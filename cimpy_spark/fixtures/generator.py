"""Standalone deterministic transcript generator (FIXTURES.md §1).

Seeded, wall-clock-free, fully distributed: `spark.range(n)` plus
`xxhash64(id, seed)`-derived pseudo-randomness — no Python in the
generation path, so `bench`-scale fixtures (millions of turns) cost a
narrow JVM-only pass.

Beyond the events-derived fixture, this one plants the adversarial
phenomena the pipeline must survive at 10^12-turn scale:

- **hot entities**: HOT_IDS are referenced from a configurable
  fraction of all rel turns (hub-mention skew → exercises salting /
  AQE skew handling in linking);
- **forward references**: rel turns may reference entities declared
  only in later turns (forces extract-then-link, the reference's
  two-pass rationale, cimpy/cimimport.py:79-83);
- **cross-role merges**: about-updates land on a different role than
  the declaration (the rdf:about cross-profile merge);
- dangling refs + unknown noise (counted quarantine);
- **multi-mention turns**: ~1/3 of turns carry a second independent
  mention (reference loops every child element,
  cimpy/cimimport.py:234-241), including same-turn attr overwrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOT = 5


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    turns_per_conv: int = 20,
    n_entities: int = 200,
    seed: int = 42,
    hot_fraction_pct: int = 25,
) -> DataFrame:
    n = n_convs * turns_per_conv
    # independent hash stream per decision — deriving several moduli
    # from ONE hash correlates them (e.g. mention-kind ≡ entity-id
    # mod gcd) and degenerates the fixture
    df = spark.range(n).select(
        (F.col("id") % n_convs).alias("conv"),
        (F.col("id") / n_convs).cast("int").alias("turn_idx"),
        *[
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed + k)), F.lit(1_000_000)).alias(
                f"h{k}"
            )
            for k in range(9)
        ],
    )
    def _mention(h_ent, h_tgt, h_hot, h_d, h_m):
        """One mention body from four independent hash streams."""
        ent = F.pmod(h_ent, F.lit(n_entities))
        # hot-entity substitution for rel targets
        tgt_raw = F.pmod(h_tgt, F.lit(n_entities))
        is_hot = F.pmod(h_hot, F.lit(100)) < hot_fraction_pct
        tgt = F.when(is_hot, F.pmod(h_hot, F.lit(N_HOT))).otherwise(tgt_raw)
        d = h_d
        m = F.pmod(h_m, F.lit(5))

        e_s = F.concat(F.lit("E"), ent.cast("string"))
        t_s = F.concat(F.lit("T"), F.pmod(ent, F.lit(5)).cast("string"))
        tgt_s = F.concat(F.lit("E"), tgt.cast("string"))
        alias_s = F.concat(
            F.lit("E"),
            (ent - F.when(F.pmod(ent, F.lit(8)) == 0, 0).otherwise(1)).cast("string"),
        )
        pred = (
            F.when(F.pmod(d, F.lit(3)) == 0, F.lit("connects_to"))
            .when(F.pmod(d, F.lit(3)) == 1, F.lit("feeds"))
            .otherwise(F.lit("controls"))
        )

        decl = F.concat(
            F.lit("«decl "), e_s, F.lit(" type:"), t_s,
            F.lit(" p_int="), F.pmod(d, F.lit(97)).cast("string"),
            F.lit(" p_bool="),
            F.when(F.pmod(d, F.lit(2)) == 0, F.lit("true")).otherwise(F.lit("false")),
            F.lit(" p_enum=kind:Unit.V"), F.pmod(d, F.lit(3)).cast("string"),
            F.lit("»"),
        )
        about = F.concat(
            F.lit("«about "), e_s,
            F.lit(" q_str=s"), F.pmod(d, F.lit(23)).cast("string"),
            F.lit(" q_int="), F.pmod(d, F.lit(41)).cast("string"),
            F.lit("»"),
        )
        rel = F.concat(
            F.lit("«rel "), e_s, F.lit(" "), pred, F.lit(" "),
            F.when(
                F.pmod(d, F.lit(11)) == 0,
                F.concat(F.lit("X"), F.pmod(d, F.lit(50)).cast("string")),
            ).otherwise(tgt_s),
            F.lit("»"),
        )
        same = F.concat(F.lit("«same "), e_s, F.lit(" "), alias_s, F.lit("»"))
        unk = F.concat(
            F.lit("«unk z"), F.pmod(d, F.lit(13)).cast("string"), F.lit("»")
        )

        # m: 0 decl, 1 about, 2 rel, 3 same-or-unk, 4 rel (refs dominate)
        return (
            F.when(m == 0, decl)
            .when(m == 1, about)
            .when(m == 2, rel)
            .when(m == 3, F.when(F.pmod(d, F.lit(5)) == 0, same).otherwise(unk))
            .otherwise(rel)
        )

    m = F.pmod(F.col("h4"), F.lit(5))
    d = F.col("h3")
    mention = _mention(F.col("h0"), F.col("h1"), F.col("h2"), d, F.col("h4"))
    # ~1/3 of turns carry a SECOND mention from independent streams
    # (multi-mention turns, reference loops every child element,
    # cimpy/cimimport.py:234-241); a later mention can overwrite an
    # earlier one's attrs within the same turn (setattr order)
    second = F.when(
        F.pmod(F.col("h8"), F.lit(3)) == 0,
        F.concat(
            F.lit(" also "),
            _mention(F.col("h5"), F.col("h6"), F.col("h2"), F.col("h7"), F.col("h8")),
        ),
    ).otherwise(F.lit(""))

    role = (
        F.when(m == 0, F.lit("user"))
        .when(m == 1, F.lit("assistant"))
        .when(m == 2, F.lit("tool"))
        .otherwise(F.lit("system"))
    )
    return df.select(
        F.concat(F.lit("g"), F.col("conv").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("turn "), F.col("turn_idx").cast("string"), F.lit(" notes: "),
            mention, second,
        ).alias("text"),
        F.when(m == 2, F.concat(F.lit("tool_"), F.pmod(d, F.lit(7)).cast("string"))).alias(
            "tool"
        ),
        # deterministic timestamp: epoch + id seconds (no wall clock)
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("conv") * 86400 + F.col("turn_idx") * 60).alias(
            "ts"
        ),
    )
