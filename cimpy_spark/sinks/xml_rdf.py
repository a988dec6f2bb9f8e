"""Per-profile RDF/XML EXPORT — the symmetric half of
`sources/xml_rdf.py` and the last reference capability with no
engine counterpart (VERDICT r6 missing #1).

Reference analog: `cimpy/cimexport.py:290-399` (generate_xml:
class-attribute routing -> chevron/mustache render over
`export_template.mustache`), graded by `tests/test_export.py`'s
import->export->compare flow over the CIGRE MV fixture. This module
re-expresses the same serialization RELATIONALLY over the triple IR:

- **profile routing** (cimexport._sort_classes_to_profile): each
  class instance serializes into the profile of the file its rdf:ID
  declaration was read from (serializationProfile); each attribute
  serializes into the profile of the file IT was read from. An
  attribute whose profile differs from its class's profile becomes an
  ``rdf:about`` block in the attribute's own profile — exactly the
  reference's about_dict mechanism (cimexport.py:219-287).
- **mRID suppression**: the subject IS the rdf:ID; rdf_type rows
  become the element tag, never a child (`cimexport.py:232-234`).
- **default suppression** (cimexport.py:103-110 ignores '', None,
  0.0, 0): literals that are empty or numeric-zero are dropped. The
  IR is untyped strings, so a *string-typed* "0" (which the reference
  would keep — Python ``"0" in ['',None,0.0,0]`` is False) is also
  suppressed here; typed suppression for schema'd corpora goes
  through operators/schema.suppress_defaults instead. Documented
  divergence, exercised by the roundtrip test.
- **value vs reference vs URL dispatch**
  (cimexport._set_attribute_or_reference): literal -> element text
  (XML-escaped), ref -> ``rdf:resource="#mRID"`` (absolute
  scheme-carrying refs like ``urn:uuid:...`` stay un-anchored), enum
  -> ``rdf:resource="<cim_ns><Scheme.Value>"`` — the scheme prefix
  the import IR deliberately retains is what makes the URI
  reconstructible (sources/xml_rdf.py module doc).
- **model header**: the md:FullModel block is re-rendered from the
  file's own xml_meta triples (created/version/profile/DependentOn…)
  instead of a fresh wall-clock timestamp — deterministic output, and
  the header itself roundtrips. Documented deviation from
  cimexport.py:380-391 (which stamps datetime.now()).

Namespace prefixes are NOT round-tripped: the import IR is
namespace-erased by design (tag/URI splitting, SURVEY §2 F1), so
every body element renders under ``cim:`` and every header child
under ``md:``. Re-import strips prefixes again, so the triple IR is
a fixpoint even though prefix spellings are not.

Scale shape (100 TB estate): routing and element assembly are narrow
JVM column expressions plus ONE groupBy on (profile, subj, is_about)
— map-side combinable, no Python in the per-triple path. The file
writer is the only imperative step: after `repartition(profile,
shard)` each task streams its partition's pre-rendered element
strings to ONE complete, self-describing RDF/XML document (header +
FullModel + elements + footer), so a profile can be sharded across N
files and re-imported losslessly by the multi-file union reader —
the same shape every distributed text sink uses.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Default CIM data namespace for rebuilding enum URIs. Source files
# may carry per-attribute bases (CIGRE MV mixes 2010 and 2012 schema
# URIs); the IR keeps only the '#'-suffix, so export normalizes every
# enum onto one base — re-import strips the base again, hence the
# triple fixpoint holds regardless.
CIM_NS = "http://iec.ch/TC57/2012/CIM-schema-cim16#"

# rdf:RDF header namespace table (superset of what the fixture uses;
# unused declarations are harmless).
NAMESPACES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "cim": "http://iec.ch/TC57/2012/CIM-schema-cim16#",
    "md": "http://iec.ch/TC57/61970-552/ModelDescription/1#",
    "entsoe": "http://entsoe.eu/Secretariat/ProfileExtension/2#",
    "neplan": "http://www.neplan.ch#",
}

# Long profile name -> short name (cimpy/cgmes_v2_4_15/Base.py:4-23);
# matched as substrings of the md:Model.profile URL.
_PROFILE_LONGNAMES = [
    ("DiagramLayout", "DL"),
    ("Dynamics", "DY"),
    ("Equipment", "EQ"),
    ("GeographicalLocation", "GL"),
    ("StateVariables", "SV"),
    ("SteadyStateHypothesis", "SSH"),
    ("Topology", "TP"),
]


def _xml_escape(col):
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def file_profiles(triples: DataFrame) -> DataFrame:
    """(conv_id, profile): short profile name of each source file,
    elected from its FullModel's md:Model.profile URL — the same
    signal cimimport records as serializationProfile. Files with no
    recognizable profile are dropped (their triples won't route)."""
    expr = F.coalesce(
        *[
            F.when(F.col("obj").contains(long), F.lit(short))
            for long, short in _PROFILE_LONGNAMES
        ]
    )
    return (
        triples.filter(
            (F.col("role") == "xml_meta") & (F.col("pred") == "Model.profile")
        )
        .select("conv_id", expr.alias("profile"))
        .filter(F.col("profile").isNotNull())
        .dropDuplicates(["conv_id"])
    )


def _is_default(obj, obj_kind):
    """cimexport.py:103-110's ['', None, 0.0, 0] ignore-list over the
    untyped string IR: empty anywhere, numeric zero for literals (see
    module doc for the string-typed-"0" divergence)."""
    return (
        obj.isNull()
        | (obj == "")
        | ((obj_kind == "literal") & obj.rlike(r"^-?0+(\.0+)?$"))
    )


def _child_expr(cim_ns: str):
    """Rendered child line: the relational form of
    cimexport._set_attribute_or_reference (value vs #ref vs absolute
    ref vs enum URL)."""
    pred, obj, kind = F.col("pred"), F.col("obj"), F.col("obj_kind")
    lit_line = F.concat(
        F.lit("    <cim:"), pred, F.lit(">"), _xml_escape(obj),
        F.lit("</cim:"), pred, F.lit(">"),
    )
    ref_target = F.when(obj.contains(":"), obj).otherwise(
        F.concat(F.lit("#"), obj)
    )
    ref_line = F.concat(
        F.lit("    <cim:"), pred, F.lit(' rdf:resource="'), ref_target,
        F.lit('"/>'),
    )
    enum_line = F.concat(
        F.lit("    <cim:"), pred, F.lit(' rdf:resource="'),
        F.lit(cim_ns), obj, F.lit('"/>'),
    )
    return (
        F.when(kind == "enum", enum_line)
        .when(kind == "ref", ref_line)
        .otherwise(lit_line)
    )


def _md_child_expr():
    """FullModel header child (md: prefix; DependentOn refs render as
    absolute rdf:resource)."""
    pred, obj, kind = F.col("pred"), F.col("obj"), F.col("obj_kind")
    lit_line = F.concat(
        F.lit("    <md:"), pred, F.lit(">"), _xml_escape(obj),
        F.lit("</md:"), pred, F.lit(">"),
    )
    ref_line = F.concat(
        F.lit("    <md:"), pred, F.lit(' rdf:resource="'), obj,
        F.lit('"/>'),
    )
    return F.when(kind == "ref", ref_line).otherwise(lit_line)


def _sorted_body(children_struct_col):
    """Deterministic child order = source mention order: sort the
    collected (conv_id, turn_idx, mention_idx, child) structs and
    project the rendered lines."""
    return F.concat_ws(
        "\n",
        F.transform(F.array_sort(children_struct_col), lambda s: s["child"]),
    )


def render_profile_elements(
    triples: DataFrame, cim_ns: str = CIM_NS
) -> DataFrame:
    """Route and render every element block.

    Output: (profile, ord_conv, ord_turn, block_rank, subj, element)
    — one fully-rendered XML element string per row, ready for the
    sharded file writer. block_rank orders FullModel (0) before body
    elements (1) within a file.
    """
    fp = file_profiles(triples)

    # -- class election: rdf:ID declaration wins name + home profile
    #    (first declaration in source order, like link.declared_entities)
    decls = (
        triples.filter(
            (F.col("pred") == "rdf_type") & (F.col("role") == "xml")
        )
        .join(fp, "conv_id")
        .groupBy("subj")
        .agg(
            F.min_by(
                F.struct(
                    F.col("obj").alias("cls"), "profile",
                    "conv_id", "turn_idx",
                ),
                F.struct("conv_id", "turn_idx", "mention_idx"),
            ).alias("w")
        )
        .select(
            "subj", "w.cls",
            F.col("w.profile").alias("class_profile"),
            F.col("w.conv_id").alias("decl_conv"),
            F.col("w.turn_idx").alias("decl_turn"),
        )
    )

    # -- attribute routing + rendering (defaults suppressed)
    attrs = (
        triples.filter(
            (F.col("pred") != "rdf_type")
            & F.col("role").isin("xml", "xml_about")
            & ~_is_default(F.col("obj"), F.col("obj_kind"))
        )
        .join(fp, "conv_id")
        .select(
            "subj",
            "profile",
            F.struct(
                "conv_id", "turn_idx", "mention_idx",
                _child_expr(cim_ns).alias("child"),
            ).alias("ch"),
            F.col("conv_id").alias("c0"),
            F.col("turn_idx").alias("t0"),
        )
    )
    blocks = (
        attrs.join(decls, "subj", "left")
        .withColumn(
            "is_about",
            F.col("class_profile").isNull()
            | (F.col("profile") != F.col("class_profile")),
        )
        .groupBy("profile", "subj", "is_about")
        .agg(
            _sorted_body(F.collect_list("ch")).alias("body"),
            F.min("c0").alias("ord_conv"),
            F.min("t0").alias("ord_turn"),
            F.first("cls", ignorenulls=True).alias("cls"),
        )
    )

    # -- main elements: EVERY declared subject gets its rdf:ID block
    #    in its home profile, even with zero same-profile attributes
    #    (the reference renders the class with an empty attribute
    #    list); about blocks exist only where attributes landed.
    own_blocks = blocks.filter(~F.col("is_about")).select(
        F.col("subj").alias("bsubj"),
        F.col("profile").alias("bp"),
        "body", "ord_conv", "ord_turn",
    )
    main = (
        decls.join(
            own_blocks,
            on=(decls["subj"] == own_blocks["bsubj"])
            & (decls["class_profile"] == own_blocks["bp"]),
            how="left",
        )
        .select(
            decls["subj"].alias("subj"),
            F.col("class_profile").alias("profile"),
            F.col("cls"),
            F.col("body"),
            # attribute-less declarations order by their own position
            F.coalesce(F.col("ord_conv"), F.col("decl_conv")).alias("ord_conv"),
            F.coalesce(F.col("ord_turn"), F.col("decl_turn")).alias("ord_turn"),
            F.lit(False).alias("is_about"),
        )
    )
    about = blocks.filter(F.col("is_about")).select(
        "subj", "profile",
        F.coalesce(F.col("cls"), F.lit("Unknown")).alias("cls"),
        "body", "ord_conv", "ord_turn",
        F.lit(True).alias("is_about"),
    )
    body_elems = main.unionByName(about).select(
        "profile", "ord_conv", "ord_turn",
        F.lit(1).alias("block_rank"),
        "subj",
        F.concat(
            F.lit("  <cim:"), F.col("cls"),
            F.when(F.col("is_about"), F.lit(' rdf:about="#')).otherwise(
                F.lit(' rdf:ID="')
            ),
            F.col("subj"), F.lit('">'),
            F.when(
                F.col("body").isNotNull() & (F.col("body") != ""),
                F.concat(F.lit("\n"), F.col("body")),
            ).otherwise(F.lit("")),
            F.lit("\n  </cim:"), F.col("cls"), F.lit(">"),
        ).alias("element"),
    )

    # -- FullModel header element per file, from its own xml_meta
    #    triples (deterministic; see module doc)
    meta = (
        triples.filter(
            (F.col("role") == "xml_meta") & (F.col("pred") != "rdf_type")
        )
        .join(fp, "conv_id")
        .select(
            "subj", "profile",
            F.struct(
                "conv_id", "turn_idx", "mention_idx",
                _md_child_expr().alias("child"),
            ).alias("ch"),
            F.col("conv_id").alias("c0"),
        )
    )
    fullmodel = meta.groupBy("profile", "subj").agg(
        _sorted_body(F.collect_list("ch")).alias("body"),
        F.min("c0").alias("ord_conv"),
    ).select(
        "profile",
        "ord_conv",
        F.lit(0).alias("ord_turn"),
        F.lit(0).alias("block_rank"),
        "subj",
        F.concat(
            F.lit('  <md:FullModel rdf:about="'), F.col("subj"), F.lit('">\n'),
            F.col("body"), F.lit("\n  </md:FullModel>"),
        ).alias("element"),
    )
    return fullmodel.unionByName(body_elems)


def _writer_factory(out_dir: str, namespaces: dict[str, str]):
    ns = " ".join(f'xmlns:{k}="{v}"' for k, v in sorted(namespaces.items()))
    header = f'<?xml version="1.0" encoding="utf-8"?>\n<rdf:RDF {ns}>\n'

    def write_partition(batches: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts: dict[tuple[str, int], list[str]] = {}
        for pdf in batches:
            for profile, shard, element in zip(
                pdf["profile"], pdf["shard"], pdf["element"]
            ):
                parts.setdefault((profile, int(shard)), []).append(element)
        rows = []
        for (profile, shard), elems in sorted(parts.items()):
            path = os.path.join(out_dir, f"{profile}_{shard:04d}_{pid:04d}.xml")
            with open(path, "w", encoding="utf-8") as f:
                f.write(header)
                for e in elems:
                    f.write(e)
                    f.write("\n")
                f.write("</rdf:RDF>\n")
            rows.append((profile, path, len(elems)))
        if rows:
            yield pd.DataFrame(rows, columns=["profile", "path", "n_elements"])

    return write_partition


def export_rdf_xml(
    spark: SparkSession,
    triples: DataFrame,
    out_dir: str,
    cim_ns: str = CIM_NS,
    namespaces: dict[str, str] | None = None,
    shards: int = 1,
) -> list[tuple[str, str, int]]:
    """Serialize the triple IR to per-profile RDF/XML under
    ``out_dir``; returns the manifest [(profile, path, n_elements)].

    ``shards`` > 1 splits each profile's body elements across N
    complete self-describing documents (each repeats the FullModel
    header, so any subset re-imports standalone); the element order
    within a file is deterministic (source order). One task writes
    one file stream — the partition's rows arrive pre-sorted via
    sortWithinPartitions, and file content never passes through the
    driver."""
    os.makedirs(out_dir, exist_ok=True)
    elems = render_profile_elements(triples, cim_ns)
    shard_col = (
        F.when(F.col("block_rank") == 0, F.lit(None).cast("long"))
        .otherwise(F.pmod(F.xxhash64("subj"), F.lit(shards)))
    )
    sharded = elems.withColumn("shard", shard_col)
    body = sharded.filter(F.col("shard").isNotNull())
    # FullModel rows replicate into every shard of their profile
    shard_ids = spark.range(shards).select(F.col("id").alias("shard"))
    headers = (
        sharded.filter(F.col("shard").isNull())
        .drop("shard")
        .crossJoin(F.broadcast(shard_ids))
    )
    manifest = (
        headers.unionByName(body)
        .repartition(max(shards, 1), "profile", "shard")
        .sortWithinPartitions(
            "profile", "shard", "block_rank", "ord_conv", "ord_turn", "subj"
        )
        .mapInPandas(
            _writer_factory(out_dir, namespaces or NAMESPACES),
            schema="profile string, path string, n_elements long",
        )
    )
    return [(r["profile"], r["path"], r["n_elements"]) for r in manifest.collect()]
