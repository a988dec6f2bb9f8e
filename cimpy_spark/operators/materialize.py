"""Stage 4+5 — graph materialization with checkpoint/resume.

The reference's export walks the object graph and renders one XML
file per profile (cimpy/cimexport.py:290-336, profile routing
:167-287). Spark-first, materialization IS the partitioned table
write: `nodes` partitioned by attribute class, `edges` partitioned by
predicate (the profile-routing analog — consumers of one predicate /
attribute family get partition pruning for free). The reference's
refuse-to-overwrite rule (cimpy/cimexport.py:322-334) maps to the
committed-snapshot check: a committed stage is never rewritten unless
forced.

Each stage is checkpointed through `LineageLedger.run_stage`, so a
killed run resumes from the last committed stage (north_rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cimpy_spark import pipeline as P
from cimpy_spark.operators.canonicalize import (
    canonical_edges,
    canonical_labels,
    canonical_nodes,
)
from cimpy_spark.operators.extract import extract_triples
from cimpy_spark.operators.link import (
    declared_entities_keyed,
    edges_from_resolved,
    merge_keyed_entities,
    quarantine_from_resolved,
    resolve_references,
)
from cimpy_spark.plans.checkpoints import checkpoint_df
from cimpy_spark.plans.lineage import LineageLedger

STAGES = [
    "triples", "meta", "entities", "linked", "edges", "quarantine",
    "cmap_full", "cmap", "canon_edges", "nodes",
]


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    force: bool = False,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline, committing each stage.

    Returns the committed snapshot DataFrames keyed by stage name.
    Re-invoking on a completed out_dir recomputes nothing.
    """
    ledger = LineageLedger(out_dir)
    out: dict[str, DataFrame] = {}

    # fact stage is APPEND-ONLY (Iceberg-append stand-in): the
    # bootstrap writes increment 0; later ingest_increment calls add
    # increment dirs without ever rewriting old ones
    from cimpy_spark.operators.extract import TRIPLE_SCHEMA

    if not force and ledger.is_append_committed("triples"):
        out["triples"] = ledger.read_append_stage(spark, "triples", TRIPLE_SCHEMA)
    else:
        out["triples"] = ledger.run_append_stage(
            spark, "triples", lambda: extract_triples(transcripts),
            partition_by=["obj_kind"], reset=True,
        )
    triples = out["triples"]

    # per-profile snapshot header (model-description analog,
    # cimpy/cimexport.py:378-389) incl. the first-wins author/namespace
    # capture; commit wall time lives in the ledger
    from cimpy_spark.operators.extract import snapshot_header, snapshot_meta

    out["meta"] = ledger.run_stage(
        spark,
        "meta",
        lambda: snapshot_meta(triples, snapshot_header(transcripts)),
        force=force,
    )

    # committed KEYED (entity_id, type, conv_id, turn_idx, mention_idx):
    # carrying the winning election key makes the dictionary
    # increment-composable (min(old winner, new rows) = min(all rows))
    out["entities"] = ledger.run_stage(
        spark, "entities", lambda: declared_entities_keyed(triples), force=force
    )
    entities = out["entities"]

    # ONE linking join committed; edges/quarantine are cheap views
    # over the committed snapshot (broadcast decision from the ledger,
    # not a fresh count action)
    n_entities = ledger.records()["entities"]["rows_out"]
    out["linked"] = ledger.run_stage(
        spark, "linked",
        lambda: resolve_references(
            triples, entities, broadcast_dict=n_entities <= 5_000_000
        ),
        force=force,
    )
    out["edges"] = ledger.run_stage(
        spark, "edges", lambda: edges_from_resolved(out["linked"]), force=force
    )
    out["quarantine"] = ledger.run_stage(
        spark, "quarantine", lambda: quarantine_from_resolved(out["linked"]), force=force
    )

    # full labeling committed for the incremental path (lossless
    # contraction); public cmap = restriction to declared entities
    out["cmap_full"] = ledger.run_stage(
        spark, "cmap_full",
        lambda: canonical_labels(entities, P.same_links(triples)),
        force=force,
    )
    out["cmap"] = ledger.run_stage(
        spark, "cmap",
        lambda: entities.join(out["cmap_full"], "entity_id").select(
            "entity_id", "canonical_id"
        ),
        force=force,
    )
    cmap = out["cmap"]

    out["canon_edges"] = ledger.run_stage(
        spark, "canon_edges",
        lambda: canonical_edges(out["edges"], cmap),
        partition_by=["pred"], force=force,
    )
    out["nodes"] = ledger.run_stage(
        spark, "nodes",
        lambda: canonical_nodes(triples, cmap),
        # provenance partition first (rdf:about routing analog), then
        # attribute family for consumer partition pruning
        partition_by=["profile", "attr"], force=force,
    )
    return out


def ingest_increment(
    spark: SparkSession, transcripts: DataFrame, out_dir: str
) -> dict[str, DataFrame]:
    """Batch-incremental ingest: extract ONLY conversations not yet in
    the committed triple snapshot, union with it, and recompute the
    downstream stages. Extraction dominates cost at corpus scale, and
    re-extraction of old conversations never happens — the
    incremental axis of the reference ("more profile files later",
    cimpy/cimimport.py:93,197) distributed.

    The new-conversation filter is a left-anti join against the
    committed triples' conv_ids (at 10^12-turn scale this becomes a
    partition-watermark check against the lineage ledger — same
    semantics, cheaper lookup). EVERY downstream stage is incremental
    when its committed snapshot postdates the triples commit:
    entities merge keyed dictionaries, linking re-joins only the
    increment + dangling tail, CC iterates only the increment's links
    over the committed contraction, canonical edges rewrite only
    increment-touched raw edges, and node elections recompute only
    touched components. All are equivalence-tested against a single
    full run (sameAs links may join old and new components, so the
    canonical map stays global by construction).
    """
    ledger = LineageLedger(out_dir)
    # gate on the APPEND format specifically: a legacy-format triples
    # snapshot (or none) bootstraps via run_pipeline instead of
    # crashing on an empty increment list
    if not ledger.is_append_committed("triples"):
        return run_pipeline(spark, transcripts, out_dir)

    from cimpy_spark.operators.extract import TRIPLE_SCHEMA

    committed = ledger.read_append_stage(spark, "triples", TRIPLE_SCHEMA)
    # Trust the committed labeling ONLY if it was committed after the
    # current triples snapshot: a crash between the triples commit and
    # the cmap_full commit of a previous increment leaves a stale
    # labeling whose silent reuse would drop that increment's sameAs
    # merges forever. Stale/missing -> full CC over the merged set.
    # (Materialize eagerly: the incremental cmap_full stage overwrites
    # the very snapshot this reads — same hazard as triples below.)
    old_labels = (
        checkpoint_df(spark.read.parquet(ledger.stage_dir("cmap_full")))
        if ledger.committed_after("cmap_full", "triples")
        else None
    )
    # incremental linking needs the pre-increment resolved set AND the
    # pre-increment entity dictionary (to know which declarations are
    # new); both must postdate the current triples commit
    use_inc_link = ledger.committed_after(
        "linked", "triples"
    ) and ledger.committed_after("entities", "triples")
    old_linked = (
        checkpoint_df(spark.read.parquet(ledger.stage_dir("linked")))
        if use_inc_link
        else None
    )
    old_entities = (
        checkpoint_df(spark.read.parquet(ledger.stage_dir("entities")))
        if use_inc_link
        else None
    )
    old_nodes = (
        checkpoint_df(spark.read.parquet(ledger.stage_dir("nodes")))
        if old_labels is not None and ledger.committed_after("nodes", "triples")
        else None
    )
    old_canon_edges = None
    if (
        old_labels is not None
        and use_inc_link
        and ledger.committed_after("canon_edges", "triples")
    ):
        if ledger.records()["canon_edges"]["rows_out"] > 0:
            old_canon_edges = checkpoint_df(
                spark.read.parquet(ledger.stage_dir("canon_edges"))
            )
        else:
            # a partitioned write of an EMPTY stage leaves no parquet
            # files to infer a schema from — stand in an empty frame
            old_canon_edges = spark.createDataFrame(
                [], "src string, pred string, dst string"
            )
    # committed first-wins header (read BEFORE the append below — the
    # meta stage is force-overwritten every increment, and its commit
    # must postdate the pre-append triples commit to be trusted)
    old_hdr = None
    if ledger.committed_after("meta", "triples"):
        _om = spark.read.parquet(ledger.stage_dir("meta"))
        if "author" in _om.columns:
            old_hdr = (
                _om.select(
                    F.col("profile").alias("role"),
                    "author",
                    "namespace",
                    "hdr_conv_id",
                    "hdr_turn_idx",
                )
                .filter(F.col("author").isNotNull())
            )
            old_hdr = checkpoint_df(old_hdr)

    seen = committed.select("conv_id").distinct()
    fresh = transcripts.join(seen, "conv_id", "left_anti")
    new_triples = checkpoint_df(extract_triples(fresh))

    # APPEND the increment (old increment dirs are never rewritten —
    # O(increment) IO, the Iceberg-append semantics), then force the
    # derived stages, each of which is itself incremental below
    out: dict[str, DataFrame] = {}
    out["triples"] = ledger.run_append_stage(
        spark, "triples", lambda: new_triples, partition_by=["obj_kind"]
    )
    triples = out["triples"]

    def _entities():
        if old_entities is not None:
            # merge committed keyed dictionary with the increment's —
            # no rescan of old declarations
            return merge_keyed_entities(
                old_entities, declared_entities_keyed(new_triples)
            )
        return declared_entities_keyed(triples)

    from cimpy_spark.operators.extract import (
        merge_headers,
        snapshot_header,
        snapshot_meta,
    )

    def _meta():
        # keyed first-wins merge: the committed header (min key over
        # all previous increments) ∪ the increment's header re-elects
        # exactly — no rescan of old transcripts. A stale/legacy meta
        # stage (crash between the triples and meta commits of a
        # previous increment) falls back to capturing over the WHOLE
        # transcripts argument — a superset of `fresh`, the most
        # history reachable without the lost commit. NB: the fallback
        # is exact only when the caller passes the full corpus (as the
        # driver does); a caller passing just the increment gets a
        # header that can differ from a full rebuild, hence the
        # warning.
        if old_hdr is not None:
            hdr = merge_headers(old_hdr, snapshot_header(fresh))
        else:
            import warnings

            warnings.warn(
                "stale/legacy meta stage: recovering the snapshot header "
                "from the passed transcripts only — pass the widest "
                "transcript set available for an exact header",
                stacklevel=2,
            )
            hdr = snapshot_header(transcripts)
        return snapshot_meta(triples, hdr)

    out["meta"] = ledger.run_stage(spark, "meta", _meta, force=True)

    out["entities"] = ledger.run_stage(spark, "entities", _entities, force=True)
    entities = out["entities"]

    n_entities = ledger.records()["entities"]["rows_out"]

    def _linked():
        if old_linked is not None:
            # re-join only the increment's refs + the old dangling tail
            from cimpy_spark.operators.link import incremental_resolve

            new_entities_only = entities.join(
                old_entities.select("entity_id"), "entity_id", "left_anti"
            )
            return incremental_resolve(
                old_linked,
                new_triples,
                entities,
                new_entities_only,
                broadcast_dict=n_entities <= 5_000_000,
            )
        return resolve_references(
            triples, entities, broadcast_dict=n_entities <= 5_000_000
        )

    out["linked"] = ledger.run_stage(spark, "linked", _linked, force=True)
    out["edges"] = ledger.run_stage(
        spark, "edges", lambda: edges_from_resolved(out["linked"]), force=True
    )
    out["quarantine"] = ledger.run_stage(
        spark, "quarantine", lambda: quarantine_from_resolved(out["linked"]), force=True
    )

    def _cmap_full():
        if old_labels is not None:
            # incremental CC: only the increment's sameAs links are
            # iterated; old components arrive pre-contracted
            from cimpy_spark.operators.canonicalize import incremental_canonical_map

            return incremental_canonical_map(
                old_labels,
                entities.select("entity_id"),
                P.same_links(new_triples),
            )
        return canonical_labels(entities, P.same_links(triples))

    out["cmap_full"] = ledger.run_stage(spark, "cmap_full", _cmap_full, force=True)
    out["cmap"] = ledger.run_stage(
        spark, "cmap",
        lambda: entities.join(out["cmap_full"], "entity_id").select(
            "entity_id", "canonical_id"
        ),
        force=True,
    )
    cmap = out["cmap"]

    def _canon_edges():
        if old_canon_edges is not None:
            from cimpy_spark.operators.canonicalize import (
                incremental_canonical_edges,
            )

            # endpoints the increment can have introduced as edges:
            # the increment's refs, the previously-dangling tail, AND
            # newly-declared entities (an old resolved edge whose src
            # was undeclared produces its first canonical row when the
            # increment declares that src — linking checks only dst)
            new_refs = new_triples.filter(
                (F.col("obj_kind") == "ref") & (F.col("pred") != "sameAs")
            )
            dangling = old_linked.filter(~F.col("resolved"))
            new_decls = new_triples.filter(F.col("pred") == "rdf_type").select(
                F.col("subj").alias("entity_id")
            )
            cand = (
                new_refs.select(F.col("subj").alias("entity_id"))
                .unionByName(new_refs.select(F.col("obj").alias("entity_id")))
                .unionByName(dangling.select(F.col("src").alias("entity_id")))
                .unionByName(dangling.select(F.col("dst").alias("entity_id")))
                .unionByName(new_decls)
                .distinct()
            )
            return incremental_canonical_edges(
                old_canon_edges,
                out["edges"],
                cand,
                old_labels,
                out["cmap_full"],
                cmap,
                cmap_rows=ledger.records()["cmap_full"]["rows_out"],
            )
        return canonical_edges(out["edges"], cmap)

    out["canon_edges"] = ledger.run_stage(
        spark, "canon_edges", _canon_edges, partition_by=["pred"], force=True
    )

    def _nodes():
        if old_nodes is not None:
            # touched-component re-election only; cmap_rows from the
            # ledger governs broadcast vs shuffled joins at scale
            from cimpy_spark.operators.canonicalize import incremental_canonical_nodes

            return incremental_canonical_nodes(
                old_nodes, triples, new_triples, old_labels, out["cmap_full"],
                entities,
                cmap_rows=ledger.records()["cmap_full"]["rows_out"],
            )
        return canonical_nodes(triples, cmap)

    out["nodes"] = ledger.run_stage(
        spark, "nodes", _nodes, partition_by=["profile", "attr"], force=True
    )
    return out


def write_bucketed_graph(
    spark: SparkSession,
    nodes: DataFrame,
    canon_edges: DataFrame,
    n_buckets: int = 16,
    prefix: str = "kg",
) -> tuple[str, str]:
    """Bucketed co-located sink: nodes bucketed+sorted by entity_id,
    edges by src, SAME bucket count — so the hot consumer join
    (edges ⋈ nodes on src=entity_id, the reference's pointer-chase
    CIM2DPsim.py:465-476 at scale) runs with ZERO exchanges on either
    side (verified by plan test). At 10^9-node scale this converts the
    per-query shuffle into a one-time write-side clustering; on a real
    deployment the same layout is an Iceberg bucket-partition spec.

    Returns the two table names (registered in the session catalog;
    files under spark.sql.warehouse.dir)."""
    import shutil

    nodes_t = f"{prefix}_nodes_bucketed"
    edges_t = f"{prefix}_edges_bucketed"
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    for t in (nodes_t, edges_t):
        # idempotent rewrite: drop the catalog entry AND any orphaned
        # location a previous session left behind (the in-memory
        # catalog forgets tables across sessions; the files don't)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        if warehouse:
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        nodes.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "entity_id")
        .sortBy("entity_id")
        .saveAsTable(nodes_t)
    )
    (
        canon_edges.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "src")
        .sortBy("src")
        .saveAsTable(edges_t)
    )
    return nodes_t, edges_t


def roundtrip_check(spark: SparkSession, out_dir: str) -> bool:
    """Materialize → re-read → re-derive invariant views and compare
    (the reference's import→export→import fixpoint,
    tests/test_export.py:99-213). Cheap structural check: canonical
    edges re-derived from committed snapshots equal the committed
    canon_edges."""
    ledger = LineageLedger(out_dir)
    edges = spark.read.parquet(ledger.stage_dir("edges"))
    cmap = spark.read.parquet(ledger.stage_dir("cmap"))
    committed = spark.read.parquet(ledger.stage_dir("canon_edges")).select(
        "src", "pred", "dst"
    )
    rederived = canonical_edges(edges, cmap).select("src", "pred", "dst")
    return (
        rederived.exceptAll(committed).isEmpty()
        and committed.exceptAll(rederived).isEmpty()
    )
