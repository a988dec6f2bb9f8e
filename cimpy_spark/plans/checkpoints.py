"""Shared plan-materialization helper.

Every operator that must cut lineage or pin an intermediate that is
consumed by multiple downstream plans (the CC loop, LSH band keys,
SimHash fingerprints, verified dup pairs, ANN buckets) goes through
ONE policy: a RELIABLE checkpoint when the session has a checkpoint
directory configured — a cluster run must survive executor loss
mid-pipeline, and localCheckpoint blocks are gone with their executor
— falling back to ``localCheckpoint`` in the single-JVM sandbox where
no checkpoint dir exists and executor loss means the whole app died
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_df(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize `df` fault-tolerantly when possible.

    `eager=False` defers materialization to the first action over the
    result (use when a count/probe immediately follows — one job
    instead of two)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
