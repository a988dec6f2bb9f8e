from cimpy_spark.plans.lineage import LineageLedger  # noqa: F401
