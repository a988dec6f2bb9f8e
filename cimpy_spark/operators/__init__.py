from cimpy_spark.operators.extract import extract_triples, extraction_metrics  # noqa: F401
from cimpy_spark.operators.link import (  # noqa: F401
    declared_entities,
    link_references,
    reverse_edges,
    salted_join,
)
from cimpy_spark.operators.canonicalize import (  # noqa: F401
    canonical_map,
    canonical_edges,
    canonical_nodes,
)
