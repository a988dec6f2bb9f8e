"""cimpy_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference (Canfirat98/cimpy), re-expressed Spark-first.

The reference imports CIM/CGMES RDF/XML profile files into a typed
object graph (two-pass: instantiate, then link references —
``cimpy/cimimport.py:84-372``) and exports it back per-profile
(``cimpy/cimexport.py:290-399``). This engine generalizes that to a
distributed pipeline over transcript tables:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      → extract   : Arrow-batched mention detection → (subj, pred, obj) triples
      → link      : entity linking via broadcast/hash joins (+ salting)
      → canonical : connected-components canonicalization (cross-profile merge)
      → materialize: partitioned nodes/edges tables + lineage/metrics

No custom Catalyst rules are needed; every stage is declarative
DataFrame code so predicate pushdown, column pruning, AQE and
whole-stage codegen apply end to end.
"""

__version__ = "0.1.0"
