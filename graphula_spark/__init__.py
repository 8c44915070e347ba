"""graphula_spark — a PySpark-native rebuild of the graphula triple store.

The reference (pstutz/graphula) is a single-node LMDB-backed RDF triple
store answering SPARQL BGP queries with a recursive binding-at-a-time
matcher (reference: core/src/main/scala/com/graphula/Graphula.scala).
This package re-expresses the same capabilities Spark-first:

- terms are dictionary-encoded 63-bit positive longs
  (reference: core/.../dictionary/Dictionary.scala:34-37)
- the triple set is one DataFrame ``(s, p, o)`` of longs; Catalyst
  predicate pushdown + partition pruning replace the reference's 8-way
  LMDB permutation index (reference: core/.../index/Index.scala:61-78)
- a BGP is executed as a chain of aliased equi self-joins, greedily
  ordered by estimated cardinality + join-graph connectivity
  (reference: core/.../Graphula.scala:120-190)
- everything above BGPs (FILTER/OPTIONAL/UNION/...) — which the
  reference delegates to Jena ARQ — is our own SPARQL front-end
  compiled to DataFrame operations.
"""

from graphula_spark.dataset import Dataset
from graphula_spark.dictionary import Dictionary, HASH_MASK
from graphula_spark.graph import Graph
from graphula_spark.plans.bgp import Var, TriplePattern
from graphula_spark.operators.importance import (
    importance_sample,
    importance_weights,
    importance_weights_subset,
)
from graphula_spark.operators.splits import (
    leakage_safe_split,
    split_by_key,
)
from graphula_spark.pipeline import PipelineConfig, PipelineResult, run_pipeline
from graphula_spark.session import get_spark
from graphula_spark.sources.ntriples import (
    read_nquads,
    read_ntriples,
    write_nquads,
    write_ntriples,
)
from graphula_spark.sources.rdfxml import read_rdfxml
from graphula_spark.sources.turtle import read_trig, read_turtle

__all__ = [
    "Dataset",
    "Dictionary",
    "Graph",
    "Var",
    "TriplePattern",
    "get_spark",
    "HASH_MASK",
    "PipelineConfig",
    "PipelineResult",
    "run_pipeline",
    "importance_sample",
    "leakage_safe_split",
    "split_by_key",
    "importance_weights",
    "importance_weights_subset",
    "read_nquads",
    "read_ntriples",
    "read_rdfxml",
    "read_trig",
    "read_turtle",
    "write_nquads",
    "write_ntriples",
]

__version__ = "0.1.0"
