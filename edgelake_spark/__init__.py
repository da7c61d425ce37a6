"""edgelake_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of EdgeLake (reference: /root/reference,
LF Edge EdgeLake, MPL-2.0).

EdgeLake federates SQL over edge nodes by rewriting each query into a
per-operator "remote query" plus a query-node "unify query"
(reference: edge_lake/dbms/unify_results.py:18-24). On Spark that whole
distributed layer collapses into a single Catalyst plan over partitioned
tables: partial/final aggregation, predicate pushdown, and partition
pruning are native. This package therefore implements

- the EdgeLake SQL dialect (``increments``, ``period``, ``extend``,
  ``include``, ``::casting``, date-literal functions, option block) as a
  thin rewrite layer producing standard Spark SQL / DataFrame plans
  (:mod:`edgelake_spark.dialect`, :mod:`edgelake_spark.engine`),
- the ingestion surface (schema inference with EdgeLake's widening
  lattice, mapping policies, micro-batched streaming with time/volume
  thresholds, streaming conditions, data monitor) on Structured
  Streaming (:mod:`edgelake_spark.ingest`,
  :mod:`edgelake_spark.streaming`),
- large-scale training-data operators beyond the reference (exact and
  near dedup, similarity search, text analysis, multimodal plumbing)
  (:mod:`edgelake_spark.functions`).
"""

from edgelake_spark.session import get_spark
from edgelake_spark.engine import EdgeLakeEngine

__all__ = ["get_spark", "EdgeLakeEngine"]
__version__ = "0.1.0"
