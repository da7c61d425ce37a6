"""Ingestion surface: schema inference, mapping policies, partitioned
writes — EdgeLake's JSON→table pipeline re-expressed on Spark.

Reference: edge_lake/json_to_sql/ (suggest_create_table.py,
mapping_policy.py, map_json_to_insert.py). Data arrives as JSON rows
(REST PUT / MQTT / Kafka / watch-dir files); a table schema is either
inferred from the data (with a type-widening lattice) or declared by a
mapping policy; rows gain system columns and land in a partitioned
table.
"""

from edgelake_spark.ingest.infer import (
    infer_schema,
    infer_value_type,
    resolve_type,
    rows_to_dataframe,
)
from edgelake_spark.ingest.mapping import apply_mapping_policy, policy_to_schema

__all__ = [
    "infer_schema",
    "infer_value_type",
    "resolve_type",
    "rows_to_dataframe",
    "apply_mapping_policy",
    "policy_to_schema",
]
