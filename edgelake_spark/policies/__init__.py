"""Metadata policies + the `bring` query language.

EdgeLake keeps cluster metadata (table schemas, mappings, node
configurations) as JSON policy documents in a shared ledger, queried
with ``blockchain get <type> where <attrs> bring[.variant] [paths]``
(reference edge_lake/cmd/member_cmd.py:1614 blockchain_get;
edge_lake/generic/utils_json.py:41-57,481-720 bring parsing/execution).

The ledger is small metadata — the reference evaluates bring in plain
Python on the query node, and so do we (PolicyStore). For
policy-shaped *data* at scale, the same pulls compile to
from_json/explode DataFrame plans (see ingest/mapping.py, which is the
high-volume consumer of bring paths).
"""

from edgelake_spark.policies.bring import PolicyStore

__all__ = ["PolicyStore"]
