"""Mapping policies: declared schemas + `bring` pulls + defaults + `if`
scripts, applied to incoming JSON.

Reference: edge_lake/json_to_sql/mapping_policy.py — a policy document

    {"mapping": {"id": ..., "dbms": ..., "table": ...,
                 "schema": {
                    "<column>": {"type": "timestamp",
                                 "bring": "[readings][][ts]",   # path pull
                                 "default": "...",              # fallback
                                 "optional": true}}}}

``bring "[a][b]"`` navigates attribute paths, ``[]`` iterates a list
(one output row per element — reference get_value_by_key,
mapping_policy.py:537-575). On Spark the pull compiles to column
navigation + explode over the raw JSON, all JVM-side via from_json /
get_json_object.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgelake_spark.ingest.infer import edgelake_to_spark_type

_PATH_RE = re.compile(r"\[([^\]]*)\]")


def parse_bring_path(path: str) -> list[str]:
    """'[readings][][value]' → ['readings', '', 'value'] ('' = iterate)."""
    if not path:
        return []
    if not path.startswith("["):
        return [path]
    return _PATH_RE.findall(path)


def policy_to_schema(policy: dict) -> dict[str, dict]:
    """schema section of a mapping policy → {column: column_info}
    (reference policy_to_columns_dict, mapping_policy.py:66)."""
    mapping = policy.get("mapping", {})
    schema = mapping.get("schema")
    if not isinstance(schema, dict):
        raise ValueError("mapping policy missing 'schema'")
    out = {}
    for column, info in schema.items():
        if column.startswith("__") and column.endswith("__"):
            continue  # dummy/script columns are ignored (reference :98)
        out[column] = info if isinstance(info, dict) else {"type": "varchar"}
    return out


def _jsonpath(path_parts: list[str]) -> str:
    """bring path → JSONPath for get_json_object ('' handled by a prior
    explode)."""
    out = "$"
    for p in path_parts:
        if p == "":
            continue
        out += f".{p}"
    return out


def apply_mapping_policy(
    spark: SparkSession, raw_json_df: DataFrame, policy: dict, json_col: str = "value"
) -> DataFrame:
    """Apply a mapping policy to a DataFrame of raw JSON strings.

    If any bring path contains a list-iteration segment ``[]``, the rows
    explode over that list (reference: one insert per list entry).
    Everything compiles to JVM-side json functions — at scale this is a
    map-only stage feeding the partitioned write.
    """
    schema = policy_to_schema(policy)

    # find the (single) iteration prefix, e.g. [readings][]
    iter_prefix: list[str] | None = None
    for info in schema.values():
        parts = parse_bring_path(info.get("bring", ""))
        if "" in parts:
            prefix = parts[: parts.index("")]
            if iter_prefix is not None and prefix != iter_prefix:
                raise ValueError("multiple different [] iteration paths not supported")
            iter_prefix = prefix

    df = raw_json_df
    item_col = None
    if iter_prefix is not None:
        arr = f"$.{'.'.join(iter_prefix)}" if iter_prefix else "$"
        df = df.withColumn(
            "__items", F.from_json(F.get_json_object(F.col(json_col), arr), "array<string>")
        ).withColumn("__item", F.explode("__items"))
        item_col = "__item"

    def _pull_expr(path_str: str):
        parts = parse_bring_path(path_str)
        if parts and "" in parts:
            rel = parts[parts.index("") + 1 :]
            return F.get_json_object(F.col(item_col), _jsonpath(rel))
        if parts:
            return F.get_json_object(F.col(json_col), _jsonpath(parts))
        return F.lit(None)

    cols = []
    for column, info in schema.items():
        el_type = info.get("type", "varchar").upper()
        spark_type = edgelake_to_spark_type(el_type)
        expr = _pull_expr(info.get("bring", "")).cast(spark_type)
        # conditional values — the declarative subset of the reference's
        # per-column `if` scripts (mapping_policy.py:747 process_if_code;
        # the imperative command-script form is out of scope): ordered
        # rules, first match wins, falling through to bring/default.
        # Reversed wrap order makes the FIRST listed rule the outermost
        # (highest-priority) when().
        for rule in reversed(info.get("conditions", [])):
            cond = _condition_to_column(rule["if"], _pull_expr)
            expr = F.when(cond, F.lit(rule["then"]).cast(spark_type)).otherwise(expr)
        if "default" in info and info["default"] is not None:
            expr = F.coalesce(expr, F.lit(info["default"]).cast(spark_type))
        cols.append(expr.alias(column))
    out = df.select(*cols)

    # policy-level row filter: `if <cond> then ignore event`
    drop = policy.get("mapping", {}).get("ignore_if")
    if drop:
        out = df.filter(~_condition_to_column(drop, _pull_expr)).select(*cols)
    return out


_COND_RE = re.compile(r"^\s*(\[[^=<>!]+\])\s*(==|!=|>=|<=|>|<)\s*(.+?)\s*$")


def _condition_to_column(cond: str, pull_expr) -> F.Column:
    """'[path] <op> <literal>' with optional top-level ``and``/``or``
    chains → boolean Column over the raw JSON (compound conditions per
    the reference's if-scripts, mapping_policy.py:747 process_if_code;
    ``or`` binds looser than ``and``, like SQL)."""
    or_parts = re.split(r"\s+or\s+", cond, flags=re.IGNORECASE)
    if len(or_parts) > 1:
        out = _condition_to_column(or_parts[0], pull_expr)
        for part in or_parts[1:]:
            out = out | _condition_to_column(part, pull_expr)
        return out
    and_parts = re.split(r"\s+and\s+", cond, flags=re.IGNORECASE)
    if len(and_parts) > 1:
        out = _condition_to_column(and_parts[0], pull_expr)
        for part in and_parts[1:]:
            out = out & _condition_to_column(part, pull_expr)
        return out
    m = _COND_RE.match(cond)
    if not m:
        raise ValueError(f"cannot parse mapping condition: {cond}")
    path, op, literal = m.groups()
    lhs = pull_expr(path)
    literal = literal.strip("'\"")
    try:
        rhs = F.lit(float(literal))
        lhs = lhs.cast("double")
    except ValueError:
        rhs = F.lit(literal)
    return {
        "==": lhs == rhs,
        "!=": lhs != rhs,
        ">": lhs > rhs,
        ">=": lhs >= rhs,
        "<": lhs < rhs,
        "<=": lhs <= rhs,
    }[op]
