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

``bring "re.group(N)"`` pulls a match group of the policy-level
``re_match`` pattern applied to the ``re_source`` path (the reference's
PLC tag-name mapping, mapping_policy.py:57,1153) — compiled to a
JVM-side regexp_extract.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgelake_spark.ingest.infer import edgelake_to_spark_type

_PATH_RE = re.compile(r"\[([^\]]*)\]")
#: `re.group(N)` value pulls (reference mapping_policy.py:57
#: re_group_pattern_, :1153 get_re_match_value)
_RE_GROUP_RE = re.compile(r"^\s*re\.group\((\d+)\)\s*$")


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

    # regex-group pulls (reference mapping_policy.py:57,1153 + PLC flow
    # mqtt_client.py:1234-1250): the policy declares a `re_match`
    # pattern applied to `re_source` (a bring path; the reference
    # applies it to the PLC attribute name), and any bring value
    # `re.group(N)` pulls that match group. re.match anchors at the
    # start, so the compiled regexp_extract pattern is ^-anchored; a
    # failed match yields NULL (the reference skips falsy values).
    re_pattern = policy.get("mapping", {}).get("re_match")
    re_source = policy.get("mapping", {}).get("re_source")
    if re_pattern and not re_pattern.startswith("^"):
        re_pattern = "^" + re_pattern

    def _pull_expr(path_str: str):
        gm = _RE_GROUP_RE.match(path_str or "")
        if gm:
            if not re_pattern or not re_source:
                raise ValueError(
                    "re.group(N) bring needs policy-level re_match and re_source"
                )
            ext = F.regexp_extract(_pull_expr(re_source), re_pattern, int(gm.group(1)))
            return F.when(ext != "", ext)
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
    # policy-level imperative script (reference "script" attribute):
    # runs conceptually per row AFTER bring/default seeding; assignments
    # targeting schema columns override their expressions, new names
    # become extra output columns
    script_lines = policy.get("mapping", {}).get("script") or []
    drop_cond: F.Column | None = None
    if script_lines:
        seed = {name: expr for name, expr in zip(schema.keys(), cols)}
        vars_, drop_cond = compile_policy_script(script_lines, _pull_expr, seed)
        cols = [vars_[n].alias(n) for n in vars_]

    # row filters evaluate over the RAW json columns, so apply them
    # before projecting the mapped schema
    ignore_if = policy.get("mapping", {}).get("ignore_if")
    if ignore_if:
        cond = _condition_to_column(ignore_if, _pull_expr)
        drop_cond = cond if drop_cond is None else (drop_cond | cond)
    if drop_cond is not None:
        df = df.filter(~F.coalesce(drop_cond, F.lit(False)))
    return df.select(*cols)


_SCRIPT_IF_RE = re.compile(r"^\s*if\s+(.*?)\s+then\s+(.*?)\s*$", re.IGNORECASE)
_ASSIGN_RE = re.compile(r"^\s*(?:set\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*$")


def _script_value(text: str, pull_expr) -> F.Column:
    """RHS of a script assignment: '[path]' pull, numeric, or string
    literal (reference data_assignment, member_cmd.py via
    mapping_policy.py:782-788)."""
    text = text.strip()
    if text.startswith("[") or _RE_GROUP_RE.match(text):
        return pull_expr(text)
    try:
        return F.lit(int(text))
    except ValueError:
        pass
    try:
        return F.lit(float(text))
    except ValueError:
        pass
    return F.lit(text.strip("'\""))


def compile_policy_script(
    lines: list[str], pull_expr, seed: dict[str, F.Column] | None = None
) -> tuple[dict[str, F.Column], F.Column | None]:
    """Compile the reference's ordered imperative policy script
    (mapping_policy.py:747-801 process_if_code) into pure Catalyst
    expressions — per-row imperative semantics, zero Python in the
    data path.

    Each line is ``if <cond> then <action>`` or a bare ``<action>``;
    actions: ``<var> = <value>`` (assignment, later lines overwrite),
    ``ignore event`` (drop the row), ``ignore attribute <name>`` (null
    the column), ``ignore script`` (stop processing further lines for
    that row — the reference's IGNORE_SCRIPT early break).

    The imperative control flow folds into expressions: an ``active``
    predicate accumulates ``ignore script`` breaks, each line's
    effective condition is ``active AND line_cond``, and ordered
    re-assignment is a when().otherwise chain where later lines wrap
    earlier ones (last true assignment wins, exactly like sequential
    execution).

    Returns ({var: expression}, drop_condition|None).
    """
    vars_: dict[str, F.Column] = dict(seed or {})
    drop: F.Column | None = None
    active: F.Column = F.lit(True)
    for line in lines:
        m = _SCRIPT_IF_RE.match(line)
        if m:
            cond = _condition_to_column(m.group(1), pull_expr) & active
            action = m.group(2)
        else:
            cond = active
            action = line.strip()
        low = action.lower()
        if low in ("ignore event", "drop event"):
            drop = cond if drop is None else (drop | cond)
        elif low == "ignore script":
            # rows matching cond stop seeing later lines
            active = active & ~F.coalesce(cond, F.lit(False))
        elif low.startswith("ignore attribute"):
            name = action.split()[-1]
            prev = vars_.get(name, F.lit(None))
            vars_[name] = F.when(~F.coalesce(cond, F.lit(False)), prev)
        else:
            am = _ASSIGN_RE.match(action)
            if not am:
                raise ValueError(f"cannot parse policy script action: {action}")
            name, rhs = am.groups()
            prev = vars_.get(name, F.lit(None))
            vars_[name] = F.when(F.coalesce(cond, F.lit(False)), _script_value(rhs, pull_expr)).otherwise(prev)
    return vars_, drop


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
    bare = cond.strip()
    if bare.startswith("[") and bare.endswith("]") and not _COND_RE.match(cond):
        # existence test: `if [attr] then ...` is true when the
        # attribute is present (reference process_analyzed_if treats a
        # bare key as a presence check)
        return pull_expr(bare).isNotNull()
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
