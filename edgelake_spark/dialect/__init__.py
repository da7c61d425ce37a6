"""EdgeLake SQL dialect: parsing + rewriting to Spark SQL.

The reference rewrites each SELECT into a remote (per-operator) query and
a local (unify) query (edge_lake/dbms/unify_results.py:901 make_sql_stmt).
On Spark both phases are one declarative plan, so this package only has
to translate the dialect-specific surface:

- ``increments(unit, n, col)`` tumbling time buckets (§2.5 of SURVEY.md)
- ``period(unit, n, date, col[, filter])`` anchored trailing window
- ``now()/date()/timestamp()`` literal functions with SQLite-style
  modifiers, evaluated at rewrite time exactly like the reference
- the ``::casting`` postfix chain, applied to the result DataFrame
- ``extend=/include=`` multi-table union with identity columns
- the option block (format / timezone / limit / per_column / table / ...)
"""

from edgelake_spark.dialect.parser import parse_select, split_top_level
from edgelake_spark.dialect.rewriter import rewrite_select, RewriteError

__all__ = ["parse_select", "split_top_level", "rewrite_select", "RewriteError"]
