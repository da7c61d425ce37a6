"""Similarity search over embedding columns (array<float>).

- cosine: elements cast to double FIRST, then multiply/accumulate in
  index order — both engines execute the identical IEEE sequence, so
  scores agree bit-for-bit with the DuckDB oracle.
- brute-force top-k: broadcast the (small) query set against the
  corpus; one pass, no corpus shuffle — the right baseline at any scale
  when |queries| is small.
- IVF top-k: deterministic centroid subset (vec_id % stride), assign
  each corpus vector to its nearest centroid (broadcast centroids),
  probe the nprobe nearest centroids per query. The corpus-side work
  drops by ~|centroids|/nprobe; at 100 TB the assignment becomes a
  bucketed/partitioned layout so probes touch only matching partitions.
"""

from __future__ import annotations

CENTROID_STRIDE = 47  # vec_id % 47 == 0 → deterministic centroid subset
NPROBE = 2


def spark_cosine(a: str, b: str) -> str:
    da = f"transform({a}, x -> CAST(x AS DOUBLE))"
    db = f"transform({b}, x -> CAST(x AS DOUBLE))"
    dot = f"aggregate(zip_with({da}, {db}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({da}, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"
    nb = f"sqrt(aggregate({db}, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"
    return f"({dot} / ({na} * {nb}))"


def duck_cosine(a: str, b: str) -> str:
    # index-order accumulation to mirror Spark's aggregate() exactly
    dot = f"list_sum([({a})[i]::DOUBLE * ({b})[i]::DOUBLE for i in range(1, len({a}) + 1)])"
    na = f"sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in {a}]))"
    nb = f"sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in {b}]))"
    return f"({dot} / ({na} * {nb}))"


# --- staged variant: cast + norm computed ONCE per vector -------------
#
# Spark's higher-order functions are interpreted; recomputing the
# double-cast and the norm inside every candidate pair multiplies the
# per-pair cost ~5×. Staging (demb, norm) as columns first keeps the
# exact same IEEE operation sequence (so oracle parity holds) while the
# per-pair work drops to one zip_with+aggregate. At cluster scale this
# is also the right layout: norms live with the vectors, computed once
# at ingest.


def spark_norm_stage_sql(table: str, extra_cols: str = "label") -> str:
    demb = "transform(embedding, x -> CAST(x AS DOUBLE))"
    return (
        f"SELECT vec_id, {extra_cols}, {demb} AS demb, "
        f"sqrt(aggregate({demb}, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)) AS norm "
        f"FROM {table}"
    )


def duck_norm_stage_sql(table: str, extra_cols: str = "label") -> str:
    demb = "[x::DOUBLE for x in embedding]"
    return (
        f"SELECT vec_id, {extra_cols}, {demb} AS demb, "
        f"sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in embedding])) AS norm "
        f"FROM {table}"
    )


def spark_cosine_staged(a: str, b: str) -> str:
    """Cosine over two pre-staged (demb, norm) rows, e.g. a='a', b='b'."""
    dot = (
        f"aggregate(zip_with({a}.demb, {b}.demb, (x, y) -> x * y), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return f"({dot} / ({a}.norm * {b}.norm))"


def duck_cosine_staged(a: str, b: str) -> str:
    dot = (
        f"list_sum([({a}.demb)[i] * ({b}.demb)[i] "
        f"for i in range(1, len({a}.demb) + 1)])"
    )
    return f"({dot} / ({a}.norm * {b}.norm))"
