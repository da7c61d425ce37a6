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
