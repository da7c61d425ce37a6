"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time


BENCH_QUERIES = [
    # dialect core
    "el_agg",
    "el_avg_group",
    "el_increments_hour",
    "el_period",
    "el_json_props",
    "el_include_mixed_schema",
    # joins / windows / scans
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "topk_per_group",
    "scalar_subquery",
    "lineitem_time_scan",
    "events_sessionize",
    "events_pivot",
    # training-data ops
    "doc_exact_dedup",
    "doc_minhash_pairs",
    "doc_dedup_clusters",
    "doc_simhash",
    "doc_ngram_jaccard",
    "doc_quality",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_near_dup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    from edgelake_spark import get_spark
    from edgelake_spark.queries import SPARK_QUERIES

    spark = get_spark(app_name="edgelake-bench", cpus=cpus)

    # warm the JVM, parquet footers, and the codegen paths (HOF
    # pipelines + window/cosine exprs) so per-query numbers measure the
    # plans, not first-touch JIT/janino compilation
    warm_dir = "/root/testdata/sf0.001"
    for warm in ("rows_count", "doc_quality", "emb_cosine_topk", "doc_simhash"):
        try:
            SPARK_QUERIES[warm](spark, warm_dir).collect()
        except Exception as exc:
            print(f"# warmup {warm} failed: {exc}", file=sys.stderr)

    import gc

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = SPARK_QUERIES[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({len(rows)} rows)", file=sys.stderr)
        # drop cached/checkpointed intermediates between queries so one
        # query's leftovers don't GC-thrash the next one's JVM
        spark.catalog.clearCache()
        gc.collect()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "edgelake_spark headline queries wall time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
