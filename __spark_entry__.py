"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship EdgeLake-dialect query (increments buckets
over the events stream) at sf0.001.
``queries()`` / ``oracle_sql()`` — the operator inventory from
SURVEY.md §2 plus the training-data operators; see
edgelake_spark/queries.py for the cross-engine determinism conventions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from edgelake_spark.queries import ORACLE_SQL, SPARK_QUERIES

#: The driver's correctness run verifies only the FIRST 50 entries of
#: queries(). Round 3 verified the 50 gates then-declared first (the
#: keys of CORRECTNESS_r03.json, listed here); later rounds rotate the
#: never-driver-verified gates into the window so every gate gets an
#: independent DuckDB check, not just the local parity replica.
#: _verified_from_disk() extends this set from every CORRECTNESS_r*.json
#: present, so the rotation is automatic from round 5 on — a gate that
#: went green in ANY driver run yields its window slot to one that
#: has not.
_R03_VERIFIED = frozenset({
    "el_basic_where", "el_agg", "el_avg_group", "el_range_distinct",
    "el_distinct_col", "el_group_order_desc", "el_increments_hour",
    "el_increments_auto", "el_period", "el_period_filter",
    "el_time_literals", "el_extend_include", "el_per_column_limit",
    "el_casting_str", "el_json_props", "tpch_q1", "tpch_q3",
    "tpch_q5ish", "topk_per_group", "scalar_subquery", "rows_count",
    "doc_exact_dedup", "doc_minhash_bands", "doc_minhash_pairs",
    "doc_simhash", "doc_ngram_jaccard", "doc_lang_id", "doc_quality",
    "emb_cosine_topk", "emb_ivf_topk", "el_include_mixed_schema",
    "el_view_query", "el_increments_grouped", "el_casting_replace",
    "events_sessionize", "events_pivot", "lineitem_time_scan",
    "events_union_distinct", "emb_near_dup", "doc_dedup_clusters",
    "el_timezone_cast", "el_casting_pad_format", "el_string_predicates",
    "el_period_month", "policy_bring", "multimodal_features",
    "events_ewma", "doc_dedup_keep", "events_asof_orders",
    "doc_simhash_pairs",
})

#: Unverified family variants whose siblings are already driver-green
#: (increments ladder beyond hour/auto/grouped/year, period week,
#: timediff casting, footer-estimate counts): they queue at the BACK of
#: the unverified block so genuinely novel gates fit in the 50-slot
#: window first.
_DEFER = (
    "el_increments_minute",
    "el_increments_month",
    "el_increments_week",
    "el_casting_timediff",
    "el_period_week",
    "rows_count_estimate",
    # round-4 additions: queue behind the r3-era gates so this round's
    # 50-slot driver window verifies the backlog first; rotate these in
    # next round
    "tpch_q2ish",
    "tpch_q12ish",
    "tpch_q16ish",
    "tpch_q20ish",
    "tpch_q22ish",
    "emb_ivfpq_topk",
    "doc_dup_chunk_frac",
    "events_m4_downsample",
    "emb_sq8_topk",
    "doc_mean_token_rank",
    "events_gapfill_interp",
    "doc_mix_weights",
    "doc_pack_sequences",
    "emb_pq_recall",
    "emb_sq8_recall",
    "doc_gopher_rules",
    "doc_pii_redact",
    "doc_chunk_overlap",
    "doc_remove_dup_chunks",
    "emb_bq_hamming_topk",
    "emb_bq_recall",
    "doc_bm25_topk",
    "orders_bucketed_join",
    "events_funnel",
    "doc_pagerank3",
    "doc_lang_confusion",
    "events_seasonal",
    "doc_minhash_calibration",
    "events_cusum",
    "events_markov",
    "events_quantiles",
    "events_profile",
    "events_ab_test",
    "emb_drift",
    "emb_knn_classify",
    "orders_rfm",
    "lineitem_basket",
    "orders_pareto",
    "events_dau_wau",
)

#: Gates added AFTER the deferred backlog exactly filled the 50-slot
#: window: they rank behind every _DEFER gate (but ahead of verified
#: ones) so the current round's driver window still converges the
#: backlog to zero; these rotate into the next round's window.
_STAGED = (
    "doc_lm_surprisal",
    "events_mad_outliers",
    "events_lag_corr",
    "orders_cohort_retention",
    "emb_sq8_recon_error",
    "events_holt_forecast",
    "doc_vocab_shift",
    "doc_split_leakage",
    "doc_cluster_sizes",
    "doc_len_histogram",
)


def _verified_from_disk() -> frozenset:
    """Gates whose CURRENT content fingerprint went fully green
    (rows+schema+hash) in a recorded driver correctness run — they
    queue BEHIND never-verified gates in the 50-slot window.

    Keyed on (gate, fingerprint), not name alone (round-6 advice): a
    gate edited after its last green run — Spark side or oracle side —
    drops out of the verified set and automatically re-enters the
    window. VERIFIED_GATES.json is regenerated per round by
    tools/refresh_verified_gates.py from git history; if it is absent,
    fall back to the historical name-keyed union so the driver contract
    never breaks."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "VERIFIED_GATES.json")) as fh:
            verified_fps = json.load(fh)
        from edgelake_spark.fingerprint import all_fingerprints

        current = all_fingerprints()
        return frozenset(
            g for g, fp in current.items() if fp in verified_fps.get(g, ())
        )
    except (OSError, ValueError, ImportError):
        pass

    names = set(_R03_VERIFIED)
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for gate, res in data.items():
            if (
                isinstance(res, dict)
                and res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
            ):
                names.add(gate)
    return frozenset(names)


def _window_order(names) -> list[str]:
    """Never-driver-verified gates fill the 50-slot window first; the
    round-5 _STAGED backlog outranks gates added this round (rank 0 vs
    2) so the backlog converges to zero before new gates compete for
    slots; _DEFER is historical (all driver-green by r5)."""
    verified = _verified_from_disk()
    rank = {n: 1 for n in _DEFER}
    rank.update({n: 0 for n in _STAGED})
    return sorted(names, key=lambda n: 3 if n in verified else rank.get(n, 2))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK_QUERIES["el_increments_hour"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: SPARK_QUERIES[n] for n in _window_order(SPARK_QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return {n: ORACLE_SQL[n] for n in _window_order(ORACLE_SQL)}
