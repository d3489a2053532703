"""sf2 oracle-parity sweep for the scale-sensitive registry slice
(VERDICT r10 #8): push the exact-parity frontier one more decade past
the committed sf1 record (CORRECTNESS_SF1.json, 172/172).

Query selection: the ~20 most scale-sensitive ORACLE-EXPRESSIBLE
queries — the scale-probe set's relational/window/text shapes plus
the heaviest shuffle/join/window queries of BENCH_DETAIL — excluding
the pairwise-quadratic-oracle family (DuckDB-side >20s at sf1
already; their sf-scale parity story is CORRECTNESS_SF1_QUADRATIC's
measured record, and BENCH_BACKSTOP covers their skew regime).

Usage:
    python scripts/make_scale_data.py --factor 20 --dst /root/repo/.scale/sf2
    python scripts/sf2_sweep.py
Writes /root/repo/CORRECTNESS_SF2.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF2 = "/root/repo/.scale/sf2"
OUT = "/root/repo/CORRECTNESS_SF2.json"

QUERIES = [
    # aggregate / TPC-H shapes (the 100 TB relational core)
    "q_tpch_q1_shape",
    "q_tpch_q3_shape",
    "q_tpch_q9_shape",
    "q_tpch_q18_shape",
    "q_tpch_q21_shape",
    "q_star_join",
    "q_fact_join",
    "q_skew_agg",
    # window / sessionization (full event-table exchanges)
    "q_sessionize",
    "q_session_edges",
    "q_user_streaks",
    "q_interval_count_24h",
    "q_asof_status",
    "q_rolling_distinct",
    "q_lag_features",
    # text / curation (token-explosion heavy)
    "q_winnow_fingerprint",
    "q_boilerplate_strip",
    "q_token_entropy",
    "q_tfidf_top_terms",
    "q_bm25_search",
    "q_source_cap_two_phase",
    "q_heavy_hitters",
    "q_global_index",
    "q_batch_pack",
    # sketch-vs-exact gate (oracle-checked accuracy at scale)
    "q_approx_distinct_check",
    # persist-drop regression sentinel (r11 touched)
    "q_pmi_cooccur",
]


def main() -> int:
    if not os.path.isdir(SF2):
        sys.exit(
            "run scripts/make_scale_data.py --factor 20 "
            "--dst /root/repo/.scale/sf2 first"
        )
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
        ),
    )
    from oracle_harness import compare

    from roborock_data_pipeline_spark.session import get_spark

    spark = get_spark("rdp-spark-sf2-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    record: dict[str, object] = {"sf_dir": SF2, "queries": {}}
    n_ok = n_fail = 0
    for name in QUERIES:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            probs = compare(name, spark, SF2)
        except Exception as exc:  # noqa: BLE001 — record, don't die
            probs = [f"exception: {exc}"]
        wall = round(time.perf_counter() - t0, 1)
        status = "ok" if not probs else "fail"
        n_ok += status == "ok"
        n_fail += status == "fail"
        record["queries"][name] = (
            {"status": status, "wall_s": wall}
            if not probs
            else {"status": status, "wall_s": wall, "problems": probs[:5]}
        )
        print(f"[{status.upper():4s}] {name} ({wall}s)", flush=True)
    record["status"] = (
        f"r11: {n_ok}/{len(QUERIES)} oracle parity at sf2 (20x the bench "
        "scale) for the scale-sensitive oracle-expressible slice; "
        "quadratic-oracle family covered by CORRECTNESS_SF1_QUADRATIC + "
        "BENCH_BACKSTOP instead"
    )
    record["ok"] = n_ok
    record["fail"] = n_fail
    with open(OUT, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(json.dumps({"ok": n_ok, "fail": n_fail, "out": OUT}))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
