"""Measure every in-query .persist() with and without (VERDICT r10 #3).

For each query that persists an intermediate it cannot release (the
API returns a DataFrame, so the cache outlives the call in a
long-lived session), run min-of-N wall clock twice at the audit SF:

  - "persist": the code as written;
  - "nopersist": DataFrame.persist monkeypatched to a no-op (and
    unpersist likewise), so every reuse recomputes from the pruned
    scan instead of the cache.

Output: PERSIST_AUDIT.json — one record per query with both times and
the ratio. The committed decision table lives next to the persist
sites: keep only measured wins (documented), drop the rest.

Usage: python scripts/persist_audit.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from roborock_data_pipeline_spark.registry import all_queries
from roborock_data_pipeline_spark.session import get_spark

# queries holding an in-query persist (VERDICT r10 "what's wrong #1")
AUDITED = [
    "q_near_dup_jaccard",    # dedup.py shingle postings, 2 join sides
    "q_dedup_minhash",       # dedup.py shingles + banded signatures
    "q_dup_groups",          # dedup.py iterative label propagation
    "q_containment_pairs",   # dedup.py shingle postings, pair join
    "q_bm25_search",         # text.py corpus postings, 3 readers
    "q_pmi_cooccur",         # analytics.py distinct (user,type) pairs
    "q_kmeans_clusters",     # clustering.py Lloyd iterations
    "q_pagerank",            # graph.py power iterations
    "q_tfidf_top_terms",     # text.py exploded token table, 2 readers
    "q_source_overlap",      # text.py distinct (source, token) vocab
    "q_contamination",       # quality.py shingle postings, 2 filtered readers
    "q_boilerplate_strip",   # quality.py segment explode, 2 readers (r14)
    # r15 (VERDICT r14 #3 "re-audit every tracked persist"): sites
    # that held persists but were missing from the audited set
    "q_bigram_lm",           # quality.py bigram postings, 3 readers
    "q_media_ahash",         # multimodal.py fingerprint table, 2 readers
    "q_media_near_dup",      # multimodal.py fingerprint self-join sides
]

# After the decision (r11): persists DROPPED except the measured
# winners — see the committed PERSIST_AUDIT.json and the NOT-persisted
# comments at each former site. Re-running this script measures the
# post-decision state (the "persist" arm only differs where a persist
# was kept).


def run_once(spark, fn, sf_dir: str, *, clear: bool = True) -> float:
    if clear:
        spark.catalog.clearCache()
    t0 = time.monotonic()
    fn(spark, sf_dir)._jdf.queryExecution()  # plan build
    fn(spark, sf_dir).collect()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("persist-audit")
    qs = all_queries()

    real_persist = DataFrame.persist
    real_unpersist = DataFrame.unpersist

    results: dict[str, dict] = {}
    for name in AUDITED:
        fn = qs[name].fn
        # INTERLEAVE the two arms sample-by-sample (r14): running all
        # persist samples before all nopersist samples handed the
        # second arm every JIT/codegen warm-up the first arm paid —
        # measured ~1.4x first-arm penalty on a query whose two arms
        # are IDENTICAL code (q_kmeans_clusters, no persist site), so
        # ordered arms can flip any decision with a true ratio under
        # that bias. Alternating samples exposes both arms to the
        # same warm-up trajectory; min-of-n is taken per arm as
        # before.
        # BOTH decision models, arms interleaved within each (r15,
        # VERDICT r14 #3): COLD = clearCache before every run (a
        # single-shot session); WARM = clearCache once, then samples
        # share whatever cache the query builds for itself — exactly
        # bench.py's min-of-N-without-clearing model and what a
        # session re-invoking the query sees. A kept persist must
        # win (or tie) in both.
        samples: dict[str, list[float]] = {
            "persist": [], "nopersist": [],
            "persist_warm": [], "nopersist_warm": [],
        }
        for cycle in range(n_runs):
            # alternate which arm leads each cycle (r15): even with
            # interleaving, a fixed arm order hands the leading arm
            # every within-cycle warm-up; the control query (kmeans,
            # NO persist site — arms are identical code) still read
            # 0.85 under fixed order on a drifting box
            order = ("persist", "nopersist") if cycle % 2 == 0 else (
                "nopersist", "persist")
            for mode in order:
                if mode == "nopersist":
                    DataFrame.persist = lambda self, *a, **k: self
                    DataFrame.unpersist = lambda self, *a, **k: self
                try:
                    samples[mode].append(run_once(spark, fn, sf_dir))
                finally:
                    DataFrame.persist = real_persist
                    DataFrame.unpersist = real_unpersist
        for mode in ("persist_warm", "nopersist_warm"):
            spark.catalog.clearCache()
            if mode == "nopersist_warm":
                DataFrame.persist = lambda self, *a, **k: self
                DataFrame.unpersist = lambda self, *a, **k: self
            try:
                for i in range(n_runs):
                    samples[mode].append(
                        run_once(spark, fn, sf_dir, clear=False)
                    )
            finally:
                DataFrame.persist = real_persist
                DataFrame.unpersist = real_unpersist
        rec: dict[str, float] = {}
        for mode in samples:
            rec[mode] = round(min(samples[mode]), 4)
            print(f"{name:24s} {mode:14s} min-of-{n_runs}: {rec[mode]:.3f}s",
                  flush=True)
        rec["nopersist_over_persist"] = round(
            rec["nopersist"] / rec["persist"], 3
        )
        rec["nopersist_over_persist_warm"] = round(
            rec["nopersist_warm"] / rec["persist_warm"], 3
        )
        results[name] = rec

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PERSIST_AUDIT.json")
    with open(out, "w") as fh:
        json.dump({"sf_dir": sf_dir, "n_runs": n_runs,
                   "queries": results}, fh, indent=1, sort_keys=True)
    print(json.dumps({"wrote": out, "queries": results}, sort_keys=True))


if __name__ == "__main__":
    main()
