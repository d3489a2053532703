"""Per-query micro-bench: bench.py's exact methodology (noop sink,
clearCache between queries, min-of-N with the cache a query builds
for itself staying live across its own samples), restricted to the
queries named on the command line — the guide §1 "isolate each
expensive query" harness for optimization A/Bs.

Usage: python scripts/profile_queries.py q_a q_b ... [--n 5] [--plan]
Prints one JSON line per query: {"query", "samples", "min"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--plan", action="store_true",
                    help="dump .explain('formatted') per query")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from roborock_data_pipeline_spark.registry import all_queries
    from roborock_data_pipeline_spark.session import get_spark

    spark = get_spark("rdp-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # same warm-up as bench.py: flagship query + one Python-worker pass
    specs["q_daily_summary"].fn(spark, args.sf_dir).write.format(
        "noop").mode("overwrite").save()
    warm = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism)
    warm.mapInPandas(lambda it: it, schema="id long").write.format(
        "noop").mode("overwrite").save()

    for name in args.queries:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        spark.catalog.clearCache()
        samples = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            specs[name].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"query": name, "samples": samples,
                          "min": min(samples)}), flush=True)
        if args.plan:
            df = specs[name].fn(spark, args.sf_dir)
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    spark.stop()


if __name__ == "__main__":
    main()
