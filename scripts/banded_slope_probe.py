"""Measure the banded branch's SLOPE, not just its onset (VERDICT r9
next-round #2 / missing #1).

BENCH_SCALE.json catches the exact→banded regime change at sf1, but
at sf1 every oversized block is only ~2.1× the cap (2 signature
bits, backstop idle) — nothing showed the cost is ~linear once the
regime is ENGAGED at depth. Two measurements close that:

1. DEEP-REGIME SLOPE (label collapse): the sf0.1 and sf1 embeddings
   with labels collapsed to 3, probed at cap=256. sf0.1 has 2,000
   vectors → ~670/block (g≈2.6, 2 bits — banded engaged); sf1 has
   20,000 → ~6,700/block (g≈27, 5 signature bits — the deep regime
   with the full multi-band machinery and backstop lookups live).
   Same cap both sides, 10× input, BOTH sides in the banded regime →
   the wall ratio IS the engaged-regime slope. The candidate bound
   (n_bands·cap·n) predicts ≤10× with the signature-width growth
   absorbed by the one-pass fold (r10).

2. REGISTERED-QUERY SLOPE sf1→sf2 (if .scale/sf2 exists, generated
   by `make_scale_data.py --factor 20 --dst .scale/sf2`): q_knn_join
   / q_embedding_near_dup / q_semantic_dedup at 2× the sf1 corpus,
   deeper in the same banded regime (g≈8.5, 4 bits). Linear ≈ 2×.

Flags: deep-regime ratio > 12× (the BENCH_SCALE convention for 10×
input), sf1→sf2 ratio > 2.8 × max(1, output_growth/2) (the envelope
form of scale_probe.py scaled to a 2× input step).

Writes /root/repo/BENCH_SCALE2.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scale/sf1"
SF2 = "/root/repo/.scale/sf2"
OUT = "/root/repo/BENCH_SCALE2.json"
DEEP_CAP = 256
DEEP_FLAG = 12.0   # 10x input step
STEP_FLAG = 2.8    # 2x input step (sf1 -> sf2)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best(fn, samples: int) -> float:
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from roborock_data_pipeline_spark.operators import similarity
    from roborock_data_pipeline_spark.registry import all_queries
    from roborock_data_pipeline_spark.session import get_spark
    from roborock_data_pipeline_spark.sources.tables import load, spread

    spark = get_spark("rdp-spark-banded-slope")
    spark.sparkContext.setLogLevel("ERROR")
    flagged: list[str] = []
    report: dict[str, object] = {"deep_cap": DEEP_CAP}

    # warm
    _noop(all_queries()["q_tpch_q1_shape"].fn(spark, SF01))

    # --- 1. deep-regime slope via label collapse -----------------------
    def collapsed(sf_dir):
        return (
            spread(load(spark, sf_dir, "embeddings"))
            .select(
                "vec_id",
                F.pmod(F.col("label").cast("long"), F.lit(3))
                .cast("int")
                .alias("label"),
                "embedding",
            )
        )

    deep: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((SF01, "sf0.1"), (SF1, "sf1")):
        emb = collapsed(sf_dir)
        n = emb.count()
        spark.catalog.clearCache()
        wall = _best(
            lambda: _noop(similarity.blocked_pairs(emb, cap=DEEP_CAP)),
            args.samples,
        )
        rows = similarity.blocked_pairs(emb, cap=DEEP_CAP).count()
        deep[tag] = {"rows_in": n, "wall_s": wall, "pairs_out": rows}
        print(f"deep {tag}: n={n} wall={wall}s pairs={rows}", flush=True)
    ratio = round(deep["sf1"]["wall_s"] / deep["sf0.1"]["wall_s"], 2)
    deep["ratio"] = ratio
    if ratio > DEEP_FLAG:
        flagged.append(f"deep_regime:{ratio}x(envelope {DEEP_FLAG}x)")
    report["deep_regime_label_collapse"] = deep

    # --- 2. registered-query slope sf1 -> sf2 --------------------------
    if os.path.isdir(SF2):
        specs = all_queries()
        step: dict[str, dict[str, object]] = {}
        for name in ("q_knn_join", "q_embedding_near_dup",
                     "q_semantic_dedup"):
            fn = specs[name].fn
            walls, rows = {}, {}
            for sf_dir, tag in ((SF1, "sf1"), (SF2, "sf2")):
                spark.catalog.clearCache()
                walls[tag] = _best(
                    lambda: _noop(fn(spark, sf_dir)), args.samples
                )
                rows[tag] = fn(spark, sf_dir).count()
            r = round(walls["sf2"] / walls["sf1"], 2)
            out_growth = (
                rows["sf2"] / rows["sf1"] if rows["sf1"] else None
            )
            envelope = STEP_FLAG * max(
                1.0, (out_growth or 0.0) / 2.0
            )
            step[name] = {
                "sf1_s": walls["sf1"], "sf2_s": walls["sf2"],
                "ratio": r, "rows_sf1": rows["sf1"],
                "rows_sf2": rows["sf2"],
                "envelope": round(envelope, 2),
            }
            if rows["sf1"] and r > envelope:
                flagged.append(f"{name}:{r}x(envelope {envelope:.1f}x)")
            print(f"{name}: {walls['sf1']}s -> {walls['sf2']}s "
                  f"{r}x rows {rows['sf1']}->{rows['sf2']}", flush=True)
        report["sf1_to_sf2"] = step
    else:
        report["sf1_to_sf2"] = (
            "sf2 not generated (make_scale_data.py --factor 20 "
            "--dst /root/repo/.scale/sf2)"
        )

    report["flagged"] = flagged
    report["samples_min_of"] = args.samples
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({"flagged": flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
