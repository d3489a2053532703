"""Backstop-regime probe at the PRODUCTION cap (VERDICT r10 #4).

The one regime BENCH_SCALE/BENCH_SCALE2 never measured wall-clock
for: a NATURALLY SKEWED mega-label — one near-clique holding ~50% of
all vectors — at cap=BLOCK_CAP(1024). A clique of mutually-near
vectors (cos≈1) collides into ONE sign-LSH bucket in every band, so
the banded sub-split cannot spread it and the band-seeded HASH
BACKSTOP is what enforces the n_bands·cap·n candidate bound. This
probe builds that corpus at two sizes (sf1- and sf2-scale), and
records:

1. ENGAGEMENT PROOF — a sharp fingerprint, not a threshold: with the
   clique in one LSH bucket per band, the backstop hash-splits it
   into g = ceil(clique/cap) sub-buckets, so a clique pair survives
   per band with probability 1/g and ACROSS the n_bands independent
   band hashes with p = 1-(1-1/g)^n_bands (first-collision dedup
   makes bands a union, not a sum). Emitted clique pairs must land
   within 10% of p × quadratic — measured r11: 17.20M vs predicted
   17.19M (sf1, g=10) and 37.1M vs 37.1M (sf2, g=20).
2. SLOPE: for a pair ENUMERATOR the work *is* the output, so the
   step gate is the OUTPUT-NORMALIZED wall ratio (wall ratio /
   output growth) ≤ 2.0 — measured r11: wall 1.67× for 2× input and
   2.16× output → 0.77× per output. The raw wall ratio is recorded
   alongside; cap-bounded cells are same-size tasks, so residual
   wobble is local[32] wave quantization, gone at cluster widths.
3. OPERATIONAL GATES (what the capped family PROMISES in this
   regime — pair recall is explicitly NOT the contract here: the
   backstop's graceful degradation caps candidates at ~bands·cap·n
   while the clique's true pair set is quadratic, so a 95%
   pair-recall gate is unsatisfiable by design and would measure the
   wrong thing):
   - DEDUP EFFECTIVENESS: keep-lowest over the capped pairs
     collapses the clique — survivors ≤ 1% of clique members;
   - COVERAGE: ≥99% of clique members appear in ≥1 emitted pair
     (a member with no pair can never be deduped);
   - BYSTANDER RECALL: the non-clique half keeps the standard
     twin-recall gate (≥95%) — the mega block must not damage
     normal blocks.

Usage:
    python scripts/make_scale_data.py                       # sf1
    python scripts/make_scale_data.py --factor 20 --dst /root/repo/.scale/sf2
    python scripts/backstop_probe.py [--samples 2]
Writes /root/repo/BENCH_BACKSTOP.json.
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

SF1 = "/root/repo/.scale/sf1"
SF2 = "/root/repo/.scale/sf2"
OUT = "/root/repo/BENCH_BACKSTOP.json"
STEP_FLAG = 2.0         # output-normalized (work == output here)
SURVIVOR_BOUND = 0.01   # clique survivors / clique size
COVERAGE_BOUND = 0.99   # clique members with >=1 pair
TWIN_RECALL_BOUND = 0.95
# twin id offset must not collide with the scale generator's replica
# strides (1e7/1e8 families) or a clique pair id-difference could be
# mistaken for a twin pair
TWIN_OFFSET = 1_000_000_007


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
    if not os.path.isdir(SF1):
        sys.exit("run scripts/make_scale_data.py first")

    from pyspark.sql import functions as F

    from roborock_data_pipeline_spark.operators import similarity
    from roborock_data_pipeline_spark.session import get_spark
    from roborock_data_pipeline_spark.sources.tables import load, spread

    spark = get_spark("rdp-spark-backstop")
    spark.sparkContext.setLogLevel("ERROR")
    cap = similarity.BLOCK_CAP
    bands = similarity.N_BANDS
    report: dict[str, object] = {
        "cap": cap,
        "n_bands": bands,
        "contract_note": (
            "pair recall is NOT the contract in the backstop regime: "
            "the candidate bound (n_bands*cap*n) is deliberately "
            "sub-quadratic while a mega-clique's true pair set is "
            "quadratic — the operational gates are dedup "
            "effectiveness (clique collapses), member coverage, and "
            "undamaged bystander recall"
        ),
    }

    def mega(sf_dir: str):
        """~50% of vectors become one near-clique under label 0: the
        clique member keeps its own embedding direction REPLACED by a
        shared base + per-member ~0.1% jitter (deterministic from
        vec_id), so all clique cosines are ≈1; non-clique vectors
        keep their embeddings, their labels shifted by +1 so label 0
        is purely the mega block."""
        emb = spread(load(spark, sf_dir, "embeddings"))
        base = F.transform(
            F.col("embedding"),
            lambda x, i: F.lit(1.0)
            + F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000)).cast(
                "double"
            )
            / F.lit(500000.0),
        )
        is_clique = F.col("vec_id") % 2 == 0
        return emb.select(
            "vec_id",
            F.when(is_clique, F.lit(0))
            .otherwise(F.col("label").cast("int") + 1)
            .alias("label"),
            F.when(is_clique, base.cast("array<float>"))
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )

    flagged: list[str] = []
    walls: dict[str, float] = {}
    meta: dict[str, dict] = {}
    for sf_dir, tag in [(SF1, "sf1"), (SF2, "sf2")]:
        if not os.path.isdir(sf_dir):
            report[tag] = "corpus not generated"
            continue
        emb = mega(sf_dir)
        n = emb.count()
        n_clique = emb.where(F.col("label") == 0).count()
        spark.catalog.clearCache()
        walls[tag] = _best(
            lambda: _noop(
                similarity.blocked_pairs(
                    emb, cap=cap, min_cos=0.9, tag=f"backstop-{tag}"
                )
            ),
            args.samples,
        )
        pairs = similarity.blocked_pairs(
            emb, cap=cap, min_cos=0.9, tag=f"backstop-{tag}"
        )
        clique_pairs = pairs.join(
            emb.where(F.col("label") == 0).select(
                F.col("vec_id").alias("id1")
            ),
            "id1",
            "left_semi",
        )
        n_pairs = pairs.count()
        n_clique_pairs = clique_pairs.count()
        quadratic = n_clique * (n_clique - 1) // 2
        bound = bands * cap * n_clique
        g = -(-n_clique // cap)  # ceil
        p_collide = 1.0 - (1.0 - 1.0 / g) ** bands
        predicted = p_collide * quadratic
        covered = (
            pairs.select(F.col("id1").alias("v"))
            .unionAll(pairs.select(F.col("id2").alias("v")))
            .join(
                emb.where(F.col("label") == 0).select(
                    F.col("vec_id").alias("v")
                ),
                "v",
                "left_semi",
            )
            .distinct()
            .count()
        )
        coverage = covered / n_clique
        # dedup effectiveness: keep-lowest over the emitted pairs
        losers = pairs.select(
            F.greatest("id1", "id2").alias("loser")
        ).distinct()
        clique_survivors = (
            emb.where(F.col("label") == 0)
            .join(
                losers.select(F.col("loser").alias("vec_id")),
                "vec_id",
                "left_anti",
            )
            .count()
        )
        survivor_frac = clique_survivors / n_clique
        meta[tag] = {
            "rows_in": n,
            "clique_size": n_clique,
            "wall_s": walls[tag],
            "pairs_out": n_pairs,
            "clique_pairs_out": n_clique_pairs,
            "clique_quadratic_truth": quadratic,
            "candidate_bound": bound,
            "backstop_g": g,
            "predicted_pairs": int(predicted),
            # the engagement FINGERPRINT: emitted clique pairs match
            # the backstop's union-of-bands collision probability —
            # the plain banded split (no backstop) would emit ~all
            # quadratic pairs here (one LSH bucket per band)
            "engagement_proven": n_clique_pairs <= bound
            and abs(n_clique_pairs - predicted) <= 0.10 * predicted,
            "clique_coverage": round(coverage, 5),
            "clique_survivors": clique_survivors,
            "survivor_frac": round(survivor_frac, 5),
        }
        if not meta[tag]["engagement_proven"]:
            flagged.append(f"{tag}:backstop_not_engaged")
        if coverage < COVERAGE_BOUND:
            flagged.append(f"{tag}:coverage {coverage:.4f}<{COVERAGE_BOUND}")
        if survivor_frac > SURVIVOR_BOUND:
            flagged.append(
                f"{tag}:survivors {survivor_frac:.4f}>{SURVIVOR_BOUND}"
            )
        print(f"{tag}: {json.dumps(meta[tag])}", flush=True)
        report[tag] = meta[tag]

    if "sf1" in walls and "sf2" in walls:
        ratio = round(walls["sf2"] / walls["sf1"], 2)
        out_growth = meta["sf2"]["pairs_out"] / max(
            1, meta["sf1"]["pairs_out"]
        )
        per_output = round(ratio / out_growth, 2)
        report["step_ratio"] = {
            "wall_ratio": ratio,
            "output_growth": round(out_growth, 2),
            "per_output_ratio": per_output,
            "flag_bar": STEP_FLAG,
            "note": (
                "work == output for a pair enumerator; the residual "
                "per-output ratio over 1.0 is local[32] wave "
                "quantization of same-size cap-bounded cells"
            ),
        }
        if per_output > STEP_FLAG:
            flagged.append(
                f"step:{per_output}x per output (bar {STEP_FLAG}x)"
            )
        print(
            f"step wall {ratio}x, output {out_growth:.2f}x, "
            f"per-output {per_output}x (bar {STEP_FLAG}x)",
            flush=True,
        )

    # bystander gate: the standard twin-recall predicate on the
    # NON-clique half of the sf1 mega corpus — normal blocks must be
    # unharmed by the mega block's presence in the same plan
    emb1 = mega(SF1)
    bystander = emb1.where(F.col("label") != 0)
    twins = bystander.select(
        (F.col("vec_id") + TWIN_OFFSET).alias("vec_id"),
        "label",
        "embedding",
    )
    aug = bystander.unionByName(twins).unionByName(
        emb1.where(F.col("label") == 0)
    )
    pairs = similarity.blocked_pairs(
        aug, cap=cap, min_cos=0.9, tag="backstop-bystander"
    )
    twin_hits = (
        pairs.where(
            (F.col("id2") - F.col("id1") == TWIN_OFFSET)
        )
        .join(
            bystander.select(F.col("vec_id").alias("id1")),
            "id1",
            "left_semi",
        )
        .count()
    )
    n_bystander = bystander.count()
    twin_recall = twin_hits / n_bystander
    report["bystander_twin_recall"] = {
        "recall": round(twin_recall, 5),
        "bound": TWIN_RECALL_BOUND,
        "n_twin_pairs_expected": n_bystander,
    }
    if twin_recall < TWIN_RECALL_BOUND:
        flagged.append(
            f"bystander_recall {twin_recall:.4f}<{TWIN_RECALL_BOUND}"
        )
    print(f"bystander twin recall {twin_recall:.5f}", flush=True)

    report["flagged"] = flagged
    report["samples_min_of"] = args.samples
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({"flagged": flagged, "out": OUT}))
    spark.stop()


if __name__ == "__main__":
    main()
