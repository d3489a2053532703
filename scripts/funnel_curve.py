"""Streaming-funnel ingest throughput vs micro-batch size (VERDICT
r11 #6).

SCALE_FUNNEL showed ~28-33 s per 5,000-doc micro-batch at sf1
(~165 docs/s on 32 cores), dominated by FIXED per-batch index churn
(two segment publishes + index probes + the transactional publish),
not data volume. This script measures the curve: the same corpus
ingested as 1k / 5k / 25k-doc micro-batches (plus one 50k-doc
single-batch run), with a per-phase decomposition — gate+apply,
MinHash stage (probe+pair+segment write), semantic stage, and the
transaction commit+finalize — so a deployment can read off where the
fixed overhead amortizes and size its trigger accordingly.

Writes SCALE_FUNNEL_CURVE.json; the envelope statement lives in
SCALE.md.

Usage: python scripts/funnel_curve.py [--scaled /root/repo/.scale/sf1]
       [--total 25000] [--sizes 1000,5000,25000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

PHASES = ("stage_minhash", "stage_semantic", "txn_commit_finalize")


def _instrument(timers: dict[str, float]):
    """Wrap the funnel's phase entry points with wall-clock
    accumulators (script-side instrumentation only — the engine is
    untouched)."""
    from roborock_data_pipeline_spark.operators import (
        funnel_txn,
        incremental_dedup,
        incremental_semdedup,
    )

    originals = {
        "stage_minhash": (
            incremental_dedup, "stage_minhash_update",
        ),
        "stage_semantic": (
            incremental_semdedup, "stage_semantic_update",
        ),
        "txn_link": (funnel_txn, "link_commit"),
        "txn_finalize": (funnel_txn, "finalize"),
    }
    saved = {}

    def mk(key, fn):
        def timed(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                timers[key] = timers.get(key, 0.0) + (
                    time.perf_counter() - t0
                )
        return timed

    for key, (mod, attr) in originals.items():
        fn = getattr(mod, attr)
        saved[key] = (mod, attr, fn)
        setattr(mod, attr, mk(key, fn))
    return saved


def _restore(saved) -> None:
    for mod, attr, fn in saved.values():
        setattr(mod, attr, fn)


def _run_config(spark, docs, emb, batch_size: int, total: int) -> dict:
    from roborock_data_pipeline_spark import pipeline

    work = tempfile.mkdtemp(prefix=f"funnel-curve-{batch_size}-")
    stream_dir = os.path.join(work, "stream")
    os.makedirs(stream_dir)
    n_batches = total // batch_size
    # deterministic chunks by doc_id RANK so every config ingests the
    # SAME documents in the same order, only chunked differently; the
    # boundary doc_ids (one tiny sorted collect of n_batches values)
    # keep the per-chunk filter a 2-literal range predicate instead of
    # a batch_size-literal In list
    bounds = [
        r["doc_id"]
        for r in docs.select("doc_id")
        .orderBy("doc_id")
        .limit(total)
        .collect()
    ]
    edges = [bounds[i * batch_size] for i in range(n_batches)] + [
        bounds[total - 1] + 1
    ]
    for i in range(n_batches):
        part = docs.where(
            (F.col("doc_id") >= edges[i]) & (F.col("doc_id") < edges[i + 1])
        ).coalesce(1)
        tmp = os.path.join(work, f"_stage_{i}")
        part.write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(src, os.path.join(stream_dir, f"chunk-{i:04d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    timers: dict[str, float] = {}
    saved = _instrument(timers)
    walls: list[float] = []
    last = [time.perf_counter()]

    def on_batch(epoch_id, counts):
        now = time.perf_counter()
        walls.append(round(now - last[0], 3))
        last[0] = now

    try:
        t0 = time.perf_counter()
        q = pipeline.run_curate_stream(
            spark, stream_dir, emb,
            os.path.join(work, "state"), os.path.join(work, "out"),
            os.path.join(work, "ckpt"),
            max_files_per_trigger=1, on_batch=on_batch,
        )
        q.awaitTermination()
        ingest_s = round(time.perf_counter() - t0, 3)
        published = pipeline.read_curated_stream(
            spark, os.path.join(work, "out")
        ).count()
    finally:
        _restore(saved)
        shutil.rmtree(work, ignore_errors=True)
    txn = round(timers.get("txn_link", 0) + timers.get("txn_finalize", 0), 3)
    decomposed = {
        "stage_minhash_s": round(timers.get("stage_minhash", 0), 3),
        "stage_semantic_s": round(timers.get("stage_semantic", 0), 3),
        "txn_commit_finalize_s": txn,
    }
    accounted = sum(decomposed.values())
    return {
        "batch_size": batch_size,
        "n_batches": n_batches,
        "total_docs": total,
        "ingest_wall_s": ingest_s,
        "wall_per_batch_s": round(ingest_s / max(n_batches, 1), 3),
        "docs_per_s": round(total / ingest_s, 1),
        "per_batch_walls": walls,
        "phase_totals": decomposed,
        # gate + dedup-apply + counts + streaming-engine overhead
        "other_s": round(ingest_s - accounted, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaled", default="/root/repo/.scale/sf1")
    ap.add_argument("--total", type=int, default=25_000)
    ap.add_argument("--sizes", default="1000,5000,25000")
    ap.add_argument("--out", default="/root/repo/SCALE_FUNNEL_CURVE.json")
    args = ap.parse_args()

    from roborock_data_pipeline_spark.session import get_spark
    from roborock_data_pipeline_spark.sources.tables import load

    spark = get_spark("rdp-funnel-curve")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, args.scaled, "documents")
    emb = load(spark, args.scaled, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    configs = []
    for size in [int(s) for s in args.sizes.split(",")]:
        rec = _run_config(spark, docs, emb, size, args.total)
        print(json.dumps(rec), flush=True)
        configs.append(rec)
    report = {
        "scaled": args.scaled,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "configs": configs,
        "note": (
            "same documents per config, chunked differently; phase "
            "totals are whole-run accumulations over all batches "
            "(stage_* includes the index probe + pair emission + "
            "segment parquet write; other = gate + keep-first apply "
            "+ curated publish staging + streaming-engine overhead)"
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({
        "docs_per_s": {c["batch_size"]: c["docs_per_s"] for c in configs},
        "wall_per_batch_s": {
            c["batch_size"]: c["wall_per_batch_s"] for c in configs
        },
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
