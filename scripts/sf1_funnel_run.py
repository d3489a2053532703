"""Run the streaming curation funnel once at sf1 (VERDICT r8 #8): the
one composite path the per-query scale probe does not cover — gate →
incremental MinHash dedup → incremental semantic dedup → atomic
publish, under the real Structured Streaming engine, followed by a
funnel_maintenance compaction pass.

The sf1 documents land as 10 replica-sized stream files (one
micro-batch each with maxFilesPerTrigger=1 — the incremental-ingest
shape: every batch probes the indexes GROWN by the previous batches).
Records per-batch wall/counts, index segment counts before/after
maintenance, and maintenance wall time to SCALE_FUNNEL.json; the
measured paragraph lives in SCALE.md.

Usage:  python scripts/sf1_funnel_run.py [--scaled /root/repo/.scale/sf1]
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

DOC_OFF = 100_000_000
N_REP = 10


def _live_segments(d: str) -> int:
    from roborock_data_pipeline_spark.operators.index_segments import (
        live_segments,
    )

    base, batches = live_segments(d)
    return (1 if base is not None else 0) + len(batches)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaled", default="/root/repo/.scale/sf1")
    ap.add_argument("--out", default="/root/repo/SCALE_FUNNEL.json")
    args = ap.parse_args()

    from roborock_data_pipeline_spark import pipeline
    from roborock_data_pipeline_spark.session import get_spark
    from roborock_data_pipeline_spark.sources.tables import load

    spark = get_spark("rdp-spark-sf1-funnel")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sf1-funnel-")
    stream_dir = os.path.join(work, "stream")
    state = os.path.join(work, "state")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")

    docs = load(spark, args.scaled, "documents")
    emb = load(spark, args.scaled, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    os.makedirs(stream_dir, exist_ok=True)
    for rep in range(N_REP):
        part = docs.where(
            F.floor(F.col("doc_id") / DOC_OFF) == rep
        ).coalesce(1)
        tmp = os.path.join(work, f"_stage_{rep}")
        part.write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(src, os.path.join(stream_dir, f"replica-{rep}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    batches: list[dict] = []
    last = [time.perf_counter()]

    def on_batch(epoch_id: str, counts: dict) -> None:
        now = time.perf_counter()
        rec = {"epoch": epoch_id, "wall_s": round(now - last[0], 3), **counts}
        last[0] = now
        batches.append(rec)
        print(json.dumps(rec), flush=True)

    t0 = time.perf_counter()
    q = pipeline.run_curate_stream(
        spark, stream_dir, emb, state, out_dir, ckpt,
        max_files_per_trigger=1, on_batch=on_batch,
    )
    q.awaitTermination()
    ingest_s = round(time.perf_counter() - t0, 3)

    mh, sem = os.path.join(state, "minhash"), os.path.join(state, "semantic")
    seg_before = {"minhash": _live_segments(mh), "semantic": _live_segments(sem)}
    t1 = time.perf_counter()
    merged = pipeline.funnel_maintenance(spark, state, out_dir)
    maint_s = round(time.perf_counter() - t1, 3)
    seg_after = {"minhash": _live_segments(mh), "semantic": _live_segments(sem)}

    published = pipeline.read_curated_stream(spark, out_dir).count()
    report = {
        "scaled": args.scaled,
        "micro_batches": len(batches),
        "ingest_wall_s": ingest_s,
        "per_batch": batches,
        "published_total": published,
        "segments_before_maintenance": seg_before,
        "segments_after_maintenance": seg_after,
        "maintenance": merged,
        "maintenance_wall_s": maint_s,
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({
        "ingest_wall_s": ingest_s, "maintenance_wall_s": maint_s,
        "published": published, "batches": len(batches),
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
