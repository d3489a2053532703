"""Streaming near-dup pairs with BOUNDED state (VERDICT r10 #5).

A raw streaming caller who hands ``blocked_pairs`` an unbounded
embedding stream gets the banded stream-stream self-join — correct,
but its join state store retains every input row for the life of the
query (×bands ×salt replicas): fine for a finite backfill, fatal for
a production feed (the r10 self-review documented exactly this).

THIS module is the production entry point for "emit cos≥t pairs as
vectors arrive": the curation funnel's ``foreachBatch`` pattern
promoted to a first-class near-dup-pairs surface. Each micro-batch
runs the BATCH pair engine against the persisted semantic index
(operators/incremental_semdedup) — new×new pairs within the batch,
new×indexed pairs against everything ingested before it — and the
index absorbs the batch. Properties the stream-stream form cannot
give:

- ZERO streaming state: foreachBatch runs batch jobs, so the state
  store holds nothing (the test pins ``stateOperators == []`` across
  ≥3 batches) — corpus memory lives in the INDEX, on disk,
  compactable, probe-pruned, instead of in executor state forever;
- exactly-once pair emission under crash/replay: the epoch id is the
  index batch id, and a replayed epoch returns its committed pair
  set verbatim (the index's stored-pairs replay contract) while the
  pair sink's epoch-named publish is idempotent;
- completeness: every qualifying pair is emitted exactly once, in
  the batch its LATER member arrives (union over batches ≡ the
  one-shot batch run on the whole corpus — pinned by test).

Setup contract: the index must exist (``create_semantic_index`` on a
training sample — frozen centroids are what make cell assignment
stable across batches).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from roborock_data_pipeline_spark.operators.incremental_semdedup import (
    update_semantic_index,
)
from roborock_data_pipeline_spark.operators.similarity import BLOCK_CAP

EMB_STREAM_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    T.StructField("label", T.IntegerType(), True),
])

PAIR_SCHEMA = T.StructType([
    T.StructField("vec_id_1", T.LongType(), False),
    T.StructField("vec_id_2", T.LongType(), False),
    T.StructField("cosine", T.DoubleType(), False),
])


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All pairs emitted so far (one dir per committed epoch)."""
    dirs = [
        os.path.join(pairs_dir, d)
        for d in (os.listdir(pairs_dir) if os.path.isdir(pairs_dir) else [])
        if d.startswith("epoch-")
    ]
    if not dirs:
        return spark.createDataFrame([], PAIR_SCHEMA)
    return spark.read.schema(PAIR_SCHEMA).parquet(*dirs)


def near_dup_pairs_stream(
    spark: SparkSession,
    emb_stream_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    cap: int = BLOCK_CAP,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the bounded-state near-dup pair stream over a parquet
    file source of embeddings. Returns the started query
    (``availableNow``: drains the current source then stops — rerun
    on a schedule for continuous ingest; the checkpoint makes reruns
    incremental)."""
    stream = spark.readStream.schema(EMB_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    emb_stream = stream.parquet(emb_stream_dir)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = update_semantic_index(
            spark,
            batch_df,
            index_dir,
            threshold=threshold,
            cap=cap,
            batch_id=f"e{epoch_id:012d}",
        )
        dest = os.path.join(pairs_dir, f"epoch-{epoch_id:012d}")
        if os.path.isdir(dest):
            return  # replayed epoch: pairs already published
        staged = os.path.join(
            pairs_dir, ".staging", f"epoch-{epoch_id}-{uuid.uuid4().hex[:8]}"
        )
        try:
            pairs.select("vec_id_1", "vec_id_2", "cosine").write.mode(
                "overwrite"
            ).parquet(staged)
            os.replace(staged, dest)
        finally:
            if os.path.exists(staged):
                shutil.rmtree(staged, ignore_errors=True)

    return (
        emb_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
