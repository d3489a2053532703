"""Generate a larger scale factor from an existing testdata dir by
key-offset replication — the input to the scale-curve probe
(scripts/scale_probe.py, VERDICT r6 #5 / r7 backlog #8).

Usage:
    python scripts/make_scale_data.py [--factor 10] \
        [--src /root/testdata/sf0.1] [--dst /root/repo/.scale/sf1]

Replication discipline (what makes the output a fair scaling input,
not just the same bytes repeated):

- FK consistency: every key column is offset per replica with a
  stride far above the base key range (custkey/suppkey/partkey
  +1e7·i, orderkey +1e8·i, doc/vec ids +1e8·i, event/user ids), so
  joins fan out exactly as at the base scale — 10× rows, 10× key
  cardinality, identical per-key density.
- Dimensions (region, nation) stay fixed, like TPC-H: a bigger
  warehouse has more facts, not more nations. Group-by-nation
  queries therefore grow per-group (the realistic skew direction).
- documents: replica texts get a per-replica Caesar rotation of
  letters — a bijective token renaming preserving token ORDER and
  lengths, so each replica's internal shingle/jaccard structure is
  byte-for-byte isomorphic to the base (dup pairs scale exactly
  ×factor) while cross-replica shingle overlap is structurally zero
  (10 exact copies of every doc would make every dup group 10×
  wider — a different workload, not a bigger one).
- embeddings: per-component deterministic jitter (~0.1%) keeps the
  cluster/cell geometry while breaking exact duplicates, for the
  same reason.
- events keep their time range (scale grows traffic density, not
  history span) — window/sessionize queries see 10× events per
  window, the hard direction.

Deterministic end-to-end: same src → same dst bytes (values, not
file layout).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

KEY_OFFSETS = {
    # table: {column: stride per replica}
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "events": {"event_id": 1_000_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 100_000_000},
}
DIMS = ("region", "nation")


def scale_table(spark, src, name, factor):
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    if name in DIMS:
        return base
    reps = []
    for i in range(factor):
        rep = base
        for col, stride in KEY_OFFSETS.get(name, {}).items():
            rep = rep.withColumn(col, F.col(col) + F.lit(i * stride))
        if name == "documents" and i > 0:
            # Per-replica Caesar rotation of letters: a BIJECTIVE
            # token renaming that keeps the original token ORDER, so
            # every within-replica shingle/jaccard relation is exactly
            # the base replica's (dup pairs scale exactly ×factor),
            # while a rotated shingle can never equal another
            # replica's — cross-replica overlap is structurally zero.
            # (The first cut of this generator SORTED tokens by a
            # replica-seeded hash instead; with the corpus's shared
            # vocabulary that collapsed every replica's docs onto
            # near-identical sorted sequences and made within-replica
            # dup pairs quadratic — q_dedup_minhash probed 19× at 10×
            # data purely from that artifact.) Lengths, punctuation,
            # and whitespace are untouched, so n_chars and every
            # length/token-count-driven cost stay representative;
            # stopword/lang n-gram stats do shift — an accepted trade
            # for exact dup-structure preservation in a perf probe.
            rot = i % 25 + 1  # never 0 (mod 26) for i > 0
            lower = "abcdefghijklmnopqrstuvwxyz"
            src_alpha = lower + lower.upper()
            dst_alpha = (
                lower[rot:] + lower[:rot]
                + (lower[rot:] + lower[:rot]).upper()
            )
            rep = rep.withColumn(
                "text", F.translate("text", src_alpha, dst_alpha)
            )
        if name == "embeddings" and i > 0:
            # ~0.1% deterministic jitter per component: keeps cluster
            # geometry, breaks exact-duplicate explosion
            rep = rep.withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (x, j) -> cast(x * (1.0d + "
                    f"pmod(xxhash64(vec_id, j, {i}), 2000) / 1000000.0d) "
                    "as float))"
                ),
            )
        reps.append(rep)
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.scale/sf1")
    args = ap.parse_args()

    from roborock_data_pipeline_spark.session import get_spark

    spark = get_spark("rdp-spark-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)
    tables = list(DIMS) + list(KEY_OFFSETS)
    for name in tables:
        dst = os.path.join(args.dst, f"{name}.parquet")
        # single-file layout, matching the testdata vintage (the
        # loaders treat each table as one parquet path)
        scale_table(spark, args.src, name, args.factor).coalesce(
            max(1, args.factor // 2)
        ).write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"{name}: {n} rows -> {dst}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
