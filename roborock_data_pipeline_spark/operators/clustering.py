"""Embedding clustering (SURVEY §2.K EXT — LLM-data pipeline).

K-means over the `embeddings` table — the semantic-dedup /
domain-mixing clustering step of pretraining pipelines (e.g.
SemDeDup-style cluster-then-dedup-within-cluster): cluster the
corpus, then sample/dedup per cluster. Also the offline step that
trains IVF centroids for `operators/similarity.ivf_topk`.

Lloyd's algorithm in its canonical distributed form (same geometry
as Spark MLlib's KMeans): centroids are a k x d driver-side array
(2 KB here) broadcast into a codegen assignment expression each
iteration; the update is a (cluster, dim)-keyed partial aggregate.
No per-row Python anywhere — assignment and update are both
JVM-side.

The iteration is inherently non-SQL-expressible (fixed-point loop),
so the registered query carries no DuckDB oracle — the driver runs
its rows-only check, and tests/test_clustering.py proves cluster
recovery on synthetically separated data plus determinism across
runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roborock_data_pipeline_spark.registry import query
from roborock_data_pipeline_spark.sources.tables import load, spread


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding") -> DataFrame:
    """Add `cluster` (argmin squared-L2 centroid index, first-min
    tie-break) and `dist` (that squared distance) columns.

    Pure codegen: per centroid one zip_with/aggregate expression over
    the vector column; k x d literals fold into the generated code.
    Map-only — rides the input partitioning at any scale.
    """
    # Centroids enter as a broadcast one-row relation, and distances
    # are ONE transform over that nested-array column — not k
    # unrolled aggregate expressions and not k x d literals in the
    # plan tree. Both alternatives made every Lloyd iteration pay
    # ~1 s of Catalyst analysis/codegen at k=8, d=64; this form keeps
    # the plan size constant in k and d (the BroadcastNestedLoopJoin
    # build side is a single k x d row, ~2 KB).
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [([list(map(float, c)) for c in centroids],)],
        "cents: array<array<double>>",
    )
    darr = F.transform(
        F.col("cents"),
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    df = df.crossJoin(F.broadcast(cent_df))
    # bind the distance array once; dist/cluster read the bound column
    # (array_min + array_position) instead of re-evaluating the HOF
    return (
        df.withColumn("_dists", darr)
        .withColumn("dist", F.array_min("_dists"))
        .withColumn(
            "cluster",
            (F.array_position("_dists", F.col("dist")) - 1).cast("int"),
        )
        .drop("_dists")
    )


def kmeans_fit(df: DataFrame, k: int, iters: int,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means: deterministic init (the k rows with lowest
    id), `iters` assign/update rounds. Returns (assigned df, final
    centroids).

    Driver round-trip per iteration is k x d floats — the unavoidable
    and tiny fixed-point state (MLlib does the same); the heavy work
    (assignment scan + (cluster, dim) mean) is fully distributed:
    update explodes to (cluster, pos, x) and partial-aggregates
    map-side down to k x d rows before the only shuffle.
    """
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [list(r[vec_col]) for r in init]
    for _ in range(iters):
        assigned = assign_clusters(df, cents, vec_col)
        rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .collect()
        )
        new = {r["cluster"]: [float(p["m"]) for p in r["pm"]] for r in rows}
        # empty clusters keep their previous centroid
        cents = [new.get(j, cents[j]) for j in range(k)]
    return assign_clusters(df, cents, vec_col), cents


@query("q_kmeans_clusters")  # iterative fixed-point: rows-only check
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the embedding corpus (k=8, 5 Lloyd iterations,
    deterministic lowest-vec_id init) and summarize each cluster:
    population and mean squared distance to centroid — the
    cluster-profile report that drives SemDeDup-style per-cluster
    dedup budgets and IVF index training.

    At 100 TB: assignment is a map-only codegen pass per iteration
    (centroids are k x d literals, ~kB broadcast in the plan), the
    update shuffle carries at most k x d x P partial rows, and the
    output is k rows. Iteration count is fixed (5), so total cost is
    5 scans — the standard trade against MLlib's convergence loop.
    """
    e = spread(load(spark, sf_dir, "embeddings"))
    assigned, _ = kmeans_fit(e, k=8, iters=5)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.avg("dist"), 6).alias("avg_sq_dist"),
        )
    )
