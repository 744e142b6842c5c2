"""Similarity search over embedding columns.

- :func:`brute_force_topk` — exact cosine top-k: normalize once,
  broadcast the (small) query side, window-rank per query. The
  correctness baseline.
- :func:`ivf_topk` — IVF-style ANN: vectors are partitioned into cells
  (nearest coarse centroid); a query probes only the `nprobe` nearest
  cells and brute-forces within them. At 100 TB the cell assignment is
  a broadcast map-side op and the probe touches nprobe/nlist of the
  data — the scan cost drops proportionally. Centroids here come from
  the label column (deterministic); on a real corpus they'd come from
  a k-means job (same dataflow, iterated).
- :func:`lsh_buckets` — sign-LSH bucketing (see plans/queries
  q_ann_lsh_buckets for the driver-facing version).

All math is double-precision JVM-side (functions/vectors) so results
sit under the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vectors as vec_fn


def _normalized(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return vectors.select(
        F.col(id_col).cast("bigint").alias("vid"),
        vec_fn.l2_normalize(F.col(vec_col).cast("array<double>")).alias("v"),
    )


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(qid, neighbor, cosine, rk) exact top-k per query vector."""
    normed = _normalized(vectors, id_col, vec_col)
    q = _normalized(queries, id_col, vec_col).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vid"))
    return (
        F.broadcast(q).crossJoin(normed)
        .where(F.col("qid") != F.col("vid"))
        .withColumn("cos_raw", vec_fn.dot(F.col("qv"), F.col("v")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", F.col("vid").alias("neighbor"),
                F.round("cos_raw", 6).alias("cosine"),
                F.col("rk").cast("bigint").alias("rk"))
    )


def cells_from_centroids(vectors: DataFrame, centroids: DataFrame,
                         id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest coarse centroid (cell_id)."""
    normed = _normalized(vectors, id_col, vec_col)
    w = Window.partitionBy("vid").orderBy(F.desc("cs"), F.asc("cell_id"))
    return (
        normed.crossJoin(F.broadcast(centroids))
        .withColumn("cs", vec_fn.dot(F.col("v"), F.col("centroid")))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("vid", "v", "cell_id")
    )


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, centroids: DataFrame,
    k: int = 5, nprobe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: per query, search only the nprobe nearest cells.

    centroids: (cell_id bigint, centroid array<double>) — L2-normalized.
    Returns (qid, neighbor, cosine, rk).
    """
    cells = cells_from_centroids(vectors, centroids, id_col, vec_col)
    q = _normalized(queries, id_col, vec_col).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("qcs"), F.asc("cell_id"))
    probes = (
        F.broadcast(q).crossJoin(F.broadcast(centroids))
        .withColumn("qcs", vec_fn.dot(F.col("qv"), F.col("centroid")))
        .withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= nprobe)
        .select("qid", "qv", "cell_id")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vid"))
    return (
        probes.join(cells, "cell_id")
        .where(F.col("qid") != F.col("vid"))
        .withColumn("cos_raw", vec_fn.dot(F.col("qv"), F.col("v")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", F.col("vid").alias("neighbor"),
                F.round("cos_raw", 6).alias("cosine"),
                F.col("rk").cast("bigint").alias("rk"))
    )
