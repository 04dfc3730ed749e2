"""Similarity search over the `embeddings` table (array<float> column) —
training-data pipeline extension (BASELINE.json north star).

- s1: brute-force cosine top-k — the exact baseline, built-in exprs only
      (zip_with/aggregate fold → deterministic double math shared with the
      DuckDB oracle).
- s2: IVF two-stage ANN — deterministic k-means (Lloyd's iterations as
      pure DataFrame ops: broadcast-join assignment + posexplode mean
      update) builds nlist coarse cells; queries probe the nprobe nearest
      cells and exact-rerank inside. The 100 TB path: the corpus would be
      written partitioned by cell id, so a probe is a partition-pruned
      scan of nprobe/nlist of the data. rows-only checked; recall on
      planted near-duplicates is property-tested (the testdata embeddings
      are isotropic-random — label is NOT a geometric cluster — so recall
      on random neighbors would measure the data, not the operator).
- numpy_topk: Arrow-batched mapInPandas matmul kernel, the vectorized
      form when Python-side scoring is unavoidable; tests assert it agrees
      exactly with s1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import vectors as V
from ..functions.rounding import fround
from ..registry import register
from ..sources.tables import load_table

_R = 6
K = 10
N_QUERIES = 5  # query set: vec_id < 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the testdata parquet is a single ~200 KB split → one task; the vector
    # folds (interpreted higher-order exprs) would run single-threaded.
    # Repartition to the session's parallelism — at real scale the input
    # arrives in many splits and this is a no-op decision.
    par = spark.sparkContext.defaultParallelism
    return (
        load_table(spark, sf_dir, "embeddings")
        .repartition(par, "vec_id")
        .select("vec_id", "label", V.to_double("embedding").alias("v"))
    )


# ---------------------------------------------------------------------------
# S1 — brute-force cosine top-k (exact baseline, oracle-checked)
# ---------------------------------------------------------------------------
@register(
    "s1_knn_bruteforce",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         round({V.sql_cosine("q.qv", "e.v")}, {_R}) AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {K}
""",
    doc="S1: exact brute-force cosine top-10 for 5 query vectors",
)
def s1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            fround(V.cosine(F.col("qv"), F.col("v")), _R).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Deterministic distributed k-means (Lloyd's algorithm, pure DataFrame ops)
# ---------------------------------------------------------------------------
def _normalize(v: Column) -> Column:
    n = V.norm(v)
    return F.transform(v, lambda x: x / n)


def assign_cells(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (spherical k-means): vectors and
    centroids are pre-normalized (`vn`/`centroid` unit-length), so the
    score is a single dot-product fold instead of a full cosine (3 folds);
    argmax via groupBy + max_by (cheaper than a window sort — no per-key
    ordering shuffle). Deterministic tiebreak: (score, -cell) struct max."""
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "v",
        "vn",
        "cell",
        V.dot(F.col("vn"), F.col("centroid")).alias("ccos"),
    )
    return scored.groupBy("vec_id").agg(
        F.any_value("label").alias("label"),
        F.any_value("v").alias("v"),
        F.any_value("vn").alias("vn"),
        F.max_by("cell", F.struct(F.col("ccos"), -F.col("cell"))).alias("cell"),
    )


def _mean_vectors(assigned: DataFrame, group_col: str, vec_col: str = "v") -> DataFrame:
    """Element-wise mean vector per group via posexplode + groupBy(pos) —
    pure built-ins; the shuffle carries (group, pos, value) triples."""
    return (
        assigned.select(group_col, F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(group_col, "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            group_col,
            F.transform("pm", lambda s: s.getField("m")).alias("centroid"),
        )
    )


def kmeans_centroids(e: DataFrame, nlist: int = 16, iters: int = 1) -> DataFrame:
    """Deterministic Lloyd's: seed centroids = the nlist lowest vec_ids,
    then `iters` rounds of assign → mean. Returns (cell, centroid).

    Centroids are COLLECTED to the driver between iterations (nlist·dim
    doubles — tiny) and re-emitted as a literal DataFrame: without the
    barrier each iteration's plan embeds the previous iterations' full
    lineage and Spark re-executes the whole history every round
    (measured 3-4× blowup at 3 iterations). This is the standard
    iterate-with-materialization shape for ML-style loops on Spark.
    """
    spark = e.sparkSession
    en = e.withColumn("vn", _normalize(F.col("v")))
    return _kmeans_from_norm(en, nlist=nlist, iters=iters)


def _kmeans_from_norm(en: DataFrame, nlist: int, iters: int) -> DataFrame:
    """Lloyd's loop over a corpus that already carries unit vectors `vn`.
    Materialize `en` (localCheckpoint / persist) before calling when the
    loop will re-execute its lineage per collect."""
    spark = en.sparkSession
    w = Window.orderBy("vec_id")
    cent = (
        en.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nlist)
        .select((F.col("rn") - 1).cast("long").alias("cell"), F.col("vn").alias("centroid"))
    )
    for _ in range(iters):
        assigned = assign_cells(en, cent)
        rows = _mean_vectors(assigned, "cell", vec_col="vn").collect()

        def _unit(vec):
            import math

            nrm = math.sqrt(sum(x * x for x in vec)) or 1.0
            return [x / nrm for x in vec]

        cent = spark.createDataFrame(
            [(r.cell, _unit(r.centroid)) for r in rows],
            "cell long, centroid array<double>",
        )
    return cent


def ivf_topk(
    e: DataFrame,
    queries: DataFrame,
    k: int = K,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 1,
) -> DataFrame:
    """Two-stage ANN: coarse-quantize the corpus into nlist k-means cells,
    probe the nprobe closest cells per query, exact-rerank inside them.
    `queries` must have (query_id, qv)."""
    # materialize the normalized corpus once: the k-means collects and the
    # final assignment would otherwise re-execute scan+normalize per job
    # (persist()/checkpoint at real scale — same decision)
    en = e.withColumn("vn", _normalize(F.col("v"))).localCheckpoint()
    cent = _kmeans_from_norm(en, nlist=nlist, iters=iters)
    indexed = assign_cells(en, cent).drop("vn")  # corpus → cell (partition key at scale)
    qc = queries.crossJoin(F.broadcast(cent)).select(
        "query_id", "qv", "cell", V.cosine(F.col("qv"), F.col("centroid")).alias("ccos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cell"))
    probes = (
        qc.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        indexed.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            fround(V.cosine(F.col("qv"), F.col("v")), _R).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


@register(
    "s2_knn_ivf",
    oracle=None,  # approximate; planted-duplicate recall property-tested
    doc="S2: IVF ANN — deterministic k-means cells, probe 4 of 16, rerank",
)
def s2_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return ivf_topk(e, q)


# ---------------------------------------------------------------------------
# NumPy kernel — vectorized brute-force (tests assert equivalence with s1)
# ---------------------------------------------------------------------------
def numpy_topk(e: DataFrame, queries: list[tuple[int, list[float]]], k: int = K) -> DataFrame:
    """mapInPandas brute-force: per Arrow batch, one matmul against the
    (broadcast) query matrix. The shape to use when Python-side scoring is
    unavoidable (e.g. a model-provided distance)."""
    import numpy as np
    import pandas as pd

    spark = e.sparkSession
    qids = [q[0] for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qnorm))

    def score(batches):
        ids, qn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy())
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qn.T  # (batch, nq)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, len(pdf)),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), len(ids)),
                    "cosine": sims.T.reshape(-1),
                }
            )

    scored = e.select("vec_id", "v").mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        fround("cosine", _R).desc(), F.col("vec_id")
    )
    return (
        scored.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", fround("cosine", _R).alias("cosine"), "rank")
    )
