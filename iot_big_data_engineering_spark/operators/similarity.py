"""Similarity search over the `embeddings` table (array<float> column) —
training-data pipeline extension (BASELINE.json north star).

- s1: brute-force cosine top-k — the exact baseline, built-in exprs only
      (zip_with/aggregate fold → deterministic double math shared with the
      DuckDB oracle).
- s2: IVF-style two-stage search (coarse centroids → probe best clusters →
      exact rerank inside) — the 100 TB scale path. Centroids are computed
      with a posexplode + groupBy(pos) mean (pure built-ins), the probe set
      is a broadcast join, and only ~nprobe/nlist of the corpus is scanned.
      rows-only checked; recall vs s1 is property-tested.
- a NumPy mapInPandas kernel (numpy_topk) used by tests as the vectorized
  equivalence check — the Arrow-batched form you would use when the corpus
  partition fits in executor memory.

Scale notes: brute-force is O(Q·N·d) — fine for reranking, wrong as the
scan; IVF reduces the scanned fraction to nprobe/nlist. At 100 TB the
corpus side would be written partitioned by cluster id so the probe is a
partition-pruned scan, not a filter over everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import vectors as V
from ..registry import register
from ..sources.tables import load_table

_R = 6
K = 10
N_QUERIES = 5  # query set: vec_id < 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", V.to_double("embedding").alias("v")
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
SELECT query_id, vec_id, cosine, rank
FROM ranked WHERE rank <= {K}
""",
    doc="S1: exact brute-force cosine top-10 for 5 query vectors",
)
def s1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

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
            F.round(V.cosine(F.col("qv"), F.col("v")), _R).alias("cosine"),
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
# S2 — IVF-style two-stage ANN (scale path; rows-only + recall test)
# ---------------------------------------------------------------------------
def centroids(e: DataFrame) -> DataFrame:
    """Per-label mean vector via posexplode + groupBy(label, pos) — pure
    built-ins, one shuffle of (label, pos, value) triples."""
    return (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "label", F.transform("pm", lambda s: s.getField("m")).alias("centroid")
        )
    )


@register(
    "s2_knn_ivf",
    oracle=None,  # approximate scan order; recall vs s1 property-tested
    doc="S2: IVF ANN — probe 3 nearest label-centroids, exact rerank inside",
)
def s2_knn_ivf(spark: SparkSession, sf_dir: str, nprobe: int = 3) -> DataFrame:
    from pyspark.sql import Window

    e = _emb(spark, sf_dir)
    cent = centroids(e)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # stage 1: per query, pick nprobe closest centroids
    qc = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qv",
            "label",
            V.cosine(F.col("qv"), F.col("centroid")).alias("ccos"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("label"))
    probes = (
        qc.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qv", "label")
    )
    # stage 2: exact cosine only inside probed clusters
    scored = (
        e.join(F.broadcast(probes), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.cosine(F.col("qv"), F.col("v")), _R).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "vec_id", "cosine", "rank")
    )


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
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(ids, len(pdf)),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), len(ids)),
                    "cosine": sims.T.reshape(-1),
                }
            )
            yield out

    scored = e.select("vec_id", "v").mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.round("cosine", _R).desc(), F.col("vec_id")
    )
    return (
        scored.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", _R).alias("cosine"), "rank")
    )
