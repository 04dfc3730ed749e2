"""Degenerate-input robustness: every operator family must handle empty
and single-row inputs without crashing (empty partitions are routine at
scale — a filter can empty any split, and kernels see empty Arrow
batches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_ivf_on_tiny_and_empty_corpus(spark):
    from iot_big_data_engineering_spark.operators.similarity import (
        _emb,
        ivf_topk,
        kmeans_centroids,
    )

    e = _emb(spark, SF_SMOKE)
    tiny = e.filter(F.col("vec_id") < 8)  # fewer rows than nlist=16
    q = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rows = ivf_topk(tiny, q, k=3).collect()
    assert len(rows) > 0
    cent = kmeans_centroids(tiny, nlist=4, iters=2)
    assert cent.shape == (4, 64)

    empty = e.filter(F.col("vec_id") < 0)
    assert ivf_topk(empty, q, k=3).count() == 0

    # empty QUERY set (not just empty corpus): np.asarray([]) is 1-D, so an
    # unguarded normalize would raise AxisError before producing anything
    no_q = q.filter(F.col("query_id") < 0)
    res = ivf_topk(tiny, no_q, k=3)
    assert res.count() == 0
    assert res.columns == ["query_id", "vec_id", "cosine", "rank"]


def test_minhash_on_empty_docs(spark):
    from iot_big_data_engineering_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from iot_big_data_engineering_spark.sources.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 0)
    sigs = minhash_signatures(d)
    assert sigs.count() == 0
    assert lsh_candidate_pairs(sigs).count() == 0


def test_decode_kernel_on_empty_payloads(spark):
    from iot_big_data_engineering_spark.operators.multimodal import (
        fake_decode_stats,
        with_binary_payload,
    )
    from iot_big_data_engineering_spark.sources.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 0)
    assert fake_decode_stats(with_binary_payload(d)).count() == 0


def test_cache_registry_releases_tracked_frames(spark):
    """Operators that persist an intermediate register it for caller-owned
    cleanup; release_caches must unpersist everything tracked."""
    from iot_big_data_engineering_spark.caching import release_caches, track

    df = track(spark.range(10).persist())
    df.count()
    assert df.storageLevel.useMemory
    assert release_caches() >= 1
    assert not df.storageLevel.useMemory
    assert release_caches() == 0  # registry drained


def test_aggregations_on_empty_window(spark):
    """Monitoring checks over an empty window must return their
    no-data shape (global aggs produce one row of nulls / zeros), and the
    alert union must simply be empty, not error."""
    from iot_big_data_engineering_spark.operators.monitoring import m15_alerts
    from iot_big_data_engineering_spark.sources.sensor_view import apply_quality
    from iot_big_data_engineering_spark.sources.tables import load_table
    from iot_big_data_engineering_spark.sources.sensor_view import map_events

    # empty quality stream → zero alerts (not a crash)
    e = load_table(spark, SF_SMOKE, "events").filter(F.col("event_id") < 0)
    q = apply_quality(map_events(e))
    assert q.count() == 0
