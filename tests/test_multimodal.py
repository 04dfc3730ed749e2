"""Multimodal plumbing tests: binary payload construction, the
mapInPandas decode kernel's schema/batch behavior, and the stub gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_big_data_engineering_spark.operators.multimodal import (
    decode_media,
    fake_decode_stats,
    with_binary_payload,
)
from iot_big_data_engineering_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_binary_payload_roundtrip(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    b = with_binary_payload(docs)
    row = (
        b.join(docs, "doc_id")
        .select(F.decode("payload", "UTF-8").alias("back"), "text")
        .limit(20)
        .collect()
    )
    assert row and all(r.back == r.text for r in row)
    assert dict(b.dtypes)["payload"] == "binary"


def test_fake_decode_plumbing(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    b = with_binary_payload(docs).repartition(4)  # force multiple Arrow batches
    out = fake_decode_stats(b)
    assert out.columns == [
        "doc_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        "n_frames",
    ]
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:50]:
        assert r.n_bytes > 0
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480
        assert (r.n_frames == 1) or (r.media_type == "video" and r.n_frames > 1)
    # determinism across runs
    again = {(r.doc_id, r.width, r.height) for r in fake_decode_stats(b).collect()}
    assert {(r.doc_id, r.width, r.height) for r in rows} == again


def test_real_decode_is_gated(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    b = with_binary_payload(docs)
    with pytest.raises(NotImplementedError):
        decode_media(b)


def test_resize_kernel_fixed_output_size(spark):
    from iot_big_data_engineering_spark.operators.multimodal import (
        THUMB_BYTES,
        resize_payloads,
        with_binary_payload,
    )
    from iot_big_data_engineering_spark.sources.tables import load_table

    b = with_binary_payload(load_table(spark, SF_SMOKE, "documents").limit(50))
    rows = resize_payloads(b).collect()
    assert len(rows) == 50
    assert all(len(r.thumb) == THUMB_BYTES for r in rows)


def test_feature_extraction_feeds_similarity(spark):
    """Extracted features are a valid array<double> embedding column:
    L1-normalized, fixed width, consumable by the ANN operators."""
    from iot_big_data_engineering_spark.operators.multimodal import (
        N_FEATURES,
        extract_features,
        with_binary_payload,
    )
    from iot_big_data_engineering_spark.operators.similarity import ivf_topk
    from iot_big_data_engineering_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    b = with_binary_payload(load_table(spark, SF_SMOKE, "documents").limit(100))
    feats = extract_features(b)
    rows = feats.collect()
    assert all(len(r.features) == N_FEATURES for r in rows)
    assert all(abs(sum(r.features) - 1.0) < 1e-9 for r in rows)

    corpus = feats.select(
        F.col("doc_id").alias("vec_id"),
        F.lit("x").alias("label"),
        F.col("features").alias("v"),
    )
    q = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    top = ivf_topk(corpus, q, k=3, nlist=4, nprobe=2)
    assert top.count() > 0


def test_mm5_header_checksum_is_byte_faithful_for_multibyte_utf8(spark):
    """mm5's checksum and its DuckDB oracle must denote the same 64 BYTES
    (not characters). With a multi-byte UTF-8 header, a character-based
    slice would silently diverge — this pins the hex-slice formulation
    against a pure-Python byte reference."""
    import hashlib

    from pyspark.sql import functions as F

    texts = ["héllo wörld — ünïcode häder " * 8, "plain ascii header " * 8]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = (
        df.select(
            F.md5(
                F.hex(F.expr("substring(encode(text, 'UTF-8'), 1, 64)"))
            ).alias("c")
        )
        .rdd.map(lambda r: r.c)
        .collect()
    )
    want = [
        hashlib.md5(t.encode("utf-8")[:64].hex().upper().encode()).hexdigest()
        for t in texts
    ]
    assert got == want

    import duckdb

    con = duckdb.connect()
    duck = [
        con.execute(
            "SELECT md5(substr(hex(encode(?)), 1, 128))", [t]
        ).fetchone()[0]
        for t in texts
    ]
    con.close()
    assert duck == want


# ---------------------------------------------------------------------------
# mm8 perceptual-hash near-dup (round-8 addition)
# ---------------------------------------------------------------------------
def test_mm8_planted_copies_at_hamming_zero(spark):
    """Every planted exact copy must pair with its original at Hamming 0
    (identical payload → identical thumbnail → identical phash → shares
    every band)."""
    from pyspark.sql import functions as F

    from iot_big_data_engineering_spark.operators.multimodal import (
        _MM8_N_PLANT,
        mm8_phash_neardup,
    )
    from iot_big_data_engineering_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    ascii_docs = load_table(spark, SF_SMOKE, "documents").filter(
        (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
        & (F.length("text") > 0)
    )
    # the plant offset is DERIVED (max(doc_id) + 1, r8-advice collision
    # fix) — recompute it the same way the operator does
    plant_offset = ascii_docs.agg(F.max("doc_id").alias("m")).first().m + 1
    ascii_ids = [
        r.doc_id
        for r in ascii_docs.orderBy("doc_id").limit(_MM8_N_PLANT).collect()
    ]
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in mm8_phash_neardup(spark, SF_SMOKE).collect()
    }
    assert len(ascii_ids) == _MM8_N_PLANT
    for did in ascii_ids:
        assert pairs.get((did, did + plant_offset)) == 0, did
    # and no planted id may collide with a real id
    real_max = plant_offset - 1
    assert all(did + plant_offset > real_max for did in ascii_ids)


def test_mm8_phash_kernel_matches_reference(spark):
    """The Arrow phash kernel must equal a driver-side recompute of the
    same aHash spec (strided sample of the cycle-padded thumbnail,
    mean-threshold bits, weights 2^0..2^61)."""
    import numpy as np

    from iot_big_data_engineering_spark.operators.multimodal import (
        _MM8_BITS,
        _MM8_STRIDE,
        THUMB_BYTES,
        phash_thumbs,
        resize_payloads,
        with_binary_payload_from,
    )

    texts = ["abcdefg", "a", "the quick brown fox jumps over the lazy dog"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.phash
        for r in phash_thumbs(
            resize_payloads(with_binary_payload_from(docs))
        ).collect()
    }
    for i, t in enumerate(texts):
        p = t.encode()
        thumb = (p * (THUMB_BYTES // len(p) + 1))[:THUMB_BYTES]
        sampled = np.frombuffer(thumb, dtype=np.uint8)[
            : _MM8_BITS * _MM8_STRIDE : _MM8_STRIDE
        ].astype(np.float64)
        bits = sampled > sampled.mean()
        ref = int((bits * (1 << np.arange(_MM8_BITS, dtype=np.int64))).sum())
        assert got[i] == ref, (i, got[i], ref)


def test_mm8_on_empty_corpus(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iot_big_data_engineering_spark.operators.multimodal import (
        mm8_phash_neardup,
    )

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(empty, str(tmp_path / "documents.parquet"))
    df = mm8_phash_neardup(spark, str(tmp_path))
    assert df.columns == ["doc_a", "doc_b", "hamming"]
    assert df.count() == 0


def test_decode_media_real_kernel_or_documented_stub(spark):
    """VERDICT r8 #7: decode_media must run a REAL Pillow kernel when
    the library exists (exercised on a generated PNG; corrupt payloads
    yield NULL dims, never a partition failure) and keep the documented
    NotImplementedError stand-in when it does not."""
    import pytest

    from iot_big_data_engineering_spark.operators.multimodal import (
        decode_media,
    )

    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_media(
                spark.createDataFrame(
                    [], "doc_id long, media_type string, payload binary"
                )
            )
        pytest.skip("Pillow not installed — real-decode path not exercisable")

    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    png = buf.getvalue()
    d = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(b"corrupt"))],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r.doc_id: r for r in decode_media(d).collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_frames) == (17, 9, 1)
    assert rows[2].width is None and rows[2].height is None


def test_mm8_doc_id_zero_corpus_plants_do_not_collide(spark, tmp_path):
    """A corpus whose max ascii doc_id is 0 must still plant at
    max+1 = 1 — the falsy-zero `or -1` branch planted ON doc 0 and
    returned an empty pair list while the oracle returned the planted
    pair (r9 code-review, reproduced). Both engines must agree AND the
    certificate must be non-vacuous."""
    import duckdb
    import pandas as pd

    from iot_big_data_engineering_spark.operators.multimodal import (
        mm8_phash_neardup,
    )
    from iot_big_data_engineering_spark.registry import all_queries

    df = pd.DataFrame(
        [(0, "hello world sample text", "en")],
        columns=["doc_id", "text", "lang"],
    ).assign(source="s", n_chars=23)
    df.to_parquet(str(tmp_path / "documents.parquet"))
    sp = sorted(map(tuple, mm8_phash_neardup(spark, str(tmp_path)).collect()))
    con = duckdb.connect()
    con.register("documents", df)
    du = sorted(map(tuple, con.execute(
        all_queries()["mm8_phash_neardup"].oracle
    ).fetchall()))
    assert sp == du
    assert sp == [(0, 1, 0)]  # the planted copy pairs at Hamming 0


def test_media_type_total_on_negative_doc_ids_both_engines(spark):
    """r11 ANSI audit: Spark's `%` is signed, so the old `% 3 + 1` index
    fed element_at index 0 — which RAISES under ANSI — or index -1,
    which silently reads the LAST element, for negative doc_ids. pmod
    makes the mapping total; the oracles' ((doc_id % 3 + 3) % 3 + 1) is
    the same function under DuckDB's truncating `%`. Asserted
    value-by-value on both engines across the full residue range."""
    import duckdb

    docs = spark.createDataFrame(
        [(i, f"t{i}", "web", "en") for i in range(-5, 4)],
        "doc_id long, text string, source string, lang string",
    )
    got = {
        (r.doc_id, r.media_type)
        for r in with_binary_payload(docs)
        .select("doc_id", "media_type")
        .collect()
    }
    oracle = duckdb.sql(
        "SELECT doc_id,"
        " ['image','audio','video'][((doc_id % 3 + 3) % 3 + 1)] AS mt"
        " FROM (SELECT unnest(range(-5, 4)) AS doc_id)"
    ).fetchall()
    assert got == {(int(d), m) for d, m in oracle}
    as_map = dict(got)
    for i in range(-5, 4):
        # Python's % floors, i.e. agrees with pmod on every sign
        assert as_map[i] == ["image", "audio", "video"][i % 3]


def test_mm5_plan_prunes_media_type_expression(spark):
    """mm5's compared surface is media-type-independent: its grouped
    header-checksum output never references media_type, so Catalyst
    must PRUNE the expression out of the executed plan entirely — the
    mechanical proof that this round's media_type_col change (pmod)
    cannot alter mm5's gated values (r12 window adjudication,
    SCALE.md)."""
    from iot_big_data_engineering_spark.operators.multimodal import (
        mm5_payload_dedup,
    )
    from iot_big_data_engineering_spark.plans.checks import plan_str

    p = plan_str(mm5_payload_dedup(spark, SF_SMOKE))
    # non-vacuity: this really is the whole formatted physical plan
    assert "header_checksum" in p and "Scan" in p, p
    assert "media_type" not in p, p
    assert "pmod" not in p, p


def test_fake_decode_n_frames_total_on_negative_doc_ids(spark):
    """Same sweep, second site: the decode stub's n_frames uses pandas'
    FLOORED `%` (always in [1, 24]), so the mm3 oracle must wrap
    DuckDB's truncating `%` — ((doc_id % 24 + 24) % 24 + 1) — or the
    two engines diverge on negative doc_ids. Asserted value-by-value
    against DuckDB on a residue-spanning negative range."""
    import duckdb

    docs = spark.createDataFrame(
        [(i, "x" * (abs(i) + 1), "web", "en") for i in range(-30, 5)],
        "doc_id long, text string, source string, lang string",
    )
    got = {
        (r.doc_id, r.n_frames)
        for r in fake_decode_stats(with_binary_payload(docs))
        .filter(F.col("media_type") == "video")
        .select("doc_id", "n_frames")
        .collect()
    }
    oracle = duckdb.sql(
        "SELECT doc_id, CAST((doc_id % 24 + 24) % 24 + 1 AS INTEGER) AS nf"
        " FROM (SELECT unnest(range(-30, 5)) AS doc_id)"
        " WHERE (doc_id % 3 + 3) % 3 = 2"
    ).fetchall()
    assert got == {(int(d), int(n)) for d, n in oracle}
    assert all(1 <= n <= 24 for _, n in got)
