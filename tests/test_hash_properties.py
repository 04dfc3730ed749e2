"""Property coverage for the cross-engine deterministic-hash layer —
the overflow-exact Knuth multiply (functions/hashing.py) and its
consumers. These hashes decide SAMPLE MEMBERSHIP and SPLIT SIDES, so a
divergence is silent data corruption, not a crash; the property tests
pin Python-bigint ground truth against BOTH engines over adversarial
int64 ranges, not just the handful of hand-picked boundary ids."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from iot_big_data_engineering_spark.functions import hashing

_INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=40, deadline=None)
@given(st.lists(_INT64, min_size=1, max_size=50))
def test_knuth_hash32_sql_matches_bigint_reference(ids):
    """DuckDB fragment == arbitrary-precision (id*MULT) mod 2^32 for
    ANY int64 — hypothesis hunts the boundary regions the fixed-id test
    cannot."""
    import duckdb

    expected = [
        (i * hashing.HASH32_MULT) % hashing.HASH32_MOD for i in ids
    ]
    con = duckdb.connect()
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {hashing.knuth_hash32_sql('k')} FROM "
            f"(SELECT unnest(?::BIGINT[]) AS k)",
            [ids],
        ).fetchall()
    ]
    assert got == expected


def test_knuth_hash32_spark_matches_bigint_reference_bulk(spark):
    """Spark column == Python bigint over a seeded spread of 500 ids
    covering the full signed-int64 range (one job, not per-example)."""
    import numpy as np

    rng = np.random.default_rng(42)
    ids = [int(x) for x in rng.integers(-(2**63), 2**63 - 1, 500)]
    ids += [0, 1, -1, 2**63 - 1, -(2**63), 2**32, 2**32 - 1]
    from pyspark.sql import functions as F

    got = dict(
        spark.createDataFrame([(i,) for i in ids], "k long")
        .select("k", hashing.knuth_hash32(F.col("k")).alias("h"))
        .collect()
    )
    for i in ids:
        assert got[i] == (i * hashing.HASH32_MULT) % hashing.HASH32_MOD, i


def test_cms_estimate_dominates_true_count_random_corpus(spark):
    """CMS's one-sided guarantee (estimate >= true count, every key) on
    a seeded random corpus with full-range int64 keys and a width small
    enough to force collisions."""
    import collections

    import numpy as np
    from pyspark.sql import functions as F

    from iot_big_data_engineering_spark.operators.sketches import (
        _cms_bucket,
        cms_table,
    )

    rng = np.random.default_rng(7)
    keys = [int(x) for x in rng.integers(-(2**63), 2**63 - 1, 60)]
    rows = [
        (i, keys[int(rng.integers(0, len(keys)))]) for i in range(2000)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    W = 16
    cnts = {
        (r.depth, r.bucket): r.cnt
        for r in cms_table(ev, depth=3, width=W).collect()
    }
    probe = (
        ev.select("user_id")
        .distinct()
        .withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(2))))
        .select(
            "user_id", "d",
            _cms_bucket(F.col("user_id"), F.col("d"), W).alias("b"),
        )
        .collect()
    )
    true = collections.Counter(u for _, u in rows)
    est = collections.defaultdict(lambda: float("inf"))
    for r in probe:
        est[r.user_id] = min(est[r.user_id], cnts[(r.d, r.b)])
    for u, t in true.items():
        assert est[u] >= t, (u, est[u], t)


def test_mm8_phash_kernel_property_random_ascii(spark):
    """The Arrow phash kernel equals the driver-side reference on 50
    seeded random printable-ASCII payloads of varied lengths (including
    length-1 and lengths straddling the 256-byte thumbnail)."""
    import numpy as np

    from iot_big_data_engineering_spark.operators.multimodal import (
        _MM8_BITS,
        _MM8_STRIDE,
        THUMB_BYTES,
        phash_thumbs,
        resize_payloads,
        with_binary_payload_from,
    )

    rng = np.random.default_rng(11)
    texts = []
    for n in [1, 2, 7, 63, 255, 256, 257, 1000] + list(
        rng.integers(1, 1200, 42)
    ):
        texts.append(
            "".join(chr(int(c)) for c in rng.integers(33, 127, int(n)))
        )
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.phash
        for r in phash_thumbs(
            resize_payloads(with_binary_payload_from(docs))
        ).collect()
    }
    weights = 1 << np.arange(_MM8_BITS, dtype=np.int64)
    for i, t in enumerate(texts):
        p = t.encode()
        thumb = (p * (THUMB_BYTES // len(p) + 1))[:THUMB_BYTES]
        sampled = np.frombuffer(thumb, dtype=np.uint8)[
            : _MM8_BITS * _MM8_STRIDE : _MM8_STRIDE
        ].astype(np.float64)
        ref = int(((sampled > sampled.mean()) * weights).sum())
        assert got[i] == ref, (i, got[i], ref)


def test_scd2_history_rows_invariants_random_frames(spark):
    """The shared SCD2 explode kernel (adv14 + st12 both ride it) over a
    seeded random reconciled frame — every flag/balance combination,
    including NULL balances on either side: (1) changed keys emit
    exactly the closed+updated pair, every other key exactly one row;
    (2) at most one open row per key, open == (valid_to IS NULL);
    (3) the action matches the (in_dim, in_snap, null-safe equal)
    truth table row-for-row."""
    import numpy as np

    from iot_big_data_engineering_spark.operators.advanced import (
        scd2_history_rows,
    )

    rng = np.random.default_rng(7)
    rows, expected = [], {}
    for k in range(300):
        in_dim, in_snap = bool(rng.integers(2)), bool(rng.integers(2))
        if not (in_dim or in_snap):
            continue  # a reconciled frame never emits a no-side key
        bal_old = (
            None if rng.random() < 0.25 else float(rng.integers(10) * 10)
        ) if in_dim else None
        bal_new = (
            None if rng.random() < 0.25 else float(rng.integers(10) * 10)
        ) if in_snap else None
        rows.append((k, in_dim, in_snap, bal_old, bal_new))
        if in_dim and in_snap:
            expected[k] = (
                ["closed", "updated"] if bal_old != bal_new else ["current"]
            )
        elif in_dim:
            expected[k] = ["retired"]
        else:
            expected[k] = ["inserted"]

    df = spark.createDataFrame(
        rows,
        "c_custkey long, in_dim boolean, in_snap boolean, "
        "bal_old double, bal_new double",
    )
    got = {}
    for r in scd2_history_rows(df).collect():
        got.setdefault(r.c_custkey, []).append(r)
        assert r.is_current == (r.valid_to is None), r
    assert set(got) == set(expected)
    for k, actions in expected.items():
        assert sorted(r.scd_action for r in got[k]) == sorted(actions), k
        assert sum(r.is_current for r in got[k]) <= 1, k


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**14),  # budget B (tokens)
    st.integers(min_value=1, max_value=10**9),   # sum of weights
    st.integers(min_value=0, max_value=10**7),   # one source's weight
)
def test_dp14_target_decomposition_exact(b, sw, w):
    """dp14's overflow-safe target decomposition
    (B div Σw)·w + ((B mod Σw)·w) div Σw must equal (B·w) div Σw
    computed in Python big-int — and every intermediate must fit int64
    for the generated ranges (B·w itself may NOT, which is the point)."""
    w = min(w, sw)
    got = (b // sw) * w + ((b % sw) * w) // sw
    assert got == (b * w) // sw
    assert (b // sw) * w <= 2**63 - 1
    assert (b % sw) * w < 2**63 - 1


def test_dp15_bigram_screen_matches_python_replay_random_corpora(spark):
    """dp15's whole algebra — top-V vocab with (count DESC, token ASC)
    ties, '<unk>' pooling BEFORE bigram construction, context/transition
    counts, the integer Laplace rare rule and the ppm division — replayed
    in pure Python on seeded random corpora; the Spark rows must match
    exactly, including the worst-first (rare_ppm DESC, doc_id ASC)
    report order."""
    import collections

    import numpy as np

    from iot_big_data_engineering_spark.operators.textstats import (
        bigram_lm_screen,
    )

    rng = np.random.default_rng(17)
    for trial in range(3):
        vocab_size = int(rng.integers(3, 8))
        alphabet = [f"tok{j}" for j in range(int(rng.integers(4, 12)))]
        docs = []
        for i in range(int(rng.integers(5, 40))):
            n = int(rng.integers(0, 12))
            words = [alphabet[int(rng.integers(0, len(alphabet)))]
                     for _ in range(n)]
            docs.append((i, "en", " ".join(words)))
        theta = int(rng.integers(2, 200))

        # --- Python replay ---
        toks = {i: t.split() if t else [] for i, _, t in docs}
        counts = collections.Counter(w for ws in toks.values() for w in ws)
        vocab = set(
            w for w, _ in sorted(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )[:vocab_size]
        )
        big = collections.Counter()
        c1 = collections.Counter()
        per_doc = {}
        for i, ws in toks.items():
            mapped = [w if w in vocab else "<unk>" for w in ws]
            pairs = list(zip(mapped, mapped[1:]))
            if pairs:
                per_doc[i] = pairs
                for p in pairs:
                    big[p] += 1
                    c1[p[0]] += 1
        expected = []
        for i, pairs in per_doc.items():
            n_rare = sum(
                1 for p in pairs
                if (big[p] + 1) * theta < c1[p[0]] + vocab_size + 1
            )
            ppm = (n_rare * 1_000_000) // len(pairs)
            expected.append((i, "en", len(pairs), n_rare, ppm))
        expected.sort(key=lambda r: (-r[4], r[0]))
        expected = expected[:20]

        # --- Spark ---
        d = spark.createDataFrame(
            docs, "doc_id long, lang string, text string"
        )
        got = [
            tuple(r)
            for r in bigram_lm_screen(d, v=vocab_size, theta=theta).collect()
        ]
        assert got == expected, (trial, vocab_size, theta)


def test_t17_pmi_matches_python_replay_random_corpora(spark):
    """t17's whole algebra — unigram/bigram counts, the support floor,
    the exact int64 ratio under one ln, the 6-dp floor round and the
    (pmi DESC, w1, w2) report order — replayed in pure Python on seeded
    random corpora."""
    import collections
    import math

    import numpy as np

    from iot_big_data_engineering_spark.operators.textstats import (
        collocations_pmi,
    )

    rng = np.random.default_rng(23)
    for _ in range(3):
        alphabet = [f"w{j}" for j in range(int(rng.integers(3, 9)))]
        docs = []
        for i in range(int(rng.integers(5, 30))):
            n = int(rng.integers(0, 15))
            docs.append(
                (i, " ".join(alphabet[int(rng.integers(0, len(alphabet)))]
                             for _ in range(n)))
            )
        support = int(rng.integers(1, 5))
        topn = int(rng.integers(3, 15))

        toks = {i: t.split() if t else [] for i, t in docs}
        c1 = collections.Counter(w for ws in toks.values() for w in ws)
        n1 = sum(c1.values())
        c12 = collections.Counter(
            p for ws in toks.values() for p in zip(ws, ws[1:])
        )
        n2 = sum(c12.values())
        scored = []
        for (w1, w2), c in c12.items():
            if c < support:
                continue
            pmi = math.log((c * n1 * n1) / (n2 * c1[w1] * c1[w2]))
            pmi = math.floor(pmi * 1e6 + 0.5) / 1e6
            scored.append((w1, w2, c, pmi))
        scored.sort(key=lambda r: (-r[3], r[0], r[1]))
        expected = scored[:topn]

        d = spark.createDataFrame(docs, "doc_id long, text string")
        got = [
            (r.w1, r.w2, r.pair_count, r.pmi)
            for r in collocations_pmi(
                d, min_support=support, topn=topn
            ).collect()
        ]
        assert got == expected, (support, topn, got, expected)


def test_j23_frequent_pairs_matches_python_bruteforce(spark):
    """j23 vs a per-basket brute force on seeded random order/part
    assignments — pair counts, both support floors, exact lift and the
    (pair_n DESC, p1, p2) order."""
    import itertools

    import numpy as np

    from iot_big_data_engineering_spark.operators.joins import (
        frequent_pairs,
    )

    rng = np.random.default_rng(31)
    for _ in range(3):
        n_orders = int(rng.integers(5, 25))
        n_parts = int(rng.integers(3, 10))
        rows = []
        for o in range(n_orders):
            k = int(rng.integers(1, 6))
            for p in rng.choice(n_parts, size=k, replace=True):
                rows.append((o, int(p)))
        item_s = int(rng.integers(1, 4))
        pair_s = int(rng.integers(1, 4))

        baskets = {}
        for o, p in rows:
            baskets.setdefault(o, set()).add(p)
        item_count = {}
        for b in baskets.values():
            for p in b:
                item_count[p] = item_count.get(p, 0) + 1
        freq = {p for p, c in item_count.items() if c >= item_s}
        n_ord = len(baskets)
        pair_count = {}
        for b in baskets.values():
            for p1, p2 in itertools.combinations(sorted(b & freq), 2):
                pair_count[(p1, p2)] = pair_count.get((p1, p2), 0) + 1
        import math

        expected = []
        for (p1, p2), c in pair_count.items():
            if c < pair_s:
                continue
            lift = (c * n_ord) / (item_count[p1] * item_count[p2])
            lift = math.floor(lift * 1e6 + 0.5) / 1e6
            expected.append(
                (p1, p2, c, item_count[p1], item_count[p2], lift)
            )
        expected.sort(key=lambda r: (-r[2], r[0], r[1]))
        expected = expected[:20]

        l = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        got = [
            (r.p1, r.p2, r.pair_n, r.c1, r.c2, r.lift)
            for r in frequent_pairs(
                l, item_support=item_s, pair_support=pair_s
            ).collect()
        ]
        assert got == expected, (item_s, pair_s, got, expected)


def test_w8_markov_matches_python_replay_random_sequences(spark):
    """w8 vs a pure-Python replay on seeded random per-user event
    sequences (shuffled input order — the (ts, event_id) window order
    must win)."""
    import datetime as dt
    import math

    import numpy as np

    from iot_big_data_engineering_spark.operators.joins import (
        markov_transitions,
    )

    rng = np.random.default_rng(41)
    types = ["a", "b", "c", "d"]
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    seqs = {}
    for u in range(int(rng.integers(3, 10))):
        n = int(rng.integers(0, 12))
        seq = [types[int(rng.integers(0, len(types)))] for _ in range(n)]
        seqs[u] = seq
        for j, typ in enumerate(seq):
            rows.append((eid, u, t0 + dt.timedelta(seconds=j), typ))
            eid += 1
    order = rng.permutation(len(rows))
    rows = [rows[i] for i in order]

    trans = {}
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    tot = {}
    for (a, _), c in trans.items():
        tot[a] = tot.get(a, 0) + c
    expected = {
        (a, b): (c, tot[a], math.floor(c / tot[a] * 1e6 + 0.5) / 1e6)
        for (a, b), c in trans.items()
    }

    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r.from_type, r.to_type): (r.transitions, r.from_total, r.prob)
        for r in markov_transitions(e).collect()
    }
    assert got == expected
