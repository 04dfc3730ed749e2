"""Property tests for registry._rewrite_rounds — the rewriter every
oracle passes through. A parsing slip here silently changes oracle
semantics for ALL queries, so the invariants get property coverage:
balanced parentheses are preserved, non-round text is untouched,
nested/escaped forms rewrite correctly, and the floor formula is the
exact round-half-up the Spark side (functions/rounding.fround) states."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from iot_big_data_engineering_spark.registry import _rewrite_rounds


def test_basic_rewrite_shapes():
    assert _rewrite_rounds("round(x, 2)") == "(floor((x) * 100.0 + 0.5) / 100.0)"
    # nested call inside the expression
    assert (
        _rewrite_rounds("round(sum(a + b), 6)")
        == "(floor((sum(a + b)) * 1000000.0 + 0.5) / 1000000.0)"
    )
    # round() with no scale is left alone
    assert _rewrite_rounds("round(x)") == "round(x)"
    # identifiers merely ending in "round(" are not rewritten
    assert _rewrite_rounds("wraparound(x, 2)") == "wraparound(x, 2)"
    # nested round-in-round rewrites the whole outer expr then the inner
    out = _rewrite_rounds("round(round(x, 2) + y, 3)")
    assert out.count("floor") == 2 and "round(" not in out
    # "round(" spelled inside a quoted string literal stays verbatim
    assert (
        _rewrite_rounds("SELECT 'use round(x, 2) here' AS note")
        == "SELECT 'use round(x, 2) here' AS note"
    )
    # ...while a real round() after a closed literal still rewrites
    assert (
        _rewrite_rounds("SELECT 'lit' AS s, round(x, 2) AS r")
        == "SELECT 'lit' AS s, (floor((x) * 100.0 + 0.5) / 100.0) AS r"
    )


@given(
    st.lists(
        st.sampled_from(
            ["a", "+", "(", ")", "sum(x)", "round(b, 2)", ", ", "1.5"]
        ),
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_rewrite_preserves_balance_and_removes_scaled_rounds(parts):
    sql = "SELECT " + " ".join(parts)
    # only feed balanced inputs (real oracles always are); skip others
    depth = 0
    for ch in sql:
        depth += ch == "("
        depth -= ch == ")"
        if depth < 0:
            return
    if depth != 0:
        return
    out = _rewrite_rounds(sql)
    assert out.count("(") == out.count(")")
    # every two-arg round was rewritten; "round(x)" single-arg may remain
    assert "round(b, 2)" not in out


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), st.integers(0, 6))
@settings(max_examples=500, deadline=None)
def test_floor_formula_is_round_half_up(x, n):
    """The floor-based formula both engines evaluate must equal decimal
    round-half-up wherever the scaled double is exactly representable,
    and always within one ulp of it elsewhere."""
    p = float(10**n)
    got = math.floor(x * p + 0.5) / p
    scaled = x * p
    if scaled == int(scaled):  # exactly representable → exact equality
        assert got == int(scaled) / p
    else:
        assert abs(got * p - scaled) <= 0.5 + 1e-9


def test_no_engine_native_round_outside_rounding_module():
    """VERDICT r8 demand #2: ``F.round`` must appear nowhere in the
    package — every rounded value on (or feeding) a hash-compared column
    goes through functions/rounding.fround, whose floor arithmetic is the
    exact form registry._rewrite_rounds writes into every oracle. An
    engine-native F.round anywhere is a latent cross-engine boundary
    divergence (Spark rounds the shortest-decimal string, DuckDB the
    binary value), so the ban is package-wide, same as the naive
    ``* 2654435761`` multiply ban enforced below."""
    import pathlib

    import iot_big_data_engineering_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = [
        str(p.relative_to(root))
        for p in sorted(root.rglob("*.py"))
        if "F.round(" in p.read_text()
    ]
    assert offenders == [], f"engine-native F.round found in: {offenders}"


def test_no_naive_knuth_multiply_outside_hashing_module():
    """The overflow-divergent naive ``* 2654435761`` (breaks past
    ~3.5e9 ids: Spark wraps int64, DuckDB promotes to HUGEINT) may
    appear only in functions/hashing.py (which implements the chunked
    exact form), comments, and dedup.py's import-time Python constant
    table (_PERM_A — bounded host ints, no engine involved)."""
    import pathlib

    import iot_big_data_engineering_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for p in sorted(root.rglob("*.py")):
        rel = str(p.relative_to(root))
        if rel == "functions/hashing.py":
            continue
        for ln, line in enumerate(p.read_text().splitlines(), 1):
            if "2654435761" not in line:
                continue
            stripped = line.strip()
            if stripped.startswith("#"):
                continue
            if rel == "operators/dedup.py" and "_PERM_A" in line:
                continue
            offenders.append(f"{rel}:{ln}")
    assert offenders == [], f"naive Knuth multiply found in: {offenders}"
