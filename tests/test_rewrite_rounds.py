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
