"""Hypothesis checks for the determinism doctrine's core arithmetic:
the half-up integer-division formulas (plans/queries.py) must equal
exact Decimal ROUND_HALF_UP arithmetic for all inputs — these run in
pure Python (no Spark) because the formulas are plain integer ops that
evaluate identically in Spark, DuckDB and Python."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


def pct_change_2dp(cur: int, prev: int) -> float:
    """Python twin of plans.queries._pct_change_2dp (prev > 0):
    sign * ((2*|diff|*10000 + prev) // (2*prev)) / 100."""
    sign = 1 if cur >= prev else -1
    return sign * ((2 * abs(cur - prev) * 10000 + prev) // (2 * prev)) / 100.0


def avg_2dp(total: int, n: int) -> float:
    """Half-up mean at 2 dp: ((2*total + n) // (2*n)) / 100 for
    non-negative cents totals (plans.queries q00/q09)."""
    return ((2 * total + n) // (2 * n)) / 100.0


@settings(max_examples=2000, deadline=None)
@given(
    cur=st.integers(min_value=0, max_value=10**14),
    prev=st.integers(min_value=1, max_value=10**14),
)
def test_pct_change_matches_decimal_half_up(cur: int, prev: int):
    # compare the scaled integers (basis points): ROUND_HALF_UP in
    # Decimal rounds away from zero, exactly like the sign*|diff| form
    exact_bp = int(
        (Decimal(cur - prev) * 10000 / Decimal(prev)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )
    sign = 1 if cur >= prev else -1
    got_bp = sign * ((2 * abs(cur - prev) * 10000 + prev) // (2 * prev))
    assert got_bp == exact_bp
    assert pct_change_2dp(cur, prev) == got_bp / 100.0


@settings(max_examples=2000, deadline=None)
@given(
    total=st.integers(min_value=0, max_value=10**15),
    n=st.integers(min_value=1, max_value=10**9),
)
def test_avg_matches_decimal_half_up(total: int, n: int):
    # semantics: round the per-unit average to integer CENTS half-up,
    # then convert to currency units
    exact_cents = int(
        (Decimal(total) / Decimal(n)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )
    assert avg_2dp(total, n) == exact_cents / 100.0
