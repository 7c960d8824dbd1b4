"""Property tests for the round-11 storage policies: the size-tiered
merge selector (pure function — exhaustively fuzzable without Spark)
and retention semantics against a dict model."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.sinks import (
    ManifestParquetSink,
)

SIZES = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=2, max_size=40
)
BOUND = st.integers(min_value=1, max_value=12)
FACTOR = st.one_of(
    st.floats(min_value=1.0, max_value=16.0, allow_nan=False),
    st.just(float("inf")),
)


@settings(max_examples=300, deadline=None)
@given(SIZES, BOUND, FACTOR)
def test_tier_take_invariants(sizes, bound, factor):
    """For ANY live-size sequence: the take is at least 2 (a 1-segment
    merge is a no-op), never exceeds the list, restores the live
    bound when triggered over it, and is the maximal suffix allowed
    by the geometric rule (greedy: the first excluded segment really
    violates it)."""
    take = ManifestParquetSink.tier_take(sizes, bound, factor)
    take_c = min(take, len(sizes))
    assert take >= 2
    assert take >= min(len(sizes), max(2, len(sizes) - bound + 1))
    # post-merge live count restores the bound whenever triggered
    if len(sizes) > bound:
        assert len(sizes) - take_c + 1 <= bound
    # greedy maximality: the next-older segment (if any) violates the
    # size rule against the accumulated tail (factor=inf always
    # extends to a full merge, so a partial take implies finite
    # factor and a genuine violation)
    if take < len(sizes):
        assert factor != float("inf")
        tail = sum(sizes[-take:])
        assert sizes[-(take + 1)] > factor * tail


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=50), min_size=2, max_size=64),
    BOUND,
)
def test_tiered_policy_never_loses_rows_and_bounds_live(batches, bound):
    """Model the full auto-compaction loop over arbitrary batch sizes:
    total rows conserved, live count <= bound after every trigger,
    and cumulative rewrite volume never exceeds the full-rewrite
    policy's at the same trigger points... for the DEFAULT factor.
    (Rewrite-volume dominance is asymptotic, not per-prefix — a
    tiered run can trigger MORE events early — so only conservation
    and the bound are universal; volume is pinned by the 512-batch
    deterministic test.)"""
    live: list[int] = []
    for b in batches:
        live.append(b)
        if len(live) > bound:
            take = min(
                ManifestParquetSink.tier_take(live, bound, 2.0), len(live)
            )
            merged = sum(live[-take:])
            live = live[:-take] + [merged]
            assert len(live) <= bound
    assert sum(live) == sum(batches)


def _model_expire(admits: list[list[int]], horizon: int) -> set[int]:
    """Dict model of compact(expire_below=h): the first-admission
    snapshot of each key is its batch index; survivors are keys first
    admitted strictly after the horizon."""
    first: dict[int, int] = {}
    for snap, keys in enumerate(admits):
        for k in keys:
            first.setdefault(k, snap)
    return {k for k, s in first.items() if s > horizon}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=12), max_size=5),
        min_size=2,
        max_size=4,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_expire_below_matches_dict_model(spark, tmp_path_factory,
                                         admits, horizon_idx):
    """compact(expire_below=h) over arbitrary overlapping batches ≡
    the first-admission dict model (insert-if-absent pins each key to
    its FIRST batch; expiry drops exactly the keys pinned at or below
    the horizon)."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.sinks import (
        make_sink,
    )

    root = tmp_path_factory.mktemp("expire")
    sink = make_sink(
        spark, str(root), keys={"t": ["k"]}, backend="manifest"
    )
    for keys in admits:
        sink.insert_if_absent(
            "t",
            spark.createDataFrame(
                [(int(k),) for k in keys] or [(None,)], "k long"
            ).dropna(),
        )
    horizon = min(horizon_idx, len(admits) - 1)
    expected = _model_expire(admits, horizon)
    out = sink.compact("t", expire_below=horizon)
    df = sink.read("t")
    got = set() if df is None else {r["k"] for r in df.collect()}
    if out is None:
        # too few live segments to compact: nothing expired
        full = {k for ks in admits for k in ks}
        assert got == full
    else:
        assert got == expected
