"""Property-based check: asof_join equals a brute-force per-row argmax
reference on randomized inputs (keys, duplicate timestamps, boundary
collisions included). One Spark round-trip per generated case is slow,
so cases are generated up front and batched into a single DataFrame
pair with a case-id key."""

from __future__ import annotations

import random

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.asof import (
    asof_join,
)

rng = random.Random(1234)
N_CASES = 25


def _gen_case(cid: int):
    # small discrete time domain to force boundary collisions
    times = list(range(0, 20))
    keys = ["a", "b"]
    left = [
        (cid, rng.choice(keys), rng.choice(times), i)
        for i in range(rng.randint(1, 6))
    ]
    right = [
        (cid, rng.choice(keys), rng.choice(times), 100 + i)
        for i in range(rng.randint(0, 6))
    ]
    return left, right


def _brute(left, right, strict):
    """argmax reference: latest right row (by time, then rid) before
    (or at) each left row's time, same (case, key)."""
    out = {}
    for cid, k, t, lid in left:
        best = None
        for rcid, rk, rt, rid in right:
            if (rcid, rk) != (cid, k):
                continue
            ok = rt < t if strict else rt <= t
            if ok and (best is None or (rt, rid) > best):
                best = (rt, rid)
        out[(cid, lid)] = best[1] if best else None
    return out


def test_asof_join_matches_bruteforce(spark):
    cases = [_gen_case(c) for c in range(N_CASES)]
    all_left = [r for l, _ in cases for r in l]
    all_right = [r for _, r in cases for r in r]
    ldf = spark.createDataFrame(all_left, "cid int, k string, t long, lid int")
    rdf = spark.createDataFrame(all_right, "cid int, k string, rt long, rid int")
    for strict in (True, False):
        got_df = asof_join(
            ldf, rdf, on=["cid", "k"], left_time="t", right_time="rt",
            right_cols={"rid": "match_rid"}, strict=strict, tiebreak="rid",
        )
        got = {(r.cid, r.lid): r.match_rid for r in got_df.collect()}
        expected = _brute(all_left, all_right, strict)
        assert got == expected, f"strict={strict}"
