"""Property-based tests (SURVEY.md §5.3): hypothesis-generated inputs
pin the operator invariants the reference enforces only through inline
data-quality filters."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.functions import clamp, guarded_div, safe_corr
from financial_data_lakehouse_pipeline__spark.operators import cleaning, joins

_settings = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


@given(rows=st.lists(st.tuples(finite, finite), min_size=1, max_size=30))
@_settings
def test_guarded_div_never_raises_never_nan(spark, rows):
    """The guard prevents ANSI DIVIDE_BY_ZERO and NaN; it is a zero-guard,
    not an overflow guard — x / subnormal may still be ±inf (IEEE
    semantics, identical in DuckDB, so cross-engine comparison holds;
    hypothesis found the 4.0 / 2.2e-308 case)."""
    df = spark.createDataFrame([Row(n=n, d=d) for n, d in rows])
    out = df.select("n", "d", guarded_div(F.col("n"), F.col("d")).alias("q")).collect()
    for r in out:
        assert r.q is None or not math.isnan(r.q)
        if r.d == 0:
            assert r.q is None


@given(
    rows=st.lists(finite, min_size=1, max_size=30),
    lo=st.floats(min_value=-100, max_value=0),
    hi=st.floats(min_value=0, max_value=100),
)
@_settings
def test_clamp_always_in_range(spark, rows, lo, hi):
    df = spark.createDataFrame([Row(x=x) for x in rows])
    out = df.select(clamp(F.col("x"), lo, hi).alias("c")).collect()
    assert all(lo <= r.c <= hi for r in out)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000), finite),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_dedup_keep_latest_unique_and_idempotent(spark, rows):
    df = spark.createDataFrame([Row(k=k, ts=ts, v=v) for k, ts, v in rows])
    order = [F.col("ts").desc(), F.col("v").desc()]
    once = cleaning.dedup_keep_latest(df, ["k"], order)
    got = once.collect()
    keys = [r.k for r in got]
    assert len(keys) == len(set(keys))  # unique per key
    twice = cleaning.dedup_keep_latest(once, ["k"], order).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, twice))  # idempotent


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10), finite, finite), min_size=2, max_size=40
    )
)
@_settings
def test_corr_bounded_or_null(spark, rows):
    df = spark.createDataFrame([Row(k=k, x=x, y=y) for k, x, y in rows])
    out = df.groupBy("k").agg(safe_corr(F.col("x"), F.col("y")).alias("c")).collect()
    for r in out:
        assert r.c is None or -1.0 - 1e-9 <= r.c <= 1.0 + 1e-9


@given(
    left=st.lists(st.tuples(st.integers(0, 8), finite | st.none()), max_size=20),
    right=st.lists(st.tuples(st.integers(0, 8), finite | st.none()), max_size=20),
)
@_settings
def test_coalescing_merge_prefers_left(spark, left, right):
    """The merged value equals the left value wherever left is non-null
    (reference J1 source-preference contract, dt:86-99)."""
    ldf = spark.createDataFrame(
        [Row(k=k, va=v) for k, v in left], schema="k int, va double"
    )
    rdf = spark.createDataFrame(
        [Row(k=k, vb=v) for k, v in right], schema="k int, vb double"
    )
    ldf = cleaning.dedup_by_subset(ldf, ["k"])
    rdf = cleaning.dedup_by_subset(rdf, ["k"])
    merged = joins.coalescing_merge(ldf, rdf, ["k"], {"v": ("va", "vb")})
    lmap = {r.k: r.va for r in ldf.collect()}
    for r in merged.collect():
        if lmap.get(r.k) is not None:
            assert r.v == lmap[r.k]


@given(
    left=st.lists(st.integers(0, 50), min_size=1, max_size=15),
    right=st.lists(
        st.tuples(st.integers(0, 50), st.one_of(st.none(), finite)),
        min_size=0,
        max_size=15,
        # unique right timestamps: two right rows at the SAME instant
        # with different values are tie-ambiguous by contract (the
        # operator documents (time, tag) as its total order; callers
        # needing same-instant right dedup run dedup_keep_latest first)
        unique_by=lambda t: t[0],
    ),
    tol=st.one_of(st.none(), st.integers(1, 40)),
)
@_settings
def test_asof_join_matches_python_reference(spark, left, right, tol):
    """asof_join (backward, optional tolerance) vs a naive Python
    reference under random NULL right values, duplicate timestamps, and
    arbitrary tolerance: the carried value is the latest NON-NULL right
    value at-or-before the left time, nulled when ITS OWN timestamp
    (not a newer null row's) exceeds the tolerance — the round-4
    staleness-clock contract."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    ldf = spark.createDataFrame(
        [Row(k="x", eid=i, t=ts(s)) for i, s in enumerate(left)]
    )
    rows = [("x", ts(s), v) for s, v in right]
    rdf = spark.createDataFrame(rows, "k string, rt timestamp, val double")
    out = joins.asof_join(
        ldf, rdf, ["k"], "t", "rt", ["val"],
        tolerance_seconds=float(tol) if tol is not None else None,
    )
    got = {r.eid: r.val_asof for r in out.collect()}

    for i, s in enumerate(left):
        best = None  # (rt_sec, val) of latest non-null at-or-before
        for rs, v in right:
            if v is not None and rs <= s and (best is None or rs >= best[0]):
                best = (rs, v)
        want = best[1] if best else None
        if want is not None and tol is not None and s - best[0] > tol:
            want = None
        assert got[i] == want, (i, s, got[i], want)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-1000, 1000)),
        min_size=1,
        max_size=25,
    ),
    n=st.integers(1, 8),
)
@_settings
def test_rolling_median_matches_python_reference(spark, vals, n):
    """rolling_median vs a naive reference over random values including
    NULLs and partial frames: sort the trailing-n non-null window, take
    the middle (odd) or interpolated midpoint (even); all-null frames
    yield NULL."""
    from financial_data_lakehouse_pipeline__spark.operators import windows

    df = spark.createDataFrame(
        [(i, float(v) if v is not None else None) for i, v in enumerate(vals)],
        "i int, v double",
    )
    out = windows.rolling_median(df, [], ["i"], F.col("v"), n, out="med")
    got = {r.i: r.med for r in out.collect()}
    for i in range(len(vals)):
        frame = [v for v in vals[max(0, i - n + 1): i + 1] if v is not None]
        if not frame:
            want = None
        else:
            s = sorted(frame)
            c = len(s)
            want = (
                float(s[c // 2])
                if c % 2 == 1
                else (s[c // 2 - 1] + s[c // 2]) / 2.0
            )
        assert got[i] == want, (i, got[i], want)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=0,
        max_size=60,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find_property(spark, edges):
    """Alternating-star connected components equals union-find on
    arbitrary hypothesis-generated graphs (self-loops, parallel edges,
    isolated nodes included)."""
    from financial_data_lakehouse_pipeline__spark.operators import graph

    n = 41
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for x in range(n):
        comps.setdefault(find(x), []).append(x)
    expect = {}
    for members in comps.values():
        m = min(members)
        for x in members:
            expect[x] = m

    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    ndf = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = {
        r["node"]: r["component_id"]
        for r in graph.connected_components(edf, ndf).collect()
    }
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 8), st.sampled_from("abcdef")),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_association_rules_integer_identities(spark, rows):
    """Pair/item counts match a Python reference exactly, and each ratio
    equals the same IEEE division computed in Python bit-for-bit (NOT a
    multiply-back identity — (p/n)*n != p for e.g. p=15, n=22)."""
    from collections import defaultdict
    from itertools import combinations

    from financial_data_lakehouse_pipeline__spark.operators.analysis import (
        association_rules,
    )

    baskets = defaultdict(set)
    for g, i in rows:
        baskets[g].add(i)
    n = len(baskets)
    pair_ref = defaultdict(int)
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            pair_ref[(a, b)] += 1
    item_ref = defaultdict(int)
    for items in baskets.values():
        for i in items:
            item_ref[i] += 1

    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_pair_count=1).collect()
    got_pairs = {(r["item_a"], r["item_b"]): r for r in out}
    assert {k: v["pair_count"] for k, v in got_pairs.items()} == dict(pair_ref)
    for (a, b), r in got_pairs.items():
        assert (r["count_a"], r["count_b"]) == (item_ref[a], item_ref[b])
        p = r["pair_count"]
        assert r["support"] == p / n
        assert r["conf_a_to_b"] == p / item_ref[a]
        assert r["conf_b_to_a"] == p / item_ref[b]
        assert r["lift"] == (p * n) / (item_ref[a] * item_ref[b])


@given(
    rows=st.lists(
        st.tuples(
            st.floats(
                allow_nan=False,
                allow_infinity=False,
                min_value=-100,
                max_value=100,
            ),
            st.integers(0, 20),
        ),
        min_size=1,
        max_size=25,
    ).filter(lambda rs: sum(w for _, w in rs) > 0)
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_weighted_percentile_matches_python_reference(spark, rows):
    """weighted_percentile_disc picks the smallest value whose cumulative
    weight share reaches q — against a direct Python scan, including
    zero-weight rows, duplicate values, and all mass on one row.
    (This test caught the decimal-product scale collapse: Spark reduces
    scale on (10,6)x(38,0) products, so a naive q*W threshold silently
    rounds — the operator cross-multiplies integers instead.)"""
    from financial_data_lakehouse_pipeline__spark.operators import aggregates

    qs = [0.25, 0.5, 0.9]
    df = spark.createDataFrame(
        [("g", v, w) for v, w in rows], "k string, v double, w long"
    )
    out = aggregates.weighted_percentile_disc(df, ["k"], "v", "w", qs).collect()
    got = {r["q"]: r["value"] for r in out}

    total = sum(w for _, w in rows)
    srt = sorted(rows)
    for q in qs:
        qnum = round(q * 1_000_000)  # mirror the integer cross-product
        cum = 0
        expect = None
        for v, w in srt:
            prev = cum
            cum += w
            if cum * 1_000_000 >= qnum * total and prev * 1_000_000 < qnum * total:
                expect = v
                break
        assert got[q] == expect, (q, srt, got)
    assert len(out) == len(qs)


# ---------------------------------------------------------------- round 6


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=40,
    ),
    width=st.sampled_from([1, 3, 7, 100]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_skyline_equals_bruteforce_any_bucket_width(spark, pts, width):
    """The two-phase frontier must equal brute-force dominance for ANY
    bucket width (width=100 puts everything in one bucket; width=1
    makes every x its own bucket) — the reduction is width-invariant."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    df = spark.createDataFrame([Row(x=a, y=b) for a, b in pts])
    got = {
        (r["x"], r["y"])
        for r in analysis.skyline2d_min(df, "x", "y", bucket_width=width).collect()
    }
    uniq = set(pts)
    expect = {
        p
        for p in uniq
        if not any(q[0] <= p[0] and q[1] <= p[1] and q != p for q in uniq)
    }
    assert got == expect


@given(
    ys=st.lists(st.integers(-1000, 1000), min_size=2, max_size=12, unique=False)
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_theil_sen_matches_python_median(spark, ys):
    """ts_slope == the Python median of all pairwise slopes (identical
    double arithmetic), for arbitrary integer series on x = 0..n-1."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [Row(k="g", x=i, y=y) for i, y in enumerate(ys)]
    out = analysis.theil_sen(spark.createDataFrame(rows), ["k"], "x", "y").collect()
    slopes = sorted(
        (float(ys[j]) - float(ys[i])) / float(j - i)
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    m = len(slopes)
    expect = (slopes[(m - 1) // 2] + slopes[m // 2]) / 2.0
    assert out[0]["n_pairs"] == m
    assert out[0]["ts_slope"] == expect


_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=8),
            st.booleans(),  # True -> incoming batch, False -> base
        ),
        min_size=2,
        max_size=10,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_minhash_equals_filtered_full_property(spark, docs):
    """Batch-driven incremental dedup == full-corpus LSH filtered to
    pairs touching the batch, on RANDOM corpora (a tiny vocabulary makes
    shared 3-gram shingles — hence LSH collisions — routine). Pins the
    round-13 broadcast-pruned plan to the union-shaped semantics for
    arbitrary base/batch splits, including all-incoming (empty base) and
    batches with no near-dup at all; the hand-crafted case lives in
    test_incremental_minhash_pairs_lossless_vs_full."""
    from hypothesis import assume

    from financial_data_lakehouse_pipeline__spark.operators import dedup

    assume(any(inc for _, inc in docs))
    rows = [
        Row(doc_id=i, text=" ".join(words), inc=inc)
        for i, (words, inc) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows)
    incoming_ids = {r.doc_id for r in rows if r.inc}
    base = df.filter(~F.col("inc")).select("doc_id", "text")
    incoming = df.filter(F.col("inc")).select("doc_id", "text")

    full = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in dedup.minhash_lsh_pairs(df).collect()
    }
    expect = {
        p for p in full if p[0] in incoming_ids or p[1] in incoming_ids
    }
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in dedup.incremental_minhash_pairs(base, incoming).collect()
    }
    assert got == expect
    assert all(a in incoming_ids or b in incoming_ids for a, b, _ in got)
