"""Unit tests for operators/mlfeat.py — hand-computed values for the
feature-engineering family (LOO target encoding, equal-frequency bins,
feature hashing, PMI, walk-forward splits)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.operators import mlfeat


def test_target_encode_loo_hand_values(spark):
    """keys [a,a,b], targets [1,3,5]: at w=0 the a-rows see each other
    ((4-1)/1=3, (4-3)/1=1) and the b singleton is NULL; at w=2 the
    singleton shrinks to the global mean (gm=3 -> (0+2*3)/2=3)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, y double"
    )
    got0 = {
        (r["k"], r["y"]): r["te"]
        for r in mlfeat.target_encode_loo(df, ["k"], "y").collect()
    }
    assert got0[("a", 1.0)] == 3.0
    assert got0[("a", 3.0)] == 1.0
    assert got0[("b", 5.0)] is None

    got2 = {
        (r["k"], r["y"]): r["te"]
        for r in mlfeat.target_encode_loo(
            df, ["k"], "y", prior_weight=2.0
        ).collect()
    }
    # a-rows: (gsum - y + 2*3) / (2 - 1 + 2)
    assert got2[("a", 1.0)] == (4.0 - 1.0 + 6.0) / 3.0
    assert got2[("b", 5.0)] == (5.0 - 5.0 + 6.0) / 2.0


def test_equal_frequency_bins_hand_values(spark):
    """8 rows, 4 bins: bin = (strict-below count) * 4 DIV 8; ties (the
    two 1s) share bin 0 and push later values up."""
    vals = [1, 1, 2, 3, 4, 5, 6, 7]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    got = {
        r["x"]: r["bin"]
        for r in mlfeat.equal_frequency_bins(df, "x", 4).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}


def test_equal_frequency_bins_population_balance(spark):
    """Over distinct values, bin populations differ by at most 1."""
    df = spark.createDataFrame([(i,) for i in range(103)], "x int")
    out = mlfeat.equal_frequency_bins(df, "x", 5)
    counts = [
        r["n"]
        for r in out.groupBy("bin").agg(F.count("*").alias("n")).collect()
    ]
    assert len(counts) == 5
    assert max(counts) - min(counts) <= 1


def test_feature_hash_deterministic_and_mass_preserving(spark):
    """Same input -> identical indices across calls; total weight ==
    total token count; indices within [0, n_features)."""
    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "b b"), (3, "")], "id int, text string"
    )
    toks = F.split(F.trim("text"), r"\s+")
    out1 = mlfeat.feature_hash(df, "id", toks, n_features=8).collect()
    out2 = mlfeat.feature_hash(df, "id", toks, n_features=8).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    assert sum(r["weight"] for r in out1) == 6  # 4 + 2 + 0
    assert all(0 <= r["feature"] < 8 for r in out1)
    # same token always lands in the same bucket: doc1's two 'a's merged
    doc1 = [r for r in out1 if r["id"] == 1]
    assert sum(r["weight"] for r in doc1) == 4
    assert len(doc1) <= 3


def test_pmi_pairs_hand_values(spark):
    """Groups {g1:[a,b], g2:[a,b], g3:[a,c]}: N=3, ca=3, cb=2, nab=2 ->
    pmi(a,b) = ln(2*3/(3*2)) = 0 exactly; (a,c)/(b,c) pruned at
    min_pair_count=2."""
    rows = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"),
            ("g3", "a"), ("g3", "c")]
    df = spark.createDataFrame(rows, "g string, i string")
    got = mlfeat.pmi_pairs(df, "g", "i", min_pair_count=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["item_a"], r["item_b"], r["pair_count"]) == ("a", "b", 2)
    assert r["pmi"] == 0.0


def test_pmi_pairs_dedups_repeat_items(spark):
    """Duplicate (group, item) rows must not inflate counts."""
    rows = [("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")]
    df = spark.createDataFrame(rows, "g string, i string")
    r = mlfeat.pmi_pairs(df, "g", "i", min_pair_count=1).collect()[0]
    assert r["pair_count"] == 2
    # N=2, ca=2, cb=2 -> ln(2*2/4) = 0
    assert r["pmi"] == 0.0


def test_walk_forward_splits_roles_and_exclusion(spark):
    """Each row lands in every fold whose test_end postdates it, as
    train strictly before train_end, else test; future rows excluded."""
    df = spark.createDataFrame(
        [(1, "1997-06-01"), (2, "1998-06-01"), (3, "1999-06-01")],
        "id int, ts string",
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    folds = [(1, "1998-01-01", "1999-01-01"), (2, "1999-01-01", "2000-01-01")]
    out = mlfeat.walk_forward_splits(df, "ts", folds)
    got = {(r["id"], r["fold"]): r["role"] for r in out.collect()}
    assert got == {
        (1, 1): "train", (1, 2): "train",
        (2, 1): "test",  (2, 2): "train",
        (3, 2): "test",
    }


def test_pmi_matches_manual_log_nonzero(spark):
    """Genuinely non-zero PMI values, positive and negative, against a
    manual computation — a wrong scale factor in the ratio cannot hide
    behind ln(1)=0 here."""
    # groups: g1=[a,b], g2=[a], g3=[b] -> N=3, ca=2, cb=2, nab=1
    rows = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g3", "b")]
    df = spark.createDataFrame(rows, "g string, i string")
    r = mlfeat.pmi_pairs(df, "g", "i", min_pair_count=1).collect()[0]
    assert r["pmi"] == round(math.log(1 * 3 / (2 * 2)), 6)  # ln(0.75) < 0

    # g1=[a,b], g2=[a,b], g3=[c] -> N=3, ca=cb=2, nab=2 -> ln(6/4) > 0
    rows2 = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"), ("g3", "c")]
    df2 = spark.createDataFrame(rows2, "g string, i string")
    got = {
        (r["item_a"], r["item_b"]): r["pmi"]
        for r in mlfeat.pmi_pairs(df2, "g", "i", min_pair_count=1).collect()
    }
    assert got[("a", "b")] == round(math.log(2 * 3 / (2 * 2)), 6)


def test_seasonal_decompose_hand_values(spark):
    """Two seasons with means 10 and 20, grand mean 15: seasonal is
    -5/+5, deseasonalized re-centers, residual is value - season mean."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [(1, 8.0), (1, 12.0), (2, 18.0), (2, 22.0)]
    df = spark.createDataFrame(rows, "s int, v double")
    out = analysis.seasonal_decompose(df, [], F.col("s"), F.col("v"))
    got = {(r["season"], r["value"]): r for r in out.collect()}
    r = got[(1, 8.0)]
    assert (r["seasonal"], r["deseasonalized"], r["residual"]) == (-5.0, 13.0, -2.0)
    r = got[(2, 22.0)]
    assert (r["seasonal"], r["deseasonalized"], r["residual"]) == (5.0, 17.0, 2.0)


def test_seasonal_decompose_grouped_keeps_columns(spark):
    """Grouped decomposition keeps the input columns and decomposes
    within each group independently."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [("a", 1, 0.0), ("a", 2, 10.0), ("b", 1, 100.0), ("b", 2, 200.0)]
    df = spark.createDataFrame(rows, "k string, s int, v double")
    out = analysis.seasonal_decompose(df, ["k"], F.col("s"), F.col("v"))
    assert "k" in out.columns and "s" in out.columns
    got = {(r["k"], r["season"]): r["seasonal"] for r in out.collect()}
    assert got[("a", 1)] == -5.0 and got[("a", 2)] == 5.0
    assert got[("b", 1)] == -50.0 and got[("b", 2)] == 50.0


def test_ols2_fit_recovers_planted_coefficients(spark):
    """Exact linear data y = 3 + 2*x1 - 1*x2 (integer, full rank) must
    recover (2, -1, 3) exactly after ROUND 6."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = []
    for x1 in range(6):
        for x2 in range(4):
            rows.append(("g", x1, x2, 3 + 2 * x1 - x2))
    df = spark.createDataFrame(rows, "k string, x1 long, x2 long, y long")
    r = analysis.ols2_fit(
        df, ["k"], F.col("y"), F.col("x1"), F.col("x2")
    ).collect()[0]
    assert (r["beta1"], r["beta2"], r["intercept"]) == (2.0, -1.0, 3.0)


def test_ols2_fit_collinear_gives_null(spark):
    """x2 = 2*x1 (rank deficient) -> det = 0 -> NULL betas."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [("g", i, 2 * i, i + 1) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, x1 long, x2 long, y long")
    r = analysis.ols2_fit(
        df, ["k"], F.col("y"), F.col("x1"), F.col("x2")
    ).collect()[0]
    assert r["beta1"] is None and r["beta2"] is None and r["intercept"] is None


def test_trimmed_mean_hand_values(spark):
    """Ten values 1..9 plus outlier 1000, trim 10%: drop min (1) and
    max (1000), mean of 2..9 = 5.5."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    vals = list(range(1, 10)) + [1000]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v long")
    r = analysis.trimmed_mean(df, ["k"], F.col("v"), trim_frac=0.1).collect()[0]
    assert r["n_kept"] == 8
    assert r["trimmed_mean"] == 5.5


def test_trimmed_mean_zero_trim_is_mean(spark):
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    df = spark.createDataFrame([("g", v) for v in [1, 2, 3, 4]], "k string, v long")
    r = analysis.trimmed_mean(df, ["k"], F.col("v"), trim_frac=0.0).collect()[0]
    assert r["n_kept"] == 4 and r["trimmed_mean"] == 2.5


def test_hhi_hand_values(spark):
    """Two equal entities -> HHI 0.5; monopoly -> 1.0."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    df = spark.createDataFrame(
        [("m1", 100), ("m1", 100), ("m2", 100), ("m2", 0)], "k string, v long"
    )
    got = {r["k"]: (r["hhi"], r["n_entities"])
           for r in analysis.hhi(df, ["k"], F.col("v")).collect()}
    assert got["m1"] == (0.5, 2)
    assert got["m2"] == (1.0, 2)


def test_gini_hand_values(spark):
    """Perfect equality -> 0; [0,0,0,100] -> 2*Σi·x/(n·Σx)-(n+1)/n =
    2*400/400 - 5/4 = 0.75; ties handled via triangular blocks."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    eq = spark.createDataFrame([("g", 5)] * 4, "k string, v long")
    r = analysis.gini(eq, ["k"], F.col("v")).collect()[0]
    assert r["gini"] == 0.0 and r["n_entities"] == 4

    conc = spark.createDataFrame(
        [("g", v) for v in [0, 0, 0, 100]], "k string, v long"
    )
    r = analysis.gini(conc, ["k"], F.col("v")).collect()[0]
    assert r["gini"] == 0.75

    # known mixed case: [1,2,3,4]: Σi*x = 1+4+9+16=30; 2*30/(4*10)-5/4=0.25
    mix = spark.createDataFrame(
        [("g", v) for v in [1, 2, 3, 4]], "k string, v long"
    )
    r = analysis.gini(mix, ["k"], F.col("v")).collect()[0]
    assert r["gini"] == 0.25


def test_welch_t_hand_values(spark):
    """Treat [10,20,30] vs control [10,20]: means 20/15, variances
    100/50, se2 = 100/3 + 50/2 = 58.333..., t = 5/sqrt(se2)."""
    import math

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [("g", True, 10), ("g", True, 20), ("g", True, 30),
            ("g", False, 10), ("g", False, 20)]
    df = spark.createDataFrame(rows, "k string, arm boolean, v long")
    r = analysis.welch_t(df, ["k"], F.col("arm"), F.col("v")).collect()[0]
    assert (r["n_treat"], r["n_control"]) == (3, 2)
    assert (r["mean_treat"], r["mean_control"]) == (20.0, 15.0)
    se2 = 100.0 / 3 + 50.0 / 2
    assert r["t_stat"] == round(5.0 / math.sqrt(se2), 6)


def test_welch_t_degenerate_arm_is_null(spark):
    """A single-row arm cannot estimate variance -> NULL t."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [("g", True, 10), ("g", False, 10), ("g", False, 20)]
    df = spark.createDataFrame(rows, "k string, arm boolean, v long")
    r = analysis.welch_t(df, ["k"], F.col("arm"), F.col("v")).collect()[0]
    assert r["t_stat"] is None


def test_equal_frequency_bins_null_rows_pass_through(spark):
    """NULL values are excluded from the distribution but their rows
    survive with a NULL bin; non-null bins are unaffected by NULLs."""
    rows = [(None,), (None,), (None,), (None,), (1,), (2,), (3,), (4,)]
    df = spark.createDataFrame(rows, "x int")
    out = mlfeat.equal_frequency_bins(df, "x", 2).collect()
    assert len(out) == 8
    got = {r["x"]: r["bin"] for r in out if r["x"] is not None}
    # distribution over non-nulls only: below(1)=0,(2)=1,(3)=2,(4)=3
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}
    assert all(r["bin"] is None for r in out if r["x"] is None)


def test_equal_frequency_bins_distributed_prefix_sum_invariance(spark):
    """The distributed prefix sum (range repartition + per-range running
    counts + offset table) is boundary-invariant: identical bins
    regardless of how many ranges the histogram splits into — including
    more ranges than distinct values (empty ranges) and a single range
    (degenerates to the old global window). Until round 11 this op
    funnelled all distinct values through ONE window task behind a 1e6
    guard, which the sf1 rehearsal tripped; this pins the replacement."""
    df = spark.createDataFrame(
        [(i % 97,) for i in range(500)] + [(None,)] * 3, "x int"
    )
    baselines = {}
    for n_parts in ("1", "7", "200"):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", n_parts)
        try:
            rows = mlfeat.equal_frequency_bins(df, "x", 10).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        baselines[n_parts] = sorted(
            (r["x"], r["bin"]) for r in rows if r["x"] is not None
        )
        assert all(r["bin"] is None for r in rows if r["x"] is None)
    assert baselines["1"] == baselines["7"] == baselines["200"]
    # spot-check exactness against the definition
    got = dict(set(baselines["7"]))
    import collections

    cnt = collections.Counter(i % 97 for i in range(500))
    below = 0
    for v in sorted(cnt):
        assert got[v] == (below * 10) // 500
        below += cnt[v]


def test_equal_frequency_bins_correct_without_exchange_reuse(spark):
    """The histogram's nondeterministic __pid (spark_partition_id over a
    sampled range repartition) is consumed by TWO subtrees — the offset
    aggregate and the ranked window. Their agreement must NOT depend on
    Catalyst's exchange-reuse optimization: with reuse disabled each
    subtree would re-instantiate the exchange (new RDD id, new sampling
    seed, potentially different boundaries) unless the operator pins
    the assignment by materializing it once. Pin: bins stay exact with
    spark.sql.exchange.reuse off."""
    import collections

    df = spark.createDataFrame([(i % 53,) for i in range(400)], "x int")
    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        rows = mlfeat.equal_frequency_bins(df, "x", 8).collect()
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
    got = {r["x"]: r["bin"] for r in rows}
    cnt = collections.Counter(i % 53 for i in range(400))
    below = 0
    for v in sorted(cnt):
        assert got[v] == (below * 8) // 400, f"value {v}"
        below += cnt[v]


def test_trimmed_mean_exact_fraction_boundary(spark):
    """trim_frac=0.29, n=100: floor(100*0.29) must be 29 (double
    multiplication gives 28.999... -> 28); 29 cut from each side."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    df = spark.createDataFrame(
        [("g", v) for v in range(1, 101)], "k string, v long"
    )
    r = analysis.trimmed_mean(df, ["k"], F.col("v"), trim_frac=0.29).collect()[0]
    assert r["n_kept"] == 100 - 2 * 29
    # survivors are 30..71 -> mean 50.5
    assert r["trimmed_mean"] == 50.5


def test_target_encode_null_keys_survive(spark):
    """NULL-key rows keep their row (te NULL) instead of vanishing."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 9.0)], "k string, y double"
    )
    out = mlfeat.target_encode_loo(df, ["k"], "y").collect()
    assert len(out) == 3
    nk = [r for r in out if r["k"] is None][0]
    assert nk["te"] is None


def test_welch_t_empty_arm_means_null_not_nan(spark):
    """All-control group: mean_treat must be NULL, never NaN."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [("g", False, 10), ("g", False, 20)]
    df = spark.createDataFrame(rows, "k string, arm boolean, v long")
    r = analysis.welch_t(df, ["k"], F.col("arm"), F.col("v")).collect()[0]
    assert r["mean_treat"] is None
    assert r["mean_control"] == 15.0
    assert r["t_stat"] is None


def test_ols2_fit_large_values_no_overflow(spark):
    """Values whose squares exceed BIGINT (x ~ 4e9) must not raise
    ANSI ArithmeticException — decimal products carry them exactly."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    base = 4_000_000_000
    rows = []
    for x1 in range(4):
        for x2 in range(3):
            rows.append(("g", base + x1 * 1000, x2, 2 * (base + x1 * 1000) - x2))
    df = spark.createDataFrame(rows, "k string, x1 long, x2 long, y long")
    r = analysis.ols2_fit(
        df, ["k"], F.col("y"), F.col("x1"), F.col("x2")
    ).collect()[0]
    assert r["beta1"] == 2.0 and r["beta2"] == -1.0


# ---------------------------------------------------------------- round 6


def test_spearman_monotone_ties_and_constant(spark):
    """rho=1 for any monotone map, -1 reversed, NULL for a constant
    margin; tied values use average midranks (hand-checked)."""
    from pyspark.sql import Row

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = (
        [Row(k="up", x=i, y=i * i) for i in range(1, 6)]
        + [Row(k="down", x=i, y=-3 * i) for i in range(1, 6)]
        + [Row(k="flat", x=i, y=7) for i in range(1, 6)]
        + [Row(k="tie", x=1, y=10), Row(k="tie", x=1, y=20),
           Row(k="tie", x=2, y=30), Row(k="tie", x=3, y=40)]
    )
    out = {
        r["k"]: r["rho"]
        for r in analysis.spearman_rho(
            spark.createDataFrame(rows), ["k"], F.col("x"), F.col("y")
        ).collect()
    }
    assert out["up"] == 1.0 and out["down"] == -1.0
    assert out["flat"] is None
    # ranks x: (1.5,1.5,3,4) y: (1,2,3,4) -> pearson = 0.9487 (scipy)
    assert out["tie"] == pytest.approx(0.948683, abs=1e-6)


def test_mann_whitney_hand_example(spark):
    """U and tie-corrected z against a hand-worked rank-sum example."""
    from pyspark.sql import Row

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    # treat: 1, 2, 4  control: 2, 3  (one tie across arms at 2)
    rows = [
        Row(k="a", v=1, g=True), Row(k="a", v=2, g=True),
        Row(k="a", v=4, g=True), Row(k="a", v=2, g=False),
        Row(k="a", v=3, g=False),
    ]
    out = analysis.mann_whitney_u(
        spark.createDataFrame(rows), ["k"], F.col("v"), F.col("g")
    ).collect()[0]
    # midranks: 1->1, 2->2.5 (x2), 3->4, 4->5; R1 = 1+2.5+5 = 8.5
    # U1 = R1 - n1(n1+1)/2 = 8.5 - 6 = 2.5
    assert out["n_treat"] == 3 and out["n_control"] == 2
    assert out["u_stat"] == pytest.approx(2.5)
    # var = (6/12)*((6) - (2^3-2)/(5*4)) = 0.5*(6-0.3) = 2.85
    # z = (2.5 - 3)/sqrt(2.85) = -0.296174
    assert out["z_stat"] == pytest.approx(-0.296174, abs=1e-6)


def test_km_survival_hand_curve_and_extinction(spark):
    """Classic KM hand example + the everyone-dies tail pinning S=0
    (no ln(0) evaluated on either engine)."""
    from pyspark.sql import Row

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    # durations: events at t=2 (x2), t=4; censored at 3, 5
    rows = [Row(t=2, e=1), Row(t=2, e=1), Row(t=3, e=0),
            Row(t=4, e=1), Row(t=5, e=0)]
    out = {
        r["t"]: (r["n_risk"], r["n_events"], r["survival"])
        for r in analysis.km_survival(
            spark.createDataFrame(rows), F.col("t"), F.col("e")
        ).collect()
    }
    # t=2: 5 at risk, 2 events -> S = 3/5 = 0.6
    # t=4: 2 at risk, 1 event  -> S = 0.6 * 1/2 = 0.3
    assert out[2] == (5, 2, 0.6)
    assert out[4] == (2, 1, 0.3)
    # everyone-dies case: last event consumes the risk set -> S = 0
    rows2 = [Row(t=1, e=1), Row(t=2, e=1)]
    out2 = {
        r["t"]: r["survival"]
        for r in analysis.km_survival(
            spark.createDataFrame(rows2), F.col("t"), F.col("e")
        ).collect()
    }
    assert out2[1] == 0.5 and out2[2] == 0.0


def test_decision_stump_recovers_planted_threshold(spark):
    """A label that flips exactly at v<=3 must be found with gain equal
    to the parent impurity (pure children), smallest-v tie-break."""
    from pyspark.sql import Row

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [Row(k="a", v=v, y=(v <= 3)) for v in [1, 2, 3, 4, 5, 6]]
    out = analysis.decision_stump(
        spark.createDataFrame(rows), ["k"], F.col("v"), F.col("y")
    ).collect()[0]
    assert out["threshold"] == 3
    assert (out["n_left"], out["pos_left"]) == (3, 3)
    assert (out["n_right"], out["pos_right"]) == (3, 0)
    assert out["gain"] == pytest.approx(0.5)  # parent gini 0.5 -> 0


def test_decision_stump_single_value_group_absent(spark):
    from pyspark.sql import Row

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    rows = [Row(k="solo", v=7, y=True), Row(k="solo", v=7, y=False)]
    assert (
        analysis.decision_stump(
            spark.createDataFrame(rows), ["k"], F.col("v"), F.col("y")
        ).count()
        == 0
    )


def test_mutual_information_independent_and_determined(spark):
    """MI = 0 for an independent product table; MI = ln(2) when y is a
    function of x with two equiprobable classes."""
    from pyspark.sql import Row

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    indep = [
        Row(x=x, y=y) for x in ["a", "b"] for y in ["u", "v"] for _ in range(5)
    ]
    mi0 = analysis.mutual_information(
        spark.createDataFrame(indep), F.col("x"), F.col("y")
    ).collect()[0]
    assert mi0["n"] == 20 and mi0["mi_nats"] == pytest.approx(0.0)

    det = [Row(x="a", y="u")] * 6 + [Row(x="b", y="v")] * 6
    mi1 = analysis.mutual_information(
        spark.createDataFrame(det), F.col("x"), F.col("y")
    ).collect()[0]
    assert mi1["mi_nats"] == pytest.approx(math.log(2.0), abs=1e-6)


def test_rank_stats_ignore_null_values(spark):
    """NULL observations must not occupy ranks (Spark NULLS FIRST vs
    DuckDB NULLS LAST would shift every real rank cross-engine):
    results equal the null-free computation."""
    from pyspark.sql import Row

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    clean = [Row(k="a", x=i, y=i, g=(i % 2 == 0)) for i in range(1, 7)]
    dirty = clean + [
        Row(k="a", x=None, y=3, g=True),
        Row(k="a", x=2, y=None, g=False),
        Row(k="a", x=None, y=None, g=True),
    ]
    rho_c = analysis.spearman_rho(
        spark.createDataFrame(clean), ["k"], F.col("x"), F.col("y")
    ).collect()[0]
    rho_d = analysis.spearman_rho(
        spark.createDataFrame(dirty), ["k"], F.col("x"), F.col("y")
    ).collect()[0]
    assert (rho_c["n_rows"], rho_c["rho"]) == (rho_d["n_rows"], rho_d["rho"])

    dirty_v = [Row(k="a", v=v, g=(i % 2 == 0)) for i, v in enumerate([1, 2, 3, 4])]
    mwu_c = analysis.mann_whitney_u(
        spark.createDataFrame(dirty_v), ["k"], F.col("v"), F.col("g")
    ).collect()[0]
    mwu_d = analysis.mann_whitney_u(
        spark.createDataFrame(dirty_v + [Row(k="a", v=None, g=True)]),
        ["k"], F.col("v"), F.col("g"),
    ).collect()[0]
    assert (mwu_c["n_treat"], mwu_c["u_stat"], mwu_c["z_stat"]) == (
        mwu_d["n_treat"], mwu_d["u_stat"], mwu_d["z_stat"]
    )


def test_weighted_log_mean_udaf_null_semantics(spark):
    """GROUPED_AGG UDAF kernel: NaN/None pairs drop (SQL aggregate NULL
    semantics), an all-null group yields NULL, values match the closed
    form."""
    import math

    from financial_data_lakehouse_pipeline__spark.functions.udafs import (
        weighted_log_mean,
    )

    rows = [
        ("a", 2.0, 1.0),
        ("a", 8.0, 3.0),
        ("a", None, 5.0),  # dropped pair
        ("b", None, 1.0),  # all-null group -> NULL
    ]
    df = spark.createDataFrame(rows, "k string, x double, w double")
    got = {
        r["k"]: r["lm"]
        for r in df.groupBy("k")
        .agg(weighted_log_mean("x", "w").alias("lm"))
        .collect()
    }
    expect_a = (1.0 * math.log(2.0) + 3.0 * math.log(8.0)) / 4.0
    assert abs(got["a"] - expect_a) < 1e-12
    assert got["b"] is None
