"""Corpus: feature-engineering operators (operators/mlfeat.py) —
leave-one-out target encoding, exact equal-frequency binning, feature
hashing, PMI co-occurrence, walk-forward CV splits — plus the
Sharpe-ratio roll-up on exact integer-cents P&L.

Determinism: group sums are exact decimal (dsum twin), bin edges are
integer floor division (Spark `DIV` == DuckDB `//`), feature indices
are md5-prefix integers, and the two inherently-floating outputs (PMI's
ln, Sharpe's mean/sqrt(var)) are computed from exact-integer moment
sums and rounded 6 dp per the corpus float convention.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.corpus import register, sql_dsum
from financial_data_lakehouse_pipeline__spark.operators import mlfeat, sampling
from financial_data_lakehouse_pipeline__spark.sources import read_table


@register(
    "target_encode_segment",
    # LOO encoding with w=10 smoothing: exact decimal group sums, the
    # identical (gsum - y + w*gmean) / (gcnt - 1 + w) IEEE chain.
    f"""WITH s AS (
          SELECT c_mktsegment,
                 {sql_dsum('c_acctbal')} AS gsum,
                 CAST(COUNT(c_acctbal) AS BIGINT) AS gcnt
          FROM customer GROUP BY c_mktsegment
        ), g AS (
          SELECT {sql_dsum('c_acctbal')} / COUNT(c_acctbal) AS gmean
          FROM customer
        )
        SELECT c_custkey, c.c_mktsegment, c_acctbal,
               CASE WHEN CAST(gcnt AS DOUBLE) - 1e0 + 10e0 > 0e0 THEN
                 (gsum - CAST(c_acctbal AS DOUBLE) + 10e0 * gmean)
                 / (CAST(gcnt AS DOUBLE) - 1e0 + 10e0) END AS te
        FROM customer c JOIN s USING (c_mktsegment), g""",
)
def target_encode_segment(spark, sf_dir):
    """Leave-one-out target encoding (operators/mlfeat.target_encode_loo)
    of market segment by account balance, prior weight 10 — each row's
    feature excludes its own target (no self-leakage) and shrinks
    toward the global mean. Per-key stats broadcast; the fact side
    never shuffles."""
    c = read_table(spark, sf_dir, "customer")
    out = mlfeat.target_encode_loo(
        c, ["c_mktsegment"], "c_acctbal", prior_weight=10.0
    )
    return out.select("c_custkey", "c_mktsegment", "c_acctbal", "te")


@register(
    "equal_freq_bins_orders",
    # Exact equal-frequency octiles of order totals: value-level
    # histogram, strict-below cumulative counts, integer floor division.
    """WITH vc AS (
          SELECT o_totalprice AS v, COUNT(*) AS c FROM orders GROUP BY 1
        ), t AS (SELECT COUNT(*) AS total FROM orders),
        r AS (
          SELECT v, COALESCE(SUM(c) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS below
          FROM vc
        )
        SELECT o_orderkey, o_totalprice,
               CAST((below * 8) // total AS INT) AS bin
        FROM orders JOIN r ON o_totalprice = v, t""",
)
def equal_freq_bins_orders(spark, sf_dir):
    """Exact equal-frequency binning (operators/mlfeat
    .equal_frequency_bins) of order totals into 8 octiles: bin =
    (rows strictly below) * 8 DIV total — pure integer arithmetic, no
    interpolation, equal values always share a bin. The single-
    partition window runs over distinct values only (documented
    aggregate-then-scan bound)."""
    o = read_table(spark, sf_dir, "orders")
    out = mlfeat.equal_frequency_bins(o, "o_totalprice", 8)
    return out.select("o_orderkey", "o_totalprice", "bin")


#: canonical lowercase tokens with the [] blank guard (textdocs._TOKS twin)
_CANON = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS = (
    f"CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) "
    f"ELSE regexp_split_to_array({_CANON}, ' ') END"
)


@register(
    "feature_hash_docs",
    # Hashing trick: md5-prefix feature indices, exact counts.
    f"""WITH tok AS (
          SELECT doc_id, unnest({_TOKS}) AS t FROM documents
        )
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5('feat:' || t), 1, 7))
                         AS BIGINT) % 64 AS INT) AS feature,
               CAST(COUNT(*) AS BIGINT) AS weight
        FROM tok WHERE length(t) > 0
        GROUP BY doc_id, feature""",
)
def feature_hash_docs(spark, sf_dir):
    """Feature hashing (operators/mlfeat.feature_hash) of document
    tokens into 64 buckets — the bounded-vocabulary featurizer (no
    dictionary pass or broadcast vocab). Explode → codegen md5 bucket →
    one (doc, feature) groupBy with map-side partials; indices
    reproduce exactly on any engine via the md5-prefix idiom."""
    d = read_table(spark, sf_dir, "documents")
    canon = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(canon, " "))
    return mlfeat.feature_hash(d, "doc_id", toks, n_features=64, salt="feat")


@register(
    "pmi_copurchase_parts",
    # PMI over co-purchased part pairs: exact integer counts, one
    # division chain, ln rounded 6 (inherently-floating convention).
    """WITH gi AS (
          SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
        ), n AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS ng FROM gi),
        ic AS (SELECT i, COUNT(*) AS ci FROM gi GROUP BY i),
        p AS (
          SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS pair_count
          FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i
          GROUP BY a.i, b.i HAVING COUNT(*) >= 3
        )
        SELECT item_a, item_b,
               CAST(pair_count AS BIGINT) AS pair_count,
               ROUND(LN(CAST(pair_count AS DOUBLE) * CAST(ng AS DOUBLE)
                        / (CAST(ca.ci AS DOUBLE) * CAST(cb.ci AS DOUBLE))),
                     6) AS pmi
        FROM p JOIN ic ca ON p.item_a = ca.i
               JOIN ic cb ON p.item_b = cb.i, n""",
)
def pmi_copurchase_parts(spark, sf_dir):
    """Pointwise mutual information (operators/mlfeat.pmi_pairs) over
    part pairs co-occurring in the same order, support >= 3 — the
    independence-null association score (complement of
    basket_rules_orders' confidence/lift). Support-pruned pair
    generation (distinct pairs, a < b self-join bounded by basket
    size squared); item counts broadcast back."""
    li = read_table(spark, sf_dir, "lineitem")
    return mlfeat.pmi_pairs(li, "l_orderkey", "l_partkey", min_pair_count=3)


_FOLDS = [
    (1, "1998-01-01", "1999-01-01"),
    (2, "1999-01-01", "2000-01-01"),
    (3, "2000-01-01", "2001-01-01"),
]

_FOLDS_SQL = ", ".join(
    f"({k}, TIMESTAMP '{tr}', TIMESTAMP '{te}')" for k, tr, te in _FOLDS
)


@register(
    "walk_forward_orders",
    # Rolling-origin CV fan-out: literal fold table, range condition,
    # role by strict timestamp compare.
    f"""SELECT o_orderkey, fold,
               CASE WHEN o_orderdate < train_end THEN 'train'
                    ELSE 'test' END AS role
        FROM orders
        JOIN (VALUES {_FOLDS_SQL}) AS f(fold, train_end, test_end)
          ON o_orderdate < test_end""",
)
def walk_forward_orders(spark, sf_dir):
    """Walk-forward (rolling-origin) CV splits (operators/mlfeat
    .walk_forward_splits): 3 expanding-train folds over order dates —
    every test row strictly postdates its training data, the only
    leak-free temporal CV. The fold spec is a broadcast literal table;
    fan-out <= 3 per row, no shuffle."""
    o = read_table(spark, sf_dir, "orders")
    out = mlfeat.walk_forward_splits(o, "o_orderdate", _FOLDS)
    return out.select("o_orderkey", "fold", "role")


#: daily close per supplier — order-encoded MAX trick (aggregates.ohlc);
#: shared by the sharpe/twap/amihud family so the 16777216 encoding has
#: exactly one SQL and one Spark definition.
_CLOSE_CTE = """SELECT l_suppkey, l_shipdate AS day,
                 MAX((l_orderkey * 10 + l_linenumber) * 16777216
                     + CAST(FLOOR(l_extendedprice * 100e0 + 5e-1) AS BIGINT))
                     % 16777216 AS close
          FROM lineitem GROUP BY l_suppkey, l_shipdate"""

_CLOSE_VOL_CTE = """SELECT l_suppkey, l_shipdate AS day,
                 MAX((l_orderkey * 10 + l_linenumber) * 16777216
                     + CAST(FLOOR(l_extendedprice * 100e0 + 5e-1) AS BIGINT))
                     % 16777216 AS close,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vol
          FROM lineitem GROUP BY l_suppkey, l_shipdate"""


def _daily_close(spark, sf_dir, with_volume: bool = False):
    """Spark twin of _CLOSE_CTE / _CLOSE_VOL_CTE."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    okey = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    aggs = [(F.max(okey * F.lit(16777216) + cents) % F.lit(16777216)).alias("close")]
    if with_volume:
        aggs.append(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("vol"))
    return li.groupBy("l_suppkey", F.col("l_shipdate").alias("day")).agg(*aggs)


@register(
    "sharpe_supplier_pnl",
    # Sharpe on daily close-to-close P&L in exact integer cents:
    # moment sums (n, s1, s2) are exact BIGINTs; mean/var/sqrt is one
    # IEEE chain; annualized by sqrt(252); ROUND 6.
    f"""WITH c AS ({_CLOSE_CTE}),
        d AS (
          SELECT l_suppkey,
                 close - LAG(close) OVER (PARTITION BY l_suppkey
                                          ORDER BY day) AS pnl
          FROM c
        ), m AS (
          SELECT l_suppkey,
                 CAST(COUNT(pnl) AS BIGINT) AS n,
                 CAST(SUM(pnl) AS BIGINT) AS s1,
                 CAST(SUM(pnl * pnl) AS BIGINT) AS s2
          FROM d WHERE pnl IS NOT NULL GROUP BY l_suppkey
        )
        SELECT l_suppkey, n AS n_days,
               CASE WHEN n > 1 AND
                         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                          * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         / (CAST(n AS DOUBLE) - 1e0) > 0e0
                    THEN ROUND(SQRT(252e0)
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                                 * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                / (CAST(n AS DOUBLE) - 1e0)), 6) END
                   AS sharpe
        FROM m""",
)
def sharpe_supplier_pnl(spark, sf_dir):
    """Annualized Sharpe ratio per supplier over daily close-to-close
    P&L — mean/std of exact integer-cents differences (ratios would
    need order-dependent float sums; cents P&L keeps every moment sum
    an exact BIGINT until the final division/sqrt chain, the
    autocorr/beta co-moment discipline). Daily close reuses the
    order-encoded MAX trick (aggregates.ohlc); one aggregation, one
    keyed window, one tiny roll-up."""
    from pyspark.sql import Window

    c = _daily_close(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("day")
    d = c.select(
        "l_suppkey",
        (F.col("close") - F.lag("close").over(w)).alias("pnl"),
    ).filter(F.col("pnl").isNotNull())
    m = d.groupBy("l_suppkey").agg(
        F.count("pnl").cast("bigint").alias("n"),
        F.sum("pnl").cast("bigint").alias("s1"),
        F.sum(F.col("pnl") * F.col("pnl")).cast("bigint").alias("s2"),
    )
    n_d = F.col("n").cast("double")
    s1_d = F.col("s1").cast("double")
    s2_d = F.col("s2").cast("double")
    var = (s2_d - s1_d * s1_d / n_d) / (n_d - F.lit(1.0))
    sharpe = F.when(
        (F.col("n") > 1) & (var > 0),
        F.round(
            F.sqrt(F.lit(252.0)) * (s1_d / n_d) / F.sqrt(var), 6
        ),
    )
    return m.select(
        "l_suppkey", F.col("n").alias("n_days"), sharpe.alias("sharpe")
    )


@register(
    "seasonal_dow_revenue",
    # Additive day-of-week decomposition of daily revenue: exact cents
    # sums, decimal-exact means, two IEEE subtractions — no rounding.
    """WITH daily AS (
          SELECT o_orderdate AS day,
                 CAST(isodow(o_orderdate) AS INT) AS season,
                 SUM(CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT))
                     AS value
          FROM orders GROUP BY 1, 2
        ), sm AS (
          SELECT season,
                 CAST(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)
                     / COUNT(value) AS smean
          FROM daily GROUP BY season
        ), gm AS (
          SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)
                     / COUNT(value) AS gmean
          FROM daily
        )
        SELECT day, season, CAST(value AS BIGINT) AS value,
               smean - gmean AS seasonal,
               value - (smean - gmean) AS deseasonalized,
               value - smean AS residual
        FROM daily JOIN sm USING (season), gm""",
)
def seasonal_dow_revenue(spark, sf_dir):
    """Additive day-of-week seasonal decomposition
    (operators/analysis.seasonal_decompose) of daily order revenue:
    seasonal component (weekday mean minus grand mean), seasonally
    adjusted series, and the residual anomaly signal — the calendar
    adjustment upstream of any trend/anomaly model. Daily revenue is
    an exact integer-cents sum; both means are decimal-exact; the
    decomposition is two broadcast joins onto a pre-aggregated daily
    spine (the fact table shuffles once, for the daily rollup)."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(cents).alias("v")
    )
    out = analysis.seasonal_decompose(
        daily,
        [],
        (F.weekday("day") + F.lit(1)).cast("int"),
        F.col("v").cast("bigint"),
    )
    return out.select(
        "day", "season", "value", "seasonal", "deseasonalized", "residual"
    )


#: DECIMAL(38,0)-exact moment sum cast to double (ols2_fit twin) —
#: squared-cents products overflow BIGINT, decimal sums cannot.
def _msum(e: str) -> str:
    return f"CAST(SUM(CAST({e} AS DECIMAL(38,0))) AS DOUBLE)"


@register(
    "ols2_quantity_price_discount",
    # Two-regressor OLS per return flag: 9 decimal-exact moment sums,
    # Cramer solve in one double chain, betas ROUND 6.
    f"""WITH m AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 {_msum('CAST(FLOOR(l_extendedprice) AS BIGINT)')} AS s1,
                 {_msum('CAST(FLOOR(l_discount * 10000e0 + 5e-1) AS BIGINT)')} AS s2,
                 {_msum('CAST(l_quantity AS BIGINT)')} AS sy,
                 {_msum('CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS DECIMAL(38,0))')} AS s11,
                 {_msum('CAST(CAST(FLOOR(l_discount * 10000e0 + 5e-1) AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(FLOOR(l_discount * 10000e0 + 5e-1) AS BIGINT) AS DECIMAL(38,0))')} AS s22,
                 {_msum('CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(FLOOR(l_discount * 10000e0 + 5e-1) AS BIGINT) AS DECIMAL(38,0))')} AS s12,
                 {_msum('CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))')} AS s1y,
                 {_msum('CAST(CAST(FLOOR(l_discount * 10000e0 + 5e-1) AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))')} AS s2y
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_rows,
               CASE WHEN (n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                         - (n * s12 - s1 * s2) * (n * s12 - s1 * s2) > 0e0
                    THEN ROUND(((n * s1y - s1 * sy) * (n * s22 - s2 * s2)
                                - (n * s2y - s2 * sy) * (n * s12 - s1 * s2))
                               / ((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                                  - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)),
                               6) + 0e0 END AS beta1,
               CASE WHEN (n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                         - (n * s12 - s1 * s2) * (n * s12 - s1 * s2) > 0e0
                    THEN ROUND(((n * s2y - s2 * sy) * (n * s11 - s1 * s1)
                                - (n * s1y - s1 * sy) * (n * s12 - s1 * s2))
                               / ((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                                  - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)),
                               6) + 0e0 END AS beta2,
               CASE WHEN (n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                         - (n * s12 - s1 * s2) * (n * s12 - s1 * s2) > 0e0
                    THEN ROUND((sy - (((n * s1y - s1 * sy) * (n * s22 - s2 * s2)
                                - (n * s2y - s2 * sy) * (n * s12 - s1 * s2))
                               / ((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                                  - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)))
                               * s1
                               - (((n * s2y - s2 * sy) * (n * s11 - s1 * s1)
                                - (n * s1y - s1 * sy) * (n * s12 - s1 * s2))
                               / ((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                                  - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)))
                               * s2) / n, 6) + 0e0 END AS intercept
        FROM m""",
)
def ols2_quantity_price_discount(spark, sf_dir):
    """Two-regressor OLS (operators/analysis.ols2_fit): quantity on
    (whole-dollar price, discount basis points) per return flag — the
    multivariate extension of the grouped OLS/corr family. Nine
    decimal-exact moment sums (squared-cents products exceed BIGINT;
    DECIMAL(38,0) cannot overflow), one Cramer-rule double chain per
    group, ROUND 6. One shuffle, map-side partials, no join."""
    li = read_table(spark, sf_dir, "lineitem")
    return analysis_ols2(li)


def analysis_ols2(li):
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    x1 = F.floor(F.col("l_extendedprice")).cast("bigint")
    x2 = F.floor(F.col("l_discount") * 10000.0 + F.lit(0.5)).cast("bigint")
    y = F.col("l_quantity").cast("bigint")
    return analysis.ols2_fit(li, ["l_returnflag"], y, x1, x2)


@register(
    "trimmed_mean_order_totals",
    # 10% two-sided trim by ROW_NUMBER rank over cents, decimal-exact
    # mean of the survivors (equal values interchangeable at the cut).
    """WITH c AS (
          SELECT o_orderpriority,
                 CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT) AS v
          FROM orders
        ), r AS (
          SELECT o_orderpriority, v,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY v) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM c
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(v) AS DOUBLE)
                   / CAST(NULLIF(COUNT(v), 0) AS DOUBLE) AS trimmed_mean
        FROM r
        WHERE rn > (n * 1) // 10
          AND rn <= n - (n * 1) // 10
        GROUP BY o_orderpriority""",
)
def trimmed_mean_order_totals(spark, sf_dir):
    """10% two-sided trimmed mean (operators/analysis.trimmed_mean) of
    order totals per priority — the robust location estimate between
    mean and median. Rank-based integer cut over exact cents (ties are
    interchangeable: the survivor SUM is identical whichever equal
    values survive), exact-BIGINT-sum mean (single rounding on both
    engines — see operators/analysis.trimmed_mean on why dmean's
    decimal accumulator diverges past 2^53); one shuffle + one window
    on the same key."""
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    return analysis.trimmed_mean(o, ["o_orderpriority"], cents, trim_frac=0.1)


@register(
    "hhi_nation_supplier_revenue",
    # Supplier-revenue concentration per nation: HHI from two exact
    # DECIMAL(38,0) sums, one division — no rounding.
    """WITH sr AS (
          SELECT s_nationkey,
                 l_suppkey,
                 SUM(CAST(FLOOR(l_extendedprice * 100e0 + 5e-1) AS BIGINT))
                     AS rev_c
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY s_nationkey, l_suppkey
        )
        SELECT s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_entities,
               CASE WHEN CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DOUBLE) > 0e0
                    THEN CAST(SUM(CAST(rev_c AS DECIMAL(38,0))
                                  * CAST(rev_c AS DECIMAL(38,0)))
                              AS DOUBLE)
                         / (CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DOUBLE)
                            * CAST(SUM(CAST(rev_c AS DECIMAL(38,0)))
                                   AS DOUBLE)) END AS hhi
        FROM sr GROUP BY s_nationkey""",
)
def hhi_nation_supplier_revenue(spark, sf_dir):
    """Herfindahl-Hirschman supplier-revenue concentration per nation
    (operators/analysis.hhi): Σ share² from exact integer-cents revenue
    — the market-concentration audit (1/n = perfectly split, 1 =
    monopoly). Two aggregations (per-supplier revenue, then per-nation
    HHI), both shuffling only aggregate-sized data; the single division
    of decimal-exact sums needs no rounding."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    sr = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(cents).alias("rev_c"))
    )
    return analysis.hhi(sr, ["s_nationkey"], F.col("rev_c"))


@register(
    "gini_customer_balance",
    # Gini over positive balances per nation: value-level counts,
    # triangular rank-block sums (all DECIMAL(38,0)-exact), one fixed
    # double chain — deterministic, no rounding.
    """WITH pos AS (
          SELECT c_nationkey,
                 CAST(FLOOR(c_acctbal * 100e0 + 5e-1) AS BIGINT) AS v
          FROM customer WHERE c_acctbal > 0e0
        ), vc AS (
          SELECT c_nationkey, v, CAST(COUNT(*) AS BIGINT) AS c
          FROM pos GROUP BY c_nationkey, v
        ), r AS (
          SELECT c_nationkey, v, c,
                 COALESCE(SUM(c) OVER (PARTITION BY c_nationkey ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS b
          FROM vc
        ), g AS (
          SELECT c_nationkey,
                 CAST(SUM(CAST(v AS DECIMAL(38,0))
                          * CAST(c * b + (c * (c + 1)) // 2
                                 AS DECIMAL(38,0))) AS DOUBLE) AS si,
                 CAST(SUM(CAST(v AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
                      AS DOUBLE) AS t,
                 CAST(SUM(c) AS DOUBLE) AS n
          FROM r GROUP BY c_nationkey
        )
        SELECT c_nationkey, CAST(n AS BIGINT) AS n_entities,
               CASE WHEN t > 0e0
                    THEN 2e0 * si / (n * t) - (n + 1e0) / n END AS gini
        FROM g""",
)
def gini_customer_balance(spark, sf_dir):
    """Gini inequality coefficient of positive customer balances per
    nation (operators/analysis.gini) — the concentration audit for any
    value distribution. No row-level global sort: value-level counts +
    a per-group window over distinct values turn the classic sorted-
    rank formula into exact triangular-number arithmetic
    (Σ i·x_(i) = Σ_v v·(c·b + c(c+1)/2)); everything is
    DECIMAL(38,0)-exact until one final double chain."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    c = read_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    cents = F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("bigint")
    return analysis.gini(c, ["c_nationkey"], cents)


#: deterministic A/B arm: md5 bucket parity on the customer key
_ARM = ("(CAST(('0x' || substr(md5('ab:' || CAST(o_custkey AS VARCHAR)), 1, 7)) "
        "AS BIGINT) % 10000) % 2 = 0")


@register(
    "welch_ab_order_totals",
    # Welch two-sample t per priority between hash-assigned arms: six
    # conditional DECIMAL(38,0)-exact sums in ONE aggregation, fixed
    # double chain, t ROUND 6 (+0e0 kills -0.0).
    f"""WITH c AS (
          SELECT o_orderpriority,
                 {_ARM} AS treat,
                 CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT) AS v
          FROM orders
        ), m AS (
          SELECT o_orderpriority,
                 CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS DOUBLE) AS nt,
                 CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS DOUBLE) AS nc,
                 CAST(SUM(CASE WHEN treat THEN CAST(v AS DECIMAL(38,0))
                               ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS st,
                 CAST(SUM(CASE WHEN NOT treat THEN CAST(v AS DECIMAL(38,0))
                               ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS sc,
                 CAST(SUM(CASE WHEN treat THEN CAST(v AS DECIMAL(38,0))
                                    * CAST(v AS DECIMAL(38,0))
                               ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS qt,
                 CAST(SUM(CASE WHEN NOT treat THEN CAST(v AS DECIMAL(38,0))
                                    * CAST(v AS DECIMAL(38,0))
                               ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS qc
          FROM c GROUP BY o_orderpriority
        )
        SELECT o_orderpriority,
               CAST(nt AS BIGINT) AS n_treat,
               CAST(nc AS BIGINT) AS n_control,
               CASE WHEN nt > 0e0 THEN st / nt END AS mean_treat,
               CASE WHEN nc > 0e0 THEN sc / nc END AS mean_control,
               CASE WHEN nt > 1e0 AND nc > 1e0
                         AND (qt - st * st / nt) / (nt - 1e0) / nt
                             + (qc - sc * sc / nc) / (nc - 1e0) / nc > 0e0
                    THEN ROUND((st / nt - sc / nc)
                               / SQRT((qt - st * st / nt) / (nt - 1e0) / nt
                                      + (qc - sc * sc / nc) / (nc - 1e0) / nc),
                               6) + 0e0 END AS t_stat
        FROM m""",
)
def welch_ab_order_totals(spark, sf_dir):
    """Welch's unequal-variance two-sample t per order priority
    (operators/analysis.welch_t) between deterministically hash-assigned
    A/B arms on the customer key — the experiment-readout aggregate
    (expected ~0 here: the split is random by construction, which is
    itself the A/A sanity check an experimentation pipeline runs). Six
    conditional decimal-exact moment sums in one aggregation — no
    self-join, no second pass; t ROUND 6."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    o = read_table(spark, sf_dir, "orders")
    arm = sampling.hash_bucket(F.col("o_custkey"), salt="ab") % 2 == 0
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    return analysis.welch_t(o, ["o_orderpriority"], arm, cents)


@register(
    "twap_supplier_price",
    # Gap-weighted TWAP: cents x day-gaps are exact DECIMAL(38,0)
    # sums; one division. Last observation carries no weight (no next).
    f"""WITH c AS ({_CLOSE_CTE}),
        g AS (
          SELECT l_suppkey, close,
                 date_diff('day', day,
                           LEAD(day) OVER (PARTITION BY l_suppkey
                                           ORDER BY day)) AS dt
          FROM c
        )
        SELECT l_suppkey,
               CAST(SUM(CAST(dt AS BIGINT)) AS BIGINT) AS span_days,
               CAST(SUM(CAST(close * dt AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(SUM(CAST(dt AS DECIMAL(38,0))) AS DOUBLE) / 100e0
                   AS twap
        FROM g WHERE dt IS NOT NULL AND dt > 0
        GROUP BY l_suppkey""",
)
def twap_supplier_price(spark, sf_dir):
    """Time-weighted average price per supplier (the TWAP execution
    benchmark, complement of vwap_supplier_price): each daily close is
    weighted by the number of days it 'stood' (gap to the next
    observation — calendar holes weight their last print, the standard
    step-function integral). Exact cents x integer day-gaps summed as
    DECIMAL(38,0), one division — no rounding. One aggregation + one
    keyed window + one re-aggregation."""
    from pyspark.sql import Window

    c = _daily_close(spark, sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy("day")
    g = c.select(
        "l_suppkey",
        "close",
        F.datediff(F.lead("day").over(w), F.col("day")).alias("dt"),
    ).filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
    dec = "decimal(38,0)"
    return g.groupBy("l_suppkey").agg(
        F.sum(F.col("dt").cast("bigint")).cast("bigint").alias("span_days"),
        (
            F.sum((F.col("close") * F.col("dt")).cast(dec)).cast("double")
            / F.sum(F.col("dt").cast(dec)).cast("double")
            / F.lit(100.0)
        ).alias("twap"),
    )


@register(
    "amihud_illiquidity_supplier",
    # Amihud ILLIQ = mean(|daily price move| / daily volume): each
    # ratio is one exact IEEE division (cents int / volume int); the
    # mean of float ratios is the one order-dependent float sum in the
    # corpus convention -> ROUND 6 like stddev/corr.
    f"""WITH c AS ({_CLOSE_VOL_CTE}),
        d AS (
          SELECT l_suppkey,
                 ABS(close - LAG(close) OVER (PARTITION BY l_suppkey
                                              ORDER BY day)) AS mv,
                 vol
          FROM c
        )
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(SUM(CAST(mv AS DOUBLE) / CAST(vol AS DOUBLE))
                     / COUNT(*), 6) AS illiq
        FROM d WHERE mv IS NOT NULL AND vol > 0
        GROUP BY l_suppkey""",
)
def amihud_illiquidity_supplier(spark, sf_dir):
    """Amihud illiquidity per supplier: the mean of |daily close move| /
    daily volume — the classic price-impact-per-unit-flow measure. Each
    day's ratio is a single exact IEEE division of integers; the final
    mean is the corpus's one genuinely order-dependent float sum, so
    ROUND 6 per the stddev/corr convention (error ~1e-13 relative over
    thousands of same-scale terms). One aggregation + one keyed window
    + one re-aggregation."""
    from pyspark.sql import Window

    c = _daily_close(spark, sf_dir, with_volume=True)
    w = Window.partitionBy("l_suppkey").orderBy("day")
    d = c.select(
        "l_suppkey",
        F.abs(F.col("close") - F.lag("close").over(w)).alias("mv"),
        "vol",
    ).filter(F.col("mv").isNotNull() & (F.col("vol") > 0))
    return d.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.sum(F.col("mv").cast("double") / F.col("vol").cast("double"))
            / F.count(F.lit(1)),
            6,
        ).alias("illiq"),
    )


@register(
    "cohort_ltv_curve",
    # Cumulative revenue-per-customer by cohort age: exact cents sums,
    # integer DIV week ages, one division at the end.
    """WITH first AS (
          SELECT o_custkey, MIN(o_orderdate) AS cohort
          FROM orders GROUP BY o_custkey
        ), sizes AS (
          SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM first GROUP BY cohort
        ), aged AS (
          SELECT f.cohort,
                 date_diff('day', f.cohort, o.o_orderdate) // 7 AS age_weeks,
                 CAST(FLOOR(o.o_totalprice * 100e0 + 5e-1) AS BIGINT) AS cents
          FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
        ), agg AS (
          SELECT cohort, age_weeks,
                 CAST(SUM(cents) AS BIGINT) AS week_rev_c
          FROM aged GROUP BY cohort, age_weeks
        )
        SELECT a.cohort, CAST(a.age_weeks AS BIGINT) AS age_weeks,
               s.cohort_size,
               CAST(SUM(a.week_rev_c) OVER (PARTITION BY a.cohort
                    ORDER BY a.age_weeks
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST(s.cohort_size AS DOUBLE) / 100e0
                   AS cum_ltv_per_customer
        FROM agg a JOIN sizes s USING (cohort)""",
)
def cohort_ltv_curve(spark, sf_dir):
    """Cohort lifetime-value curve: cumulative revenue per customer by
    acquisition cohort (first-order date) and age in weeks — the
    retention economics complement of retention_weekly_cohorts. The
    cumulative window runs over the PRE-AGGREGATED (cohort, age) table
    (bounded by cohorts x ages, never fact rows); revenue is exact
    integer cents until one division by the cohort size. Two shuffles
    (per-customer first-date, per-(cohort, age) rollup) + one bounded
    window."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    aged = o.join(first, "o_custkey").select(
        "cohort",
        F.expr("datediff(o_orderdate, cohort) DIV 7").alias("age_weeks"),
        cents.alias("cents"),
    )
    agg = aged.groupBy("cohort", "age_weeks").agg(
        F.sum("cents").cast("bigint").alias("week_rev_c")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = agg.join(F.broadcast(sizes), "cohort")
    return j.select(
        "cohort",
        F.col("age_weeks").cast("bigint").alias("age_weeks"),
        "cohort_size",
        (
            F.sum("week_rev_c").over(w).cast("double")
            / F.col("cohort_size").cast("double")
            / F.lit(100.0)
        ).alias("cum_ltv_per_customer"),
    )


def _rfm_bin_sql(metric: str) -> str:
    """Per-metric equal-frequency quintile CTE pair (mlfeat
    .equal_frequency_bins twin): strict-below counts over distinct
    values, integer floor division against the shared `tot` CTE."""
    return f"""vc_{metric} AS (
          SELECT {metric} AS v, COUNT(*) AS c FROM rfm GROUP BY 1
        ), b_{metric} AS (
          SELECT v,
                 CAST((COALESCE(SUM(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) * 5) // (SELECT total FROM tot) AS INT)
                     AS {metric}_bin
          FROM vc_{metric}
        )"""


@register(
    "rfm_segmentation",
    # R/F/M per customer (exact ints) -> three independent
    # equal-frequency quintiles -> composite code. All integer
    # arithmetic; no rounding anywhere.
    f"""WITH g AS (SELECT MAX(o_orderdate) AS mx FROM orders),
        rfm AS (
          SELECT o_custkey,
                 date_diff('day', MAX(o_orderdate), g.mx) AS r,
                 CAST(COUNT(*) AS BIGINT) AS f,
                 CAST(SUM(CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT))
                      AS BIGINT) AS m
          FROM orders, g GROUP BY o_custkey, g.mx
        ),
        tot AS (SELECT COUNT(*) AS total FROM rfm),
        {_rfm_bin_sql('r')},
        {_rfm_bin_sql('f')},
        {_rfm_bin_sql('m')}
        SELECT o_custkey, CAST(r AS BIGINT) AS r, f, m,
               CAST(4 - r_bin AS INT) AS r_score, f_bin, m_bin,
               CAST((4 - r_bin) * 100 + f_bin * 10 + m_bin AS INT) AS rfm_code
        FROM rfm
        JOIN b_r ON rfm.r = b_r.v
        JOIN b_f ON rfm.f = b_f.v
        JOIN b_m ON rfm.m = b_m.v""",
)
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: recency (days since last order vs the
    dataset horizon), frequency (order count), monetary (exact cents
    total), each cut into exact equal-frequency quintiles
    (operators/mlfeat.equal_frequency_bins applied three times) and
    composed into the classic 3-digit RFM code — the recency digit is
    INVERTED from its raw bin (r_score = 4 - bin) so that, per the RFM
    convention, higher means more recent and a high code means a
    recently-active, frequent, high-value customer. Everything is
    integer arithmetic — bins are bit-identical cross-engine; the
    per-customer aggregate runs first and the global max date attaches
    to its tiny result, so the fact table shuffles once with no
    constant column along for the ride."""
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    mx = o.agg(F.max("o_orderdate").alias("__mx"))
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum(cents).cast("bigint").alias("m"),
    )
    rfm = per_cust.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.datediff(F.col("__mx"), F.col("__last")).alias("r"),
        "f",
        "m",
    )
    out = mlfeat.equal_frequency_bins(rfm, "r", 5, out="r_bin")
    out = mlfeat.equal_frequency_bins(out, "f", 5, out="f_bin")
    out = mlfeat.equal_frequency_bins(out, "m", 5, out="m_bin")
    r_score = (F.lit(4) - F.col("r_bin")).cast("int")
    return out.select(
        "o_custkey",
        F.col("r").cast("bigint").alias("r"),
        "f",
        "m",
        r_score.alias("r_score"),
        "f_bin",
        "m_bin",
        (
            r_score * F.lit(100) + F.col("f_bin") * F.lit(10) + F.col("m_bin")
        ).cast("int").alias("rfm_code"),
    )


#: fixed priority domain — terms add in THIS literal order on both
#: engines, so the chi-square sum is a fixed IEEE chain (no float-sum
#: order dependence, no rounding).
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _chi2_term_sql(i: int) -> str:
    return (
        f"(CAST(c{i} AS DOUBLE) - CAST(y AS DOUBLE) * CAST(p{i} AS DOUBLE)"
        f" / CAST(n AS DOUBLE))"
        f" * (CAST(c{i} AS DOUBLE) - CAST(y AS DOUBLE) * CAST(p{i} AS DOUBLE)"
        f" / CAST(n AS DOUBLE))"
        f" / (CAST(y AS DOUBLE) * CAST(p{i} AS DOUBLE) / CAST(n AS DOUBLE))"
    )


@register(
    "chi2_priority_mix_by_year",
    # Per-year chi-square against the overall priority mix: all counts
    # exact integers; the 5 terms pivot to fixed columns and add
    # left-to-right in the same literal order on both engines.
    f"""WITH c AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
                 {', '.join(
                    f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' "
                    f"THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
                    for i, p in enumerate(_PRIORITIES))},
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM orders GROUP BY 1
        ), g AS (
          SELECT {', '.join(
                    f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' "
                    f"THEN 1 ELSE 0 END) AS BIGINT) AS p{i}"
                    for i, p in enumerate(_PRIORITIES))},
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM orders
        )
        SELECT yr, y AS n_orders,
               {' + '.join(_chi2_term_sql(i) for i in range(5))} AS chi2
        FROM c, g""",
)
def chi2_priority_mix_by_year(spark, sf_dir):
    """Chi-square mix-shift screen: does each year's order-priority
    distribution deviate from the overall mix? (The categorical drift
    monitor — complement of drift_doc_sources' total-variation
    distance.) Observed and expected counts are exact integers; the
    five (o-e)^2/e terms materialize as FIXED pivot columns and add in
    one literal left-to-right chain, so the statistic is
    bit-deterministic with NO rounding — a float SUM over exploded
    rows would be partial-aggregation-order-dependent. One conditional
    aggregation per side + a 1-row broadcast."""
    o = read_table(spark, sf_dir, "orders")

    def conds(alias_prefix):
        return [
            F.sum(
                F.when(F.col("o_orderpriority") == p, 1).otherwise(0)
            ).cast("bigint").alias(f"{alias_prefix}{i}")
            for i, p in enumerate(_PRIORITIES)
        ]

    per_year = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr")
    ).agg(*conds("c"), F.count(F.lit(1)).cast("bigint").alias("y"))
    glob = o.agg(*conds("p"), F.count(F.lit(1)).cast("bigint").alias("n"))
    j = per_year.crossJoin(F.broadcast(glob))
    nd = F.col("n").cast("double")
    chi2 = None
    for i in range(5):
        e = F.col("y").cast("double") * F.col(f"p{i}").cast("double") / nd
        d = F.col(f"c{i}").cast("double") - e
        term = d * d / e
        chi2 = term if chi2 is None else chi2 + term
    return j.select("yr", F.col("y").alias("n_orders"), chi2.alias("chi2"))


@register(
    "theilsen_weekly_revenue",
    # Pairwise slopes over exact integers (BIGINT cents diff / BIGINT
    # week diff -> one double division), median by a TOTAL-order rank
    # (slope, xa, xb) with integer-DIV middle positions — every step
    # cross-engine exact. Week index is integer floor-division of a
    # day diff from a fixed Monday, so both engines bucket identically.
    """WITH w AS (
          SELECT l_suppkey,
                 date_diff('day', DATE '1994-01-03',
                           CAST(date_trunc('week', l_shipdate) AS DATE))
                   // 7 AS wx,
                 SUM(CAST(FLOOR(l_extendedprice * 100e0 + 5e-1) AS BIGINT))
                   AS rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1996-01-01'
          GROUP BY 1, 2
        ), nw AS (
          SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_weeks
          FROM w GROUP BY 1
        ), p AS (
          SELECT a.l_suppkey, a.wx AS xa, b.wx AS xb,
                 CAST(b.rev - a.rev AS DOUBLE)
                   / CAST(b.wx - a.wx AS DOUBLE) AS s
          FROM w a JOIN w b
            ON a.l_suppkey = b.l_suppkey AND a.wx < b.wx
        ), r AS (
          SELECT l_suppkey, s,
                 ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                    ORDER BY s, xa, xb) AS rn,
                 COUNT(*) OVER (PARTITION BY l_suppkey) AS n
          FROM p
        ), m AS (
          SELECT l_suppkey, n, s
          FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        )
        SELECT m.l_suppkey, nw.n_weeks, CAST(MAX(n) AS BIGINT) AS n_pairs,
               CAST(SUM(s) / COUNT(*) AS DOUBLE) AS ts_slope
        FROM m JOIN nw ON m.l_suppkey = nw.l_suppkey
        GROUP BY m.l_suppkey, nw.n_weeks""",
)
def theilsen_weekly_revenue(spark, sf_dir):
    """Theil–Sen robust trend of 1995 weekly revenue per supplier
    (operators/analysis.theil_sen): median of pairwise slopes over
    calendar-bucketed points — the per-group pair count is bounded by
    the calendar (<= 52 weekly points -> <= 1326 pairs per supplier)
    REGARDLESS of raw data scale, which is what makes the quadratic
    pair generation safe at 100 TB. Revenue is exact integer cents;
    the week index is an exact integer, so every slope is one double
    division both engines compute bit-identically."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    wk = li.groupBy(
        "l_suppkey",
        F.expr(
            "datediff(CAST(date_trunc('week', l_shipdate) AS DATE), "
            "DATE'1994-01-03') DIV 7"
        ).alias("__wx"),
    ).agg(
        F.sum(
            F.expr("CAST(FLOOR(l_extendedprice * 100e0 + 5e-1) AS BIGINT)")
        ).alias("__rev")
    )
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    ts = analysis.theil_sen(wk, ["l_suppkey"], "__wx", "__rev", out="ts_slope")
    n_weeks = wk.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weeks")
    )
    return ts.join(n_weeks, "l_suppkey").select(
        "l_suppkey", "n_weeks", "n_pairs", "ts_slope"
    )


#: 2× the average (midrank) tie rank — exact integer; cnt_le (RANGE
#: frame) + rank() share one window (operators/analysis._double_rank).
def _r2(part: str, order: str) -> str:
    return (
        f"COUNT(*) OVER (PARTITION BY {part} ORDER BY {order} RANGE BETWEEN "
        f"UNBOUNDED PRECEDING AND CURRENT ROW) "
        f"+ RANK() OVER (PARTITION BY {part} ORDER BY {order})"
    )


@register(
    "spearman_quantity_price_supplier",
    # Exact-integer double-midranks, DECIMAL(38,0) moment sums, one
    # fixed double chain, ROUND 6, -0.0 normalized (ols2 conventions).
    f"""WITH b AS (
          SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS q,
                 CAST(FLOOR(l_extendedprice * 100e0 + 5e-1) AS BIGINT) AS c
          FROM lineitem
        ), r AS (
          SELECT l_suppkey,
                 {_r2('l_suppkey', 'q')} AS rx,
                 {_r2('l_suppkey', 'c')} AS ry
          FROM b
        ), g AS (
          SELECT l_suppkey,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 {_msum('rx')} AS sx,
                 {_msum('ry')} AS sy,
                 {_msum('CAST(rx AS DECIMAL(38,0)) * CAST(ry AS DECIMAL(38,0))')} AS sxy,
                 {_msum('CAST(rx AS DECIMAL(38,0)) * CAST(rx AS DECIMAL(38,0))')} AS sxx,
                 {_msum('CAST(ry AS DECIMAL(38,0)) * CAST(ry AS DECIMAL(38,0))')} AS syy
          FROM r GROUP BY 1
        )
        SELECT l_suppkey, CAST(n AS BIGINT) AS n_rows,
               CASE WHEN n * sxx - sx * sx > 0e0 AND n * syy - sy * sy > 0e0
                    THEN ROUND((n * sxy - sx * sy)
                               / sqrt((n * sxx - sx * sx)
                                      * (n * syy - sy * sy)), 6) + 0e0
               END AS rho
        FROM g""",
)
def spearman_quantity_price_supplier(spark, sf_dir):
    """Spearman rank correlation of (quantity, price cents) per supplier
    (operators/analysis.spearman_rho) — the monotone-association twin of
    grouped_corr: outlier/scale-immune because it correlates exact
    integer double-midranks (2× avg tie rank), not values. One shuffle
    on the supplier key, two in-partition sorts, DECIMAL(38,0)-exact
    moments, ROUND 6."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    li = read_table(spark, sf_dir, "lineitem")
    return analysis.spearman_rho(
        li,
        ["l_suppkey"],
        F.col("l_quantity").cast("bigint"),
        F.expr("CAST(FLOOR(l_extendedprice * 100e0 + 5e-1) AS BIGINT)"),
    )


@register(
    "mwu_order_totals_priority",
    # All inputs exact integers from ONE ranked pass: 2×midranks, the
    # tie term summed row-wise as t²−1, then a single fixed double
    # chain for z (ROUND 6); U itself is exact (halves of integers).
    f"""WITH b AS (
          SELECT c_mktsegment,
                 CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT) AS v,
                 o_orderpriority IN ('1-URGENT', '2-HIGH') AS g
          FROM orders JOIN customer ON o_custkey = c_custkey
        ), r AS (
          SELECT c_mktsegment, g,
                 {_r2('c_mktsegment', 'v')} AS r2,
                 COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY v
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
                 - (RANK() OVER (PARTITION BY c_mktsegment ORDER BY v)
                    - 1) AS t
          FROM b
        ), a AS (
          SELECT c_mktsegment,
                 CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1i,
                 {_msum("CASE WHEN g THEN CAST(r2 AS DECIMAL(38,0)) "
                        "ELSE CAST(0 AS DECIMAL(38,0)) END")} AS r1x2,
                 {_msum('CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) '
                        '- CAST(1 AS DECIMAL(38,0))')} AS tcorr
          FROM r GROUP BY 1
        )
        SELECT c_mktsegment, n1i AS n_treat,
               CAST(cnt - n1i AS BIGINT) AS n_control,
               (r1x2 - CAST(n1i AS DOUBLE) * (CAST(n1i AS DOUBLE) + 1.0))
                 / 2.0 AS u_stat,
               CASE WHEN n1i > 0 AND n1i < cnt
                         AND (CAST(n1i AS DOUBLE)
                              * (CAST(cnt AS DOUBLE) - CAST(n1i AS DOUBLE))
                              / 12.0)
                             * ((CAST(cnt AS DOUBLE) + 1.0)
                                - tcorr / (CAST(cnt AS DOUBLE)
                                           * (CAST(cnt AS DOUBLE) - 1.0)))
                             > 0e0
                    THEN ROUND(((r1x2 - CAST(n1i AS DOUBLE)
                                   * (CAST(n1i AS DOUBLE) + 1.0))
                                - CAST(n1i AS DOUBLE)
                                  * (CAST(cnt AS DOUBLE)
                                     - CAST(n1i AS DOUBLE)))
                               / (2.0 * sqrt((CAST(n1i AS DOUBLE)
                                    * (CAST(cnt AS DOUBLE)
                                       - CAST(n1i AS DOUBLE)) / 12.0)
                                   * ((CAST(cnt AS DOUBLE) + 1.0)
                                      - tcorr / (CAST(cnt AS DOUBLE)
                                          * (CAST(cnt AS DOUBLE) - 1.0))))),
                               6) + 0e0
               END AS z_stat
        FROM a""",
)
def mwu_order_totals_priority(spark, sf_dir):
    """Mann–Whitney U per market segment: do URGENT/HIGH-priority orders
    have stochastically larger totals (operators/analysis.
    mann_whitney_u)? The rank-based two-sample test beside
    welch_ab_order_totals — whole-distribution, outlier-immune, with
    the exact tie correction. One ranked pass, one aggregation."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    return analysis.mann_whitney_u(
        j,
        ["c_mktsegment"],
        F.expr("CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT)"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
    )


@register(
    "km_reorder_survival",
    # Integer durations (day gaps, censored at 60), exact at-risk
    # counts; survival is exp of the running ln-sum of exact-integer
    # ratios, ROUND 6 (inherently-floating chain), extinction pinned
    # to 0 before any ln(0) can evaluate.
    """WITH r AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders
        ), g AS (
          SELECT o_custkey,
                 MAX(CASE WHEN rn = 1 THEN od END) AS d1,
                 MAX(CASE WHEN rn = 2 THEN od END) AS d2
          FROM r WHERE rn <= 2 GROUP BY 1
        ), s AS (
          SELECT CASE WHEN d2 IS NOT NULL
                           AND date_diff('day', d1, d2) <= 60
                      THEN date_diff('day', d1, d2) ELSE 60 END AS t,
                 CASE WHEN d2 IS NOT NULL
                           AND date_diff('day', d1, d2) <= 60
                      THEN 1 ELSE 0 END AS e
          FROM g
        ), per_t AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c,
                 CAST(SUM(e) AS BIGINT) AS n_events
          FROM s GROUP BY 1
        ), risked AS (
          SELECT t, n_events,
                 CAST(SUM(c) OVER ()
                      - COALESCE(SUM(c) OVER (ORDER BY t ROWS BETWEEN
                            UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS n_risk
          FROM per_t
        ), ev AS (SELECT * FROM risked WHERE n_events > 0),
        curve AS (
          SELECT t, n_risk, n_events,
                 MAX(CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ext,
                 SUM(CASE WHEN n_events < n_risk
                          THEN ln(CAST(n_risk - n_events AS DOUBLE)
                                  / CAST(n_risk AS DOUBLE))
                          ELSE 0e0 END)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS lsum
          FROM ev
        )
        SELECT t, n_risk, n_events,
               ROUND(CASE WHEN ext = 1 THEN 0e0 ELSE exp(lsum) END, 6)
                 + 0e0 AS survival
        FROM curve""",
)
def km_reorder_survival(spark, sf_dir):
    """Kaplan–Meier curve of customer reorder latency
    (operators/analysis.km_survival): time from first to second order in
    days, right-censored at a 60-day horizon (single-order customers and
    slower reorders censor). Subjects reduce to per-duration counts
    FIRST; the global windows then run over <= 61 distinct durations —
    the caller-bounded cardinality the operator's scale contract
    requires. Survival = exp(running ln-sum of exact ratios), ROUND 6."""
    from pyspark.sql import Window

    from financial_data_lakehouse_pipeline__spark.operators import analysis

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("__od"),
        F.row_number().over(w).alias("__rn"),
    ).filter(F.col("__rn") <= 2)
    g = r.groupBy("o_custkey").agg(
        F.max(F.when(F.col("__rn") == 1, F.col("__od"))).alias("__d1"),
        F.max(F.when(F.col("__rn") == 2, F.col("__od"))).alias("__d2"),
    )
    gap = F.datediff(F.col("__d2"), F.col("__d1"))
    ev = (gap.isNotNull()) & (gap <= 60)
    subj = g.select(
        F.when(ev, gap).otherwise(F.lit(60)).alias("__t"),
        F.when(ev, F.lit(1)).otherwise(F.lit(0)).alias("__e"),
    )
    return analysis.km_survival(subj, F.col("__t"), F.col("__e"))


@register(
    "decision_stump_quantity_returns",
    # Exact integer class counts at every candidate split; the Gini
    # chain is fixed-order double math (identical cross-engine), so
    # ordering by raw gain is deterministic; ties broken by smallest
    # threshold; gain ROUND 6 only on output.
    """WITH per_v AS (
          SELECT l_linestatus, CAST(l_quantity AS BIGINT) AS v,
                 CAST(COUNT(*) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS BIGINT) AS p
          FROM lineitem GROUP BY 1, 2
        ), cum AS (
          SELECT l_linestatus, v,
                 SUM(c) OVER (PARTITION BY l_linestatus ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS nl,
                 SUM(p) OVER (PARTITION BY l_linestatus ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS pl,
                 SUM(c) OVER (PARTITION BY l_linestatus) AS n,
                 SUM(p) OVER (PARTITION BY l_linestatus) AS pt
          FROM per_v
        ), d AS (
          SELECT l_linestatus, v, nl, pl,
                 CAST(n - nl AS BIGINT) AS nri, CAST(pt - pl AS BIGINT) AS pri,
                 CAST(nl AS DOUBLE) AS nld, CAST(pl AS DOUBLE) AS pld,
                 CAST(n AS DOUBLE) AS nd, CAST(pt AS DOUBLE) AS pd
          FROM cum WHERE n > nl
        ), gset AS (
          SELECT l_linestatus, v, nl, pl, nri, pri, nld, pld, nd, pd,
                 nd - nld AS nrd, pd - pld AS prd
          FROM d
        ), scored AS (
          SELECT l_linestatus, v, nl, pl, nri, pri,
                 (1e0 - (pd / nd) * (pd / nd)
                      - ((nd - pd) / nd) * ((nd - pd) / nd))
                 - (nld * (1e0 - (pld / nld) * (pld / nld)
                               - ((nld - pld) / nld) * ((nld - pld) / nld))
                    + nrd * (1e0 - (prd / nrd) * (prd / nrd)
                                 - ((nrd - prd) / nrd) * ((nrd - prd) / nrd)))
                   / nd AS gain
          FROM gset
        )
        SELECT l_linestatus, v AS threshold,
               CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
               nri AS n_right, pri AS pos_right,
               ROUND(gain, 6) + 0e0 AS gain
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_linestatus
                                           ORDER BY gain DESC, v) AS rn
              FROM scored)
        WHERE rn = 1""",
)
def decision_stump_quantity_returns(spark, sf_dir):
    """Exact best-split decision stump per line status: the quantity
    threshold best separating returned lineitems
    (operators/analysis.decision_stump) — the per-feature split search
    at the heart of distributed tree learners, evaluated over
    per-distinct-value class counts (<= 50 candidates per group however
    large the fact). Deterministic: integer counts, fixed-order Gini
    chain, smallest-threshold tie-break."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    li = read_table(spark, sf_dir, "lineitem")
    return analysis.decision_stump(
        li,
        ["l_linestatus"],
        F.col("l_quantity"),
        F.col("l_returnflag") == "R",
    )


@register(
    "mi_segment_priority",
    # Exact contingency counts; both margins are window sums over the
    # joint table (the fact is scanned once); the ln-term sum is the
    # one inherently-floating step -> ROUND 6.
    """WITH joint AS (
          SELECT c_mktsegment AS x, o_orderpriority AS y,
                 CAST(COUNT(*) AS BIGINT) AS nxy
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment IS NOT NULL
            AND o_orderpriority IS NOT NULL
          GROUP BY 1, 2
        ), m AS (
          SELECT nxy,
                 SUM(nxy) OVER (PARTITION BY x) AS nx,
                 SUM(nxy) OVER (PARTITION BY y) AS ny,
                 SUM(nxy) OVER () AS n
          FROM joint
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               ROUND(SUM((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
                         * ln((CAST(n AS DOUBLE) * CAST(nxy AS DOUBLE))
                              / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))),
                     6) + 0e0 AS mi_nats
        FROM m""",
)
def mi_segment_priority(spark, sf_dir):
    """Mutual information (nats) between customer market segment and
    order priority (operators/analysis.mutual_information) — the
    symmetric dependence readout beside chi2_priority_mix_by_year.
    Joint contingency in one shuffle; margins via window sums over the
    25-cell table; ln-sum ROUND 6."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    return analysis.mutual_information(
        j, F.col("c_mktsegment"), F.col("o_orderpriority")
    )


@register(
    "lift_curve_orders",
    # Bin twin = the equal_freq_bins integer arithmetic; counts exact;
    # pos_rate and lift are each ONE IEEE division of exact (<2^53)
    # integer products — bit-identical, no ROUND.
    """WITH lab AS (
          SELECT o_orderkey, o_totalprice,
                 CASE WHEN EXISTS (SELECT 1 FROM lineitem l
                                   WHERE l.l_orderkey = o_orderkey
                                     AND l.l_returnflag = 'R')
                      THEN 1 ELSE 0 END AS y
          FROM orders
        ), vc AS (
          SELECT o_totalprice AS v, COUNT(*) AS c FROM lab GROUP BY 1
        ), rk AS (
          SELECT v,
                 COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below,
                 SUM(c) OVER () AS total
          FROM vc
        ), bins AS (
          SELECT v, CAST((below * 10) // total AS INT) AS decile FROM rk
        ), d AS (
          SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS positives
          FROM lab JOIN bins ON lab.o_totalprice = bins.v
          GROUP BY 1
        ), g AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nn,
                 CAST(SUM(positives) AS BIGINT) AS pp
          FROM d
        )
        SELECT decile, n, positives,
               CAST(positives AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
               (CAST(positives AS DOUBLE) * CAST(nn AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(pp AS DOUBLE)) AS lift
        FROM d, g""",
)
def lift_curve_orders(spark, sf_dir):
    """Decile lift curve for 'order value predicts returns': orders
    bucketed into value deciles by the guarded
    operators/mlfeat.equal_frequency_bins (distinct-value histogram —
    never a global row sort, unlike NTILE), label = order contains a
    returned lineitem; per decile the positive rate and lift vs the
    base rate — the calibration readout every ranking/quality model
    ships with. Counts exact; rate and lift are single IEEE divisions
    of exact integer products."""
    from financial_data_lakehouse_pipeline__spark.operators import mlfeat

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    r = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("__r", F.lit(1))
    )
    lab = o.join(r, "o_orderkey", "left").select(
        "o_orderkey",
        "o_totalprice",
        F.coalesce(F.col("__r"), F.lit(0)).alias("y"),
    )
    b = mlfeat.equal_frequency_bins(lab, "o_totalprice", 10, out="decile")
    d = b.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("positives"),
    )
    g = d.agg(
        F.sum("n").cast("bigint").alias("__nn"),
        F.sum("positives").cast("bigint").alias("__pp"),
    )
    return d.crossJoin(F.broadcast(g)).select(
        "decile",
        "n",
        "positives",
        (F.col("positives").cast("double") / F.col("n").cast("double")).alias(
            "pos_rate"
        ),
        (
            (F.col("positives").cast("double") * F.col("__nn").cast("double"))
            / (F.col("n").cast("double") * F.col("__pp").cast("double"))
        ).alias("lift"),
    )


@register(
    "auc_returns_by_priority",
    # Rank-based AUC twin: 2xmidranks from the shared _r2 window pair,
    # S and class counts exact integers, ONE IEEE division at the end.
    f"""WITH lab AS (
          SELECT o_orderpriority AS pri,
                 CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT) AS v,
                 EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o_orderkey
                           AND l.l_returnflag = 'R') AS y
          FROM orders
        ), r AS (
          SELECT pri, y, {_r2('pri', 'v')} AS dr FROM lab
        ), g AS (
          SELECT pri,
                 CAST(SUM(CASE WHEN y THEN dr ELSE 0 END) AS BIGINT) AS s,
                 CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                 CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
          FROM r GROUP BY pri
        )
        SELECT pri, n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 CAST(s - n_pos * (n_pos + 1) AS DOUBLE)
                   / (2e0 * CAST(n_pos * n_neg AS DOUBLE))
               END AS auc
        FROM g""",
)
def auc_returns_by_priority(spark, sf_dir):
    """Per-priority ROC AUC of 'order value predicts a return'
    (operators/analysis.roc_auc) — the rank-based Mann-Whitney AUC:
    no threshold sweep, one ranked pass per group, exact integers up
    to a single final division. Cents-integer scores (the corpus
    money discipline) keep the ranking itself exact."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("__r", F.lit(True))
    )
    lab = o.join(r, "o_orderkey", "left").select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.coalesce(F.col("__r"), F.lit(False)).alias("y"),
    )
    return analysis.roc_auc(lab, ["pri"], F.col("cents"), F.col("y"))


@register(
    "hbos_outlier_orders",
    # Same integer bin arithmetic per feature (exact cross-engine
    # membership), exact bin counts, ln-sum ROUND 6.
    """WITH f AS (
          SELECT o_orderkey,
                 CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT)
                   AS cents,
                 CAST(datediff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS BIGINT) AS day
          FROM orders
        ),
        s1 AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM f),
        s2 AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM f),
        b AS (
          SELECT o_orderkey,
                 (cents - s1.mn) * 10 // (s1.mx - s1.mn + 1) AS b1,
                 (day - s2.mn) * 10 // (s2.mx - s2.mn + 1) AS b2
          FROM f, s1, s2
        ),
        h1 AS (SELECT b1, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY b1),
        h2 AS (SELECT b2, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY b2),
        m1 AS (SELECT MAX(c) AS cm FROM h1),
        m2 AS (SELECT MAX(c) AS cm FROM h2)
        SELECT b.o_orderkey,
               ROUND(ln(CAST(m1.cm AS DOUBLE) / CAST(h1.c AS DOUBLE))
                     + ln(CAST(m2.cm AS DOUBLE) / CAST(h2.c AS DOUBLE)), 6)
                 + 0e0 AS hbos
        FROM b JOIN h1 USING (b1) JOIN h2 USING (b2), m1, m2""",
)
def hbos_outlier_orders(spark, sf_dir):
    """HBOS anomaly scores over orders (operators/analysis.hbos_scores,
    10 bins, features = price cents + order-day number): per row the
    sum over features of ln(max_bin/bin) — rows in sparse bins on both
    axes score high. Linear-time, no distance computations; bins are
    exact integer arithmetic, ln-sum ROUND 6. The fact table never
    shuffles (1-row stats + <=10-row histograms broadcast back)."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("bigint")
        .alias("day"),
    )
    out = analysis.hbos_scores(o, ["cents", "day"], n_bins=10)
    return out.select(
        "o_orderkey", (F.round("hbos", 6) + F.lit(0.0)).alias("hbos")
    )


@register(
    "did_asia_pricing",
    # One conditional-aggregation pass; cents sums exact BIGINT; each
    # mean one IEEE division; DiD a fixed subtraction chain — no ROUND.
    """WITH b AS (
          SELECT (r_name = 'ASIA') AS t,
                 (CAST(o_orderdate AS DATE) >= DATE '1995-01-01') AS p,
                 CAST(FLOOR(o_totalprice * 100e0 + 5e-1) AS BIGINT) AS v
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        ), g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN NOT t AND NOT p THEN v ELSE 0 END)
                      AS BIGINT) AS s_pre_c,
                 CAST(SUM(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_pre_c,
                 CAST(SUM(CASE WHEN NOT t AND p THEN v ELSE 0 END)
                      AS BIGINT) AS s_post_c,
                 CAST(SUM(CASE WHEN NOT t AND p THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_post_c,
                 CAST(SUM(CASE WHEN t AND NOT p THEN v ELSE 0 END)
                      AS BIGINT) AS s_pre_t,
                 CAST(SUM(CASE WHEN t AND NOT p THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_pre_t,
                 CAST(SUM(CASE WHEN t AND p THEN v ELSE 0 END)
                      AS BIGINT) AS s_post_t,
                 CAST(SUM(CASE WHEN t AND p THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_post_t
          FROM b
        )
        SELECT n,
               CASE WHEN n_pre_c > 0 THEN CAST(s_pre_c AS DOUBLE)
                    / CAST(n_pre_c AS DOUBLE) END AS pre_c_mean,
               CASE WHEN n_post_c > 0 THEN CAST(s_post_c AS DOUBLE)
                    / CAST(n_post_c AS DOUBLE) END AS post_c_mean,
               CASE WHEN n_pre_t > 0 THEN CAST(s_pre_t AS DOUBLE)
                    / CAST(n_pre_t AS DOUBLE) END AS pre_t_mean,
               CASE WHEN n_post_t > 0 THEN CAST(s_post_t AS DOUBLE)
                    / CAST(n_post_t AS DOUBLE) END AS post_t_mean,
               ((CASE WHEN n_post_t > 0 THEN CAST(s_post_t AS DOUBLE)
                      / CAST(n_post_t AS DOUBLE) END)
                - (CASE WHEN n_pre_t > 0 THEN CAST(s_pre_t AS DOUBLE)
                        / CAST(n_pre_t AS DOUBLE) END))
               - ((CASE WHEN n_post_c > 0 THEN CAST(s_post_c AS DOUBLE)
                        / CAST(n_post_c AS DOUBLE) END)
                  - (CASE WHEN n_pre_c > 0 THEN CAST(s_pre_c AS DOUBLE)
                          / CAST(n_pre_c AS DOUBLE) END)) AS did
        FROM g""",
)
def did_asia_pricing(spark, sf_dir):
    """Difference-in-differences on order value (cents): ASIA customers
    (treated) vs the rest, pre/post 1995-01-01
    (operators/analysis.diff_in_diff) — the parallel-trends causal
    readout beside event_study. One conditional-aggregation pass over
    the enriched fact; exact integer cells, single-division means,
    fixed subtraction chain (no ROUND)."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    j = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
    )
    return analysis.diff_in_diff(
        j,
        F.col("r_name") == "ASIA",
        F.col("o_orderdate").cast("date") >= F.lit("1995-01-01").cast("date"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)),
    )
