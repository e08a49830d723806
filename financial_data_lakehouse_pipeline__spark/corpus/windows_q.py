"""Corpus: window functions (SURVEY.md §2.5 W1-W6 + ranking/cumsum
extensions). Every window uses a TOTAL order (unique tiebreakers) so
row-frame results are deterministic across engines and partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.corpus import register, sql_money_sum
from financial_data_lakehouse_pipeline__spark.functions import guarded_div, money_sum
from financial_data_lakehouse_pipeline__spark.operators import cleaning, windows
from financial_data_lakehouse_pipeline__spark.sources import read_table

# Total order for lineitem windows partitioned by supplier. The synthetic
# lineitem is NOT unique on (orderkey, linenumber) — at sf0.1 one supplier
# has two rows sharing (shipdate, orderkey, linenumber) — so the value
# columns join the ordering: any remaining ties are rows identical in
# every referenced column, whose swap cannot change any output.
_LI_ORDER = (
    "ORDER BY l_shipdate, l_orderkey, l_linenumber, "
    "l_extendedprice, l_quantity, l_partkey"
)
_LI_WIN = f"PARTITION BY l_suppkey {_LI_ORDER}"
_LI_ORDER_COLS = [
    "l_shipdate",
    "l_orderkey",
    "l_linenumber",
    "l_extendedprice",
    "l_quantity",
    "l_partkey",
]
_DEC = "decimal(30,6)"


@register(
    "dedup_keep_latest",
    """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
       FROM events
       QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) = 1""",
)
def dedup_keep_latest(spark, sf_dir):
    """W1/A10: keep-latest dedup via row_number (reference dc:70-72)."""
    ev = read_table(spark, sf_dir, "events")
    out = cleaning.dedup_keep_latest(
        ev,
        ["user_id", "event_type"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    )
    return out.select("user_id", "event_type", "event_id", "ts", "value")


#: 2-decimal money contract → exact scaled-integer window sums
#: (functions.money_sum rationale; ~4× cheaper than decimal frames).
#: e0-notation literals stay DOUBLE in both engines (a 100.0 literal
#: parses as DECIMAL in SQL and would shift the arithmetic type).
_CENTS = "CAST(FLOOR(l_extendedprice * 100e0 + 5e-1) AS BIGINT)"


@register(
    "rolling_sma",
    f"""SELECT l_suppkey, l_orderkey, l_linenumber,
               (SUM({_CENTS}) OVER w7 / 100e0) / (COUNT(*) OVER w7) AS sma_7,
               (SUM({_CENTS}) OVER w20 / 100e0) / (COUNT(*) OVER w20) AS sma_20
        FROM lineitem
        WINDOW w7 AS ({_LI_WIN} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
               w20 AS ({_LI_WIN} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""",
)
def rolling_sma(spark, sf_dir):
    """W2: rolling means over row frames (reference SMA-7/20, dt:162-178).
    Partial windows at series start aggregate fewer rows (pinned).

    The mean is an exact scaled-integer sum / count, unrounded: windowed
    double AVG sums in engine-specific order (Spark sequential frame
    buffer vs DuckDB segment tree), so only exact accumulation makes the
    quotient bit-identical — the r1 rounding-tie class of failures.
    Integer cents (2-decimal price contract) beat decimal frames ~4×."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.rolling_agg(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        {
            "__s7": (F.sum(cents), 7),
            "__c7": (F.count(F.lit(1)), 7),
            "__s20": (F.sum(cents), 20),
            "__c20": (F.count(F.lit(1)), 20),
        },
    )
    return out.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        ((F.col("__s7") / F.lit(100.0)) / F.col("__c7")).alias("sma_7"),
        ((F.col("__s20") / F.lit(100.0)) / F.col("__c20")).alias("sma_20"),
    )


@register(
    "rolling_bollinger",
    # ±2σ from EXACT integer window moments (Σc, Σc², n over cents):
    # var = (nΣc² - (Σc)²) / (n(n-1)) with an exact integer numerator,
    # then ONE correctly-rounded int→double conversion, sqrt, and the
    # band arithmetic — a fixed IEEE chain, bit-identical cross-engine,
    # so NO ROUND anywhere. (Until round 11 the bands used the engines'
    # native STDDEV_SAMP behind ROUND 4; the sf1 full-corpus run found
    # 1 of 6M windows where the two engines' accumulations straddled a
    # .00005 rounding boundary.)
    f"""WITH t AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                 l_extendedprice, l_quantity, l_partkey,
                 {_CENTS} AS cents
          FROM lineitem
        ),
        m AS (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 SUM(cents) OVER w20 AS s1,
                 SUM(cents * cents) OVER w20 AS s2,
                 COUNT(*) OVER w20 AS n
          FROM t
          WINDOW w20 AS ({_LI_WIN} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               (s1 / 100e0) / n AS bb_middle,
               (s1 / 100e0) / n
                 + 2 * (CASE WHEN n > 1 THEN
                     sqrt((n * s2 - s1 * s1) / (n * (n - 1e0))) / 100e0
                   END) AS bb_upper,
               (s1 / 100e0) / n
                 - 2 * (CASE WHEN n > 1 THEN
                     sqrt((n * s2 - s1 * s1) / (n * (n - 1e0))) / 100e0
                   END) AS bb_lower
        FROM m""",
)
def rolling_bollinger(spark, sf_dir):
    """W3: rolling stddev bands (reference Bollinger, dt:181-184).
    Middle AND bands are bit-identical cross-engine: the rolling
    variance comes from exact scaled-integer window moments (sum,
    sum-of-squares, count over cents — all BIGINT-exact; 20-row windows
    of <=1e7-cent prices keep nΣc² under 2^56), collapsed to a double
    through one correctly-rounded conversion + sqrt. No native
    stddev_samp, no ROUND — the sf1 run showed engine-native stddev
    accumulation order can straddle any rounding boundary at enough
    windows."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.rolling_agg(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        {
            "__s": (F.sum(cents), 20),
            "__s2": (F.sum(cents * cents), 20),
            "__c": (F.count(F.lit(1)), 20),
        },
    )
    s1, s2, c = F.col("__s"), F.col("__s2"), F.col("__c")
    mid = (s1 / F.lit(100.0)) / c
    sd = F.when(
        c > 1, F.sqrt((c * s2 - s1 * s1) / (c * (c - F.lit(1.0)))) / F.lit(100.0)
    )
    return out.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        mid.alias("bb_middle"),
        (mid + 2 * sd).alias("bb_upper"),
        (mid - 2 * sd).alias("bb_lower"),
    )


@register(
    "rsi_supplier_price",
    f"""WITH d AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                 l_extendedprice, l_quantity, l_partkey,
                 {_CENTS} - LAG({_CENTS}) OVER ({_LI_WIN}) AS delta
          FROM lineitem
        ),
        g AS (
          SELECT *,
                 CASE WHEN delta > 0 THEN delta
                      WHEN delta IS NOT NULL THEN 0 END AS gain,
                 CASE WHEN delta < 0 THEN -delta
                      WHEN delta IS NOT NULL THEN 0 END AS loss
          FROM d
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CASE WHEN SUM(gain) OVER w14 + SUM(loss) OVER w14 = 0 THEN NULL
                    ELSE 100e0 * SUM(gain) OVER w14
                         / (SUM(gain) OVER w14 + SUM(loss) OVER w14) END
                   AS rsi_14
        FROM g
        WINDOW w14 AS ({_LI_WIN} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""",
)
def rsi_supplier_price(spark, sf_dir):
    """RSI-14 (Cutler) per supplier price series — extends the reference's
    indicator set (dt:162-228) with the next-most-standard oscillator.
    Exact integer gain/loss sums over cents; single double division
    (bit-identical cross-engine, no ROUND)."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.rsi(li, ["l_suppkey"], _LI_ORDER_COLS, cents, n=14, out="rsi_14")
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "rsi_14")


#: Shared CTE: lineitem with the scaled-integer price alongside every
#: window-ordering column (the indicator oracles below all start here).
_CENTS_CTE = f"""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                l_extendedprice, l_quantity, l_partkey, {_CENTS} AS c
         FROM lineitem"""


@register(
    "stochastic_supplier_price",
    f"""WITH c AS ({_CENTS_CTE}),
        k AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                 l_extendedprice, l_quantity, l_partkey,
                 CASE WHEN MAX(c) OVER w14 <> MIN(c) OVER w14
                      THEN 100e0 * (c - MIN(c) OVER w14)
                           / (MAX(c) OVER w14 - MIN(c) OVER w14) END AS pct_k
          FROM c
          WINDOW w14 AS ({_LI_WIN} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT l_suppkey, l_orderkey, l_linenumber, pct_k,
               ROUND(AVG(pct_k) OVER w3, 4) AS pct_d
        FROM k
        WINDOW w3 AS ({_LI_WIN} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
)
def stochastic_supplier_price(spark, sf_dir):
    """Stochastic %K/%D-3 per supplier price series (operators/
    windows.stochastic). %K is exact — integer rolling extremes, one
    double division, no ROUND; %D-3 is a 3-row float mean and keeps
    ROUND 4 (the Bollinger stddev contract)."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.stochastic(li, ["l_suppkey"], _LI_ORDER_COLS, cents, n=14, d=3)
    return out.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "pct_k",
        F.round("pct_d", 4).alias("pct_d"),
    )


@register(
    "obv_supplier_volume",
    f"""WITH c AS ({_CENTS_CTE}),
        d AS (
          SELECT *, c - LAG(c) OVER ({_LI_WIN}) AS delta FROM c
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CASE WHEN delta > 0 THEN CAST(l_quantity AS BIGINT)
                             WHEN delta < 0 THEN -CAST(l_quantity AS BIGINT)
                             ELSE 0 END)
                    OVER ({_LI_WIN} ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS obv
        FROM d""",
)
def obv_supplier_volume(spark, sf_dir):
    """On-balance volume per supplier (operators/windows.obv): quantity
    signed by the price-delta direction, accumulated. All-BIGINT — exact,
    no float contract (l_quantity is integral 1..50 in the testdata)."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.obv(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        cents,
        F.col("l_quantity").cast("bigint"),
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "obv")


@register(
    "drawdown_supplier_price",
    f"""WITH c AS ({_CENTS_CTE})
        SELECT l_suppkey, l_orderkey, l_linenumber,
               MAX(c) OVER wmax / 100e0 AS peak_price,
               CAST(c - MAX(c) OVER wmax AS DOUBLE) / MAX(c) OVER wmax
                   AS drawdown
        FROM c
        WINDOW wmax AS ({_LI_WIN} ROWS UNBOUNDED PRECEDING)""",
)
def drawdown_supplier_price(spark, sf_dir):
    """Drawdown from the running price peak per supplier (operators/
    windows.drawdown). Integer running max; peak/100 and the drawdown
    ratio are one IEEE division each — bit-identical, no ROUND."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.drawdown(li, ["l_suppkey"], _LI_ORDER_COLS, cents)
    return out.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.col("peak") / F.lit(100.0)).alias("peak_price"),
        "drawdown",
    )


@register(
    "vwap_supplier_price",
    f"""WITH c AS ({_CENTS_CTE})
        SELECT l_suppkey, l_orderkey, l_linenumber,
               (SUM(c * CAST(l_quantity AS BIGINT)) OVER wc
                / CAST(SUM(CAST(l_quantity AS BIGINT)) OVER wc AS DOUBLE))
                   / 100e0 AS vwap
        FROM c
        WINDOW wc AS ({_LI_WIN} ROWS UNBOUNDED PRECEDING)""",
)
def vwap_supplier_price(spark, sf_dir):
    """Cumulative VWAP per supplier (operators/windows.vwap): both
    running sums are exact BIGINT (cents × integral quantity), the
    quotient one double division — bit-identical, no ROUND."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.vwap(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        cents,
        F.col("l_quantity").cast("bigint"),
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "vwap")


@register(
    "rolling_corr_price_qty",
    f"""WITH c AS ({_CENTS_CTE}),
        s AS (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(COUNT(*) OVER w14 AS DOUBLE) AS n,
                 CAST(SUM(c) OVER w14 AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w14 AS DOUBLE) AS sy,
                 CAST(SUM(c * CAST(l_quantity AS BIGINT)) OVER w14 AS DOUBLE)
                     AS sxy,
                 CAST(SUM(c * c) OVER w14 AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                      OVER w14 AS DOUBLE) AS syy
          FROM c
          WINDOW w14 AS ({_LI_WIN} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                    THEN (n * sxy - sx * sy)
                         / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) END
                   AS corr_14
        FROM s""",
)
def rolling_corr_price_qty(spark, sf_dir):
    """Rolling 14-row price-quantity correlation per supplier
    (operators/windows.rolling_corr): exact BIGINT co-moment sums, then
    one fixed double expression tree — bit-identical cross-engine with
    zero tolerance (windowed builtin CORR is NOT reproducible)."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.rolling_corr(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        cents,
        F.col("l_quantity").cast("bigint"),
        n=14,
        out="corr_14",
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "corr_14")


@register(
    "lag_momentum",
    f"""SELECT l_suppkey, l_orderkey, l_linenumber,
               CASE WHEN LAG(l_extendedprice, 1) OVER ({_LI_WIN}) IS NOT NULL
                     AND LAG(l_extendedprice, 1) OVER ({_LI_WIN}) <> 0
                    THEN (l_extendedprice - LAG(l_extendedprice, 1) OVER ({_LI_WIN}))
                         * 100.0 / LAG(l_extendedprice, 1) OVER ({_LI_WIN}) END
                   AS momentum_1,
               CASE WHEN LAG(l_extendedprice, 5) OVER ({_LI_WIN}) IS NOT NULL
                     AND LAG(l_extendedprice, 5) OVER ({_LI_WIN}) <> 0
                    THEN (l_extendedprice - LAG(l_extendedprice, 5) OVER ({_LI_WIN}))
                         * 100.0 / LAG(l_extendedprice, 5) OVER ({_LI_WIN}) END
                   AS momentum_5
        FROM lineitem""",
)
def lag_momentum(spark, sf_dir):
    """W4: lag + percent-change momentum (reference dt:194-217).
    Unrounded: lag + row-wise arithmetic is bit-identical across engines."""
    li = read_table(spark, sf_dir, "lineitem")
    out = windows.momentum(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        "l_extendedprice",
        [1, 5],
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "momentum_1", "momentum_5")


@register(
    "lead_forward_returns",
    f"""SELECT l_suppkey, l_orderkey, l_linenumber,
               CASE WHEN l_extendedprice <> 0 THEN
                    (LEAD(l_extendedprice, 1) OVER ({_LI_WIN}) - l_extendedprice)
                    * 100.0 / l_extendedprice END AS fwd_return_1,
               CASE WHEN l_extendedprice <> 0 THEN
                    (LEAD(l_extendedprice, 3) OVER ({_LI_WIN}) - l_extendedprice)
                    * 100.0 / l_extendedprice END AS fwd_return_3
        FROM lineitem""",
)
def lead_forward_returns(spark, sf_dir):
    """W5: lead + multi-horizon forward returns (reference sa:138-150).
    Unrounded — row-wise doubles are engine-identical."""
    li = read_table(spark, sf_dir, "lineitem")
    out = windows.forward_returns(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        "l_extendedprice",
        [1, 3],
    )
    return out.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "fwd_return_1", "fwd_return_3"
    )


@register(
    "relative_quantity",
    f"""SELECT l_suppkey, l_orderkey, l_linenumber,
               CASE WHEN AVG(l_quantity) OVER w IS NOT NULL
                     AND AVG(l_quantity) OVER w <> 0
                    THEN l_quantity / AVG(l_quantity) OVER w END AS relative_qty
        FROM lineitem
        WINDOW w AS ({_LI_WIN} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""",
)
def relative_quantity(spark, sf_dir):
    """W6: value relative to its rolling mean (reference relative_volume
    dt:223-228). Unrounded: l_quantity values are integral, so the
    windowed double sum is exact in ANY accumulation order and the ratio
    is bit-identical across engines."""
    li = read_table(spark, sf_dir, "lineitem")
    out = windows.relative_to_rolling(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        "l_quantity",
        20,
        "relative_qty",
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "relative_qty")


@register(
    "rank_orders_by_status",
    """SELECT o_orderstatus, o_orderkey,
              ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                 ORDER BY o_totalprice DESC, o_orderkey) AS row_number,
              RANK() OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice DESC, o_orderkey) AS rank,
              DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                 ORDER BY o_totalprice DESC, o_orderkey) AS dense_rank
       FROM orders""",
)
def rank_orders_by_status(spark, sf_dir):
    """Ranking family (engine extension beyond reference's row_number)."""
    o = read_table(spark, sf_dir, "orders")
    out = windows.ranked(
        o,
        ["o_orderstatus"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        ["row_number", "rank", "dense_rank"],
    )
    return out.select(
        "o_orderstatus", "o_orderkey", "row_number", "rank", "dense_rank"
    )


@register(
    "running_customer_total",
    f"""SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_total,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS order_seq
        FROM orders""",
)
def running_customer_total(spark, sf_dir):
    """Cumulative (running) aggregate — exact decimal accumulation keeps
    the running total order-independent across engines."""
    o = read_table(spark, sf_dir, "orders")
    # The window must attach to the Sum itself (a Cast root would leave the
    # Sum un-windowed → MISSING_GROUP_BY), so cast to double AFTER windowing.
    out = windows.cumulative(
        o,
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        {
            "running_total": F.sum(F.col("o_totalprice").cast(_DEC)),
            "order_seq": F.row_number(),
        },
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.col("running_total").cast("double").alias("running_total"),
        "order_seq",
    )


@register(
    "range_frame_revenue",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
              (SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000e0 + 5e-1)
                        AS BIGINT)) OVER w / 10000e0) AS rev_7d,
              CAST(COUNT(*) OVER w AS BIGINT) AS n_7d
       FROM lineitem
       WINDOW w AS (PARTITION BY l_suppkey
                    ORDER BY datediff('day', DATE '1992-01-01',
                                      CAST(l_shipdate AS DATE))
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""",
)
def range_frame_revenue(spark, sf_dir):
    """Calendar-correct 7-DAY rolling revenue via a RANGE frame keyed on a
    day number — fixes the reference's silent assumption that row frames
    equal calendar windows (SURVEY.md §2.5 note: row-based SMA frames
    assume gap-free trading days). Ties on the same day all join the
    frame, so no tiebreaker ordering is needed for determinism."""
    li = read_table(spark, sf_dir, "lineitem")
    day_num = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
    )
    rev_scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0 + F.lit(0.5)
    ).cast("bigint")
    out = windows.rolling_range_agg(
        li.withColumn("__day", day_num),
        ["l_suppkey"],
        F.col("__day"),
        {
            "__rev": (F.sum(rev_scaled), 7),
            "n_7d": (F.count(F.lit(1)), 7),
        },
    )
    return out.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.col("__rev") / F.lit(10000.0)).alias("rev_7d"),
        F.col("n_7d").cast("bigint").alias("n_7d"),
    )


@register(
    "ema_supplier_price",
    # The per-key linear recurrence replayed as a recursive CTE with the
    # SAME operation order (alpha*v + (1-alpha)*prev), so every step is
    # bit-identical to the applyInPandas loop.
    # base is MATERIALIZED: the recursive part references it once per
    # iteration, and without the hint DuckDB re-evaluates the window scan
    # every iteration (measured 6.3s -> 1.8s at sf0.01).
    f"""WITH RECURSIVE base AS MATERIALIZED (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(l_extendedprice AS DOUBLE) AS v,
                 ROW_NUMBER() OVER ({_LI_WIN}) AS rn
          FROM lineitem
        ), r AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, rn, v AS ema
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.l_suppkey, b.l_orderkey, b.l_linenumber, b.rn,
                 (2.0 / 13.0) * b.v + (1.0 - 2.0 / 13.0) * r.ema
          FROM base b JOIN r ON b.l_suppkey = r.l_suppkey AND b.rn = r.rn + 1
        )
        SELECT l_suppkey, l_orderkey, l_linenumber, ema AS ema_12 FROM r""",
)
def ema_supplier_price(spark, sf_dir):
    """True recursive EMA via applyInPandas (SURVEY.md §7.3 hard part —
    the reference fakes EMA with an SMA, dt:176-178). span=12 →
    alpha = 2/13. The explicit-loop recurrence makes a recursive-CTE
    oracle exact; also pinned against an independent reimplementation in
    tests/test_operators.py."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", *_LI_ORDER_COLS)
    out = windows.ema(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        "l_extendedprice",
        span=12,
        out="ema_12",
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "ema_12")


@register(
    "macd_supplier_price",
    # One recursive CTE advances all three recurrences (fast EMA, slow
    # EMA, signal) together — the same operation order as the single
    # applyInPandas loop, so every step is bit-identical. base is
    # MATERIALIZED (recursive arm re-evaluates it per iteration otherwise).
    f"""WITH RECURSIVE base AS MATERIALIZED (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(l_extendedprice AS DOUBLE) AS v,
                 ROW_NUMBER() OVER ({_LI_WIN}) AS rn
          FROM lineitem
        ), r AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, rn,
                 v AS ema_f, v AS ema_s, CAST(0.0 AS DOUBLE) AS sig
          FROM base WHERE rn = 1
          UNION ALL
          SELECT l_suppkey, l_orderkey, l_linenumber, rn, ef, es,
                 (2.0 / 10.0) * (ef - es) + (1.0 - 2.0 / 10.0) * sig
          FROM (
            SELECT b.l_suppkey, b.l_orderkey, b.l_linenumber, b.rn,
                   (2.0 / 13.0) * b.v + (1.0 - 2.0 / 13.0) * r.ema_f AS ef,
                   (2.0 / 27.0) * b.v + (1.0 - 2.0 / 27.0) * r.ema_s AS es,
                   r.sig AS sig
            FROM base b
            JOIN r ON b.l_suppkey = r.l_suppkey AND b.rn = r.rn + 1
          )
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               ema_f - ema_s AS macd, sig AS macd_signal,
               (ema_f - ema_s) - sig AS macd_hist
        FROM r""",
)
def macd_supplier_price(spark, sf_dir):
    """MACD(12,26,9) per supplier price series (operators/windows.macd):
    three recurrences in one grouped Arrow pass — single shuffle. The
    recursive-CTE oracle replays the identical operation order."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", *_LI_ORDER_COLS)
    out = windows.macd(
        li, ["l_suppkey"], _LI_ORDER_COLS, "l_extendedprice"
    )
    return out.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "macd", "macd_signal", "macd_hist"
    )


@register(
    "holt_linear_supplier_price",
    # Level + trend advance together in one recursive CTE with the SAME
    # operation order as the applyInPandas loop (alpha*v + (1-alpha)*
    # (l+b), then beta*(l'-l) + (1-beta)*b), so every step is
    # bit-identical. The one-step forecast (fit) is the PRIOR l+b.
    # base MATERIALIZED per the recursive-CTE convention.
    f"""WITH RECURSIVE base AS MATERIALIZED (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(l_extendedprice AS DOUBLE) AS v,
                 ROW_NUMBER() OVER ({_LI_WIN}) AS rn
          FROM lineitem
        ), r AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, rn,
                 v AS lev, CAST(0.0 AS DOUBLE) AS tr, v AS fit
          FROM base WHERE rn = 1
          UNION ALL
          SELECT l_suppkey, l_orderkey, l_linenumber, rn,
                 nl, 0.2 * (nl - lev) + (1.0 - 0.2) * tr, lev + tr
          FROM (
            SELECT b.l_suppkey, b.l_orderkey, b.l_linenumber, b.rn,
                   0.4 * b.v + (1.0 - 0.4) * (r.lev + r.tr) AS nl,
                   r.lev AS lev, r.tr AS tr
            FROM base b
            JOIN r ON b.l_suppkey = r.l_suppkey AND b.rn = r.rn + 1
          )
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               lev AS holt_level, tr AS holt_trend, fit AS holt_fit
        FROM r""",
)
def holt_linear_supplier_price(spark, sf_dir):
    """Holt double exponential smoothing (level + linear trend,
    alpha=0.4 beta=0.2) per supplier price series
    (operators/windows.holt_linear) — the forecasting recurrence one
    step beyond the EMA family: the trend state makes the one-step
    forecast follow ramps. Both recurrences in ONE grouped Arrow pass;
    the recursive-CTE oracle replays the identical operation order."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", *_LI_ORDER_COLS)
    out = windows.holt_linear(
        li, ["l_suppkey"], _LI_ORDER_COLS, "l_extendedprice", alpha=0.4, beta=0.2
    )
    return out.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        "holt_level", "holt_trend", "holt_fit",
    )


#: Daily OHLC bars per supplier — shared oracle CTE for the bar queries.
#: open/close via the order-encoded MIN/MAX (aggregates.ohlc): okey in
#: the high bits, cents in the low 24.
_OHLC_CTE = f"""c AS ({_CENTS_CTE}),
o AS (
  SELECT l_suppkey, l_shipdate AS day,
         MIN((l_orderkey * 10 + l_linenumber) * 16777216 + c) % 16777216
             AS open,
         MAX(c) AS high, MIN(c) AS low,
         MAX((l_orderkey * 10 + l_linenumber) * 16777216 + c) % 16777216
             AS close,
         CAST(COUNT(*) AS BIGINT) AS n_trades,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume
  FROM c GROUP BY l_suppkey, l_shipdate
)"""


def _daily_ohlc(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    okey = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    from financial_data_lakehouse_pipeline__spark.operators import aggregates as _agg

    return _agg.ohlc(
        li,
        ["l_suppkey", F.col("l_shipdate").alias("day")],
        okey,
        cents,
        volume=F.col("l_quantity").cast("bigint"),
    )


@register("ohlc_supplier_daily", f"WITH {_OHLC_CTE} SELECT * FROM o")
def ohlc_supplier_daily(spark, sf_dir):
    """Daily OHLC bars per supplier (operators/aggregates.ohlc): one
    hash aggregation; open/close from the order-encoded MIN/MAX — all
    BIGINT, exact, deterministic under okey ties (value rides the low
    bits)."""
    return _daily_ohlc(spark, sf_dir)


@register(
    "atr_supplier_daily",
    f"""WITH {_OHLC_CTE},
        t AS (
          SELECT l_suppkey, day, high, low, close,
                 LAG(close) OVER (PARTITION BY l_suppkey ORDER BY day) AS pc
          FROM o
        ),
        r AS (
          SELECT l_suppkey, day,
                 GREATEST(high - low,
                          COALESCE(ABS(high - pc), high - low),
                          COALESCE(ABS(low - pc), high - low)) AS tr
          FROM t
        )
        SELECT l_suppkey, day,
               CAST(SUM(tr) OVER w14 AS BIGINT) / COUNT(*) OVER w14 / 100e0
                   AS atr_14
        FROM r
        WINDOW w14 AS (PARTITION BY l_suppkey ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""",
)
def atr_supplier_daily(spark, sf_dir):
    """ATR-14 over the daily supplier bars (operators/windows.atr on
    aggregates.ohlc output): exact BIGINT true ranges (COALESCE'd first
    bar), one double division — bit-identical, no ROUND. `day` is unique
    per supplier, so the window order is total."""
    bars = _daily_ohlc(spark, sf_dir)
    out = windows.atr(bars, ["l_suppkey"], ["day"], n=14)
    return out.select(
        "l_suppkey", "day", (F.col("atr") / F.lit(100.0)).alias("atr_14")
    )


@register(
    "cross_sectional_daily_rank",
    f"""WITH g AS (
          SELECT l_shipdate AS day, l_suppkey,
                 CAST(SUM({_CENTS}) AS BIGINT) AS rev_cents
          FROM lineitem GROUP BY 1, 2
        )
        SELECT day, l_suppkey, rev_cents,
               RANK() OVER w AS rank,
               NTILE(10) OVER w AS ntile_10
        FROM g
        WINDOW w AS (PARTITION BY day ORDER BY rev_cents DESC, l_suppkey)""",
)
def cross_sectional_daily_rank(spark, sf_dir):
    """CROSS-SECTIONAL ranking: partition by DAY, rank suppliers by that
    day's revenue (operators/windows.ranked) — the orthogonal window
    orientation to every time-series indicator (momentum deciles,
    relative-strength leaders). Runs on the pre-aggregated daily table,
    so the rank shuffle moves groups, not lineitems; (rev DESC, suppkey)
    is a total order → rank and ntile deterministic."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    g = li.groupBy(
        F.col("l_shipdate").alias("day"), "l_suppkey"
    ).agg(F.sum(cents).alias("rev_cents"))
    out = windows.ranked(
        g,
        ["day"],
        [F.col("rev_cents").desc(), F.col("l_suppkey")],
        methods=("rank", "ntile_10"),
    )
    return out.select("day", "l_suppkey", "rev_cents", "rank", "ntile_10")


@register(
    "rolling_beta_price_qty",
    f"""WITH c AS ({_CENTS_CTE}),
        s AS (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(COUNT(*) OVER w14 AS DOUBLE) AS n,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w14 AS DOUBLE) AS sx,
                 CAST(SUM(c) OVER w14 AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity AS BIGINT) * c) OVER w14 AS DOUBLE)
                     AS sxy,
                 CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                      OVER w14 AS DOUBLE) AS sxx
          FROM c
          WINDOW w14 AS ({_LI_WIN} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CASE WHEN n * sxx - sx * sx > 0
                    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END
                   AS beta_14
        FROM s""",
)
def rolling_beta_price_qty(spark, sf_dir):
    """Rolling 14-row hedge ratio: OLS slope of price (cents) on quantity
    per supplier (operators/windows.rolling_beta) — exact BIGINT
    co-moments, one fixed double tree, bit-identical cross-engine."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.rolling_beta(
        li,
        ["l_suppkey"],
        _LI_ORDER_COLS,
        F.col("l_quantity").cast("bigint"),
        cents,
        n=14,
        out="beta_14",
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "beta_14")


@register(
    "pair_spread_z",
    f"""WITH {_OHLC_CTE},
        a AS (SELECT day, close AS close_a FROM o WHERE l_suppkey = 0),
        b AS (SELECT day, close AS close_b FROM o WHERE l_suppkey = 1),
        j AS (
          SELECT a.day, close_a, close_b, close_a - close_b AS spread
          FROM a JOIN b USING (day)
        ),
        s AS (
          SELECT day, close_a, close_b, spread,
                 CAST(COUNT(*) OVER w30 AS DOUBLE) AS n,
                 CAST(SUM(spread) OVER w30 AS DOUBLE) AS sv,
                 CAST(SUM(spread * spread) OVER w30 AS DOUBLE) AS svv
          FROM j
          WINDOW w30 AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
        )
        SELECT day, close_a, close_b, spread,
               CASE WHEN n > 1 AND (svv - sv * sv / n) / (n - 1e0) > 0
                    THEN (CAST(spread AS DOUBLE) - sv / n)
                         / SQRT((svv - sv * sv / n) / (n - 1e0)) END
                   AS spread_z
        FROM s""",
)
def pair_spread_z(spark, sf_dir):
    """Pairs-trading spread: align suppliers 0 and 1 by trading day
    (inner join of their daily OHLC closes), spread = close_a − close_b
    (exact cents), rolling 30-bar z-score of the spread via exact
    co-moment sums — the mean-reversion entry signal. The unpartitioned
    window is safe: it runs over the PAIR's aligned series (calendar-
    bounded), not the fact table; `day` is unique after the join."""
    from pyspark.sql import Window

    bars = _daily_ohlc(spark, sf_dir)
    a = bars.filter(F.col("l_suppkey") == 0).select(
        "day", F.col("close").alias("close_a")
    )
    b = bars.filter(F.col("l_suppkey") == 1).select(
        "day", F.col("close").alias("close_b")
    )
    j = a.join(b, "day").withColumn(
        "spread", F.col("close_a") - F.col("close_b")
    )
    # WindowExec single-partition WARN fires here BY DESIGN: the input
    # is the joined daily-bar curve — ONE row per calendar day after the
    # equi-join (calendar-bounded, ~2.5k rows/decade), never raw
    # lineitem rows. SCALE.md §5 documents the bound.
    w = Window.orderBy("day").rowsBetween(-29, 0)
    sp = F.col("spread")
    n = F.count(F.lit(1)).over(w).cast("double")
    sv = F.sum(sp).over(w).cast("double")
    svv = F.sum(sp * sp).over(w).cast("double")
    var = (svv - sv * sv / n) / (n - F.lit(1.0))
    z = F.when(
        (n > 1) & (var > 0), (sp.cast("double") - sv / n) / F.sqrt(var)
    )
    return j.select(
        "day", "close_a", "close_b", "spread", z.alias("spread_z")
    )


@register(
    "autocorr_supplier_price",
    f"""WITH c AS ({_CENTS_CTE}),
        p AS (
          SELECT l_suppkey, c AS y, LAG(c) OVER ({_LI_WIN}) AS x FROM c
        ),
        s AS (
          SELECT l_suppkey,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(x * y) AS DOUBLE) AS sxy,
                 CAST(SUM(x * x) AS DOUBLE) AS sxx,
                 CAST(SUM(y * y) AS DOUBLE) AS syy
          FROM p WHERE x IS NOT NULL GROUP BY l_suppkey
        )
        SELECT l_suppkey, n_pairs,
               CASE WHEN CAST(n_pairs AS DOUBLE) * sxx - sx * sx > 0
                     AND CAST(n_pairs AS DOUBLE) * syy - sy * sy > 0
                    THEN (CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
                         / (SQRT(CAST(n_pairs AS DOUBLE) * sxx - sx * sx)
                            * SQRT(CAST(n_pairs AS DOUBLE) * syy - sy * sy)) END
                   AS autocorr_1
        FROM s""",
)
def autocorr_supplier_price(spark, sf_dir):
    """Lag-1 autocorrelation of each supplier's price series
    (operators/analysis.autocorrelation) — the AR(1) mean-reversion /
    momentum-persistence diagnostic. Exact BIGINT co-moments over the
    (lag, current) pair series, one fixed double tree — bit-identical
    cross-engine, no ROUND."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    out = analysis.autocorrelation(
        li, ["l_suppkey"], _LI_ORDER_COLS, cents, lag=1, out="autocorr_1"
    )
    return out.select("l_suppkey", "n_pairs", "autocorr_1")


@register(
    "supplier_close_corr_matrix",
    f"""WITH {_OHLC_CTE},
        p AS (SELECT l_suppkey, day, close FROM o WHERE l_suppkey < 8),
        j AS (
          SELECT a.l_suppkey AS entity_a, b.l_suppkey AS entity_b,
                 a.close AS x, b.close AS y
          FROM p a JOIN p b ON a.day = b.day AND a.l_suppkey < b.l_suppkey
        ),
        s AS (
          SELECT entity_a, entity_b,
                 CAST(COUNT(*) AS BIGINT) AS n_obs,
                 CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(x * y) AS DOUBLE) AS sxy,
                 CAST(SUM(x * x) AS DOUBLE) AS sxx,
                 CAST(SUM(y * y) AS DOUBLE) AS syy
          FROM j GROUP BY 1, 2
        )
        SELECT entity_a, entity_b, n_obs,
               CASE WHEN CAST(n_obs AS DOUBLE) * sxx - sx * sx > 0
                     AND CAST(n_obs AS DOUBLE) * syy - sy * sy > 0
                    THEN (CAST(n_obs AS DOUBLE) * sxy - sx * sy)
                         / (SQRT(CAST(n_obs AS DOUBLE) * sxx - sx * sx)
                            * SQRT(CAST(n_obs AS DOUBLE) * syy - sy * sy)) END
                   AS corr
        FROM s""",
)
def supplier_close_corr_matrix(spark, sf_dir):
    """Pairwise correlation matrix of daily closes for suppliers 0-7
    (operators/analysis.pairwise_corr over aggregates.ohlc bars) — the
    cross-sectional pairs-screening matrix. Self-join on the DAY key
    over the pre-aggregated panel (never a cross join; at scale the
    join input is the universe × days, not the fact table). Exact
    BIGINT co-moments per pair, fixed double tree — bit-identical."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    bars = _daily_ohlc(spark, sf_dir).filter(F.col("l_suppkey") < 8)
    return analysis.pairwise_corr(bars, "l_suppkey", "day", F.col("close"))


@register(
    "ohlc_supplier_weekly",
    f"""WITH {_OHLC_CTE},
        w AS (
          SELECT l_suppkey,
                 CAST(FLOOR(datediff('day', DATE '1970-01-01', day) / 7e0)
                      AS BIGINT) AS week,
                 datediff('day', DATE '1970-01-01', day) AS ed,
                 open, high, low, close, n_trades, volume
          FROM o
        )
        SELECT l_suppkey, week,
               MIN(ed * 16777216 + open) % 16777216 AS open,
               MAX(high) AS high, MIN(low) AS low,
               MAX(ed * 16777216 + close) % 16777216 AS close,
               CAST(SUM(n_trades) AS BIGINT) AS n_trades,
               CAST(SUM(volume) AS BIGINT) AS volume
        FROM w GROUP BY 1, 2""",
)
def ohlc_supplier_weekly(spark, sf_dir):
    """Weekly OHLC bars resampled from the daily bars
    (operators/aggregates.ohlc_resample): open from the week's first
    day, close from its last (order-encoded MIN/MAX on the unique epoch
    day — no tie rules reachable), high/low/volume direct. Epoch-day//7
    week buckets (portable, wow_nation_revenue rationale). All BIGINT,
    exact; composes daily → weekly without re-reading lineitem."""
    from financial_data_lakehouse_pipeline__spark.operators import aggregates as agg

    bars = _daily_ohlc(spark, sf_dir)
    ed = F.datediff(F.col("day"), F.lit("1970-01-01"))
    week = F.floor(ed / F.lit(7.0))
    return agg.ohlc_resample(
        bars, ["l_suppkey", week.alias("week")], ed
    ).select(
        "l_suppkey", "week", "open", "high", "low", "close", "n_trades", "volume"
    )


@register(
    "donchian_supplier_price",
    f"""WITH {_OHLC_CTE}
        SELECT l_suppkey, day, close,
               MAX(high) OVER w AS donchian_upper,
               MIN(low) OVER w AS donchian_lower,
               CAST(MAX(high) OVER w + MIN(low) OVER w AS DOUBLE) / 2
                   AS donchian_mid,
               CAST(close >= MAX(high) OVER w AS BIGINT) AS new_high,
               CAST(close <= MIN(low) OVER w AS BIGINT) AS new_low
        FROM o
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY day
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""",
)
def donchian_supplier_price(spark, sf_dir):
    """Donchian-20 channel over the daily supplier bars
    (operators/windows.donchian on aggregates.ohlc output): exact
    BIGINT channel extremes, integer breakout predicates, one double
    division for the midline — bit-identical, no ROUND. Shares the one
    (supplier, day) shuffle + sort across all three frames."""
    bars = _daily_ohlc(spark, sf_dir)
    out = windows.donchian(bars, ["l_suppkey"], ["day"], n=20)
    return out.select(
        "l_suppkey",
        "day",
        "close",
        "donchian_upper",
        "donchian_lower",
        "donchian_mid",
        F.col("new_high").cast("bigint").alias("new_high"),
        F.col("new_low").cast("bigint").alias("new_low"),
    )


@register(
    "ichimoku_supplier_price",
    f"""WITH {_OHLC_CTE},
        m AS (
          SELECT l_suppkey, day, close,
                 CAST(MAX(high) OVER w9 + MIN(low) OVER w9 AS DOUBLE) / 2
                     AS tenkan,
                 CAST(MAX(high) OVER w26 + MIN(low) OVER w26 AS DOUBLE) / 2
                     AS kijun,
                 CAST(MAX(high) OVER w52 + MIN(low) OVER w52 AS DOUBLE) / 2
                     AS mid52
          FROM o
          WINDOW
            w9 AS (PARTITION BY l_suppkey ORDER BY day
                   ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
            w26 AS (PARTITION BY l_suppkey ORDER BY day
                    ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
            w52 AS (PARTITION BY l_suppkey ORDER BY day
                    ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
        )
        SELECT l_suppkey, day, tenkan, kijun,
               LAG((tenkan + kijun) / 2, 26) OVER wo AS senkou_a,
               LAG(mid52, 26) OVER wo AS senkou_b,
               LEAD(close, 26) OVER wo AS chikou
        FROM m
        WINDOW wo AS (PARTITION BY l_suppkey ORDER BY day)""",
)
def ichimoku_supplier_price(spark, sf_dir):
    """Ichimoku cloud over the daily supplier bars
    (operators/windows.ichimoku): three midpoint frames + two offsets
    in ONE (supplier, day) shuffle + sort. Midpoints are exact-BIGINT
    extremes with one double division each; span A is a fixed-order
    double expression — bit-identical cross-engine, no ROUND. Spans /
    chikou are NULL until the 26-bar offset exists (both engines)."""
    bars = _daily_ohlc(spark, sf_dir)
    out = windows.ichimoku(bars, ["l_suppkey"], ["day"])
    return out.select(
        "l_suppkey", "day", "tenkan", "kijun", "senkou_a", "senkou_b", "chikou"
    )


@register(
    "candlestick_flags_supplier",
    f"""WITH {_OHLC_CTE},
        t AS (
          SELECT l_suppkey, day, open, high, low, close,
                 LAG(open) OVER w AS po, LAG(close) OVER w AS pc,
                 LAG(high) OVER w AS ph, LAG(low) OVER w AS pl
          FROM o
          WINDOW w AS (PARTITION BY l_suppkey ORDER BY day)
        )
        SELECT l_suppkey, day,
               CAST(high - low > 0 AND ABS(close - open) * 10 <= high - low
                    AS BIGINT) AS doji,
               CAST(COALESCE(pc < po AND close > open AND open <= pc
                             AND close >= po
                             AND ABS(close - open) > po - pc, FALSE)
                    AS BIGINT) AS bullish_engulf,
               CAST(COALESCE(pc > po AND close < open AND open >= pc
                             AND close <= po
                             AND ABS(close - open) > pc - po, FALSE)
                    AS BIGINT) AS bearish_engulf,
               CAST(COALESCE(low > ph, FALSE) AS BIGINT) AS gap_up,
               CAST(COALESCE(high < pl, FALSE) AS BIGINT) AS gap_down
        FROM t""",
)
def candlestick_flags_supplier(spark, sf_dir):
    """Candlestick pattern flags over the daily supplier bars
    (operators/analysis.candlestick_flags): doji via the scaled-integer
    10% body test, engulfing / gap flags from one lag set — every
    predicate pure BIGINT arithmetic, exact, first-bar flags pinned
    FALSE by explicit COALESCE in both engines."""
    from financial_data_lakehouse_pipeline__spark.operators import analysis

    bars = _daily_ohlc(spark, sf_dir)
    out = analysis.candlestick_flags(bars, ["l_suppkey"], ["day"])
    flags = ["doji", "bullish_engulf", "bearish_engulf", "gap_up", "gap_down"]
    return out.select(
        "l_suppkey", "day", *[F.col(c).cast("bigint").alias(c) for c in flags]
    )


@register(
    "keltner_supplier_daily",
    # EMA centerline replayed as a recursive CTE (same operation order as
    # the applyInPandas loop), ATR band from exact BIGINT true ranges;
    # band arithmetic is double ops on bit-identical inputs — no ROUND.
    f"""WITH RECURSIVE {_OHLC_CTE},
        base AS MATERIALIZED (
          SELECT l_suppkey, day, high, low, close,
                 CAST(close AS DOUBLE) AS v,
                 ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY day)
                     AS rn
          FROM o
        ),
        r AS (
          SELECT l_suppkey, day, rn, v AS ema FROM base WHERE rn = 1
          UNION ALL
          SELECT b.l_suppkey, b.day, b.rn,
                 (2.0 / 21.0) * b.v + (1.0 - 2.0 / 21.0) * r.ema
          FROM base b
          JOIN r ON b.l_suppkey = r.l_suppkey AND b.rn = r.rn + 1
        ),
        t AS (
          SELECT l_suppkey, day, high, low, close,
                 LAG(close) OVER (PARTITION BY l_suppkey ORDER BY day) AS pc
          FROM base
        ),
        tr AS (
          SELECT l_suppkey, day,
                 GREATEST(high - low,
                          COALESCE(ABS(high - pc), high - low),
                          COALESCE(ABS(low - pc), high - low)) AS tr
          FROM t
        ),
        a AS (
          SELECT l_suppkey, day,
                 CAST(SUM(tr) OVER w AS BIGINT) / COUNT(*) OVER w AS atr
          FROM tr
          WINDOW w AS (PARTITION BY l_suppkey ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT r.l_suppkey, r.day,
               r.ema / 100e0 AS kc_middle,
               (r.ema + 2.0 * a.atr) / 100e0 AS kc_upper,
               (r.ema - 2.0 * a.atr) / 100e0 AS kc_lower
        FROM r JOIN a ON r.l_suppkey = a.l_suppkey AND r.day = a.day""",
)
def keltner_supplier_daily(spark, sf_dir):
    """Keltner channel over daily supplier bars (operators/windows
    .keltner): true-EMA(20) centerline (applyInPandas recurrence) ±
    2·ATR(14) gap-aware bands — composes the engine's two hardest window
    primitives in one (partition, order), verified bit-for-bit by a
    recursive-CTE + window oracle."""
    bars = _daily_ohlc(spark, sf_dir)
    out = windows.keltner(bars, ["l_suppkey"], ["day"], span=20, n_atr=14, mult=2.0)
    return out.select(
        "l_suppkey",
        "day",
        (F.col("kc_middle") / F.lit(100.0)).alias("kc_middle"),
        (F.col("kc_upper") / F.lit(100.0)).alias("kc_upper"),
        (F.col("kc_lower") / F.lit(100.0)).alias("kc_lower"),
    )


@register(
    "adx_supplier_daily",
    # DM±/TR exact BIGINTs; DI/DX closed double forms on exact inputs;
    # ADX = mean of 1e-9-quantized DX integers — windowed double sums
    # are engine-dependent, integer sums are not, so no ROUND anywhere.
    f"""WITH {_OHLC_CTE},
        t AS (
          SELECT l_suppkey, day, high, low, close,
                 LAG(high) OVER w AS ph, LAG(low) OVER w AS pl,
                 LAG(close) OVER w AS pc
          FROM o
          WINDOW w AS (PARTITION BY l_suppkey ORDER BY day)
        ),
        m AS (
          SELECT l_suppkey, day,
                 COALESCE(CASE WHEN (high - ph) > (pl - low)
                                AND (high - ph) > 0
                               THEN high - ph ELSE 0 END, 0) AS pdm,
                 COALESCE(CASE WHEN (pl - low) > (high - ph)
                                AND (pl - low) > 0
                               THEN pl - low ELSE 0 END, 0) AS mdm,
                 GREATEST(high - low,
                          COALESCE(ABS(high - pc), high - low),
                          COALESCE(ABS(low - pc), high - low)) AS tr
          FROM t
        ),
        di AS (
          SELECT l_suppkey, day,
                 100e0 * SUM(pdm) OVER wf / NULLIF(SUM(tr) OVER wf, 0)
                     AS pdi,
                 100e0 * SUM(mdm) OVER wf / NULLIF(SUM(tr) OVER wf, 0)
                     AS mdi
          FROM m
          WINDOW wf AS (PARTITION BY l_suppkey ORDER BY day
                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        ),
        dx AS (
          SELECT l_suppkey, day, pdi, mdi,
                 100e0 * ABS(pdi - mdi) / NULLIF(pdi + mdi, 0e0) AS dx
          FROM di
        ),
        q AS (
          SELECT *, CAST(FLOOR(dx * 1e9 + 5e-1) AS BIGINT) AS dxq FROM dx
        )
        SELECT l_suppkey, day, pdi, mdi, dx,
               CAST(SUM(dxq) OVER wf AS DOUBLE)
                   / CAST(COUNT(dxq) OVER wf AS DOUBLE) / 1e9 AS adx
        FROM q
        WINDOW wf AS (PARTITION BY l_suppkey ORDER BY day
                      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""",
)
def adx_supplier_daily(spark, sf_dir):
    """ADX-14 over daily supplier bars (operators/windows.adx, rolling-
    sum variant): directional movement, DI±, DX, and the ADX trend-
    strength line — all in one shared (partition, order) window spec,
    integer-exact inputs, quantized-DX mean, no rounding."""
    bars = _daily_ohlc(spark, sf_dir)
    return windows.adx(bars, ["l_suppkey"], ["day"], n=14).select(
        "l_suppkey", "day", "pdi", "mdi", "dx", "adx"
    )


@register(
    "seasonal_naive_mase",
    # Daily revenue per supplier; forecast = lag-7 value (seasonal
    # naive); errors are exact BIGINT cents; MASE = one double division
    # of two exact sums. Suppliers need > 7 observed days to score.
    f"""WITH g AS (
          SELECT l_suppkey, l_shipdate AS day,
                 CAST(SUM({_CENTS}) AS BIGINT) AS rev
          FROM lineitem GROUP BY 1, 2
        ), f AS (
          SELECT l_suppkey, day, rev,
                 LAG(rev, 7) OVER (PARTITION BY l_suppkey ORDER BY day)
                     AS fc
          FROM g
        ), e AS (
          SELECT l_suppkey, ABS(rev - fc) AS err FROM f WHERE fc IS NOT NULL
        )
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_scored,
               CAST(SUM(err) AS BIGINT) AS abs_err_cents,
               CAST(SUM(err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100e0
                   AS mae
        FROM e GROUP BY l_suppkey""",
)
def seasonal_naive_mase(spark, sf_dir):
    """Seasonal-naive forecast evaluation per supplier (the baseline
    every forecasting pipeline must beat): forecast(day) = revenue 7
    rows back, scored by MAE over the scored days — one shared
    (partition, order) window, exact BIGINT errors, a single double
    division at the end."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    g = li.groupBy("l_suppkey", F.col("l_shipdate").alias("day")).agg(
        F.sum(cents).cast("bigint").alias("rev")
    )
    w = Window.partitionBy("l_suppkey").orderBy("day")
    f = g.withColumn("fc", F.lag("rev", 7).over(w)).filter(F.col("fc").isNotNull())
    e = f.withColumn("err", F.abs(F.col("rev") - F.col("fc")))
    return e.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum("err").cast("bigint").alias("abs_err_cents"),
        (
            F.sum("err").cast("double") / F.count(F.lit(1)).cast("double") / F.lit(100.0)
        ).alias("mae"),
    )


@register(
    "rolling_median_price",
    # Rolling median over the trailing 15 rows: Spark sorts the exact
    # integer frame (collect_list + sort_array) and interpolates with
    # the same lo*(1-f)+hi*f closed form DuckDB's windowed quantile_cont
    # uses — all on integer cents, so bit-exact.
    f"""SELECT l_suppkey, l_orderkey, l_linenumber,
               quantile_cont({_CENTS}, 0.5) OVER w / 100e0 AS med_15
        FROM lineitem
        WINDOW w AS ({_LI_WIN}
                     ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)""",
)
def rolling_median_price(spark, sf_dir):
    """Rolling median (robust smoother — the outlier-immune cousin of
    the SMA): trailing-15 window via operators/windows.rolling_median,
    frame sorted as exact integer cents. On integer inputs the
    operator's (lo+hi)/2 even-count midpoint equals DuckDB's windowed
    quantile_cont interpolation lo·(1−f)+hi·f at f = 0.5 exactly (0.5
    factors are exact in binary), so the oracle stays bit-green with no
    ROUND. Frame collect is O(n·w log w) per partition — fine for
    bounded windows; for wide windows switch to a sketch."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    out = windows.rolling_median(
        li, ["l_suppkey"], _LI_ORDER_COLS, cents, 15, out="__med_cents"
    )
    return out.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.col("__med_cents") / F.lit(100.0)).alias("med_15"),
    )


@register(
    "rsi_wilder_supplier",
    # Seed = integer-exact gain/loss sums over the first 14 deltas / 14;
    # recurrence (prev*13 + x)/14 replayed with identical operation
    # order; RSI closed form on the carried doubles — no ROUND.
    f"""WITH RECURSIVE {_OHLC_CTE},
        b AS MATERIALIZED (
          SELECT l_suppkey, day, close,
                 ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY day)
                     AS rn,
                 close - LAG(close) OVER (PARTITION BY l_suppkey
                                          ORDER BY day) AS delta
          FROM o
        ),
        g AS (
          SELECT l_suppkey, day, rn,
                 CASE WHEN delta > 0 THEN delta ELSE 0 END AS gain,
                 CASE WHEN delta < 0 THEN -delta ELSE 0 END AS loss
          FROM b
        ),
        seed AS (
          SELECT l_suppkey,
                 CAST(SUM(gain) AS DOUBLE) / 14e0 AS ag,
                 CAST(SUM(loss) AS DOUBLE) / 14e0 AS al
          FROM g WHERE rn BETWEEN 2 AND 15
          GROUP BY l_suppkey HAVING COUNT(*) = 14
        ),
        r AS (
          SELECT g.l_suppkey, g.day, g.rn, s.ag, s.al
          FROM g JOIN seed s ON g.l_suppkey = s.l_suppkey
          WHERE g.rn = 15
          UNION ALL
          SELECT g.l_suppkey, g.day, g.rn,
                 (r.ag * 13e0 + CAST(g.gain AS DOUBLE)) / 14e0,
                 (r.al * 13e0 + CAST(g.loss AS DOUBLE)) / 14e0
          FROM g JOIN r ON g.l_suppkey = r.l_suppkey AND g.rn = r.rn + 1
        )
        SELECT l_suppkey, day,
               CASE WHEN al = 0e0 THEN 100e0
                    ELSE 100e0 - 100e0 / (1e0 + ag / al) END AS rsi_w
        FROM r""",
)
def rsi_wilder_supplier(spark, sf_dir):
    """Wilder's recursive RSI-14 over daily supplier bars
    (operators/windows.rsi_wilder) — the authentic smoothed form next to
    the simplified rolling-mean RSI already in the corpus: integer-exact
    deltas, seed means, and the (prev*13 + x)/14 recurrence replayed
    bit-for-bit by a recursive-CTE oracle."""
    bars = _daily_ohlc(spark, sf_dir)
    out = windows.rsi_wilder(bars, ["l_suppkey"], ["day"], n=14)
    return out.filter(F.col("rsi_w").isNotNull()).select(
        "l_suppkey", "day", "rsi_w"
    )


@register(
    "atr_wilder_supplier",
    # Seed = integer-exact TR mean over the first 14 bars; recurrence
    # (prev*13 + tr)/14 with identical operation order — no ROUND.
    f"""WITH RECURSIVE {_OHLC_CTE},
        b AS MATERIALIZED (
          SELECT l_suppkey, day, high, low, close,
                 ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY day)
                     AS rn,
                 LAG(close) OVER (PARTITION BY l_suppkey ORDER BY day)
                     AS pc
          FROM o
        ),
        t AS (
          SELECT l_suppkey, day, rn,
                 GREATEST(high - low,
                          COALESCE(ABS(high - pc), high - low),
                          COALESCE(ABS(low - pc), high - low)) AS tr
          FROM b
        ),
        seed AS (
          SELECT l_suppkey, CAST(SUM(tr) AS DOUBLE) / 14e0 AS a
          FROM t WHERE rn <= 14
          GROUP BY l_suppkey HAVING COUNT(*) = 14
        ),
        r AS (
          SELECT t.l_suppkey, t.day, t.rn, s.a
          FROM t JOIN seed s ON t.l_suppkey = s.l_suppkey
          WHERE t.rn = 14
          UNION ALL
          SELECT t.l_suppkey, t.day, t.rn,
                 (r.a * 13e0 + CAST(t.tr AS DOUBLE)) / 14e0
          FROM t JOIN r ON t.l_suppkey = r.l_suppkey AND t.rn = r.rn + 1
        )
        SELECT l_suppkey, day, a / 100e0 AS atr_w FROM r""",
)
def atr_wilder_supplier(spark, sf_dir):
    """Wilder-smoothed ATR-14 over daily supplier bars
    (operators/windows.atr_wilder) — completes the authentic recursive
    indicator trio (EMA, Wilder RSI, Wilder ATR): exact integer true
    ranges, seed mean, (prev*13 + tr)/14 recurrence, recursive-CTE
    oracle, no rounding."""
    bars = _daily_ohlc(spark, sf_dir)
    out = windows.atr_wilder(bars, ["l_suppkey"], ["day"], n=14)
    return out.filter(F.col("atr_w").isNotNull()).select(
        "l_suppkey", "day", (F.col("atr_w") / F.lit(100.0)).alias("atr_w")
    )


@register(
    "cross_sectional_supplier_rank",
    f"""WITH d AS (
          SELECT l_shipdate, l_suppkey,
                 {{MS}} AS revenue
          FROM lineitem GROUP BY 1, 2
        )
        SELECT l_shipdate, l_suppkey, revenue,
               PERCENT_RANK() OVER (PARTITION BY l_shipdate
                                    ORDER BY revenue) AS pct_rank,
               ROUND((revenue - AVG(revenue) OVER (PARTITION BY l_shipdate))
                     / NULLIF(STDDEV_SAMP(revenue)
                              OVER (PARTITION BY l_shipdate), 0), 6) AS zscore
        FROM d""".replace("{MS}", sql_money_sum(
        "l_extendedprice * (1 - l_discount)", 4)),
)
def cross_sectional_supplier_rank(spark, sf_dir):
    """Cross-sectional factor ranking: per ship date, each supplier's
    daily revenue gets its percentile rank and z-score ACROSS suppliers
    (the quant factor-ranking primitive — rank within period, not
    within entity). percent_rank is pure integer rank arithmetic (ties
    share ranks identically in both engines — no tiebreak column wanted
    here); the z-score carries ROUND 6 (stddev is inherently floating).
    Revenue itself is an exact scaled-integer sum. One shuffle on the
    date key for both the pre-aggregation and the windows."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    d = li.groupBy("l_shipdate", "l_suppkey").agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).alias("revenue")
    )
    w = Window.partitionBy("l_shipdate").orderBy("revenue")
    wp = Window.partitionBy("l_shipdate")
    return d.select(
        "l_shipdate", "l_suppkey", "revenue",
        F.percent_rank().over(w).alias("pct_rank"),
        F.round(
            guarded_div(
                F.col("revenue") - F.avg("revenue").over(wp),
                F.stddev_samp("revenue").over(wp),
            ),
            6,
        ).alias("zscore"),
    )


@register(
    "ewm_vol_supplier_price",
    # RiskMetrics EWM variance replayed as a recursive CTE with the SAME
    # operation order as the applyInPandas loop (d uses the PREVIOUS mu;
    # alpha written in e-notation so both engines hold the same DOUBLE).
    # base MATERIALIZED per the EMA oracle lesson.
    f"""WITH RECURSIVE base AS MATERIALIZED (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(l_extendedprice AS DOUBLE) AS v,
                 ROW_NUMBER() OVER ({_LI_WIN}) AS rn
          FROM lineitem
        ), r AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, rn,
                 v AS mu, 0e0 AS s
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.l_suppkey, b.l_orderkey, b.l_linenumber, b.rn,
                 r.mu + (2e0 / 2e1) * (b.v - r.mu),
                 (1e0 - (2e0 / 2e1))
                   * (r.s + (2e0 / 2e1) * (b.v - r.mu) * (b.v - r.mu))
          FROM base b JOIN r ON b.l_suppkey = r.l_suppkey
                            AND b.rn = r.rn + 1
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               s AS ewm_var, sqrt(s) AS ewm_std
        FROM r""",
)
def ewm_vol_supplier_price(spark, sf_dir):
    """Exponentially-weighted variance/volatility per supplier price
    series (operators/windows.ewm_volatility, span=19 → α=0.1) — the
    RiskMetrics vol estimate beside the true EMA. Same recursive
    machinery as the EMA family: applyInPandas explicit loop with fixed
    operation order, bit-identical to the recursive-CTE oracle; sqrt is
    correctly rounded on both engines."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", *_LI_ORDER_COLS)
    out = windows.ewm_volatility(
        li, ["l_suppkey"], _LI_ORDER_COLS, "l_extendedprice", span=19
    )
    return out.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "ewm_var", "ewm_std"
    )


@register(
    "supplier_inventory_balance",
    # Skorokhod reflection identity, exact INTEGER arithmetic (see
    # operators/windows.floored_running_sum): b = S - LEAST(0, runmin S)
    # for floor 0 — two window passes instead of the recursive CTE whose
    # per-row iterations cost ~1200 s at sf2. Same integers on every row.
    f"""WITH s AS (
          SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
                 l_extendedprice, l_quantity, l_partkey,
                 SUM(CAST(CASE WHEN l_returnflag = 'R' THEN -l_quantity
                               ELSE l_quantity END AS BIGINT))
                     OVER ({_LI_WIN} ROWS UNBOUNDED PRECEDING) AS ps
          FROM lineitem
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(ps - LEAST(CAST(0 AS BIGINT),
                               MIN(ps) OVER ({_LI_WIN}
                                   ROWS UNBOUNDED PRECEDING))
                    AS BIGINT) AS balance
        FROM s""",
)
def supplier_inventory_balance(spark, sf_dir):
    """Floored running inventory balance per supplier
    (operators/windows.floored_running_sum): shipments add quantity,
    returns (l_returnflag = 'R') subtract it, and the balance clamps at
    zero after EVERY step. A plain clamped cumsum is a DIFFERENT
    function (it forgets how much the floor absorbed), but the constant
    floor has the exact reflection closed form b = S - min(0, runmin S)
    — both engine and oracle compute it as two integer window passes,
    with the step-by-step recursion pinned independently by a
    hypothesis loop-replay test."""
    li = read_table(spark, sf_dir, "lineitem")
    d = F.when(
        F.col("l_returnflag") == "R", -F.col("l_quantity")
    ).otherwise(F.col("l_quantity")).cast("bigint")
    out = windows.floored_running_sum(
        li.select("l_suppkey", *_LI_ORDER_COLS, d.alias("__d")),
        ["l_suppkey"],
        _LI_ORDER_COLS,
        "__d",
        floor=0,
    )
    return out.select("l_suppkey", "l_orderkey", "l_linenumber", "balance")


@register(
    "underwater_duration_supplier",
    # Time-under-water: rows since the running peak was last touched.
    # rn and the at-peak marker are exact integers; ties are rows
    # identical in every referenced column (see _LI_ORDER note), whose
    # swap permutes identical output rows.
    f"""WITH c AS ({_CENTS_CTE}),
        p AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, c,
                 ROW_NUMBER() OVER ({_LI_WIN}) AS rn,
                 MAX(c) OVER ({_LI_WIN} ROWS UNBOUNDED PRECEDING) AS peak
          FROM c
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(rn - MAX(CASE WHEN c = peak THEN rn END)
                    OVER (PARTITION BY l_suppkey ORDER BY rn
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS underwater
        FROM p""",
)
def underwater_duration_supplier(spark, sf_dir):
    """Time-under-water per supplier: how many observations since the
    running price peak was last touched (the duration companion to
    drawdown_supplier_price's depth — recovery analysis needs both).
    Two stacked windows on the SAME (partition, order): running max +
    row_number, then a running max over the at-peak row numbers — one
    shuffle, two WindowExecs, all-BIGINT arithmetic (a row at the peak
    has underwater = 0 by construction)."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    w_ord = Window.partitionBy("l_suppkey").orderBy(*_LI_ORDER_COLS)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    p = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        cents.alias("__c"),
        F.row_number().over(w_ord).alias("__rn"),
        F.max(cents).over(w_cum).alias("__peak"),
    )
    w_rn = (
        Window.partitionBy("l_suppkey")
        .orderBy("__rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_peak = F.max(
        F.when(F.col("__c") == F.col("__peak"), F.col("__rn"))
    ).over(w_rn)
    return p.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.col("__rn") - last_peak).cast("bigint").alias("underwater"),
    )
