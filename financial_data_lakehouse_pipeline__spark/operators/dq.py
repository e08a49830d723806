"""Declarative data-quality checks (expectations) over a DataFrame.

The reference enforces correctness with inline cleaning filters
(data_cleaning.py:75-90,179-191,254-259,313-317 — SURVEY.md §2.2 P5/P6)
and pins great-expectations without wiring it; this module provides the
equivalent engine surface: declare expectations, get a violations
summary, or fail fast.

Scale shape: ALL row-level expectations evaluate in ONE aggregation pass
over the data (conditional sums — map-side partial aggregation, no
shuffle of the rows themselves); aggregate-level expectations (e.g. key
uniqueness) are extra aggregate expressions in the same pass wherever
Spark allows mixing them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    """Row passes when ``col`` is not NULL."""
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    """Row passes when lo <= col <= hi (NULL fails)."""
    c = F.col(col)
    return c.isNotNull() & (c >= lo) & (c <= hi)


def in_set(col: str, values) -> Column:
    """Row passes when col is one of ``values`` (NULL fails)."""
    return F.col(col).isin(list(values))


def matches(col: str, pattern: str) -> Column:
    """Row passes when col fully matches the regex (NULL fails)."""
    return F.col(col).rlike(pattern)


def check_summary(
    df: DataFrame,
    row_checks: dict[str, Column],
    agg_checks: dict[str, Column] | None = None,
) -> DataFrame:
    """Evaluate expectations in one aggregation pass.

    ``row_checks``: name -> boolean Column (True = row passes); violations
    are counted with a conditional sum. ``agg_checks``: name -> aggregate
    expression that RETURNS the violation count directly (e.g. key
    uniqueness as ``count(*) - count_distinct(key)``).

    Returns long-form ``(check_name, n_violations, passed)`` — the audit
    record a pipeline writes next to each dataset version.
    """
    aggs = [
        F.coalesce(F.sum(F.when(c, 0).otherwise(1)), F.lit(0))
        .cast("bigint")
        .alias(name)
        for name, c in row_checks.items()
    ]
    for name, expr in (agg_checks or {}).items():
        aggs.append(F.coalesce(expr, F.lit(0)).cast("bigint").alias(name))
    names = list(row_checks) + list(agg_checks or {})
    wide = df.agg(*aggs)
    stack = F.expr(
        f"stack({len(names)}, "
        + ", ".join(f"'{n}', {n}" for n in names)
        + ") AS (check_name, n_violations)"
    )
    return wide.select(stack).withColumn(
        "passed", F.col("n_violations") == 0
    )


def unique_violations(keys: list[str]) -> Column:
    """Aggregate check: number of rows beyond the first per key tuple
    (0 = the key set is unique). Use in ``agg_checks``."""
    return F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys])


def enforce(df: DataFrame, row_checks: dict[str, Column]) -> DataFrame:
    """Fail-fast variant: raise if any expectation has violations.
    Runs one job; returns ``df`` unchanged for fluent pipelines."""
    bad = (
        check_summary(df, row_checks)
        .filter(~F.col("passed"))
        .collect()
    )
    if bad:
        detail = ", ".join(f"{r.check_name}={r.n_violations}" for r in bad)
        raise ValueError(f"data-quality violations: {detail}")
    return df


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    key: str,
) -> DataFrame:
    """Categorical distribution drift between two dataset snapshots —
    the monitoring check a training pipeline runs when a new crawl/batch
    lands (did the source/language/type mix shift?).

    Output, one row per category: counts, the two probabilities, the
    category's |p_a - p_b| contribution, and the global total-variation
    distance ``tvd`` = 0.5·Σ|p_a − p_b| repeated on every row.

    Exactness: TVD is assembled from INTEGER cross-products —
    |cnt_a·total_b − cnt_b·total_a| summed as BIGINT, divided once by
    (total_a·total_b) — so the metric is bit-identical cross-engine (a
    KL/PSI formulation would drag in ln(), which differs in the last ulp
    between libm implementations). Shape at scale: one groupBy per side,
    a full-outer join on the tiny category dimension, window totals over
    that aggregate — the fact tables are read once each.
    """
    from pyspark.sql import Window

    ca = df_a.groupBy(key).agg(F.count(F.lit(1)).alias("cnt_a"))
    cb = df_b.groupBy(key).agg(F.count(F.lit(1)).alias("cnt_b"))
    m = (
        ca.join(cb, key, "full_outer")
        .withColumns(
            {
                "cnt_a": F.coalesce("cnt_a", F.lit(0)),
                "cnt_b": F.coalesce("cnt_b", F.lit(0)),
            }
        )
    )
    w = Window.partitionBy()
    ta, tb = F.sum("cnt_a").over(w), F.sum("cnt_b").over(w)
    cross = F.abs(F.col("cnt_a") * tb - F.col("cnt_b") * ta)
    return m.select(
        key,
        "cnt_a",
        "cnt_b",
        (F.col("cnt_a").cast("double") / ta).alias("p_a"),
        (F.col("cnt_b").cast("double") / tb).alias("p_b"),
        (cross.cast("double") / (ta * tb)).alias("abs_diff"),
        (
            F.lit(0.5) * F.sum(cross).over(w).cast("double") / (ta * tb)
        ).alias("tvd"),
    )


def date_gaps(
    df: DataFrame,
    keys: Sequence[str],
    date_col: Column | str,
    out: str = "missing_day",
) -> DataFrame:
    """Per-entity calendar gap report: every date inside the entity's own
    [first, last] activity range with NO rows — the completeness check a
    daily pipeline runs before trusting time-series operators (rolling
    frames silently span gaps; see gap_fill_events for the repair step).

    Shape: distinct activity (one row per entity-day), per-entity min/max
    (rows = entities), a generated date spine per entity (explode of
    sequence — no calendar table scan), then LEFT ANTI join back. The
    spine is entities × span-days rows — bounded by calendar width, not
    fact volume; the anti-join shuffles the spine, never the facts.
    """
    d = date_col if isinstance(date_col, Column) else F.col(date_col)
    act = df.select(*keys, d.alias("__day")).distinct()
    rng = act.groupBy(*keys).agg(
        F.min("__day").alias("__d0"), F.max("__day").alias("__d1")
    )
    spine = rng.select(
        *keys, F.explode(F.sequence("__d0", "__d1")).alias("__day")
    )
    return spine.join(act, [*keys, "__day"], "left_anti").select(
        *keys, F.col("__day").alias(out)
    )


def profile_columns(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> DataFrame:
    """One-pass column profile — the data-card / landing-audit summary:
    per column its row count, null count, exact distinct count, and a
    min/max pair (the value itself for numerics, the LENGTH for strings
    — keeping the output schema uniform and cross-engine exact; string
    min/max values would drag collation into the contract).

    ONE aggregation over one scan produces every metric for every
    column (no per-column passes); the long form comes from exploding a
    struct array afterwards. countDistinct is exact — swap in
    approx_count_distinct (or sketches.hll_sketch) for 100 TB profiles
    where ±2% beats an extra shuffle.

    Output: (column, n, n_null, n_distinct, min_v double, max_v double).
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in numeric_cols:
        aggs += [
            F.count(F.col(c)).alias(f"__{c}__n"),
            F.countDistinct(F.col(c)).alias(f"__{c}__d"),
            F.min(F.col(c).cast("double")).alias(f"__{c}__lo"),
            F.max(F.col(c).cast("double")).alias(f"__{c}__hi"),
        ]
    for c in string_cols:
        aggs += [
            F.count(F.col(c)).alias(f"__{c}__n"),
            F.countDistinct(F.col(c)).alias(f"__{c}__d"),
            F.min(F.length(F.col(c)).cast("double")).alias(f"__{c}__lo"),
            F.max(F.length(F.col(c)).cast("double")).alias(f"__{c}__hi"),
        ]
    agged = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__{c}__n").cast("bigint").alias("n"),
            (F.col("__total") - F.col(f"__{c}__n")).cast("bigint").alias("n_null"),
            F.col(f"__{c}__d").cast("bigint").alias("n_distinct"),
            F.col(f"__{c}__lo").alias("min_v"),
            F.col(f"__{c}__hi").alias("max_v"),
        )
        for c in [*numeric_cols, *string_cols]
    ]
    return agged.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def benford_deviation(
    df: DataFrame,
    amount_cents: Column,
) -> DataFrame:
    """First-significant-digit (Benford's law) screen over a positive
    integer amount column — the classic forensic test for fabricated
    financial figures (real transaction amounts follow
    P(d) = log10(1 + 1/d); invented ones don't).

    The digit is the first character of the BIGINT's decimal string —
    exact in every engine, no log10-near-power-of-ten boundary risk.
    One groupBy(9 digits); output per digit: count, observed share,
    expected share, and the chi-square-style global deviation
    Σ (obs − exp)²/exp repeated on every row (summed in digit order —
    9 terms, deterministic). Shares are single divisions of exact
    integers; expected shares enter both engines as identical literals.
    """
    import math

    digit = F.substring(amount_cents.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(amount_cents > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    total = F.sum("cnt").over(w)
    obs = F.col("cnt").cast("double") / total
    exp_map = F.element_at(
        F.array(*[F.lit(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]),
        F.col("digit"),
    )
    scored = counts.select(
        "digit",
        "cnt",
        obs.alias("observed_p"),
        exp_map.alias("expected_p"),
    )
    dev = F.pow(F.col("observed_p") - F.col("expected_p"), 2) / F.col(
        "expected_p"
    )
    wo = Window.partitionBy().orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # NOTE: the frame makes this a full-window sum evaluated in digit
    # order — 9 rows, deterministic addition order on both engines.
    return scored.withColumn("benford_dev", F.sum(dev).over(wo))


def monotonic_report(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    col: str,
    strict: bool = False,
) -> DataFrame:
    """Per-entity monotonicity audit of ``col`` along ``order_by``:
    counts steps where the value moves BACKWARD (strict=True also flags
    plateaus) — the sequence-sanity check for anything that should only
    grow (sequence ids vs event time, cumulative balances, version
    numbers, watermark progress).

    One lag over one keyed window; NULL steps (either side) are not
    comparable and never counted. Output per key: n_rows, n_steps
    (comparable adjacent pairs), n_violations, monotonic boolean.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_by)
    prev = F.lag(F.col(col)).over(w)
    cmp_ok = prev.isNotNull() & F.col(col).isNotNull()
    bad = F.col(col) <= prev if strict else F.col(col) < prev
    stepped = df.withColumns(
        {
            "__step": cmp_ok.cast("int"),
            "__bad": (cmp_ok & bad).cast("int"),
        }
    )
    return stepped.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("__step").cast("bigint").alias("n_steps"),
        F.sum("__bad").cast("bigint").alias("n_violations"),
        (F.sum("__bad") == 0).alias("monotonic"),
    )


def key_skew_report(
    df: DataFrame,
    keys: list[str],
    top_k: int = 5,
) -> DataFrame:
    """Join/shuffle-key skew diagnostic — the pre-flight check before
    any large keyed operation: per-key row counts reduced to one summary
    row with the metrics that predict shuffle pathology (a hot key makes
    one reducer the straggler no matter how many executors exist).

    One groupBy over the keys (the same shuffle the diagnosed join would
    do, but carrying only counts), then a single global aggregation:

    - n_keys, n_rows — cardinality context
    - max_count / top1_share — the hottest key's absolute and relative
      weight (top1_share ~ 1/n_keys means uniform; >> that means salt
      or AQE-skew-join before shuffling on this key)
    - skew_ratio — max_count / mean_count, the straggler multiplier
    - top_keys — the ``top_k`` hottest key values (stringified,
      sorted by count desc then key for determinism)

    All counts exact integers; ratios single IEEE divisions. The
    summary is a scalar aggregation (never collects per-key rows into
    one array — that would put n_keys elements on a single reducer);
    top_keys comes from a separate TakeOrderedAndProject branch that
    moves only ``top_k`` rows, then broadcast-joins onto the 1-row
    summary.
    """
    per_key = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    counts = per_key.select(key_str.alias("__k"), "__c")
    summary = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.max("__c").cast("bigint").alias("max_count"),
        (
            F.max("__c").cast("double") / F.sum("__c").cast("double")
        ).alias("top1_share"),
        (
            F.max("__c").cast("double")
            * F.count(F.lit(1)).cast("double")
            / F.sum("__c").cast("double")
        ).alias("skew_ratio"),
    )
    hot = (
        counts.orderBy(F.col("__c").desc(), F.col("__k"))
        .limit(top_k)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct((-F.col("__c")).alias("nc"), F.col("__k").alias("k"))
                )
            ).alias("__hot")
        )
        .select(F.transform(F.col("__hot"), lambda s: s["k"]).alias("top_keys"))
    )
    return summary.crossJoin(F.broadcast(hot))


def observed(
    df: DataFrame,
    name: str,
    metrics: dict[str, Column],
):
    """Attach zero-cost pipeline counters via Spark's Observation API:
    the metrics (counts, conditional counts, sums) are accumulated BY
    THE SAME ACTION that materializes the DataFrame — no second scan,
    which at 100 TB is the difference between free observability and
    doubling the job (check_summary runs its own aggregation; this
    piggybacks on work already happening, the right tool when the
    output itself is being written anyway).

    Returns (observed_df, observation). After ANY action on
    observed_df (write, count, foreachBatch), ``observation.get``
    yields the metric dict. Metrics must be aggregate expressions.
    On a STREAMING DataFrame use ``DataFrame.observe(name, ...)``
    directly and read ``progress.observedMetrics[name]`` per
    micro-batch (pinned in tests/test_streaming.py).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs


def k_anonymity_report(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    sensitive: str,
    k: int = 5,
) -> DataFrame:
    """Data-governance screen before a dataset leaves the lake:
    k-anonymity (every quasi-identifier combination must describe >= k
    rows) and l-diversity (each combination must carry more than one —
    ideally >= l — distinct sensitive values, or the 'anonymous' group
    still leaks the attribute).

    One aggregation over the QI key: per-combination row count and
    exact distinct-sensitive count, rolled into a single summary row —
    anonymity level (the minimum group size), number of violating
    combinations/rows under ``k``, and the minimum sensitive diversity.
    Cost: one shuffle on the QI columns; the distinct count rides the
    same aggregation (count_distinct partial-aggregates map-side).
    """
    g = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.count_distinct(F.col(sensitive)).cast("bigint").alias("__l"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("__n").alias("k_anonymity"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_k"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("rows_below_k"),
        F.min("__l").alias("l_diversity_min"),
        F.sum(F.when(F.col("__l") <= 1, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_single_sensitive"),
    )


def fk_orphan_audit(
    edges: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit over a list of foreign-key edges
    ``(edge_name, child_df, child_key, parent_df, parent_key)`` — for
    each edge, the child row count and how many child rows reference a
    missing parent (orphans). The DQ gate every star-schema load runs
    before publishing.

    Per edge: one exact child count and one LEFT ANTI equi-join count
    (semi-join-shaped — the parent side only ships its key column, and
    a broadcast is planned when the parent is small). NULL child keys
    count as orphans (they reference nothing); rows, not distinct keys,
    so the count is actionable row-repair volume.

    Output: (edge, total_rows, orphan_rows), one row per edge, unioned.
    """
    if not edges:
        raise ValueError("fk_orphan_audit needs at least one FK edge")
    parts = []
    for name, child, ckey, parent, pkey in edges:
        ck = child.select(F.col(ckey).alias("__ck"))
        pk = parent.select(F.col(pkey).alias("__pk")).distinct()
        total = ck.agg(F.count(F.lit(1)).cast("bigint").alias("total_rows"))
        orphans = (
            ck.join(pk, F.col("__ck") == F.col("__pk"), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_rows"))
        )
        parts.append(
            total.crossJoin(orphans).select(
                F.lit(name).alias("edge"), "total_rows", "orphan_rows"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
