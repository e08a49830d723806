"""Join operators (SURVEY.md §2.3 J1-J4, plus semi/anti/as-of extensions).

Scale posture: enrichment joins against dimension tables take an explicit
``broadcast`` flag (default on) — at 100 TB the fact side never shuffles
for a dim join. The coalescing full-outer merge shuffles both sides on the
join key once; Catalyst+AQE pick SMJ vs shuffled-hash and split skewed
partitions.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def coalescing_merge(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    prefer: Mapping[str, tuple[str, str]],
    source_flag: str | None = None,
) -> DataFrame:
    """Full-outer join + per-column source preference via coalesce.

    Reference J1: Polygon ⟗ AlphaVantage merge on (ticker, date), then
    per-column `coalesce(polygon_col, av_col)` (data_transformation.py:79-99).

    ``prefer`` maps output column → (left_col, right_col); the left value
    wins when non-null. ``source_flag`` optionally adds a provenance column
    ('both'/'left'/'right').

    Columns are referenced through string-qualified aliases
    (``F.col("__ml.x")``) rather than DataFrame indexing: when left and
    right derive from the same source plan (a self-merge), DataFrame-indexed
    columns are ambiguous to the analyzer while alias-qualified names
    resolve per side.
    """
    lt, rt = left.alias("__ml"), right.alias("__mr")
    lc_ = lambda c: F.col(f"__ml.{c}")  # noqa: E731
    rc_ = lambda c: F.col(f"__mr.{c}")  # noqa: E731
    cond = [lc_(k).eqNullSafe(rc_(k)) for k in on]
    j = lt.join(rt, cond, "full_outer")
    key_cols = [F.coalesce(lc_(k), rc_(k)).alias(k) for k in on]
    val_cols = [
        F.coalesce(lc_(lc), rc_(rc)).alias(out) for out, (lc, rc) in prefer.items()
    ]
    cols = key_cols + val_cols
    if source_flag:
        any_left = F.lit(False)
        for lc, _ in prefer.values():
            any_left = any_left | lc_(lc).isNotNull()
        any_right = F.lit(False)
        for _, rc in prefer.values():
            any_right = any_right | rc_(rc).isNotNull()
        cols.append(
            F.when(any_left & any_right, F.lit("both"))
            .when(any_left, F.lit("left"))
            .otherwise(F.lit("right"))
            .alias(source_flag)
        )
    return j.select(*cols)


def enrich(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
    broadcast_right: bool = True,
) -> DataFrame:
    """Enrichment join against a (usually small) dimension table.

    Reference J2: price ⟕ sentiment ⟕ SEC (data_transformation.py:358-369).
    ``broadcast_right=True`` ships the dim to every executor — no shuffle
    of the fact side.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """EXISTS — rows of left with a match in right (engine extension;
    reference has none, SURVEY.md §2.3 'not present')."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS — rows of left without a match in right."""
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: left rows get a deterministic salt in
    [0, salt), right rows are replicated once per salt value, and the join
    key becomes (on..., salt) — a hot key's rows spread across ``salt``
    reducers instead of one straggler partition.

    The salt is xxhash64 of the full left row (deterministic — stable
    under re-partitioning, unlike rand()). Cost: right side × salt; use
    for joins where the right side is modest but too big to broadcast and
    the left key distribution is skewed. AQE's skew-join handles many
    cases automatically; salting is the explicit fallback for extreme
    single-key skew (e.g. one user with 10% of events).
    """
    lcols = left.columns
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt))
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)]))
    )
    return l.join(r, [*on, "__salt"], how).drop("__salt")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join (start <= point <= end) without a cross
    product — the classic range-join problem Spark's optimizer turns into
    BroadcastNestedLoop/cartesian when written as a theta join.

    Bin-bucketing: the numeric point domain is cut into fixed-width bins;
    each point maps to its one bin, each interval EXPLODES into every bin
    it overlaps, and the join becomes an equi-join on the bin id followed
    by the exact range predicate. Shuffle cost is keyed and proportional
    to data volume x (interval_span / bin_width), never |points| x
    |intervals|. A point lies in exactly one bin, so no post-join
    de-duplication is needed.

    ``point_col`` / ``start_col`` / ``end_col`` must be integer-like
    numerics (cast timestamps to epoch days/seconds first — integer bin
    arithmetic is portable to any SQL engine). Pick ``bin_width`` near the
    typical interval span: much smaller multiplies the interval fan-out,
    much larger multiplies false candidate pairs.
    """
    p = points.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("bigint")
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bin_width)).cast("bigint"),
                F.floor(F.col(end_col) / F.lit(bin_width)).cast("bigint"),
            )
        ),
    )
    return (
        p.join(i, "__bin", how)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bin")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join. ``direction="backward"`` (default): for each left row,
    the LATEST right row with right_time <= left_time within the key
    group. ``direction="forward"``: the EARLIEST right row with
    right_time >= left_time — next-event enrichment (time-to-outcome
    labels, next-fill matching). ``direction="nearest"``: whichever of
    the two is closer in time per value column (ties go backward — the
    pandas merge_asof convention); both carries run over the SAME
    keyed partitioning, so nearest still costs one shuffle (plus a
    second in-partition sort for the reverse scan). All directions are
    the same union-and-carry plan. ``tolerance_seconds`` bounds
    staleness (timestamp time columns only): a match farther than the
    tolerance from the left timestamp is nulled out — the market-data
    contract ("last quote, but never older than 30s"); applied AFTER
    the carry (for nearest: to the CHOSEN side's gap), no extra
    shuffle.

    Spark lacks a native as-of join; a naive range join is O(n*m). This
    implementation uses the union-and-carry-forward trick — one shuffle on
    ``on`` + one in-partition sort, the same cost as a window function, so
    it scales like any other keyed window at 100 TB:

      1. tag right rows 0, left rows 1; union by a common schema
      2. sort by (key, time, tag) — right rows sort before left at ties,
         giving >= (inclusive) semantics
      3. last(value, ignorenulls) over the ordered window carries each
         right value forward to the left rows that follow it
    """
    lcols = left.columns
    tag = F.lit(1)
    l_side = left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__rv_{v}") for v in right_values],
        F.col(left_time).alias("__t"),
        tag.alias("__tag"),
    )
    r_side = right.select(
        *[F.col(k) for k in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on
        ],
        *[F.col(v).alias(f"__rv_{v}") for v in right_values],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
    ).select(*lcols, *[f"__rv_{v}" for v in right_values], "__t", "__tag")

    unioned = l_side.unionByName(r_side)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")

    def _window(backward: bool):
        order = (
            [F.col("__t"), F.col("__tag")]
            if backward
            # forward: scan later times first; at time ties the right row
            # (tag 0) still precedes the left row, keeping >= inclusive
            else [F.col("__t").desc(), F.col("__tag")]
        )
        return (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    def _carry(w, val_prefix, mt_prefix, with_mt):
        cols = {
            f"{val_prefix}{v}": F.last(
                F.col(f"__rv_{v}"), ignorenulls=True
            ).over(w)
            for v in right_values
        }
        if with_mt:
            # Per-VALUE matched timestamp with the same null-skipping
            # rule as the value carry: a right row with a NULL value
            # column supplies nothing, so it must not advance that
            # column's staleness clock.
            cols.update(
                {
                    f"{mt_prefix}{v}": F.last(
                        F.when(
                            (F.col("__tag") == 0)
                            & F.col(f"__rv_{v}").isNotNull(),
                            F.col("__t"),
                        ),
                        ignorenulls=True,
                    ).over(w)
                    for v in right_values
                }
            )
        return cols

    if direction == "nearest":
        carried = unioned.withColumns(
            {
                **_carry(_window(True), "__bv_", "__bmt_", True),
                **_carry(_window(False), "__fv_", "__fmt_", True),
            }
        )
        t_us = F.unix_micros(F.col("__t"))
        for v in right_values:
            bgap = t_us - F.unix_micros(F.col(f"__bmt_{v}"))
            fgap = F.unix_micros(F.col(f"__fmt_{v}")) - t_us
            # pick the closer non-null side; ties -> backward
            use_b = F.col(f"__fmt_{v}").isNull() | (
                F.col(f"__bmt_{v}").isNotNull() & (bgap <= fgap)
            )
            val = F.when(use_b, F.col(f"__bv_{v}")).otherwise(F.col(f"__fv_{v}"))
            gap = F.when(use_b, bgap).otherwise(fgap)
            if tolerance_seconds is not None:
                tol = F.lit(int(tolerance_seconds * 1_000_000))
                val = F.when(gap <= tol, val)
            carried = carried.withColumn(f"{v}{suffix}", val)
        return carried.filter(F.col("__tag") == 1).select(
            *lcols, *[f"{v}{suffix}" for v in right_values]
        )

    w = _window(direction == "backward")
    carried = unioned.withColumns(
        {
            f"{v}{suffix}": F.last(F.col(f"__rv_{v}"), ignorenulls=True).over(w)
            for v in right_values
        }
    )
    if tolerance_seconds is not None:
        # Per-VALUE matched timestamp with the same null-skipping rule as
        # the value carry: a right row with a NULL value column supplies
        # nothing, so it must not advance that column's staleness clock —
        # otherwise the gap is measured against a newer right row than the
        # one whose value is carried, and the tolerance check nulls out
        # (or keeps) the wrong match. Same window → shares the one sort.
        tol = F.lit(int(tolerance_seconds * 1_000_000))
        carried = carried.withColumns(
            {
                f"__mt_{v}": F.last(
                    F.when(
                        (F.col("__tag") == 0) & F.col(f"__rv_{v}").isNotNull(),
                        F.col("__t"),
                    ),
                    ignorenulls=True,
                ).over(w)
                for v in right_values
            }
        )
        carried = carried.withColumns(
            {
                f"{v}{suffix}": F.when(
                    F.abs(
                        F.unix_micros(F.col("__t"))
                        - F.unix_micros(F.col(f"__mt_{v}"))
                    )
                    <= tol,
                    F.col(f"{v}{suffix}"),
                )
                for v in right_values
            }
        )
    return carried.filter(F.col("__tag") == 1).select(
        *lcols, *[f"{v}{suffix}" for v in right_values]
    )


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (temporal) join against an SCD2-style versioned
    dimension: each fact row picks the dimension version whose validity
    interval [valid_from, valid_to) contains the fact timestamp
    (valid_to NULL = open version). The dimensional-correctness pattern
    every lakehouse needs once dimensions keep history (pairs with
    cdc.scd2_apply).

    Plan shape: equi-join on the business key with the interval test as
    a residual predicate — one shuffle on the key (SortMergeJoin /
    broadcast if the dimension is small), never a range cross-join;
    versions-per-key is small by construction so residual fan-out is
    bounded.
    """
    cond = None
    for k in keys:
        fk, dk = (k, k) if isinstance(k, str) else k
        c = facts[fk].eqNullSafe(dim[dk])
        cond = c if cond is None else cond & c
    ts = facts[fact_ts]
    cond = cond & (ts >= dim[valid_from]) & (
        dim[valid_to].isNull() | (ts < dim[valid_to])
    )
    return facts.join(dim, cond, how)


def fuzzy_self_join(
    df: DataFrame,
    text_col: str,
    block: Column,
    max_dist: int = 2,
) -> DataFrame:
    """Edit-distance self-join with blocking — the entity-resolution
    primitive (name/variant matching): candidate pairs share a blocking
    key (a cheap deterministic function of the string — last token,
    length band, q-gram prefix), then exact Levenshtein filters within
    the block. Cost follows block collision volume, never all-pairs —
    the same candidates-then-verify shape as the MinHash/SimHash dedup
    family, with JVM-side levenshtein as the verifier.

    Output: (text_a, text_b, dist), text_a < text_b, dist <= max_dist.
    """
    withb = df.select(F.col(text_col).alias("__t"), block.alias("__b")).distinct()
    a = withb.select(F.col("__t").alias("text_a"), "__b")
    b = withb.select(F.col("__t").alias("text_b"), "__b")
    return (
        a.join(b, "__b")
        .filter(F.col("text_a") < F.col("text_b"))
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
        .select("text_a", "text_b", "dist")
    )
