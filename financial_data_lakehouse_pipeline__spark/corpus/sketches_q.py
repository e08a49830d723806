"""Corpus: frequency-sketch operators over `events` (operators/sketches).

The md5-derived bucket hashes make the count-min sketch bit-reproducible
in plain SQL (the dedup.py portability discipline), so even the SKETCH —
normally an engine-private approximation — gets a value-level DuckDB
oracle, not just a bounds test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.corpus import register
from financial_data_lakehouse_pipeline__spark.operators import sketches
from financial_data_lakehouse_pipeline__spark.sources import read_table

_DEPTH = 4
_WIDTH = 256

#: d ∈ [0, depth) × every non-null key row → its CMS cell.
#: '0x'||substr(md5('d|key'),1,7) is the shared 28-bit md5-prefix hash
#: (same arithmetic as the minhash oracle); % width on non-negatives is
#: identical in both engines.
_CELLS = f"""
cells AS (
  SELECT d,
         CAST(('0x' || substr(md5(concat(CAST(d AS VARCHAR), '|',
                                         CAST(user_id AS VARCHAR))), 1, 7))
              AS BIGINT) % {_WIDTH} AS w
  FROM events, UNNEST(range(0, {_DEPTH})) AS t(d)
  WHERE user_id IS NOT NULL
),
sketch AS (
  SELECT CAST(d AS INT) AS d, w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY d, w
)"""


@register(
    "cms_sketch_users",
    f"WITH {_CELLS} SELECT d, w, cnt FROM sketch",
)
def cms_sketch_users(spark, sf_dir):
    """Count-min sketch of events.user_id (depth=4, width=256) — the
    fixed-size frequency summary itself, cell by cell
    (operators/sketches.count_min_sketch). depth*width cells bound the
    output no matter how many rows or distinct users feed it."""
    ev = read_table(spark, sf_dir, "events")
    return sketches.count_min_sketch(ev, "user_id", depth=_DEPTH, width=_WIDTH)


@register(
    "cms_heavy_users",
    f"""WITH {_CELLS},
        probes AS (
          SELECT DISTINCT e.user_id, c.d,
                 CAST(('0x' || substr(md5(concat(CAST(c.d AS VARCHAR), '|',
                                        CAST(e.user_id AS VARCHAR))), 1, 7))
                      AS BIGINT) % {_WIDTH} AS w
          FROM events e, UNNEST(range(0, {_DEPTH})) AS c(d)
          WHERE e.user_id IS NOT NULL
        ),
        est AS (
          SELECT p.user_id, MIN(COALESCE(s.cnt, 0)) AS est_cnt
          FROM probes p LEFT JOIN sketch s ON s.d = p.d AND s.w = p.w
          GROUP BY p.user_id
        ),
        exact AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        )
        SELECT e.user_id, CAST(e.est_cnt AS BIGINT) AS est_cnt, x.cnt
        FROM est e JOIN exact x ON x.user_id = e.user_id
        WHERE e.est_cnt >= 80 AND x.cnt >= 80""",
)
def cms_heavy_users(spark, sf_dir):
    """Heavy hitters with sketch pruning + exact verification
    (operators/sketches.cms_heavy_hitters): CMS estimates never
    undercount, so est_cnt >= threshold keeps every true heavy hitter;
    the exact count over the semi-joined hot tail removes collision
    false-positives — candidates-then-verify, the LSH shape applied to
    frequency."""
    ev = read_table(spark, sf_dir, "events")
    return sketches.cms_heavy_hitters(
        ev, "user_id", min_count=80, depth=_DEPTH, width=_WIDTH
    )


@register(
    "streaming_cms_users",
    f"WITH {_CELLS} SELECT d, w, cnt FROM sketch",
)
def streaming_cms_users(spark, sf_dir):
    """Streaming count-min sketch driven to completion
    (streaming/sketch_stream): cell counts are linearly mergeable, so
    the incremental aggregation equals the batch sketch exactly — same
    oracle as cms_sketch_users. State is depth×width counters, bounded
    forever (the streaming story exact per-key counting can't tell)."""
    import os

    from financial_data_lakehouse_pipeline__spark import streaming as st

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = st.stream_from_parquet_dir(
        spark, sf_dir, raw_schema, glob="events.parquet"
    )
    sk = st.sketch_stream(stream, "user_id", depth=_DEPTH, width=_WIDTH)
    return st.run_available_now(sk, "corpus_streaming_cms_users")
