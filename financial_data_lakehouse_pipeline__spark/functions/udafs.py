"""Vectorized grouped-aggregate (GROUPED_AGG) pandas UDAFs — the third
leg of the §2.10 UDF surface beside the scalar pandas_udf
(corpus/lake.py sql_vectorized_udf) and the Python UDTF
(functions/__init__.py chunk_text_udtf).

A GROUPED_AGG pandas UDF receives each group's column(s) as full pandas
Series (Arrow-batched, never row-at-a-time) and returns one scalar; it
plugs directly into ``groupBy().agg(...)`` and plans as a single
AggregateInPandas over one hash-partition exchange — the same shuffle
shape as a built-in aggregate.

100 TB posture: unlike built-in aggregates (partial map-side combine,
bounded state), AggregateInPandas MATERIALIZES EACH FULL GROUP on one
executor — group size, not table size, is the memory bound. Reach for a
UDAF only when the kernel is genuinely not expressible with built-ins;
the demo kernel below deliberately HAS a closed form
(exp(Σ w·ln x / Σ w)) so the corpus can pair it with an exact SQL twin,
proving the Arrow plumbing end-to-end.

This module must NOT use ``from __future__ import annotations``:
pandas_udf infers GROUPED_AGG from the real ``Series -> float`` type
hints, and stringified annotations on nested/local defs break that
introspection (see the explicit-form workaround in
corpus/lake.py sql_vectorized_udf).
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_log_mean(x: pd.Series, w: pd.Series) -> float:
    """Per-group weighted mean of ln(x): Σ w·ln(x) / Σ w — the
    log-space weighted geometric mean (exp() of this is the geomean).

    Requires x > 0 (prices, quantities); NaN/None pairs are dropped,
    matching SQL aggregate NULL semantics. Returns None for an
    all-null or zero-weight group (SQL would yield NULL).
    """
    xv = x.to_numpy(dtype="float64")
    wv = w.to_numpy(dtype="float64")
    keep = ~(np.isnan(xv) | np.isnan(wv))
    xv, wv = xv[keep], wv[keep]
    tw = wv.sum()
    if xv.size == 0 or tw == 0.0:
        return None
    return float(np.dot(wv, np.log(xv)) / tw)
