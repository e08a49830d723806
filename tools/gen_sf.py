"""Generate driver-shaped synthetic testdata at an arbitrary scale
factor — the scale-rehearsal harness (VERDICT round 9 → 10 item #1):
the driver ships sf0.001/0.01/0.1 only, so every >sf0.1 claim in
SCALE.md was design-reading until this tool existed. It manufactures
sfN with the SAME schemas, categorical domains, and distribution
shapes as the driver data (profiled from the reference dir, default
sf0.1):

  table      rows (x sf)            shape notes
  region     5  (fixed, copied)     —
  nation     25 (fixed, copied)     —
  customer   150k                   acctbal U(-1000,10000), segments empirical
  supplier   10k                    acctbal U(-1000,10000)
  part       200k                   brand/type empirical, size U(1,50)
  orders     1.5M                   orderdate U(1995-01-01, 2001-08-01)
  lineitem   Poisson(4)/order       qty U{1..50}, disc U{0..0.10 step .01},
                                    tax U{0..0.08 step .01}, ship=date+U(1,95)d
                                    (~1.8% of orders have ZERO lineitems,
                                    matching the driver's Poisson zeros)
  events     1M (users 15k)         FIXED 30-day window (density scales,
                                    matching the driver: sf0.01→0.1 kept the
                                    window, 10x the rate), value ~ Exp(50),
                                    props = {"k": U(0,99)}
  documents  50k                    U(10,100) words over the driver's 31-token
                                    vocab, lang/source empirical, 0.16% exact
                                    dup rate (driver: 8 dups / 5000 docs).
                                    --open-vocab swaps the CLOSED driver vocab
                                    for a Zipf(1.07) draw over a Heaps-law
                                    vocabulary (V ≈ 3·T^0.7 grows with corpus
                                    size) — the open-vocabulary regime real
                                    corpora exhibit, where shingle document
                                    frequencies stay O(1) and exact SSJoin
                                    candidate volume stays ~linear (the
                                    adjudication corpus for SCALE.md §18)
  embeddings 20k                    unit-normalized N(0,1)^64 float32,
                                    label U(0,9) (driver vectors carry no
                                    cluster structure: within-label mean
                                    cosine == global mean == 0.0)

Determinism: one numpy PCG64 seeded stream; same (sf, seed) → same bytes.
Usage:  python tools/gen_sf.py 1.0 /tmp/sf1 [--seed 42] [--ref /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
P_ADJ = ["large", "hot", "blue", "old", "small", "green", "red", "new"]
P_NOUN = ["ring", "bolt", "plate", "screw", "nut", "gear", "pipe", "cap"]


def _cats(ref: str, table: str, col: str, weighted: bool = False):
    """Empirical categorical domain (and optional frequencies) from the
    reference data — keeps generated categories byte-identical to the
    driver's so every corpus query's literals still select rows."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {col}, COUNT(*) FROM "
        f"read_parquet('{ref}/{table}.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vals = [r[0] for r in rows]
    if not weighted:
        return vals
    tot = sum(r[1] for r in rows)
    return vals, np.array([r[1] / tot for r in rows])


def _ts_us(base: str) -> int:
    return int(np.datetime64(base, "us").astype(np.int64))


def _write(out: str, name: str, cols: dict, chunk: int = 1_000_000) -> None:
    tbl = pa.table(cols)
    pq.write_table(
        tbl, os.path.join(out, f"{name}.parquet"),
        row_group_size=min(chunk, max(1, tbl.num_rows)),
    )
    print(f"  {name}: {tbl.num_rows} rows")


def generate(sf: float, out: str, seed: int = 42,
             ref: str = "/root/testdata/sf0.1",
             open_vocab: bool = False) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation"):  # fixed tiny dims: copy verbatim
        shutil.copyfile(
            os.path.join(ref, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
        print(f"  {t}: copied from ref")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    segs = _cats(ref, "customer", "c_mktsegment")
    _write(out, "customer", {
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, n_cust), 2), pa.float64()),
        "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, len(segs), n_cust)]),
    })
    _write(out, "supplier", {
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, n_supp), 2), pa.float64()),
    })
    brands = _cats(ref, "part", "p_brand")
    ptypes = _cats(ref, "part", "p_type")
    _write(out, "part", {
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([
            f"{P_ADJ[a]} {P_NOUN[b]}"
            for a, b in zip(rng.integers(0, len(P_ADJ), n_part),
                            rng.integers(0, len(P_NOUN), n_part))
        ]),
        "p_brand": pa.array(np.array(brands)[rng.integers(0, len(brands), n_part)]),
        "p_type": pa.array(np.array(ptypes)[rng.integers(0, len(ptypes), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(900, 1000, n_part), 2), pa.float64()),
    })

    statuses = _cats(ref, "orders", "o_orderstatus")
    prios = _cats(ref, "orders", "o_orderpriority")
    od0, od1 = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    odate_day = rng.integers(0, (od1 - od0) // DAY_US + 1, n_ord)
    odate = od0 + odate_day * DAY_US
    _write(out, "orders", {
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(statuses)[rng.integers(0, len(statuses), n_ord)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, n_ord), 2), pa.float64()),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(prios)[rng.integers(0, len(prios), n_ord)]),
    })

    # lineitem: Poisson(4) lines per order (zeros stay zero-line orders)
    nlines = rng.poisson(4.0, n_ord)
    l_ok = np.repeat(np.arange(n_ord), nlines)
    n_li = int(l_ok.size)
    l_ln = (np.concatenate([np.arange(c) for c in nlines if c > 0]) + 1
            if n_li else np.array([], dtype=np.int64))
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(rng.uniform(900, 105000, n_li), 2)
    disc = rng.integers(0, 11, n_li) / 100.0
    tax = rng.integers(0, 9, n_li) / 100.0
    rflag = np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
    lstat = np.array(["F", "O"])[rng.integers(0, 2, n_li)]
    ship = odate[l_ok] + rng.integers(1, 96, n_li) * DAY_US
    _write(out, "lineitem", {
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_ln, pa.int32()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
        "l_tax": pa.array(tax, pa.float64()),
        "l_returnflag": pa.array(rflag),
        "l_linestatus": pa.array(lstat),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    })

    etypes = _cats(ref, "events", "event_type")
    ev0 = _ts_us("2024-01-01")
    ev_ts = ev0 + rng.integers(0, 30 * DAY_US, n_ev)
    _write(out, "events", {
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(etypes)[rng.integers(0, len(etypes), n_ev)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev), 2),
                          pa.float64()),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.integers(0, 100, n_ev)]),
    })

    langs, lang_p = _cats(ref, "documents", "lang", weighted=True)
    sources = _cats(ref, "documents", "source")
    nw = rng.integers(10, 101, n_doc)
    if open_vocab:
        # Heaps-law vocabulary: V grows sublinearly with total token
        # count, so document frequencies stay O(1) as the corpus scales
        # — the regime where exact SSJoin candidates stay ~linear.
        total = int(nw.sum())
        V = max(100, int(3 * total ** 0.7))
        ranks = np.arange(1, V + 1, dtype=np.float64)
        p = 1.0 / ranks ** 1.07  # Zipf exponent ~ natural language
        p /= p.sum()
        words = np.array([f"z{r}" for r in range(V)])[
            rng.choice(V, total, p=p)
        ]
        print(f"  documents: open vocab V={V} over {total} tokens")
    else:
        vocab = np.array(VOCAB)
        words = vocab[rng.integers(0, len(vocab), int(nw.sum()))]
    texts, pos = [], 0
    for c in nw:
        texts.append(" ".join(words[pos:pos + c]))
        pos += c
    # driver dup rate: 8 exact dups per 5000 docs (0.16%)
    for i in rng.integers(0, n_doc, max(1, int(0.0016 * n_doc))):
        texts[int(i)] = texts[int(rng.integers(0, n_doc))]
    _write(out, "documents", {
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(
            np.array(langs)[rng.choice(len(langs), n_doc, p=lang_p)]),
        "source": pa.array(
            np.array(sources)[rng.integers(0, len(sources), n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", {
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    })


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", type=float)
    ap.add_argument("out")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ref", default="/root/testdata/sf0.1")
    ap.add_argument("--open-vocab", action="store_true",
                    help="Zipf/Heaps growing document vocabulary instead "
                         "of the driver's closed 31-token set")
    a = ap.parse_args()
    print(f"generating sf={a.sf} -> {a.out} (seed={a.seed}"
          f"{', open-vocab' if a.open_vocab else ''})")
    generate(a.sf, a.out, seed=a.seed, ref=a.ref, open_vocab=a.open_vocab)
