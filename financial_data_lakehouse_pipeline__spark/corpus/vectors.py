"""Corpus: embedding similarity search over the `embeddings` table —
brute-force cosine top-k (exact baseline), sign-LSH bucketed near-dup and
top-k (the scale paths).

Oracle parity: Spark computes dot/norm via a sequential JVM-side fold
(F.zip_with + F.aggregate, functions.dot/l2_norm); the DuckDB oracle uses
list_reduce/list_transform — the same left-to-right IEEE addition order,
so cosines are bit-identical and no rounding is needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.corpus import register
from financial_data_lakehouse_pipeline__spark.operators import similarity
from financial_data_lakehouse_pipeline__spark.sources import read_table


def _codes_str(col: str):
    """Serialize an array<int> PQ code column to a '|'-joined string —
    the driver's canonicalizer cannot hash array-typed cells (the
    corpus lint rejects complex output columns)."""
    return F.concat_ws("|", F.transform(F.col(col), lambda c: c.cast("string")))


def _dot_sql(a: str, b: str) -> str:
    """Sequential fold dot product — mirrors functions.dot exactly."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)"
    )


def _norm_sql(v: str) -> str:
    """Euclidean norm fold — mirrors functions.l2_norm."""
    return (
        f"sqrt(list_reduce(list_transform({v}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
    )


def _cosine_sql(a: str, b: str) -> str:
    """Zero-guarded cosine — mirrors functions.cosine_similarity."""
    na, nb = _norm_sql(a), _norm_sql(b)
    return (
        f"CASE WHEN {na} * {nb} IS NOT NULL AND {na} * {nb} <> 0 "
        f"THEN {_dot_sql(a, b)} / ({na} * {nb}) END"
    )


def _bucket_sql(v: str, planes: int) -> str:
    """Axis-aligned sign-LSH sketch — mirrors similarity.sign_lsh_bucket."""
    bits = " || ".join(
        f"CASE WHEN {v}[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(planes)
    )
    return f"({bits})"


#: The seeded projection matrix shared by the Spark plan and the SQL
#: oracle — repr(float) literals round-trip exactly in both engines, and
#: the projection fold order matches (_dot_sql ≡ functions.dot), so
#: bucket bits are bit-identical cross-engine.
_HYPERPLANES_NEARDUP = similarity.random_hyperplanes(dim=64, planes=8, seed=7)
_HYPERPLANES_TOPK = similarity.random_hyperplanes(dim=64, planes=4, seed=7)


def _bucket_proj_sql(v: str, hyperplanes) -> str:
    """Random-hyperplane sign-LSH sketch — mirrors
    similarity.sign_lsh_bucket_projected with the identical literals."""
    bits = []
    for plane in hyperplanes:
        lits = ", ".join(repr(float(w)) for w in plane)
        bits.append(
            f"CASE WHEN {_dot_sql(v, f'[{lits}]')} >= 0 THEN '1' ELSE '0' END"
        )
    return "(" + " || ".join(bits) + ")"


@register(
    "brute_force_topk",
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
             scored AS (
               SELECT query_id, neighbor_id, {_cosine_sql('qv', 'cv')} AS cosine
               FROM c, q WHERE query_id <> neighbor_id
             )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored)
        WHERE rn <= 10""",
)
def brute_force_topk(spark, sf_dir):
    """Exact cosine top-10 for a small query set (vec_id < 5) — broadcast
    queries against the streamed corpus (operators/similarity
    .brute_force_topk). The correctness baseline for the LSH paths."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.brute_force_topk(q, emb, k=10)


@register(
    "cosine_neardup",
    f"""WITH e AS (SELECT vec_id, embedding,
                          {_bucket_proj_sql('embedding', _HYPERPLANES_NEARDUP)} AS b
                   FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_cosine_sql('a.embedding', 'b.embedding')} AS cosine
        FROM e a JOIN e b ON a.b = b.b AND a.vec_id < b.vec_id
        WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= 0.35""",
)
def cosine_neardup(spark, sf_dir):
    """Near-dup pairs (cosine >= 0.35) among seeded random-hyperplane
    sign-LSH bucket collisions — equi-join on the bucket key, never
    all-pairs (operators/similarity.cosine_neardup). 8 Gaussian planes
    (256 uniform buckets; scale planes ~log2(N)); recall is approximate
    by design and the oracle reproduces the SAME projection literals, so
    the bucketing is pinned, not hidden."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup(
        emb, threshold=0.35, hyperplanes=_HYPERPLANES_NEARDUP
    )


@register(
    "signlsh_topk",
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
                          {_bucket_proj_sql('embedding', _HYPERPLANES_TOPK)} AS b
                   FROM embeddings WHERE vec_id < 20),
             c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                          {_bucket_proj_sql('embedding', _HYPERPLANES_TOPK)} AS b
                   FROM embeddings),
             scored AS (
               SELECT query_id, neighbor_id, {_cosine_sql('qv', 'cv')} AS cosine
               FROM c JOIN q USING (b) WHERE query_id <> neighbor_id
             )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored)
        WHERE rn <= 5""",
)
def signlsh_topk(spark, sf_dir):
    """Approximate top-5 restricted to the query's seeded random-
    hyperplane sign-LSH bucket — the IVF-style scale path: one equi-join
    on the bucket key instead of a cross join (operators/similarity
    .signlsh_topk). Recall vs brute force is pinned in
    tests/test_similarity.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return similarity.signlsh_topk(q, emb, k=5, hyperplanes=_HYPERPLANES_TOPK)


@register(
    "ivf_topk",
    f"""WITH flat AS (
          SELECT label, unnest(embedding) AS v,
                 unnest(range(1, len(embedding) + 1)) AS i
          FROM embeddings
        ), cent AS (
          SELECT label, i, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS c
          FROM flat GROUP BY label, i
        ), centl AS (
          SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY label
        ), q AS (
          SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 10
        ), cells AS (
          SELECT query_id, qv, label FROM (
            SELECT q.query_id, q.qv, c.label,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY {_cosine_sql('q.qv', 'c.centroid')} DESC, c.label)
                       AS cr
            FROM q, centl c
          ) WHERE cr <= 2
        ), scored AS (
          SELECT cells.query_id, e.vec_id AS neighbor_id,
                 {_cosine_sql('cells.qv', 'e.embedding')} AS cosine
          FROM cells JOIN embeddings e ON e.label = cells.label
          WHERE e.vec_id <> cells.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored)
        WHERE rn <= 5""",
)
def ivf_topk(spark, sf_dir):
    """IVF approximate top-5: label centroids as the coarse quantizer,
    probe the 2 nearest cells, exact cosine only within those inverted
    lists (operators/similarity.ivf_topk) — the classic ANN scale path:
    centroids broadcast, one equi-join on the cell key, no cross join.
    Output cosines are raw-vector folds (bit-identical); the internal
    probe ranking tolerates the centroids' last-bit engine differences."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cents = similarity.centroids_by_label(emb, dim=64)
    return similarity.ivf_topk(q, emb, cents, k=5, nprobe=2)


@register(
    "label_centroid_similarity",
    f"""WITH flat AS (
          SELECT label, unnest(embedding) AS v,
                 unnest(range(1, len(embedding) + 1)) AS i
          FROM embeddings
        ), cent AS (
          SELECT label, i, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS c
          FROM flat GROUP BY label, i
        ), centl AS (
          SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY label
        )
        SELECT e.vec_id, e.label,
               ROUND({_cosine_sql('e.embedding', 'c.centroid')}, 6)
                   AS centroid_cosine
        FROM embeddings e JOIN centl c ON e.label = c.label""",
)
def label_centroid_similarity(spark, sf_dir):
    """Per-label centroid + each vector's cosine to its own centroid — the
    cluster-assignment primitive of IVF indexing, as one aggregation +
    one broadcast join (no explode of the fact side). The centroid mean is
    a SUM over doubles (order-dependent in the last bits), so the cosine is
    ROUNDed to 6 — the one inherently-floating aggregate in this corpus."""
    emb = read_table(spark, sf_dir, "embeddings")
    from financial_data_lakehouse_pipeline__spark.functions import cosine_similarity

    dim = 64
    # Explode-free per-coordinate aggregation: one JVM-side SUM per
    # coordinate, one shuffle on label, centroids broadcast back.
    sums = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.element_at("embedding", i + 1).cast("double")).alias(f"__s{i}")
            for i in range(dim)
        ],
    )
    cent = sums.select(
        "label",
        F.array(
            *[(F.col(f"__s{i}") / F.col("__n")).cast("double") for i in range(dim)]
        ).alias("centroid"),
    )
    joined = emb.join(F.broadcast(cent), "label")
    return joined.select(
        "vec_id",
        "label",
        F.round(
            cosine_similarity(F.col("embedding"), F.col("centroid")), 6
        ).alias("centroid_cosine"),
    )


def _dist2_sql(a: str, b: str) -> str:
    """Sequential squared-L2 fold — mirrors similarity.kmeans_assign."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * "
        f"(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


#: Per-coordinate mean over 1e-12-quantized values — mirrors the kmeans /
#: semantic_dedup centroid update (exact DECIMAL(38,0) integer sums, one
#: cast-to-double, two double divisions; no decimal-cast tie rules).
_CMEAN = (
    "CAST(SUM(CAST(FLOOR(x * 1e12 + 5e-1) AS DECIMAL(38,0))) AS DOUBLE) "
    "/ 1e12 / COUNT(*)"
)


def _kmeans_sql(k: int, iters: int) -> str:
    """Unrolled Lloyd iterations: assignment (argmin over the centroid
    set, ties to smallest cid) and update (quantized-integer mean),
    exactly the recurrence similarity.kmeans runs — the driver verifies
    an ITERATIVE algorithm end-to-end, not a one-shot projection."""
    parts = [
        "v AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS c "
        f"FROM v WHERE vec_id < {k})",
    ]
    for t in range(iters):
        parts.append(
            f"a{t} AS (SELECT vec_id, v, cid, d FROM ("
            f"SELECT v.vec_id, v.v, c.cid, {_dist2_sql('v.v', 'c.c')} AS d "
            f"FROM v, c{t} c) "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY d, cid) = 1)"
        )
        parts.append(
            f"c{t + 1} AS (SELECT cid, list(cc ORDER BY i) AS c FROM ("
            f"SELECT cid, i, {_CMEAN} AS cc "
            f"FROM (SELECT cid, unnest(v) AS x, "
            f"unnest(range(1, len(v) + 1)) AS i FROM a{t}) "
            f"GROUP BY cid, i) GROUP BY cid)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
        SELECT vec_id, cid AS cluster, d AS dist2 FROM (
          SELECT v.vec_id, c.cid, {_dist2_sql('v.v', 'c.c')} AS d
          FROM v, c{iters} c)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1"""
    )


@register("kmeans_embeddings", _kmeans_sql(k=8, iters=2))
def kmeans_embeddings(spark, sf_dir):
    """Lloyd's k-means (k=8, 2 update rounds) over the embedding corpus
    (operators/similarity.kmeans) — the iterative-DataFrame-algorithm
    pattern: literal-centroid assignment (pure projection, no shuffle),
    k×dim exact-integer update aggregation, O(k·dim) driver collect per
    iteration (the MLlib iteration structure). Every centroid and
    distance is bit-identical cross-engine (quantized-integer means,
    sequential folds), so the oracle hash-matches an ITERATIVE
    clustering — assignments included — with no rounding."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.kmeans(emb, k=8, iters=2, dim=64)


def _pq_sql(m: int = 4, k: int = 8, iters: int = 1, dim: int = 64, topk: int = 10) -> str:
    """Unrolled product quantization: per subspace, the same Lloyd
    recurrence as _kmeans_sql on the coordinate slice; then encode
    (argmin over the final codebook), an ADC distance table for the
    query (vec_id 0), and the table-lookup top-k — mirrors
    similarity.pq_train / pq_encode / pq_adc_topk term for term,
    including the left-to-right addition order of the m lookup terms."""
    sub = dim // m
    parts = [
        "v AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
    ]
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(f"v_{s} AS (SELECT vec_id, v[{lo}:{hi}] AS sv FROM v)")
        parts.append(
            f"c0_{s} AS (SELECT CAST(vec_id AS INT) AS cid, sv AS c "
            f"FROM v_{s} WHERE vec_id < {k})"
        )
        for t in range(iters):
            parts.append(
                f"a{t}_{s} AS (SELECT vec_id, sv, cid FROM ("
                f"SELECT w.vec_id, w.sv, c.cid, {_dist2_sql('w.sv', 'c.c')} AS d "
                f"FROM v_{s} w, c{t}_{s} c) "
                f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id "
                f"ORDER BY d, cid) = 1)"
            )
            parts.append(
                f"c{t + 1}_{s} AS (SELECT cid, list(cc ORDER BY i) AS c FROM ("
                f"SELECT cid, i, {_CMEAN} AS cc "
                f"FROM (SELECT cid, unnest(sv) AS x, "
                f"unnest(range(1, len(sv) + 1)) AS i FROM a{t}_{s}) "
                f"GROUP BY cid, i) GROUP BY cid)"
            )
        parts.append(
            f"e_{s} AS (SELECT vec_id, cid AS code FROM ("
            f"SELECT w.vec_id, c.cid, {_dist2_sql('w.sv', 'c.c')} AS d "
            f"FROM v_{s} w, c{iters}_{s} c) "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY d, cid) = 1)"
        )
        parts.append(f"q_{s} AS (SELECT sv FROM v_{s} WHERE vec_id = 0)")
        parts.append(
            f"t_{s} AS (SELECT c.cid, {_dist2_sql('q.sv', 'c.c')} AS d "
            f"FROM c{iters}_{s} c, q_{s} q)"
        )
    enc_joins = " ".join(
        f"JOIN e_{s} ON e_{s}.vec_id = v.vec_id" for s in range(m)
    )
    t_joins = " ".join(f"JOIN t_{s} ON t_{s}.cid = e_{s}.code" for s in range(m))
    codes_list = ", ".join(f"e_{s}.code" for s in range(m))
    dist_sum = " + ".join(f"t_{s}.d" for s in range(m))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT v.vec_id, array_to_string([{codes_list}], '|') AS codes, {dist_sum} AS adc_dist
        FROM v {enc_joins} {t_joins}
        ORDER BY adc_dist, v.vec_id LIMIT {topk}"""
    )


def _ivfpq_sql(
    coarse_k: int = 4,
    coarse_iters: int = 1,
    m: int = 4,
    k: int = 8,
    pq_iters: int = 1,
    dim: int = 64,
    nprobe: int = 2,
    topk: int = 10,
) -> str:
    """Unrolled residual IVF-PQ — mirrors similarity.ivfpq_index /
    ivfpq_topk term for term: coarse Lloyd cells, residual subtraction,
    per-subspace residual codebooks, the query's per-cell ADC tables,
    and the probed-cell top-k. Same tie rules everywhere (d then cid;
    adc then vec_id); same left-to-right float addition order."""
    sub = dim // m
    parts = [
        "v AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS c "
        f"FROM v WHERE vec_id < {coarse_k})",
    ]
    for t in range(coarse_iters):
        parts.append(
            f"a{t} AS (SELECT vec_id, v, cid FROM ("
            f"SELECT w.vec_id, w.v, c.cid, {_dist2_sql('w.v', 'c.c')} AS d "
            f"FROM v w, c{t} c) "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY d, cid) = 1)"
        )
        parts.append(
            f"c{t + 1} AS (SELECT cid, list(cc ORDER BY i) AS c FROM ("
            f"SELECT cid, i, {_CMEAN} AS cc "
            f"FROM (SELECT cid, unnest(v) AS x, "
            f"unnest(range(1, len(v) + 1)) AS i FROM a{t}) "
            f"GROUP BY cid, i) GROUP BY cid)"
        )
    cf = f"c{coarse_iters}"
    parts.append(
        f"af AS (SELECT vec_id, v, cid FROM ("
        f"SELECT w.vec_id, w.v, c.cid, {_dist2_sql('w.v', 'c.c')} AS d "
        f"FROM v w, {cf} c) "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1)"
    )
    parts.append(
        "r AS (SELECT af.vec_id, af.cid AS cluster, "
        "list_transform(list_zip(af.v, c.c), "
        "x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS rv "
        f"FROM af JOIN {cf} c ON c.cid = af.cid)"
    )
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(
            f"r_{s} AS (SELECT vec_id, cluster, rv[{lo}:{hi}] AS sv FROM r)"
        )
        parts.append(
            f"pc0_{s} AS (SELECT CAST(vec_id AS INT) AS cid, sv AS c "
            f"FROM r_{s} WHERE vec_id < {k})"
        )
        for t in range(pq_iters):
            parts.append(
                f"pa{t}_{s} AS (SELECT vec_id, sv, cid FROM ("
                f"SELECT w.vec_id, w.sv, c.cid, {_dist2_sql('w.sv', 'c.c')} AS d "
                f"FROM r_{s} w, pc{t}_{s} c) "
                f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id "
                f"ORDER BY d, cid) = 1)"
            )
            parts.append(
                f"pc{t + 1}_{s} AS (SELECT cid, list(cc ORDER BY i) AS c FROM ("
                f"SELECT cid, i, {_CMEAN} AS cc "
                f"FROM (SELECT cid, unnest(sv) AS x, "
                f"unnest(range(1, len(sv) + 1)) AS i FROM pa{t}_{s}) "
                f"GROUP BY cid, i) GROUP BY cid)"
            )
        parts.append(
            f"e_{s} AS (SELECT vec_id, cid AS code FROM ("
            f"SELECT w.vec_id, c.cid, {_dist2_sql('w.sv', 'c.c')} AS d "
            f"FROM r_{s} w, pc{pq_iters}_{s} c) "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY d, cid) = 1)"
        )
    parts.append("q AS (SELECT v FROM v WHERE vec_id = 0)")
    parts.append(
        f"qcells AS (SELECT cid, c FROM ("
        f"SELECT c.cid, c.c, {_dist2_sql('q.v', 'c.c')} AS d FROM {cf} c, q) "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY d, cid) <= {nprobe})"
    )
    parts.append(
        "qr AS (SELECT qc.cid AS cell, "
        "list_transform(list_zip(q.v, qc.c), "
        "x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qr "
        "FROM qcells qc, q)"
    )
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(
            f"t_{s} AS (SELECT qr.cell, cb.cid AS code, "
            f"{_dist2_sql(f'qr.qr[{lo}:{hi}]', 'cb.c')} AS d "
            f"FROM qr, pc{pq_iters}_{s} cb)"
        )
    enc_joins = " ".join(f"JOIN e_{s} ON e_{s}.vec_id = r.vec_id" for s in range(m))
    t_joins = " ".join(
        f"JOIN t_{s} ON t_{s}.cell = r.cluster AND t_{s}.code = e_{s}.code"
        for s in range(m)
    )
    codes_list = ", ".join(f"e_{s}.code" for s in range(m))
    dist_sum = " + ".join(f"t_{s}.d" for s in range(m))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT r.vec_id, r.cluster, array_to_string([{codes_list}], '|') AS codes,
               {dist_sum} AS adc_dist
        FROM r {enc_joins} {t_joins}
        ORDER BY adc_dist, r.vec_id LIMIT {topk}"""
    )


@register(
    "ivfpq_topk_embeddings",
    _ivfpq_sql(coarse_k=4, coarse_iters=1, m=4, k=8, pq_iters=1, dim=64,
               nprobe=2, topk=10),
)
def ivfpq_topk_embeddings(spark, sf_dir):
    """Residual IVF-PQ end to end (operators/similarity.ivfpq_index /
    ivfpq_topk): 4-cell coarse quantizer, residual product quantization
    (4 subspaces × 8 codes), and nprobe=2 top-10 for the query vector
    (vec_id 0) with per-cell ADC tables. The probed-cell filter is the
    IVF pruning (partition-prunable when the index is laid out by
    cluster); scoring is table lookups in codegen. Every centroid,
    residual, code, and distance hash-matches the unrolled oracle
    bit-for-bit."""
    emb = read_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").take(1)
    index, cents, books = similarity.ivfpq_index(
        emb, coarse_k=4, coarse_iters=1, m=4, k=8, pq_iters=1, dim=64
    )
    if not qrow or not cents or any(not b for b in books):
        return spark.createDataFrame(
            [], "vec_id bigint, cluster int, codes string, adc_dist double"
        )
    query = [float(x) for x in qrow[0][0]]
    out = similarity.ivfpq_topk(index, cents, books, query, nprobe=2, topk=10)
    return out.withColumn("codes", _codes_str("codes"))


@register("pq_adc_topk_embeddings", _pq_sql(m=4, k=8, iters=1, dim=64, topk=10))
def pq_adc_topk_embeddings(spark, sf_dir):
    """Product quantization end to end (operators/similarity.pq_train /
    pq_encode / pq_adc_topk): m=4 per-subspace Lloyd codebooks, vectors
    compressed to 4 small ints, and asymmetric-distance top-10 for the
    query vector (vec_id 0) via a literal m×k lookup table — scoring is
    element_at + 3 additions per row inside codegen, no float reads at
    query time. Every codebook coordinate, code, and ADC distance is
    bit-identical cross-engine (quantized-integer means + sequential
    folds), so even the compressed index is oracle-hashable."""
    emb = read_table(spark, sf_dir, "embeddings")
    books = similarity.pq_train(emb, m=4, k=8, iters=1, dim=64)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").take(1)
    if not qrow or any(not b for b in books):
        return spark.createDataFrame(
            [], "vec_id bigint, codes string, adc_dist double"
        )
    codes = similarity.pq_encode(emb, books, dim=64)
    query = [float(x) for x in qrow[0][0]]
    out = similarity.pq_adc_topk(codes, books, query, topk=10)
    return out.withColumn("codes", _codes_str("codes"))


@register(
    "semantic_dedup_embeddings",
    f"""WITH s AS (
          SELECT label, i, {_CMEAN} AS cc
          FROM (SELECT label,
                       unnest(list_transform(embedding, y -> CAST(y AS DOUBLE)))
                           AS x,
                       unnest(range(1, len(embedding) + 1)) AS i
                FROM embeddings)
          GROUP BY label, i
        ), c AS (
          SELECT label, list(cc ORDER BY i) AS centroid FROM s GROUP BY label
        ), sc AS (
          SELECT e.vec_id, e.label,
                 {_cosine_sql('e.embedding', 'c.centroid')} AS centroid_cosine
          FROM embeddings e JOIN c ON e.label = c.label
        ), r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                    ORDER BY centroid_cosine DESC, vec_id) AS rn
          FROM sc
        )
        SELECT vec_id, label, centroid_cosine,
               CASE WHEN rn = 1 THEN 'representative' ELSE 'distinct' END AS role
        FROM r WHERE rn = 1 OR centroid_cosine < 0.2""",
)
def semantic_dedup_embeddings(spark, sf_dir):
    """SemDeDup-style semantic dedup (operators/similarity
    .semantic_dedup): per-label centroids (exact quantized-integer
    means), each vector's cosine to its own cluster center, drop
    everything at cosine ≥ 0.2 except the single closest representative.
    The threshold comparison runs on bit-identical doubles — centroid
    construction and cosine folds are deterministic cross-engine — so
    survivorship itself is oracle-exact."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, threshold=0.2, dim=64)


@register(
    "quantize_embeddings_int8",
    """WITH q AS (
          SELECT vec_id,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) / 127e0 AS scale,
                 embedding
          FROM embeddings
        ),
        c AS (
          SELECT vec_id, scale,
                 CASE WHEN scale = 0
                      THEN list_transform(embedding, x -> 0)
                      ELSE list_transform(embedding,
                           x -> CAST(FLOOR(CAST(x AS DOUBLE) / scale + 5e-1)
                                     AS INT)) END AS qv
          FROM q
        )
        SELECT vec_id, scale,
               CAST(len(qv) AS INT) AS n_dims,
               CAST(list_sum(list_transform(range(1, len(qv) + 1),
                                            i -> qv[i] * i)) AS BIGINT)
                   AS q_checksum,
               CAST(list_max(list_transform(qv, x -> abs(x))) AS INT)
                   AS q_max_abs
        FROM c""",
)
def quantize_embeddings_int8(spark, sf_dir):
    """Symmetric int8 vector quantization (operators/similarity
    .quantize_int8): per-vector scale + code array, summarized as a
    position-weighted checksum so the oracle verifies every quantized
    value bit-for-bit without array-type comparison."""
    from financial_data_lakehouse_pipeline__spark.operators import similarity as sim

    e = read_table(spark, sf_dir, "embeddings")
    q = sim.quantize_int8(e)
    qv = F.col("q_embedding")
    idx = F.sequence(F.lit(1), F.size(qv))
    return q.select(
        "vec_id",
        "scale",
        F.size(qv).cast("int").alias("n_dims"),
        F.aggregate(
            F.zip_with(qv, idx, lambda a, i: a.cast("bigint") * i),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("q_checksum"),
        F.array_max(F.transform(qv, lambda x: F.abs(x))).cast("int").alias("q_max_abs"),
    )


@register(
    "hard_negatives_topk",
    f"""WITH q AS (SELECT vec_id AS query_id, label AS query_label,
                          embedding AS qv
                   FROM embeddings WHERE vec_id < 20),
             c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
                          embedding AS cv FROM embeddings),
             scored AS (
               SELECT query_id, query_label, neighbor_id, neighbor_label,
                      {_cosine_sql('qv', 'cv')} AS cosine
               FROM c, q WHERE neighbor_label <> query_label
             )
        SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
               CAST(rn AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored)
        WHERE rn <= 10""",
)
def hard_negatives_topk(spark, sf_dir):
    """Hard-negative mining (operators/similarity.hard_negatives): the
    10 most-similar DIFFERENT-label vectors per query — contrastive
    training pairs. Queries broadcast, corpus streams, label filter
    before the per-query heap; cosines are fold-identical cross-engine."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return similarity.hard_negatives(q, emb, k=10)


@register(
    "knn_label_eval",
    # The |Q| x N scored relation is MATERIALIZED with scalar columns
    # only (norms precomputed per VECTOR, not per pair — identical IEEE
    # values, so cosines are unchanged): without this DuckDB carries
    # both embedding lists into the rank window's sort and spills
    # >80 GB at sf2; with it the sort payload is five scalars.
    f"""WITH q AS (SELECT vec_id AS qid, label AS qlab, embedding AS qv,
                          {_norm_sql('embedding')} AS qn
                   FROM embeddings WHERE vec_id % 10 = 0),
             c AS (SELECT vec_id AS nid, label AS nlab, embedding AS cv,
                          {_norm_sql('embedding')} AS cn
                   FROM embeddings),
             scored AS MATERIALIZED (
               SELECT qid, qlab, nlab, nid,
                      CASE WHEN qn * cn IS NOT NULL AND qn * cn <> 0
                           THEN {_dot_sql('qv', 'cv')} / (qn * cn)
                      END AS cosine
               FROM c, q WHERE qid <> nid
             ),
             nn AS (
               SELECT qid, qlab, nlab, rn FROM (
                 SELECT qid, qlab, nlab,
                        ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, nid) AS rn
                 FROM scored)
               WHERE rn <= 5
             ),
             votes AS (
               SELECT qid, qlab, nlab, COUNT(*) AS votes, MIN(rn) AS best
               FROM nn GROUP BY 1, 2, 3
             )
        SELECT qid AS vec_id, qlab AS label, nlab AS predicted,
               CAST(votes AS BIGINT) AS n_votes,
               CAST(nlab = qlab AS BIGINT) AS correct
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                        ORDER BY votes DESC, best, nlab) AS pick
              FROM votes)
        WHERE pick = 1""",
)
def knn_label_eval(spark, sf_dir):
    """k-NN (k=5) majority-vote label prediction over a 10% query sample
    (operators/similarity.knn_classify) — the embedding-quality probe.
    Deterministic argmax (votes desc, best rank, smallest label); the
    oracle replays the identical vote and tie-break rules, so the
    prediction table hash-matches exactly."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.knn_classify(q, emb, k=5)


@register(
    "ann_recall_signlsh",
    # Both retrieval pipelines are deterministic (identical cosine
    # doubles, neighbor_id tie-break), so the per-query recall table is
    # exact — the oracle rebuilds BOTH and intersects, no sampling.
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id, embedding AS cv
              FROM embeddings),
        ex_scored AS (
          SELECT query_id, neighbor_id, {_cosine_sql('qv', 'cv')} AS cosine
          FROM c, q WHERE query_id <> neighbor_id
        ),
        ex AS (SELECT query_id, neighbor_id FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rn
                 FROM ex_scored) WHERE rn <= 5),
        qb AS (SELECT vec_id AS query_id, embedding AS qv,
                      {_bucket_proj_sql('embedding', _HYPERPLANES_TOPK)} AS b
               FROM embeddings WHERE vec_id < 20),
        cb AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                      {_bucket_proj_sql('embedding', _HYPERPLANES_TOPK)} AS b
               FROM embeddings),
        ap_scored AS (
          SELECT query_id, neighbor_id, {_cosine_sql('qv', 'cv')} AS cosine
          FROM cb JOIN qb USING (b) WHERE query_id <> neighbor_id
        ),
        ap AS (SELECT query_id, neighbor_id FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rn
                 FROM ap_scored) WHERE rn <= 5),
        en AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
               FROM ex GROUP BY 1),
        an AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_approx
               FROM ap GROUP BY 1),
        ov AS (SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
               FROM ex e JOIN ap a
                 ON e.query_id = a.query_id
                AND e.neighbor_id = a.neighbor_id
               GROUP BY 1)
        SELECT en.query_id, en.n_exact,
               COALESCE(an.n_approx, 0) AS n_approx,
               COALESCE(ov.n_overlap, 0) AS n_overlap,
               CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE)
                 / CAST(en.n_exact AS DOUBLE) AS recall
        FROM en
        LEFT JOIN an ON en.query_id = an.query_id
        LEFT JOIN ov ON en.query_id = ov.query_id""",
)
def ann_recall_signlsh(spark, sf_dir):
    """Recall@5 evaluation of the sign-LSH ANN path against exact
    brute-force retrieval for the same 20 queries — the eval harness
    every production ANN deployment runs before trusting the index.
    Both pipelines are deterministic here (seeded hyperplanes, md5-free
    pure float math, neighbor-id tie-break), so recall is an exact
    per-query table the oracle reproduces bit-for-bit, not a sampled
    estimate. At 100 TB: run the exact arm on a fixed query panel only
    (brute force over the corpus is one broadcast-join scan per
    panel)."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(q, emb, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.signlsh_topk(
        q, emb, k=5, hyperplanes=_HYPERPLANES_TOPK
    ).select("query_id", "neighbor_id")
    en = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    an = approx.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_approx")
    )
    ov = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    out = (
        en.join(an, "query_id", "left")
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_approx"), F.lit(0).cast("bigint")).alias(
                "n_approx"
            ),
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("bigint")).alias(
                "n_overlap"
            ),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0).cast("bigint")).cast(
                    "double"
                )
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )
    return out


def _l2_sql(a: str, b: str) -> str:
    """Sequential-fold Euclidean distance — mirrors the zip_with +
    aggregate order of similarity.brute_force_topk_l2 exactly."""
    return (
        f"sqrt(list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
        f"* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v))"
    )


@register(
    "rrf_fusion_topk_embeddings",
    # Both rankings rebuilt in SQL with the identical fold order, then
    # the same full-outer RRF combination: each term is one IEEE
    # division, summed a-then-b — bit-identical, no ROUND anywhere.
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS neighbor_id, embedding AS cv
                   FROM embeddings),
             cosr AS (
               SELECT query_id, neighbor_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY {_cosine_sql('qv', 'cv')} DESC,
                                 neighbor_id) AS r
               FROM c, q WHERE query_id <> neighbor_id
             ),
             l2r AS (
               SELECT query_id, neighbor_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY {_l2_sql('qv', 'cv')} ASC,
                                 neighbor_id) AS r
               FROM c, q WHERE query_id <> neighbor_id
             ),
             f AS (
               SELECT COALESCE(a.query_id, b.query_id) AS query_id,
                      COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
                      COALESCE(1e0 / (60 + a.r), 0e0)
                        + COALESCE(1e0 / (60 + b.r), 0e0) AS rrf_score
               FROM (SELECT * FROM cosr WHERE r <= 20) a
               FULL OUTER JOIN (SELECT * FROM l2r WHERE r <= 20) b
                 ON a.query_id = b.query_id
                AND a.neighbor_id = b.neighbor_id
             )
        SELECT query_id, neighbor_id, rrf_score, CAST(rn AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY rrf_score DESC, neighbor_id) AS rn
              FROM f)
        WHERE rn <= 10""",
)
def rrf_fusion_topk_embeddings(spark, sf_dir):
    """Hybrid-retrieval fusion: exact cosine top-20 and exact L2 top-20
    for the same query set, combined by reciprocal-rank fusion
    (operators/similarity.rrf_fuse, c=60) into a final top-10 — the
    score-free combiner for rankings on incomparable scales. The
    full-outer fusion join runs over k-bounded rank tables, never the
    corpus; per-query top-k is a WindowGroupLimit window."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cos = similarity.brute_force_topk(q, emb, k=20)
    l2 = similarity.brute_force_topk_l2(q, emb, k=20)
    return similarity.rrf_fuse(cos, l2, k=10)


@register(
    "gram_matrix_embeddings",
    # Double-unnest index twin: SUM over rows of v[i]*v[j] for i <= j.
    # Cross-batch float-sum order differs (BLAS partials vs sequential),
    # so both sides ROUND 6 (entry magnitude ~1e2, error ~1e-12).
    """SELECT i, j,
              ROUND(SUM(CAST(v[i] AS DOUBLE) * CAST(v[j] AS DOUBLE)), 6)
                + 0e0 AS gram
       FROM (SELECT embedding AS v FROM embeddings
             WHERE embedding IS NOT NULL),
            (SELECT unnest(range(1, 65)) AS i),
            (SELECT unnest(range(1, 65)) AS j)
       WHERE i <= j
       GROUP BY i, j""",
)
def gram_matrix_embeddings(spark, sf_dir):
    """Upper-triangle Gram matrix X^T X of the 64-dim embedding table
    (operators/similarity.gram_matrix): per-Arrow-batch BLAS partials
    via mapInPandas, then a d²-bounded keyed sum — the one-pass
    reduction feeding PCA/whitening (power iteration pinned in
    tests/test_similarity.py). 2080 cells regardless of row count."""
    emb = read_table(spark, sf_dir, "embeddings")
    g = similarity.gram_matrix(emb, "embedding", upper_only=True)
    return g.select(
        "i", "j", (F.round(F.col("gram"), 6) + F.lit(0.0)).alias("gram")
    )


@register(
    "ndcg_label_relevance",
    # Ranking + relevance + both k-bounded DCG sums rebuilt in SQL; the
    # log2 discounts are the one floating step -> ROUND 6 on all three.
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                          label AS cl
                   FROM embeddings),
             rk AS (
               SELECT query_id, neighbor_id,
                      CASE WHEN cl = ql THEN 1e0 ELSE 0e0 END AS rel,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY {_cosine_sql('qv', 'cv')} DESC,
                                 neighbor_id) AS rank
               FROM c, q WHERE query_id <> neighbor_id
             ),
             top AS (SELECT * FROM rk WHERE rank <= 10),
             t AS (
               SELECT query_id,
                      rel / log2(CAST(rank AS DOUBLE) + 1e0) AS d,
                      rel / log2(CAST(ROW_NUMBER() OVER (
                        PARTITION BY query_id
                        ORDER BY rel DESC, neighbor_id) AS DOUBLE) + 1e0)
                        AS i
               FROM top
             ),
             a AS (SELECT query_id, SUM(d) AS dcg, SUM(i) AS idcg
                   FROM t GROUP BY 1)
        SELECT query_id, ROUND(dcg, 6) + 0e0 AS dcg,
               ROUND(idcg, 6) + 0e0 AS idcg,
               ROUND(CASE WHEN idcg > 0 THEN dcg / idcg END, 6) + 0e0
                 AS ndcg
        FROM a""",
)
def ndcg_label_relevance(spark, sf_dir):
    """nDCG@10 of the exact cosine ranking against label relevance
    (operators/similarity.ndcg_at_k; rel = 1 when the neighbor shares
    the query's label) — the position-discounted retrieval metric
    beside the ann_recall harness. All sums are k-bounded per query;
    log2 discounts ROUND 6."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    ranking = similarity.brute_force_topk(q, emb, k=10)
    rel = (
        q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("__ql"))
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("__cl"),
            )
        )
        .select(
            "query_id",
            "neighbor_id",
            F.when(F.col("__cl") == F.col("__ql"), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("rel"),
        )
    )
    out = similarity.ndcg_at_k(ranking, rel, k=10)
    return out.select(
        "query_id",
        (F.round("dcg", 6) + F.lit(0.0)).alias("dcg"),
        (F.round("idcg", 6) + F.lit(0.0)).alias("idcg"),
        (F.round("ndcg", 6) + F.lit(0.0)).alias("ndcg"),
    )


def _probe_buckets_sql(b0: str, nbits: int) -> str:
    """The probe list [b0, flip(0), ..., flip(nbits-1)] — mirrors
    similarity.signlsh_multiprobe_topk's Hamming-1 expansion."""
    flips = [
        f"substr({b0}, 1, {i}) || (CASE WHEN substr({b0}, {i + 1}, 1) = '1' "
        f"THEN '0' ELSE '1' END) || substr({b0}, {i + 2}, {nbits - i - 1})"
        for i in range(nbits)
    ]
    return "[" + ", ".join([b0] + flips) + "]"


@register(
    "signlsh_multiprobe_topk",
    # Identical projection literals, identical Hamming-1 probe list on
    # the query side, exact cosine verify — cosines are fold-order
    # bit-identical, so no ROUND anywhere.
    f"""WITH q AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 {_bucket_proj_sql('embedding', _HYPERPLANES_TOPK)} AS b0
          FROM embeddings WHERE vec_id < 5
        ),
        qx AS (
          SELECT query_id, qv,
                 unnest({_probe_buckets_sql('b0', len(_HYPERPLANES_TOPK))}) AS b
          FROM q
        ),
        c AS (
          SELECT vec_id AS neighbor_id, embedding AS cv,
                 {_bucket_proj_sql('embedding', _HYPERPLANES_TOPK)} AS b
          FROM embeddings
        ),
        scored AS (
          SELECT query_id, neighbor_id,
                 {_cosine_sql('qv', 'cv')} AS cosine
          FROM c JOIN qx USING (b)
          WHERE query_id <> neighbor_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored)
        WHERE rn <= 10""",
)
def signlsh_multiprobe_topk(spark, sf_dir):
    """Multi-probe sign-LSH approximate top-10
    (operators/similarity.signlsh_multiprobe_topk): each query probes
    its own bucket plus all Hamming-1 neighbor buckets — the recall
    lever that expands the (broadcast) query side by planes+1 keys
    instead of growing the index; the corpus still carries ONE bucket
    per row and the candidate set is one equi-join. Recall >= the
    single-probe signlsh_topk on the same planes (pinned in tests)."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.signlsh_multiprobe_topk(
        q, emb, k=10, hyperplanes=_HYPERPLANES_TOPK
    )
