"""Corpus: LLM-data text operators over the `documents` table — exact
dedup, n-gram Jaccard, MinHash+LSH, SimHash, text stats / quality /
language-id / token counts, and the multimodal binary-column plumbing.

Every oracle reproduces the Spark computation in plain DuckDB SQL —
possible because all hashing is md5-based (portable bit-for-bit,
operators/dedup.py design note) and all ratios are row-wise double
arithmetic (IEEE-identical across engines, no ROUND needed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark.corpus import register
from financial_data_lakehouse_pipeline__spark.corpus.mlprep import _bucket_sql
from financial_data_lakehouse_pipeline__spark.operators import (
    dedup,
    multimodal,
    sampling,
    text,
)
from financial_data_lakehouse_pipeline__spark.sources import read_table

# ---- shared SQL fragments mirroring functions.tokens / dedup.canonical_text

#: whitespace-normalized lowercase text (dedup.canonical_text)
_CANON = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

#: docs → distinct word 3-gram shingles (dedup.word_shingles, n=3).
#: range(0, greatest(len-3,0)+1) == F.sequence(0, greatest(k-3, 0));
#: toks[i+1:i+3] (1-based inclusive) == F.slice(toks, i+1, 3).
_SHINGLES_CTE = f"""
docs AS (
  SELECT doc_id, regexp_split_to_array({_CANON}, ' ') AS toks
  FROM documents
  WHERE length(trim(text)) > 0
),
idx AS (
  SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 3, 0) + 1)) AS i
  FROM docs
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS shingle
  FROM idx
  WHERE length(array_to_string(toks[i+1:i+3], ' ')) > 0
)"""

def _jaccard_ctes(src: str = "sh", suffix: str = "") -> str:
    """Exact pairwise Jaccard over a shingle CTE
    (dedup._pairwise_jaccard) — parametric source/suffix so one oracle
    can hold several independently-gated copies (dedup_pairs_auto)."""
    return f"""
sizes{suffix} AS (SELECT doc_id, COUNT(*) AS sz FROM {src} GROUP BY doc_id),
common{suffix} AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM {src} a JOIN {src} b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac{suffix} AS (
  SELECT id_a, id_b,
         CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
  FROM common{suffix}
  JOIN sizes{suffix} sa ON sa.doc_id = id_a
  JOIN sizes{suffix} sb ON sb.doc_id = id_b
)"""


#: exact pairwise Jaccard over `sh` (dedup._pairwise_jaccard)
_JACCARD_CTE = _jaccard_ctes()


@register(
    "doc_fingerprint",
    f"SELECT doc_id, md5({_CANON}) AS fingerprint FROM documents",
)
def doc_fingerprint(spark, sf_dir):
    """Content fingerprint per document (operators/text.fingerprint) —
    the exact-dedup key."""
    d = read_table(spark, sf_dir, "documents")
    return text.fingerprint(d).select("doc_id", "fingerprint")


@register(
    "exact_dedup_docs",
    f"""SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
               md5({_CANON}) AS fingerprint,
               CAST(COUNT(*) AS BIGINT) AS dup_count
        FROM documents
        GROUP BY md5({_CANON})""",
)
def exact_dedup_docs(spark, sf_dir):
    """Exact dedup by content hash — one hash groupBy; md5 key keeps
    shuffle rows small at any document size (operators/dedup.exact_dedup)."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(d)


@register(
    "word_stats_docs",
    r"""WITH s AS (
          SELECT doc_id,
                 length(text) AS nc,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nw,
                 length(regexp_replace(text, '\s', '', 'g')) AS wc,
                 len(regexp_extract_all(text, '[^\w\s]')) AS np
          FROM documents
        )
        SELECT doc_id,
               CAST(nc AS BIGINT) AS n_chars,
               CAST(nw AS BIGINT) AS n_words,
               CASE WHEN nw <> 0 THEN CAST(wc AS DOUBLE) / nw END AS avg_word_len,
               CASE WHEN nc <> 0 THEN CAST(np AS DOUBLE) / nc END AS punct_ratio
        FROM s""",
)
def word_stats_docs(spark, sf_dir):
    """Per-document quality features (operators/text.word_stats) — pure
    Column expressions, embarrassingly parallel."""
    d = read_table(spark, sf_dir, "documents")
    return text.word_stats(d).select(
        "doc_id", "n_chars", "n_words", "avg_word_len", "punct_ratio"
    )


@register(
    "quality_score_docs",
    r"""WITH s AS (
          SELECT doc_id,
                 length(text) AS nc,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nw,
                 length(regexp_replace(text, '\s', '', 'g')) AS wc,
                 len(regexp_extract_all(text, '[^\w\s]')) AS np
          FROM documents
        ), f AS (
          SELECT doc_id, nw,
                 CASE WHEN nw <> 0 THEN CAST(wc AS DOUBLE) / nw END AS awl,
                 CASE WHEN nc <> 0 THEN CAST(np AS DOUBLE) / nc END AS pr
          FROM s
        )
        SELECT doc_id,
               (CASE WHEN nw >= 10 AND nw <= 100000 THEN 1.0 ELSE 0.0 END
                + CASE WHEN awl >= 2.0 AND awl <= 12.0 THEN 1.0 ELSE 0.0 END
                + CASE WHEN coalesce(pr, 0.0) <= 0.3 THEN 1.0 ELSE 0.0 END) / 3.0
                   AS quality_score
        FROM f""",
)
def quality_score_docs(spark, sf_dir):
    """Composite C4/Gopher-style quality score (operators/text.quality_score)."""
    d = read_table(spark, sf_dir, "documents")
    return text.quality_score(d).select("doc_id", "quality_score")


def _lang_hits_sql(lang: str) -> str:
    pattern = r"\b(" + "|".join(text.STOPWORDS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pattern}')) AS h_{lang}"


_MX = "greatest(h_en, h_de, h_fr, h_es)"


@register(
    "language_id_docs",
    f"""WITH h AS (
          SELECT doc_id, {", ".join(_lang_hits_sql(lg) for lg in text.STOPWORDS)}
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN {_MX} = 0 THEN 'und'
                    WHEN h_en = {_MX} THEN 'en'
                    WHEN h_de = {_MX} THEN 'de'
                    WHEN h_fr = {_MX} THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM h""",
)
def language_id_docs(spark, sf_dir):
    """Stopword-vote language heuristic (operators/text.language_id).
    Tie-break pinned: first language in en>de>fr>es order at the max."""
    d = read_table(spark, sf_dir, "documents")
    return text.language_id(d).select("doc_id", "lang_pred")


_PROFILE_VALUES = ", ".join(
    f"('{g}', '{lang}')"
    for lang, grams in sorted(text.CHAR_TRIGRAM_PROFILES.items())
    for g in sorted(set(grams))
)


@register(
    "language_id_ngram_docs",
    f"""WITH d AS (
          SELECT doc_id, ' ' || {_CANON} || ' ' AS t FROM documents
        ),
        g AS (
          SELECT doc_id, substr(t, CAST(i AS INT), 3) AS gram
          FROM (SELECT doc_id, t,
                       unnest(generate_series(1, length(t) - 2)) AS i
                FROM d WHERE length(t) >= 3)
        ),
        p AS (SELECT * FROM (VALUES {_PROFILE_VALUES}) AS v(gram, lang)),
        s AS (
          SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM g JOIN p USING (gram) GROUP BY doc_id, lang
        ),
        best AS (
          SELECT doc_id, lang, n_hits,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY n_hits DESC, lang) AS rn
          FROM s
        )
        SELECT d0.doc_id,
               COALESCE(b.lang, 'und') AS lang_pred,
               COALESCE(b.n_hits, CAST(0 AS BIGINT)) AS n_hits
        FROM documents d0
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""",
)
def language_id_ngram_docs(spark, sf_dir):
    """Char-trigram profile language classifier
    (operators/text.language_id_ngram — the Cavnar-Trenkle-style upgrade
    of the stopword vote): explode char 3-grams of the space-padded
    canonical text, broadcast-join the fixed CHAR_TRIGRAM_PROFILES
    table, argmax hits per doc with (hits DESC, lang ASC) tie-break,
    'und' on zero hits. All-integer scoring — the oracle reproduces the
    profile table as literal VALUES and matches bit-for-bit. (Accuracy
    on real multilingual text is pinned separately by
    tests/test_text.py's labeled fixture; the synthetic documents table
    exercises determinism, not accuracy — its lang labels are random.)"""
    d = read_table(spark, sf_dir, "documents")
    return text.language_id_ngram(d, spark)


@register(
    "token_counts_docs",
    r"""SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                    AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                    AS BIGINT) AS n_bpe_tokens
        FROM documents""",
)
def token_counts_docs(spark, sf_dir):
    """Whitespace + BPE-ish token counting (operators/text.token_count,
    bpe_ish_token_count)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        text.bpe_ish_token_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
    )


@register(
    "chunk_docs_sliding",
    r"""WITH t AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
          FROM documents
        ),
        n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        c AS (
          SELECT doc_id, toks,
                 UNNEST(range(0, CAST(FLOOR((GREATEST(n - 32, 0) + 23)
                                            / 24e0) AS INT) + 1)) AS chunk_id
          FROM n WHERE n > 0
        )
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(chunk_id * 24 AS BIGINT) AS start_tok,
               CAST(len(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32])
                    AS BIGINT) AS n_chunk_tokens,
               array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32],
                               ' ') AS chunk_text
        FROM c""",
)
def chunk_docs_sliding(spark, sf_dir):
    """Sliding-window token chunking, size=32 stride=24
    (operators/text.chunk_tokens): overlapping fixed context windows,
    tail always covered, exact integer offsets and strings."""
    d = read_table(spark, sf_dir, "documents")
    return text.chunk_tokens(d, size=32, stride=24)


@register(
    "token_entropy_docs",
    r"""WITH tok AS (
          SELECT doc_id,
                 UNNEST(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents WHERE length(trim(text)) > 0
        ),
        c AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               ROUND(log2(CAST(SUM(c) AS DOUBLE))
                     - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                       / CAST(SUM(c) AS DOUBLE), 6) AS entropy
        FROM c GROUP BY doc_id""",
)
def token_entropy_docs(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution
    (operators/text.token_entropy). Counts are exact integers; the
    Σ c·log2(c) float aggregate is engine-order-dependent, so entropy
    carries ROUND 6 (the stddev/corr contract)."""
    d = read_table(spark, sf_dir, "documents")
    out = text.token_entropy(d)
    return out.select(
        "doc_id", "n_tokens", F.round("entropy", 6).alias("entropy")
    )


@register(
    "ngram_jaccard_pairs_docs",
    f"""WITH {_SHINGLES_CTE}, {_JACCARD_CTE}
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5""",
)
def ngram_jaccard_pairs_docs(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs >= 0.5 — the quadratic
    ground-truth baseline (operators/dedup.ngram_jaccard_pairs)."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5)


#: Boilerplate appended to EVERY doc for the stop-shingle stress query —
#: its 12 internal 3-grams hit doc-frequency = corpus size, the skew the
#: posting-list cap exists to neutralize.
_HOT_FOOTER = (
    "subscribe to our newsletter for updates and follow us on social media every day"
)


@register(
    "ngram_jaccard_capped_docs",
    f"""WITH documents AS (
          SELECT doc_id, concat_ws(' ', text, '{_HOT_FOOTER}') AS text
          FROM main.documents
        ),
        {_SHINGLES_CTE},
        hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 50),
        shc AS (SELECT * FROM sh
                WHERE shingle NOT IN (SELECT shingle FROM hot)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM shc a JOIN shc b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        jac AS (
          SELECT id_a, id_b,
                 CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
          FROM common
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
        )
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5""",
)
def ngram_jaccard_capped_docs(spark, sf_dir):
    """Stop-shingle stress: every document gets a shared boilerplate
    footer (universal posting lists — the skew that makes the exact
    quadratic join blow up O(df²) per hot shingle), then exact Jaccard
    runs with max_doc_freq=50 (operators/dedup.drop_stop_shingles). The
    cap drops exactly the universal shingles, the join cost returns to
    the unskewed profile, and Jaccard stays exact over the capped
    shingle universe — mirrored in the oracle."""
    d = read_table(spark, sf_dir, "documents").withColumn(
        "text", F.concat_ws(" ", F.col("text"), F.lit(_HOT_FOOTER))
    )
    return dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5, max_doc_freq=50)


@register(
    "prefix_jaccard_pairs_docs",
    # Same oracle as ngram_jaccard_pairs_docs ON PURPOSE: the oracle is
    # the UNPRUNED all-pairs Jaccard, so a green row proves the prefix
    # filter is lossless (every qualifying pair survives pruning).
    f"""WITH {_SHINGLES_CTE}, {_JACCARD_CTE}
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5""",
)
def prefix_jaccard_pairs_docs(spark, sf_dir):
    """Exact 3-gram Jaccard >= 0.5 via PREFIX FILTERING
    (operators/dedup.prefix_filter_jaccard_pairs): candidates only from
    each doc's rarest-first prefix shingles, then exact verification —
    the third provably-equivalent near-dup algorithm next to the full
    posting join (ngram_jaccard_pairs_docs) and MinHash+LSH
    (minhash_lsh_pairs_docs). The oracle is the unpruned all-pairs
    computation, so agreement IS the losslessness proof."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.prefix_filter_jaccard_pairs(d, n=3, threshold=0.5)


@register(
    "prefix_jaccard_skewed_docs",
    # The oracle is the UNCAPPED all-pairs join over the footer-skewed
    # docs — the full-universe ground truth the capped variants only
    # approximate. Green row = prefix filtering survives universal
    # posting lists with EXACT semantics.
    f"""WITH documents AS (
          SELECT doc_id, concat_ws(' ', text, '{_HOT_FOOTER}') AS text
          FROM main.documents
        ),
        {_SHINGLES_CTE}, {_JACCARD_CTE}
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5""",
    # The ORACLE (not the engine query) is deliberately quadratic: the
    # universal footer gives every hot shingle df = n_docs, so the
    # unpruned posting join materializes ~n² rows — ~1.5e10 at sf1's
    # 50k docs, which OOM'd a 74 GB DuckDB (SCALE.md §19c) while the
    # engine side finished in 433 s. Above the ceiling the capped
    # twins (scale-checkable proofs of the same near-dup semantics)
    # carry the verification.
    max_oracle_sf=0.5,
    capped_twins=(
        "minhash_lsh_pairs_docs",
        "ngram_jaccard_capped_docs",
        "containment_pairs_docs",
    ),
)
def prefix_jaccard_skewed_docs(spark, sf_dir):
    """Prefix filtering under boilerplate skew: every doc carries the
    universal footer (12 corpus-frequency shingles — the df² blowup the
    stop-shingle cap exists for), and the rare-first prefix order keeps
    those hot shingles out of every prefix, so the candidate join never
    touches their posting lists — measured 13.1 s vs 53.4 s unpruned at
    sf0.1 (4.1×), with EXACT full-universe Jaccard: unlike
    ngram_jaccard_capped_docs (Jaccard over the capped universe) the
    result is identical to the uncapped all-pairs ground truth, which is
    exactly what the oracle runs."""
    d = read_table(spark, sf_dir, "documents").withColumn(
        "text", F.concat_ws(" ", F.col("text"), F.lit(_HOT_FOOTER))
    )
    return dedup.prefix_filter_jaccard_pairs(d, n=3, threshold=0.5)


@register(
    "containment_pairs_docs",
    # Same shingle/common/sizes CTEs as the Jaccard family; only the
    # denominator changes (min size instead of union) — row-wise double
    # division, no rounding needed.
    f"""WITH {_SHINGLES_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(c AS DOUBLE) / LEAST(sa.sz, sb.sz) AS containment
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / LEAST(sa.sz, sb.sz) >= 0.9""",
)
def containment_pairs_docs(spark, sf_dir):
    """Asymmetric near-dup pairs by shingle containment >= 0.9
    (operators/dedup.containment_pairs): |A∩B| / min(|A|,|B|) — the
    overlap coefficient that catches a short document embedded verbatim
    in a longer one (quotes, excerpts, boilerplate inclusion), where
    Jaccard stays low because the union is large. Same posting-list
    equi-join cost shape as ngram_jaccard_pairs_docs; the
    subset-duplicate semantics are pinned by a planted-excerpt unit
    test (tests/test_operators.py)."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, n=3, threshold=0.9)


def _minhash_ctes(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    src: str | None = None,
    suffix: str = "",
) -> str:
    """Shared CTE chain ending in `lsh_pairs{suffix}(id_a, id_b,
    jaccard)` — the MinHash+LSH pipeline as reusable oracle SQL. Embeds
    the same universal-hash coefficients as
    operators/dedup.minhash_coeffs, over the same two 28-bit md5-prefix
    integers. ``max_bucket_size`` mirrors the engine's hot-bucket skip
    (dedup.minhash_lsh_pairs). ``src``/``suffix`` let a caller run the
    chain over its own (possibly route-gated) shingle CTE without name
    collisions; by default it emits the shingle CTEs itself and uses
    the historical unsuffixed names.

    The exact-Jaccard verify is CANDIDATE-BOUNDED, mirroring the
    engine's plan: common-shingle counts are computed by joining the
    shingle table onto the LSH candidate pairs, never as the full
    pairwise posting self-join (_jaccard_ctes) — the two agree on every
    candidate pair by construction, but the full posting join's cost is
    sum(df^2) over shingles (quadratic in the vocabulary head; it is
    what the deliberately-unpruned ngram_jaccard oracles measure) while
    this one is |cand| x shingles-per-doc. At sf2 the difference is an
    out-of-disk oracle vs a tractable one."""
    rows = num_hashes // bands
    P = dedup.MINHASH_P
    s = suffix
    mins = ", ".join(
        f"min(({a}*h1 + {b}*h2 + {c}) % {P}) AS mh_{i}"
        for i, (a, b, c) in enumerate(dedup.minhash_coeffs(num_hashes))
    )
    band_selects = []
    for b in range(bands):
        cols = ", ".join(f"mh_{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws('|', {cols})) AS key"
            f" FROM sig{s}"
        )
    buckets = " UNION ALL ".join(band_selects)
    bucket_ctes = f"buckets{s} AS ({buckets})"
    if max_bucket_size is not None:
        bucket_ctes = f"""buckets0{s} AS ({buckets}),
        hotb{s} AS (SELECT band, key FROM buckets0{s}
                 GROUP BY band, key HAVING COUNT(*) > {max_bucket_size}),
        buckets{s} AS (
          SELECT b.* FROM buckets0{s} b
          ANTI JOIN hotb{s} h ON b.band = h.band AND b.key = h.key
        )"""
    shingle_src = src if src is not None else "sh"
    lead = "" if src is not None else f"{_SHINGLES_CTE},\n        "
    return f"""{lead}shh{s} AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) AS h1,
                 CAST(('0x' || substr(md5(shingle), 8, 7)) AS BIGINT) AS h2
          FROM {shingle_src}
        ),
        sig{s} AS (SELECT doc_id, {mins} FROM shh{s} GROUP BY doc_id),
        {bucket_ctes},
        cand{s} AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM buckets{s} a
          JOIN buckets{s} b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        sizes{s} AS (SELECT doc_id, COUNT(*) AS sz FROM {shingle_src} GROUP BY doc_id),
        common{s} AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS c
          FROM cand{s} c
          JOIN {shingle_src} a ON a.doc_id = c.id_a
          JOIN {shingle_src} b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2
        ),
        jac{s} AS (
          SELECT id_a, id_b,
                 CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
          FROM common{s}
          JOIN sizes{s} sa ON sa.doc_id = id_a
          JOIN sizes{s} sb ON sb.doc_id = id_b
        ),
        lsh_pairs{s} AS (
          SELECT id_a, id_b, jaccard FROM jac{s}
          WHERE jaccard >= {threshold}
        )"""


def _minhash_oracle(num_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    return (
        f"WITH {_minhash_ctes(num_hashes, bands, threshold)} "
        "SELECT id_a, id_b, jaccard FROM lsh_pairs"
    )


@register("minhash_lsh_pairs_docs", _minhash_oracle())
def minhash_lsh_pairs_docs(spark, sf_dir):
    """MinHash banding near-dup pairs, exact-Jaccard verified over the
    candidate set only (operators/dedup.minhash_lsh_pairs — the 100 TB
    scale path; md5 minhashes make the oracle SQL-reproducible)."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, num_hashes=16, bands=4, threshold=0.5)


#: Dead-page boilerplate for the hot-bucket stress query — every crawl
#: corpus has one ("page not found"), and its exact duplicates share all
#: band keys, making one degenerate O(m²) LSH bucket per band.
_BOILER = "this page could not be found please check the url and try again later"


@register(
    "minhash_lsh_capped_docs",
    f"""WITH documents AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN '{_BOILER}' ELSE text END AS text
          FROM main.documents
        ),
        {_minhash_ctes(max_bucket_size=50)}
        SELECT id_a, id_b, jaccard FROM lsh_pairs""",
)
def minhash_lsh_capped_docs(spark, sf_dir):
    """Hot-bucket stress: 20% of the corpus is replaced by one identical
    dead-page boilerplate (every crawl has one), so those docs share ALL
    band keys — one m=|corpus|/5 bucket per band, m(m-1)/2 candidate
    pairs each, the quadratic blowup banding is supposed to avoid.
    max_bucket_size=50 skips the degenerate buckets before pair
    expansion (broadcast anti-join, no extra shuffle); organic near-dup
    pairs among the remaining 80% are unaffected. Exact-duplicate groups
    like this are the province of exact_dedup_docs, which is why
    skipping them loses nothing — mirrored in the oracle."""
    d = read_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.lit(_BOILER)).otherwise(F.col("text")),
    )
    return dedup.minhash_lsh_pairs(
        d, num_hashes=16, bands=4, threshold=0.5, max_bucket_size=50
    )


@register(
    "dedup_pairs_auto_docs",
    # The oracle REPLICATES THE ROUTER: it computes the same posting
    # collision-mass statistic, then gates each branch's shingle input
    # on the routed choice (cross join with the 1-row stat), so the
    # un-routed branch's whole pipeline runs over 0 rows. Whichever
    # path the data selects, DuckDB and Spark select it from the same
    # numbers — the oracle stays green even when the route flips at a
    # larger scale (prefix ≤ 512 cand/doc, capped LSH above).
    f"""WITH {_SHINGLES_CTE},
        -- MATERIALIZED throughout the gate: DuckDB inlines plain CTEs
        -- per reference, and this query references the shingle table
        -- from BOTH gated branches (~10 inlined copies of the
        -- tokenize/unnest pipeline) — at ov-sf1 the inlined plan
        -- spilled >60 GB where the materialized one runs in seconds
        sh_m AS MATERIALIZED (SELECT doc_id, shingle FROM sh),
        n_all AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM documents
        ),
        -- routing sample (mirrors dedup_route: deterministic ~10% md5
        -- bucket at >= 20k docs, full corpus below)
        samp AS MATERIALIZED (
          SELECT doc_id FROM documents, n_all
          WHERE n_all.n < 20000
             OR CAST(('0x' || substr(md5('route:' ||
                      CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
                % 10000 < 1000
        ),
        n_s AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS HUGEINT) AS ns FROM samp
        ),
        dfq AS (
          SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
          FROM sh_m JOIN samp USING (doc_id) GROUP BY shingle
        ),
        -- unified exact boundary compare in HUGEINT (the engine does
        -- the same arithmetic in Python bigints):
        --   mass_sample * n_docs <= 512 * n_sample^2
        -- which reduces to mass <= 512 * n_docs when unsampled
        stat AS MATERIALIZED (
          SELECT CASE
                   WHEN COALESCE(SUM(CAST(df AS HUGEINT)
                                     * (df - 1) // 2), 0)
                          * (SELECT n FROM n_all)
                        <= 512 * (SELECT ns FROM n_s)
                             * (SELECT ns FROM n_s)
                   THEN 'prefix' ELSE 'lsh'
                 END AS route
          FROM dfq
        ),
        sh_p AS MATERIALIZED (
          SELECT s.* FROM sh_m s, stat WHERE stat.route = 'prefix'
        ),
        sh_l AS MATERIALIZED (
          SELECT s.* FROM sh_m s, stat WHERE stat.route = 'lsh'
        ),
        {_jaccard_ctes('sh_p', '_p')},
        {_minhash_ctes(16, 4, 0.5, max_bucket_size=50, src='sh_l',
                       suffix='_l')}
        SELECT id_a, id_b, jaccard FROM jac_p WHERE jaccard >= 0.5
        UNION ALL
        SELECT id_a, id_b, jaccard FROM lsh_pairs_l""",
)
def dedup_pairs_auto_docs(spark, sf_dir):
    """Near-dup pairs with the path picked FROM THE DATA
    (operators/dedup.similar_pairs_auto): a one-pass collision-mass
    statistic routes to the exact prefix-filtered SSJoin below the
    measured switch point (512 candidate pairs per doc — between the
    sf0.1 regime where the exact join still wins and the saturated sf1
    regime where it goes quadratic, SCALE.md §17/§18) and to capped
    MinHash-LSH above it. At the driver scales the corpus routes to
    'prefix' (28–253 cand/doc measured), so this row ALSO re-proves the
    prefix filter's losslessness; at sf1 on the saturated synthetic
    vocabulary it flips to 'lsh', and the oracle — which re-derives the
    same statistic in SQL and gates each branch's input on it — flips
    with it. Since round 12 the statistic rides a deterministic ~10%
    doc sample at >= 20k docs (the full pre-pass measured ~40% of the
    routed wall at ov-sf1/2); the oracle replicates the SAME md5
    sample and the same exact HUGEINT boundary arithmetic, so both
    engines still route from identical numbers at every scale."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.similar_pairs_auto(
        d, n=3, threshold=0.5, num_hashes=16, bands=4, max_bucket_size=50
    )


@register(
    "duplicate_clusters_docs",
    # Transitive closure of the LSH pair graph: cluster_id = min reachable
    # id; singletons are their own representative.
    f"""WITH RECURSIVE {_minhash_ctes()},
        edges AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM lsh_pairs
          UNION
          SELECT id_b, id_a FROM lsh_pairs
        ),
        closure AS (
          SELECT src, dst FROM edges
          UNION
          SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src
        )
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(MIN(cl.dst), d.doc_id)) AS cluster_id,
               LEAST(d.doc_id, COALESCE(MIN(cl.dst), d.doc_id)) = d.doc_id
                   AS is_representative
        FROM documents d
        LEFT JOIN closure cl ON cl.src = d.doc_id
        GROUP BY d.doc_id""",
)
def duplicate_clusters_docs(spark, sf_dir):
    """Connected components over the MinHash near-dup graph: every doc →
    min-reachable-id cluster + representative flag — the survivor
    selection step a dedup pipeline runs after pair finding
    (operators/dedup.duplicate_clusters, min-label propagation)."""
    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, num_hashes=16, bands=4, threshold=0.5)
    return dedup.duplicate_clusters(d, pairs)


@register(
    "dedup_canonical_docs",
    f"""WITH RECURSIVE {_minhash_ctes()},
        edges AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM lsh_pairs
          UNION
          SELECT id_b, id_a FROM lsh_pairs
        ),
        closure AS (
          SELECT src, dst FROM edges
          UNION
          SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src
        ),
        rep AS (
          SELECT d.doc_id
          FROM documents d LEFT JOIN closure cl ON cl.src = d.doc_id
          GROUP BY d.doc_id
          HAVING LEAST(d.doc_id, COALESCE(MIN(cl.dst), d.doc_id)) = d.doc_id
        )
        SELECT doc_id, source, lang, n_chars
        FROM documents JOIN rep USING (doc_id)""",
)
def dedup_canonical_docs(spark, sf_dir):
    """End-to-end near-dup removal (operators/dedup.dedup_keep_canonical):
    MinHash-LSH pairs → min-label clusters → keep each cluster's
    representative via LEFT SEMI join — the deduplicated corpus itself,
    not just the pair/cluster report."""
    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, num_hashes=16, bands=4, threshold=0.5)
    out = dedup.dedup_keep_canonical(d, pairs)
    return out.select("doc_id", "source", "lang", "n_chars")


#: shared closure-over-lsh_pairs CTE tail: transitive closure of the
#: MinHash pair graph → per-doc min-reachable cluster_id (the recursive
#: twin of operators/dedup.duplicate_clusters)
_CLUSTERS_CTE = """
        edges AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM lsh_pairs
          UNION
          SELECT id_b, id_a FROM lsh_pairs
        ),
        closure AS (
          SELECT src, dst FROM edges
          UNION
          SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src
        ),
        clus AS (
          SELECT d.doc_id,
                 LEAST(d.doc_id, COALESCE(MIN(cl.dst), d.doc_id)) AS cluster_id
          FROM documents d
          LEFT JOIN closure cl ON cl.src = d.doc_id
          GROUP BY d.doc_id
        )"""


@register(
    "leakage_safe_split_docs",
    # split is hashed from the CLUSTER id (sampling.hash_bucket's exact
    # md5 arithmetic), so the oracle re-proves both the clustering and
    # the invariant that no cluster straddles splits.
    f"""WITH RECURSIVE {_minhash_ctes()},
        {_CLUSTERS_CTE},
        b AS (
          SELECT doc_id, cluster_id,
                 {_bucket_sql('cluster_id', 'split')} AS bkt
          FROM clus
        )
        SELECT doc_id, cluster_id,
               CASE WHEN bkt < 8000 THEN 'train'
                    WHEN bkt < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM b""",
)
def leakage_safe_split_docs(spark, sf_dir):
    """Near-dup-aware train/val/test split
    (operators/sampling.leakage_safe_split): cluster the MinHash pair
    graph, hash-assign the CLUSTER — a test doc's paraphrase can never
    sit in train. The straddle-free invariant is additionally pinned in
    tests/test_mlprep.py."""
    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, num_hashes=16, bands=4, threshold=0.5)
    return sampling.leakage_safe_split(d, pairs)


@register(
    "dedup_keep_best_docs",
    f"""WITH RECURSIVE {_minhash_ctes()},
        {_CLUSTERS_CTE},
        ranked AS (
          SELECT d.doc_id, d.source, d.lang, d.n_chars, c.cluster_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY c.cluster_id
                   ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
          FROM documents d JOIN clus c USING (doc_id)
        )
        SELECT doc_id, cluster_id, source, lang, n_chars
        FROM ranked WHERE rn = 1""",
)
def dedup_keep_best_docs(spark, sf_dir):
    """Quality-argmax survivor per near-dup cluster
    (operators/dedup.dedup_keep_best): keep the LONGEST copy (n_chars
    DESC, id ASC tiebreak) — what a curation pipeline actually keeps,
    vs dedup_canonical_docs' arbitrary min-id."""
    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, num_hashes=16, bands=4, threshold=0.5)
    out = dedup.dedup_keep_best(d, pairs, order_cols=["n_chars"])
    return out.select("doc_id", "cluster_id", "source", "lang", "n_chars")


#: deterministic 1-in-10 "incoming batch" membership — reuses the
#: pinned DuckDB twin of sampling.hash_bucket (mlprep._bucket_sql)
_INCR_TAG_SQL = f"""
        tag AS (
          SELECT doc_id,
                 ({_bucket_sql('doc_id', 'incr')}) < 1000 AS is_new
          FROM documents
        )"""


@register(
    "incremental_lsh_dedup_docs",
    # The oracle runs the PLAIN full-corpus LSH chain and filters pairs
    # touching the incoming batch afterward — semantically identical to
    # the engine's pre-verify candidate filter (jaccard is per-pair), so
    # equality here proves the incremental path loses nothing vs a full
    # re-dedup while skipping every base x base candidate.
    f"""WITH {_minhash_ctes(max_bucket_size=50)},
        {_INCR_TAG_SQL}
        SELECT p.id_a, p.id_b, p.jaccard
        FROM lsh_pairs p
        JOIN tag ta ON ta.doc_id = p.id_a
        JOIN tag tb ON tb.doc_id = p.id_b
        WHERE ta.is_new OR tb.is_new""",
)
def incremental_lsh_dedup_docs(spark, sf_dir):
    """Incremental near-dup detection: a deterministic 1-in-10 hash
    slice plays the nightly incoming batch, the rest the existing
    corpus; pairs are found for incoming x (base + incoming) only,
    with base x base candidates dropped BEFORE the exact-Jaccard verify
    (operators/dedup.incremental_minhash_pairs — the delta-dedup shape
    that makes daily ingest at 100 TB affordable)."""
    d = read_table(spark, sf_dir, "documents")
    is_new = sampling.hash_bucket(F.col("doc_id"), salt="incr") < 1000
    return dedup.incremental_minhash_pairs(
        d.filter(~is_new), d.filter(is_new),
        num_hashes=16, bands=4, threshold=0.5, max_bucket_size=50,
    )


def _simhash_oracle(bits: int = 16, max_hamming: int = 3) -> str:
    blocks = max_hamming + 1
    width = bits // blocks or 1
    bit_sums = "COUNT(*) AS n, " + ", ".join(
        f"SUM((h >> {j}) & 1) AS c{j}" for j in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN c{j} * 2 > n THEN CAST({2 ** j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(bits)
    )
    blks = ", ".join(
        f"(simhash >> {i * width}) & {(1 << width) - 1} AS blk_{i}" for i in range(blocks)
    )
    cands = " UNION ".join(
        f"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.simhash AS sh_a, b.simhash AS sh_b
            FROM sb a JOIN sb b ON a.blk_{i} = b.blk_{i} AND a.doc_id < b.doc_id"""
        for i in range(blocks)
    )
    return f"""WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array({_CANON}, ' ')) AS tok
          FROM documents WHERE length(trim(text)) > 0
        ),
        hashed AS (
          SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
          FROM toks WHERE length(tok) > 0
        ),
        bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id),
        s AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits),
        sb AS (SELECT doc_id, simhash, {blks} FROM s),
        cand AS ({cands})
        SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}"""


@register("simhash_pairs_docs", _simhash_oracle(bits=48, max_hamming=3))
def simhash_pairs_docs(spark, sf_dir):
    """SimHash near-dup pairs within hamming distance 3, via pigeonhole
    bit-block banding (operators/dedup.simhash_pairs). md5-prefix token
    hashing keeps the oracle exact.

    48-bit fingerprints: at 16 bits a 5k-doc corpus already produces
    millions of coincidental collisions (2^16 buckets); 48 bits keeps the
    pair volume proportional to true near-dups at 100 TB doc counts."""
    d = read_table(spark, sf_dir, "documents")
    out = dedup.simhash_pairs(d, bits=48, max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "winnowing_fingerprints_docs",
    f"""WITH t AS (
          SELECT doc_id, {_CANON} AS ct FROM documents
        ), g AS (
          SELECT doc_id,
                 list_transform(range(0, greatest(length(ct) - 8, 0) + 1),
                                i -> substring(ct, i + 1, 8)) AS grams
          FROM t
        ), h AS (
          SELECT doc_id,
                 list_transform(grams,
                   gr -> CAST(('0x' || substr(md5(gr), 1, 15)) AS BIGINT)) AS hs
          FROM g
        ), m AS (
          SELECT doc_id,
                 list_distinct(
                   list_transform(range(0, greatest(len(hs) - 4, 0) + 1),
                                  j -> list_min(hs[j+1:j+4]))) AS fps
          FROM h
        )
        SELECT doc_id, unnest(fps) AS fingerprint FROM m""",
)
def winnowing_fingerprints_docs(spark, sf_dir):
    """Winnowing (rolling-hash) fingerprints: min-hash-per-window over
    character 8-gram hashes, k=8/w=4 (operators/text
    .winnowing_fingerprints) — the MOSS-style local-edit-robust
    fingerprint set, md5-prefix ints so the oracle selects identically."""
    d = read_table(spark, sf_dir, "documents")
    return text.winnowing_fingerprints(d, k=8, window=4)


@register(
    "frame_samples_docs",
    """WITH f AS (
          SELECT doc_id, text, length(text) AS n, length(text) // 4 AS sz
          FROM documents
        ), idx AS (
          SELECT doc_id, text, n, sz, unnest(range(0, 4)) AS i FROM f
        )
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST(CASE WHEN i < 3 THEN sz ELSE n - 3 * sz END AS BIGINT)
                   AS frame_chars,
               sha256(substring(text, CAST(i * sz + 1 AS INT),
                      CAST(CASE WHEN i < 3 THEN sz ELSE n - 3 * sz END AS INT)))
                   AS frame_sha
        FROM idx""",
)
def frame_samples_docs(spark, sf_dir):
    """Multimodal frame sampling: 1→4 row fan-out per payload in Arrow
    batches (operators/multimodal.sample_frames). Frames are
    deterministic payload slices (decode stubbed), sha256-fingerprinted
    so the fan-out, slicing and hashing are all oracle-verified."""
    d = read_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(d, n_frames=4)


@register(
    "media_features_docs",
    """WITH d AS (
          SELECT doc_id, sha256(text) AS dg,
                 octet_length(encode(text)) AS nb
          FROM documents
        )
        SELECT doc_id,
               'image/fake' AS media_type,
               CAST(nb AS BIGINT) AS n_bytes,
               dg AS sha256,
               CAST(64 + CAST(('0x' || substr(dg, 1, 2)) AS BIGINT) AS INT) AS width,
               CAST(64 + CAST(('0x' || substr(dg, 3, 2)) AS BIGINT) AS INT) AS height,
               CAST(('0x' || substr(dg, 5, 4)) AS BIGINT) / 65535.0 AS feature_norm
        FROM d""",
)
def media_features_docs(spark, sf_dir):
    """Multimodal binary-column plumbing: payload bytes → mapInPandas
    Arrow-batch feature extraction (operators/multimodal). The decode is a
    deterministic stub (sha256-derived pseudo-features) so the oracle can
    reproduce it exactly — the Spark-side schema/partitioning/batching is
    the real thing."""
    d = read_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_binary_payload(d)
    return multimodal.extract_media_features(payloads)


@register(
    "repetition_stats_docs",
    f"""WITH docs AS (
          SELECT doc_id, regexp_split_to_array({_CANON}, ' ') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, array_to_string(toks[i+1:i+2], ' ') AS gram
          FROM (SELECT doc_id, toks,
                       unnest(range(0, len(toks) - 2 + 1)) AS i
                FROM docs WHERE len(toks) >= 2)
        ),
        c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
        s AS (
          SELECT doc_id, SUM(c) AS total, MAX(c) AS topc,
                 SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupc
          FROM c GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(s.total, 0) AS BIGINT) AS n_ngrams,
               CAST(s.topc AS DOUBLE) / s.total AS top_ngram_frac,
               CAST(s.dupc AS DOUBLE) / s.total AS dup_ngram_frac
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN s USING (doc_id)""",
)
def repetition_stats_docs(spark, sf_dir):
    """Gopher/MassiveText-style 2-gram repetition filters
    (operators/text.repetition_stats): top-ngram and duplicated-ngram
    occurrence fractions per document. Counts are exact integers; the
    fractions are single double divisions (bit-identical cross-engine)."""
    d = read_table(spark, sf_dir, "documents")
    return text.repetition_stats(d, n=2)


#: shared CTE chain for the Naive Bayes train/infer pair: per-class
#: term counts -> Laplace-smoothed log-odds weights (ROUND 6 after the
#: single ln per class — everything before it is exact integers)
_NB_CTES = f"""toks AS (
          SELECT doc_id, unnest(regexp_split_to_array({_CANON}, ' ')) AS term
          FROM documents WHERE length(trim(text)) > 0
        ),
        lab AS (SELECT doc_id, (lang = 'en') AS y FROM documents),
        ltoks AS (SELECT t.term, l.y FROM toks t JOIN lab l USING (doc_id)),
        cnt AS (
          SELECT term,
                 SUM(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
                 SUM(CASE WHEN y THEN 0 ELSE 1 END) AS c_neg
          FROM ltoks GROUP BY term
        ),
        tot AS (SELECT SUM(c_pos) AS tp, SUM(c_neg) AS tn,
                       COUNT(*) AS v FROM cnt),
        wts AS (
          SELECT term, c_pos, c_neg,
                 ROUND(ln(CAST(c_pos + 1 AS DOUBLE) / CAST(tp + v AS DOUBLE))
                       - ln(CAST(c_neg + 1 AS DOUBLE) / CAST(tn + v AS DOUBLE)),
                       6) + 0e0 AS weight
          FROM cnt, tot
        )"""


@register(
    "nb_train_weights_docs",
    f"""WITH {_NB_CTES}
        SELECT term, CAST(c_pos AS BIGINT) AS c_pos,
               CAST(c_neg AS BIGINT) AS c_neg, weight
        FROM wts""",
)
def nb_train_weights_docs(spark, sf_dir):
    """TRAIN a Naive Bayes text classifier (operators/text.
    naive_bayes_train — the trainer for linear_text_classifier's
    inference): multinomial NB with Laplace smoothing over the shared
    canonical tokenization, labels = (lang == 'en'). Per-class counts
    are exact integers; the only floats are one ln per class, rounded
    to 6 — so the learned weight table is bit-reproducible across
    engines and partitionings."""
    d = read_table(spark, sf_dir, "documents")
    return text.naive_bayes_train(d, F.col("lang") == "en")


@register(
    "nb_classify_docs",
    f"""WITH {_NB_CTES},
        prior AS (
          SELECT ROUND(ln(
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS DOUBLE)
                   / CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                          AS DOUBLE)), 6) + 0e0 AS bias
          FROM documents
        ),
        scored AS (
          SELECT tk.doc_id,
                 COUNT(tk.term) AS n_tokens,
                 COUNT(w.weight) AS n_hits,
                 SUM(CAST(w.weight AS DECIMAL(30,6))) AS s
          FROM toks tk LEFT JOIN wts w ON w.term = tk.term
          GROUP BY tk.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
               bias + CASE WHEN COALESCE(n_tokens, 0) > 0
                           THEN CAST(COALESCE(s, 0) AS DOUBLE) / n_tokens
                           ELSE CAST(COALESCE(s, 0) AS DOUBLE) END AS score,
               (bias + CASE WHEN COALESCE(n_tokens, 0) > 0
                            THEN CAST(COALESCE(s, 0) AS DOUBLE) / n_tokens
                            ELSE CAST(COALESCE(s, 0) AS DOUBLE) END)
                 >= 0e0 AS label
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN scored USING (doc_id)
        CROSS JOIN prior""",
)
def nb_classify_docs(spark, sf_dir):
    """Train → infer round trip: naive_bayes_train's ROUND-6 weights +
    naive_bayes_bias prior feed linear_text_classifier unchanged (its
    DECIMAL(30,6) accumulation of 6-decimal weights is exact, so the
    mean-of-weights score is bit-identical cross-engine). The oracle
    retrains AND rescores in pure SQL — the full ML pipeline verified
    end to end, not just the weight table."""
    d = read_table(spark, sf_dir, "documents")
    label = F.col("lang") == "en"
    weights = text.naive_bayes_train(d, label).select("term", "weight")
    bias = text.naive_bayes_bias(d, label)
    return text.linear_text_classifier(d, weights, bias=bias, threshold=0.0)


@register(
    "decontaminate_docs",
    f"""WITH {_SHINGLES_CTE},
        tr AS (SELECT * FROM sh WHERE doc_id % 25 <> 0),
        ev AS (SELECT * FROM sh WHERE doc_id % 25 = 0),
        m AS (
          SELECT tr.doc_id,
                 COUNT(DISTINCT tr.shingle) AS n_shared,
                 COUNT(DISTINCT ev.doc_id) AS n_eval
          FROM tr JOIN ev ON tr.shingle = ev.shingle
          GROUP BY 1
        ),
        sz AS (SELECT doc_id, COUNT(*) AS total FROM tr GROUP BY 1)
        SELECT m.doc_id,
               CAST(n_shared AS BIGINT) AS n_shared_shingles,
               CAST(n_eval AS BIGINT) AS n_eval_docs_matched,
               CAST(n_shared AS DOUBLE) / sz.total AS contaminated_frac
        FROM m JOIN sz ON sz.doc_id = m.doc_id""",
)
def decontaminate_docs(spark, sf_dir):
    """Benchmark decontamination (operators/dedup.contamination_report):
    deterministic eval split doc_id % 25 == 0, word 3-gram overlap, eval
    shingles broadcast. Counts exact; frac is one double division."""
    d = read_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 25 != 0)
    ev = d.filter(F.col("doc_id") % 25 == 0)
    return dedup.contamination_report(train, ev, n=3)


@register(
    "decontaminate_bloom_docs",
    # The bloom prefilter is a lossless fast path: the report must EQUAL
    # the exact n-gram overlap — so this query shares decontaminate_docs'
    # oracle verbatim.
    f"""WITH {_SHINGLES_CTE},
        tr AS (SELECT * FROM sh WHERE doc_id % 25 <> 0),
        ev AS (SELECT * FROM sh WHERE doc_id % 25 = 0),
        m AS (
          SELECT tr.doc_id,
                 COUNT(DISTINCT tr.shingle) AS n_shared,
                 COUNT(DISTINCT ev.doc_id) AS n_eval
          FROM tr JOIN ev ON tr.shingle = ev.shingle
          GROUP BY 1
        ),
        sz AS (SELECT doc_id, COUNT(*) AS total FROM tr GROUP BY 1)
        SELECT m.doc_id,
               CAST(n_shared AS BIGINT) AS n_shared_shingles,
               CAST(n_eval AS BIGINT) AS n_eval_docs_matched,
               CAST(n_shared AS DOUBLE) / sz.total AS contaminated_frac
        FROM m JOIN sz ON sz.doc_id = m.doc_id""",
)
def decontaminate_bloom_docs(spark, sf_dir):
    """Decontamination with the Bloom fast path
    (operators/dedup.contamination_report(bloom_prefilter=True)): train
    shingles failing any probe of the eval-shingle Bloom filter are
    certainly absent from the eval set and skip the join — the scale
    path when the eval set is too large to broadcast raw (the filter is
    num_bits/8 bytes no matter what). No false negatives, so the report
    is bit-identical to the exact overlap — the oracle is
    decontaminate_docs' oracle verbatim."""
    d = read_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 25 != 0)
    ev = d.filter(F.col("doc_id") % 25 == 0)
    return dedup.contamination_report(train, ev, n=3, bloom_prefilter=True)


@register(
    "unigram_logprob_docs",
    f"""WITH t AS (
          SELECT doc_id, unnest(regexp_split_to_array({_CANON}, ' ')) AS term
          FROM documents WHERE length(trim(text)) > 0
        ),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        m AS (SELECT term, SUM(tf) AS c FROM tf GROUP BY term),
        n AS (SELECT SUM(c) AS N FROM m)
        SELECT tf.doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
               ROUND(SUM(CAST(tf.tf AS DOUBLE) * ln(CAST(m.c AS DOUBLE)))
                     / CAST(SUM(tf.tf) AS DOUBLE)
                     - ln(CAST(n.N AS DOUBLE)), 6) AS avg_logprob
        FROM tf JOIN m USING (term), n
        GROUP BY tf.doc_id, n.N""",
)
def unigram_logprob_docs(spark, sf_dir):
    """Corpus-unigram-LM mean token log-probability per document
    (operators/text.unigram_logprob) — the perplexity-surrogate quality
    filter. Term counts are exact integers and the model table
    broadcasts (vocabulary-bounded); the ln-sum is the one float
    aggregate, ROUNDed to 6 per the stddev/corr contract."""
    d = read_table(spark, sf_dir, "documents")
    out = text.unigram_logprob(d)
    return out.select(
        "doc_id", "n_tokens", F.round("avg_logprob", 6).alias("avg_logprob")
    )


#: tokens with the [] guard for blank text (functions.tokens twin)
_TOKS = (
    f"CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) "
    f"ELSE regexp_split_to_array({_CANON}, ' ') END"
)

_BM25_TERMS = ("spark", "table", "join")


def _bm25_sql(terms, k1=1.2, b=0.75) -> str:
    tf_cols = ",\n".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    contrib = " + ".join(
        f"ln(1.0 + (CAST(N AS DOUBLE) - df{i} + 0.5) / (df{i} + 0.5)) "
        f"* (tf{i} * ({k1} + 1.0)) "
        f"/ (tf{i} + {k1} * (0.25 + {b} * CAST(dl AS DOUBLE) / avgdl))"
        for i in range(len(terms))
    )
    return f"""WITH toks AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        t AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, {tf_cols} FROM toks
        ),
        s AS (
          SELECT COUNT(*) AS N, AVG(CAST(dl AS DOUBLE)) AS avgdl, {df_cols}
          FROM t
        )
        SELECT doc_id, dl, ROUND(0.0 + {contrib}, 6) AS score
        FROM t, s"""


@register("bm25_docs", _bm25_sql(_BM25_TERMS))
def bm25_docs(spark, sf_dir):
    """BM25 relevance of every document against a fixed query term set
    (operators/text.bm25_scores) — the retrieval scorer. Per-term
    contributions combine in fixed left-to-right order (row expression,
    not a float aggregate); corpus stats (N, avgdl, per-term df) are
    tiny broadcast aggregates; avgdl is exact (integer lengths summed
    in doubles). ROUND 6 for the ln() libm variance (unigram_logprob
    contract)."""
    d = read_table(spark, sf_dir, "documents")
    out = text.bm25_scores(d, list(_BM25_TERMS))
    return out.select("doc_id", "dl", F.round("score", 6).alias("score"))


@register(
    "segment_dedup_docs",
    f"""WITH toks AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        seg AS (
          SELECT doc_id, i AS seg_idx,
                 array_to_string(toks[i*10+1 : i*10+10], ' ') AS segment
          FROM (SELECT doc_id, toks,
                       unnest(range(0, CAST(ceil(len(toks) / 10.0) AS INT))) AS i
                FROM toks)
        ),
        f AS (
          SELECT md5(segment) AS h, COUNT(DISTINCT doc_id) AS docs
          FROM seg GROUP BY 1
        ),
        m AS (
          SELECT seg.*, f.docs <= 2 AS keep
          FROM seg JOIN f ON md5(seg.segment) = f.h
        ),
        g AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_segments,
                 CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dropped,
                 COALESCE(string_agg(CASE WHEN keep THEN segment END, ' '
                                     ORDER BY seg_idx), '') AS cleaned_text
          FROM m GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(g.n_segments, 0) AS n_segments,
               COALESCE(g.n_dropped, 0) AS n_dropped,
               COALESCE(g.cleaned_text, '') AS cleaned_text
        FROM documents d LEFT JOIN g USING (doc_id)""",
)
def segment_dedup_docs(spark, sf_dir):
    """Boilerplate segment removal (operators/text.segment_dedup) — the
    CCNet/RefinedWeb line-dedup step on 10-token segments: segments
    appearing in >2 distinct documents are dropped, survivors
    reassembled in order. The frequency table groups on the segment md5
    (small, uniform shuffle keys); reassembly is one doc-keyed
    order-preserving aggregation. All-exact: counts, md5, string
    assembly — no floats anywhere."""
    d = read_table(spark, sf_dir, "documents")
    return text.segment_dedup(d)


@register(
    "vocab_coverage_docs",
    f"""WITH terms AS (
          SELECT unnest({_TOKS}) AS term FROM documents
        ), counts AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM terms WHERE length(term) >= 1 GROUP BY term
        ), tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS total
          FROM terms WHERE length(term) >= 1
        ), top AS (
          SELECT term, cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank
          FROM counts QUALIFY rank <= 200
        )
        SELECT CAST(rank AS INT) AS rank, term, cnt,
               CAST(SUM(cnt) OVER (ORDER BY rank) AS BIGINT) AS cum_cnt,
               CAST(SUM(cnt) OVER (ORDER BY rank) AS DOUBLE)
                   / CAST(total AS DOUBLE) AS cum_share
        FROM top, tot""",
)
def vocab_coverage_docs(spark, sf_dir):
    """Global vocabulary frequency + cumulative coverage curve
    (operators/text.vocab_coverage): rank terms by corpus frequency,
    report the share of all token occurrences the top-r cover — the
    tokenizer-vocab-sizing primitive. Top-k goes through
    TakeOrderedAndProject (per-partition heaps), never a single-task
    sort of the full vocabulary; cum_share is one double division of
    exact integers."""
    d = read_table(spark, sf_dir, "documents")
    return text.vocab_coverage(d, top_k=200)


@register(
    "mixture_temperature_weights",
    # Temperature-scaled sampling weights (T=0.7, mT5-style): shares are
    # exact integer ratios; pow and the 5-term normalization sum are the
    # only floating steps, so both sides ROUND to 6 (same discipline as
    # the stddev/corr aggregates).
    f"""WITH t AS (
          SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ), tot AS (
          SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM t
        ), w AS (
          SELECT source, n_tokens,
                 CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS p,
                 pow(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE),
                     0.7e0) AS w_raw
          FROM t, tot
        )
        SELECT source, n_tokens, p,
               ROUND(w_raw / SUM(w_raw) OVER (), 6) AS weight
        FROM w""",
)
def mixture_temperature_weights(spark, sf_dir):
    """Temperature-scaled source-mixture weights (T=0.7): upsample rare
    sources, downsample dominant ones — the multilingual/source
    balancing rule from the mT5/XLM-R lineage, feeding sampling
    .mixture_resample targets. Token shares are exact integer ratios;
    pow + the normalization are ROUNDed 6 (inherently-floating, like
    stddev/corr)."""
    from pyspark.sql import Window

    from financial_data_lakehouse_pipeline__spark.functions import tokens as _tk

    d = read_table(spark, sf_dir, "documents")
    canon = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    t = d.select("source", F.size(_tk(canon)).alias("__n")).groupBy("source").agg(
        F.sum("__n").cast("bigint").alias("n_tokens")
    )
    tot = t.agg(F.sum("n_tokens").cast("bigint").alias("__total"))
    w = (
        t.crossJoin(F.broadcast(tot))
        .withColumn(
            "p", F.col("n_tokens").cast("double") / F.col("__total").cast("double")
        )
        .withColumn("w_raw", F.pow(F.col("p"), F.lit(0.7)))
    )
    return w.select(
        "source",
        "n_tokens",
        "p",
        F.round(F.col("w_raw") / F.sum("w_raw").over(Window.partitionBy()), 6).alias(
            "weight"
        ),
    )


@register(
    "encoding_quality_docs",
    r"""SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars,
               len(regexp_extract_all(text, '�'))
                   / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0)
                   AS replacement_ratio,
               len(regexp_extract_all(text,
                   '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]'))
                   / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0)
                   AS control_ratio,
               len(regexp_extract_all(text, '[ÃÂâÐÑ][^ ]'))
                   / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0)
                   AS mojibake_ratio,
               (len(regexp_extract_all(text, '�'))
                + len(regexp_extract_all(text,
                      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]'))
                + len(regexp_extract_all(text, '[ÃÂâÐÑ][^ ]'))) = 0
                   AS encoding_ok
        FROM documents""",
)
def encoding_quality_docs(spark, sf_dir):
    """Encoding/mojibake screen (operators/text.encoding_quality):
    replacement-char, control-char and UTF-8-as-Latin-1 digraph ratios
    per document — single-pass regexp counts, exact integer lengths,
    one guarded division each."""
    d = read_table(spark, sf_dir, "documents")
    return text.encoding_quality(d)


@register(
    "quality_classifier_docs",
    # Linear BoW inference, exact: fixed-point weights accumulate as
    # DECIMAL, one division per doc. Docs with no vocab hits (or no
    # tokens) score exactly the bias.
    f"""WITH w(term, weight) AS (
          VALUES ('fast', 1.0), ('spark', 0.5), ('merge', 0.25),
                 ('slow', -1.0), ('the', -0.25)
        ), t AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array({_CANON}, ' ')) AS tok
          FROM documents WHERE length(trim(text)) > 0
        ), j AS (
          SELECT doc_id, tok, weight FROM t LEFT JOIN w ON tok = term
        ), s AS (
          SELECT doc_id,
                 CAST(COUNT(tok) AS BIGINT) AS n_tokens,
                 CAST(COUNT(weight) AS BIGINT) AS n_hits,
                 SUM(CAST(weight AS DECIMAL(30,6))) AS ws
          FROM j GROUP BY doc_id
        ), sc AS (
          SELECT d.doc_id,
                 COALESCE(s.n_tokens, 0) AS n_tokens,
                 COALESCE(s.n_hits, 0) AS n_hits,
                 1e-1 + CASE WHEN COALESCE(s.n_tokens, 0) > 0
                        THEN CAST(COALESCE(s.ws, 0) AS DOUBLE)
                             / CAST(s.n_tokens AS DOUBLE)
                        ELSE 0e0 END AS score
          FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        )
        SELECT doc_id, n_tokens, n_hits, score, score >= 0e0 AS label
        FROM sc""",
)
def quality_classifier_docs(spark, sf_dir):
    """Model-based quality filtering (operators/text.
    linear_text_classifier): a linear bag-of-words scorer — the
    fastText/logistic quality-classifier inference step of CCNet/
    FineWeb-style pipelines — as pure Spark expressions: explode →
    broadcast vocabulary join → one keyed aggregation, no UDF.
    Fixed-point weights make the weighted sum DECIMAL-exact, so scores
    are bit-identical cross-engine; empty/no-hit docs score exactly the
    bias."""
    d = read_table(spark, sf_dir, "documents")
    w = spark.createDataFrame(
        [("fast", 1.0), ("spark", 0.5), ("merge", 0.25),
         ("slow", -1.0), ("the", -0.25)],
        "term string, weight double",
    )
    return text.linear_text_classifier(
        d, w, bias=0.1, threshold=0.0, normalize=True
    )


@register(
    "bpe_merges_docs",
    # Unrolled 2-merge twin of the engine's driver loop: same [a-z]+
    # word counts, same double-pipe symbol strings, same builtin
    # replace() merge (leftmost non-overlapping == greedy BPE pass),
    # same (cnt DESC, a, b) tie-break. All counts are exact integers.
    r"""WITH words AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
          FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
                       AS w
                FROM documents)
          GROUP BY 1
        ),
        s0 AS (
          SELECT regexp_replace(w, '(.)', '|\1|', 'g') AS s, freq
          FROM words
        ),
        pc1 AS (
          SELECT pr[1] AS a, pr[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM (
            SELECT freq, unnest(list_zip(l, l[2:])) AS pr
            FROM (SELECT freq,
                         list_filter(regexp_split_to_array(s, '\|+'),
                                     x -> x <> '') AS l
                  FROM s0)
          ) WHERE pr[2] IS NOT NULL
          GROUP BY 1, 2
        ),
        m1 AS (SELECT a, b, cnt FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1),
        s1 AS (
          SELECT replace(s,
                         '|' || (SELECT a FROM m1) || '||'
                             || (SELECT b FROM m1) || '|',
                         '|' || (SELECT a FROM m1)
                             || (SELECT b FROM m1) || '|') AS s,
                 freq
          FROM s0
        ),
        pc2 AS (
          SELECT pr[1] AS a, pr[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM (
            SELECT freq, unnest(list_zip(l, l[2:])) AS pr
            FROM (SELECT freq,
                         list_filter(regexp_split_to_array(s, '\|+'),
                                     x -> x <> '') AS l
                  FROM s1)
          ) WHERE pr[2] IS NOT NULL
          GROUP BY 1, 2
        ),
        m2 AS (SELECT a, b, cnt FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1)
        SELECT 1 AS rank, a AS left_sym, b AS right_sym,
               cnt AS pair_count FROM m1
        UNION ALL
        SELECT 2, a, b, cnt FROM m2""",
)
def bpe_merges_docs(spark, sf_dir):
    """First two learned BPE merges over the documents corpus
    (operators/text.bpe_learn_merges, n_merges=2) — the
    tokenizer-training loop: word-frequency table once, then per merge
    one exact pair-count aggregation + a deterministic top-1
    ((cnt DESC, a, b)) and a builtin-replace merge pass. The oracle
    unrolls the same two iterations in SQL; deeper runs are pinned
    against a sequential Python reference in tests/test_operators.py."""
    d = read_table(spark, sf_dir, "documents")
    return text.bpe_learn_merges(d, "text", n_merges=2)


@register(
    "bpe_encode_docs",
    # Same fixed merge chain unrolled as nested replace() calls; token
    # count = surviving symbols per word, summed per doc. All integers.
    r"""WITH w AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z]+') AS ws
          FROM documents
        )
        SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
               CAST(COALESCE(list_aggregate(list_transform(ws, w ->
                 len(list_filter(regexp_split_to_array(
                   replace(replace(replace(replace(
                     regexp_replace(w, '(.)', '|\1|', 'g'),
                     '|t||h|', '|th|'),
                     '|th||e|', '|the|'),
                     '|a||n|', '|an|'),
                     '|i||n|', '|in|'),
                   '\|+'), x -> x <> ''))), 'sum'), 0) AS INT)
                 AS n_bpe_tokens
        FROM w""",
)
def bpe_encode_docs(spark, sf_dir):
    """BPE tokenization with a fixed 4-merge table
    (operators/text.bpe_apply_merges, merges th/the/an/in) — per-doc
    word and BPE-token counts. The merge chain is one nested builtin
    replace() expression: scan -> project, zero shuffles, no UDF —
    the tokenizer-application half of the bpe_merges_docs learner."""
    d = read_table(spark, sf_dir, "documents")
    return text.bpe_apply_merges(
        d, [("t", "h"), ("th", "e"), ("a", "n"), ("i", "n")]
    )


@register(
    "repeated_spans_docs",
    # 6-gram twin of the _SHINGLES_CTE pattern (same canonicalization,
    # same range/slice arithmetic), bounded per-span state (count +
    # min/max example ids), deterministic (n_docs DESC, span) top-20.
    f"""WITH docs AS (
          SELECT doc_id, regexp_split_to_array({_CANON}, ' ') AS toks
          FROM documents
          WHERE length(trim(text)) > 0
        ),
        idx AS (
          SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks) - 6, 0) + 1)) AS i
          FROM docs
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(toks[i+1:i+6], ' ') AS span
          FROM idx
          WHERE length(array_to_string(toks[i+1:i+6], ' ')) > 0
        )
        SELECT span, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM sh GROUP BY span HAVING COUNT(*) >= 2
        ORDER BY n_docs DESC, span LIMIT 20""",
)
def repeated_spans_docs(spark, sf_dir):
    """Top cross-document repeated 6-gram spans
    (operators/dedup.repeated_spans) — the substring-level diagnostic
    that surfaces boilerplate/license/template passages document-level
    near-dup misses. Span-keyed groupBy with bounded state (count +
    min/max example doc), TakeOrderedAndProject top-20."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.repeated_spans(d, "doc_id", "text", n=6, min_docs=2, k=20)


@register(
    "phrase_search_docs",
    # Positional-posting twin: same canonical tokens with ordinality,
    # same shifted equi-joins on (doc, pos). Counts exact.
    f"""WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array({_CANON}, ' ')) AS term,
                 generate_subscripts(
                   regexp_split_to_array({_CANON}, ' '), 1) - 1 AS pos
          FROM documents WHERE length(trim(text)) > 0
        ),
        idx AS (SELECT term, doc_id, pos FROM toks
                WHERE length(term) > 0),
        t0 AS (SELECT doc_id, pos FROM idx WHERE term = 'big'),
        t1 AS (SELECT doc_id, pos - 1 AS pos FROM idx
               WHERE term = 'order'),
        t2 AS (SELECT doc_id, pos - 2 AS pos FROM idx WHERE term = 'scan')
        SELECT t0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM t0
        JOIN t1 ON t0.doc_id = t1.doc_id AND t0.pos = t1.pos
        JOIN t2 ON t0.doc_id = t2.doc_id AND t0.pos = t2.pos
        GROUP BY t0.doc_id""",
)
def phrase_search_docs(spark, sf_dir):
    """Exact phrase search for 'big order scan' via a positional
    inverted index (operators/text.positional_index + phrase_search):
    per-term posting lists shift-joined on (doc, pos) — term filters
    push into the index scan, join inputs are posting-list-sized. The
    IR-index counterpart of the shingle-based dedup family."""
    d = read_table(spark, sf_dir, "documents")
    return text.phrase_search(d, "big order scan")


@register(
    "bigram_logprob_docs",
    # Same bigram extraction (list_zip postings), same self-trained
    # model with exact counts; the ln-sum is the one float aggregate
    # -> ROUND 6 on both sides.
    f"""WITH toked AS (
          SELECT doc_id, regexp_split_to_array({_CANON}, ' ') AS l
          FROM documents WHERE length(trim(text)) > 0
        ),
        pairs AS (
          SELECT doc_id, pr[1] AS w1, pr[2] AS w2
          FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS pr
                FROM toked)
          WHERE pr[2] IS NOT NULL
            AND length(pr[1]) > 0 AND length(pr[2]) > 0
        ),
        tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf
               FROM pairs GROUP BY 1, 2, 3),
        model AS (SELECT w1, w2, SUM(tf) AS c12 FROM tf GROUP BY 1, 2),
        marg AS (SELECT w1, SUM(c12) AS c1 FROM model GROUP BY 1)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               ROUND(SUM(CAST(tf AS DOUBLE)
                         * (ln(CAST(c12 AS DOUBLE))
                            - ln(CAST(c1 AS DOUBLE))))
                     / CAST(SUM(tf) AS DOUBLE), 6) + 0e0 AS avg_logprob
        FROM tf JOIN model USING (w1, w2) JOIN marg USING (w1)
        GROUP BY doc_id""",
)
def bigram_logprob_docs(spark, sf_dir):
    """Per-document mean bigram log-probability under the corpus's own
    bigram LM (operators/text.bigram_logprob) — the word-order-aware
    quality surrogate beside unigram_logprob_docs (CCNet-style LM
    filtering). Exact integer counts; ln-sum ROUND 6."""
    d = read_table(spark, sf_dir, "documents")
    out = text.bigram_logprob(d)
    return out.select(
        "doc_id",
        "n_bigrams",
        (F.round("avg_logprob", 6) + F.lit(0.0)).alias("avg_logprob"),
    )


@register(
    "zipf_fit_docs",
    # Same deterministic (freq DESC, term) ranking; ln/OLS are the
    # floating steps -> ROUND 6 on slope/intercept.
    f"""WITH toks AS (
          SELECT unnest(regexp_split_to_array({_CANON}, ' ')) AS term
          FROM documents WHERE length(trim(text)) > 0
        ),
        vocab AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks
          WHERE length(term) > 0 GROUP BY term
        ),
        ranked AS (
          SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS r
          FROM vocab
        ),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
                 CAST(SUM(c) AS BIGINT) AS total_tokens,
                 SUM(ln(CAST(r AS DOUBLE))) AS sx,
                 SUM(ln(CAST(c AS DOUBLE))) AS sy,
                 SUM(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy,
                 SUM(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx
          FROM ranked
        )
        SELECT n_terms, total_tokens,
               ROUND((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n_terms AS DOUBLE) * sxx - sx * sx), 6) + 0e0
                 AS slope,
               ROUND((sy - ((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                            / (CAST(n_terms AS DOUBLE) * sxx - sx * sx))
                           * sx) / CAST(n_terms AS DOUBLE), 6) + 0e0
                 AS intercept
        FROM m""",
)
def zipf_fit_docs(spark, sf_dir):
    """Zipf rank-frequency fit of the documents vocabulary
    (operators/text.zipf_fit): OLS of ln(freq) on ln(rank) — the
    corpus-level naturalness screen (natural text ~ slope -1). The
    rank window runs over the vocabulary only; ROUND 6 on the fit."""
    d = read_table(spark, sf_dir, "documents")
    out = text.zipf_fit(d)
    return out.select(
        "n_terms",
        "total_tokens",
        (F.round("slope", 6) + F.lit(0.0)).alias("slope"),
        (F.round("intercept", 6) + F.lit(0.0)).alias("intercept"),
    )


@register(
    "tfidf_cosine_pairs_docs",
    # Same deterministic 200-doc sample, same exact per-(doc,term)
    # rational-idf weights; dot/norm are float sums -> the cosine is
    # ROUNDed to 6 BEFORE the threshold filter on BOTH engines, so
    # boundary pairs cannot flip on sum-order ulps.
    r"""WITH sample AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   md5('exk:' || CAST(doc_id AS VARCHAR)) AS k
            FROM documents ORDER BY k LIMIT 200)
        ),
        terms AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                   ' ')) AS term
          FROM sample WHERE length(trim(text)) > 0
        ),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms
               WHERE length(term) >= 3 GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nn
              FROM sample),
        w AS (
          SELECT doc_id, term,
                 CAST(tf AS DOUBLE) * (CAST(nn + 1 AS DOUBLE)
                                       / CAST(df + 1 AS DOUBLE)) AS w
          FROM tf JOIN dfq USING (term) CROSS JOIN n
        ),
        nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm
                FROM w GROUP BY doc_id),
        dots AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 SUM(a.w * b.w) AS dot
          FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(dot / (na.nrm * nb.nrm), 6) + 0e0 AS cosine
        FROM dots
        JOIN nrm na ON na.doc_id = id_a
        JOIN nrm nb ON nb.doc_id = id_b
        WHERE ROUND(dot / (na.nrm * nb.nrm), 6) + 0e0 >= 0.9""",
)
def tfidf_cosine_pairs_docs(spark, sf_dir):
    """Sparse tf-idf cosine similarity join over a deterministic
    200-doc sample (operators/sampling.exact_k_sample →
    operators/text.tfidf_cosine_pairs, threshold 0.9): bag-of-words
    cosine from posting lists — the text-side sibling of the dense
    embedding cosine, catching word-REUSE similarity that shingle
    Jaccard misses. The sample bounds the posting join at every scale
    factor (this corpus's 30-term vocabulary makes full-corpus sparse
    cosine degenerate all-pairs — the operator's max_df cap is the
    production lever; the fixed sample is the corpus-sized one)."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sample = sampling.exact_k_sample(d, "doc_id", k=200)
    return text.tfidf_cosine_pairs(sample, threshold=0.9)
