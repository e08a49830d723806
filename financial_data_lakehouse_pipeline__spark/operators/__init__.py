"""Operator library — parameterized DataFrame→DataFrame functions.

Each module mirrors one band of SURVEY.md §2:

  cleaning    — flatten/cast/dedup/invariant filters           (§2.2, A10/A11)
  joins       — coalescing merge, enrichment, semi/anti, as-of (§2.3)
  windows     — rolling frames, lag/lead, ranking, cumsum, EMA (§2.5)
  aggregates  — grouped stats, conditional counts, corr, top-k (§2.4, §2.6)
  analysis    — bucketing, event detection, summary composites (sa:*)
  events      — tumbling/sliding windows, sessionization, recency weighting
  dedup       — exact, MinHash-LSH, SimHash, n-gram Jaccard    (extension)
  similarity  — embedding cosine top-k, sign-LSH ANN           (extension)
  text        — language-ID, quality scoring, tokens, fingerprints
  multimodal  — binary-column plumbing (decode stubbed)        (extension)
  sql_views   — the reference's 7 SQL views re-expressed on testdata
"""
