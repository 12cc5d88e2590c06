"""Corpus bigram language-model quality scoring (ccnet-style).

The curation suite scores documents with surface heuristics
(``text_quality``, ``repetition_stats``); production pipelines add a
statistical signal: score each document under a language model trained
on the corpus itself, then bucket by score (the CCNet recipe —
Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", arXiv:1911.00359 — uses a KenLM perplexity for
exactly this). Here the model is an add-one-smoothed BIGRAM LM, the
classic n-gram construction (Chen & Goodman smoothing family).

Cross-engine exactness (the CLAUDE.md integer rule): perplexity needs
``log``, and libm log differs between engines in the last ulp — so the
score is kept RATIONAL instead: each bigram contributes its smoothed
conditional probability in parts-per-million,

    ppm(w2 | w1) = (c(w1 w2) + 1) * 1_000_000 // (c(w1) + V)

(BIGINT floor-div, exact in both engines), and a document's score is
the floor mean over its bigrams. Monotone in the geometric-mean
probability ranking for bucketing purposes, with zero float seam.

Scale shape: training is two hash-aggregates over the token stream
(map-side partial agg; the bigram explode is a codegen ``transform``
over the token array — no UDF, no raw-text shuffle: only fixed-width
(w1, w2, count) rows move). Scoring joins each document's bigrams
against the model table on (w1, w2) — a plain shuffle equi-join where
a hot bigram ("of the") is a single build row matched by many probe
rows, the benign direction of skew; AQE handles the residual. The
model table is distinct-bigram-bounded (Zipf, far sublinear in corpus
size); V is one scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _toks_col():
    return F.expr("filter(split(text, ' '), t -> t != '')")


def _bigrams(df: DataFrame, keep: str) -> DataFrame:
    """Explode (``keep``..., w1, w2) bigram rows from a (…, text) frame
    — a codegen transform over the token array, every position counts."""
    return (df
            .withColumn("toks", _toks_col())
            .select(keep, F.explode(F.expr(
                # greatest(…, 0): slice rejects a negative length, and
                # an empty/whitespace doc has size(toks) = 0
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), "
                "(t, i) -> struct(t AS w1, toks[i + 1] AS w2))"))
                .alias("bg"))
            .select(keep, "bg.w1", "bg.w2"))


def bigram_lm_scores(docs: DataFrame) -> DataFrame:
    """Train the corpus bigram LM and score every document under it:
    ``(doc_id, n_bigrams, mean_bigram_ppm)`` — the floor mean of
    add-one-smoothed bigram probabilities in ppm (0 for docs with < 2
    tokens). Higher = more typical of the corpus; bucketing on this
    column is the CCNet head/middle/tail split."""
    docs = docs.select("doc_id", "text")
    big = _bigrams(docs, "doc_id")
    model = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12"))
    uni = (docs.withColumn("toks", _toks_col())
           .select(F.explode("toks").alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    v = uni.count()  # vocab size — one scalar to the driver
    # BIGINT `DIV` on both sides, never `/` (Spark's `/` is DOUBLE
    # division — a rounded-up quotient would truncate differently from
    # DuckDB's integer `//`; CLAUDE.md integer-exactness rule)
    scored = (big
              .join(model, ["w1", "w2"])
              .join(uni, "w1")
              .select("doc_id",
                      F.expr(f"(c12 + 1) * CAST({PPM} AS BIGINT) "
                             f"DIV (c1 + CAST({v} AS BIGINT))")
                      .alias("ppm")))
    scored = (big.select("doc_id").groupBy("doc_id").count()
              .join(scored.groupBy("doc_id")
                    .agg(F.sum("ppm").alias("s")), "doc_id")
              .select("doc_id", F.col("count").alias("n_bigrams"),
                      F.expr("s DIV count").alias("mean_bigram_ppm")))
    return (docs.select("doc_id")
            .join(scored, "doc_id", "left")
            .fillna(0, ["n_bigrams", "mean_bigram_ppm"]))


def bigram_lm_ctes(*, table: str, out: str = "lm_scores") -> str:
    """The full train+score pipeline as a spliceable CTE chain ending
    in ``{out}(doc_id, n_bigrams, mean_bigram_ppm)`` — used by
    :func:`bigram_lm_oracle_sql` and composed into pipeline oracles
    (the spans.py CTE-chain pattern). Internal names carry the ``lm_``
    prefix to stay collision-free."""
    return f"""lm_toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '')
               AS tk
      FROM {table}),
    lm_guard AS (
      SELECT CASE WHEN MAX(len(tk)) > 100000
             THEN error('oracle token bound 100000 exceeded in {table}')
             ELSE 1 END AS ok FROM lm_toks),
    lm_big AS (
      SELECT doc_id, tk[CAST(i AS INTEGER)] AS w1,
             tk[CAST(i AS INTEGER) + 1] AS w2
      FROM lm_toks, lm_guard, generate_series(1, 100000) g(i)
      WHERE lm_guard.ok = 1 AND i <= len(tk) - 1),
    lm_model AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM lm_big GROUP BY w1, w2),
    lm_uni AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
      FROM (SELECT doc_id, UNNEST(tk) AS w1 FROM lm_toks) GROUP BY w1),
    lm_v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lm_uni),
    lm_scored AS (
      SELECT b.doc_id,
             ((m.c12 + 1) * {PPM}) // (u.c1 + lm_v.v) AS ppm
      FROM lm_big b
      JOIN lm_model m USING (w1, w2)
      JOIN lm_uni u USING (w1)
      CROSS JOIN lm_v),
    lm_per AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
               AS mean_bigram_ppm
      FROM lm_scored GROUP BY doc_id),
    {out} AS (
      SELECT d.doc_id,
             CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(COALESCE(p.mean_bigram_ppm, 0) AS BIGINT)
               AS mean_bigram_ppm
      FROM {table} d LEFT JOIN lm_per p USING (doc_id))"""


def bigram_lm_oracle_sql(*, table: str = "documents") -> str:
    return f"""
    WITH {bigram_lm_ctes(table=table, out="lm_scores")}
    SELECT doc_id, n_bigrams, mean_bigram_ppm FROM lm_scores"""


