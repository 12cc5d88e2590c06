"""Training-corpus curation signals beyond dedup: PII scrubbing and
Gopher-style repetition statistics (Rae et al. 2021 "Scaling Language
Models" quality heuristics; standard LLM data-pipeline stages).

Scale notes: both operators are pure column expressions — JVM-side
regex / higher-order functions, zero shuffle, whole-stage-codegen'd
(except HOF lambdas, which are interpreted per element but stay
executor-local; documents are ~100s of words, so the O(distinct × n)
mode computation is trivial per row). Nothing here moves data.

Oracle twins replicate the exact expression shapes in DuckDB (regex
patterns kept inside the Java∩RE2 common subset: no backrefs, no
lookaround; counts via regexp_extract_all + len vs Spark regexp_count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"

# The synthetic documents carry no PII, so the driver query derives a
# deterministic PII-bearing text per doc (same expression both engines).
_PII_TEXT_SPARK = (
    "concat(text, ' contact user', doc_id, '@example.com call 555-', "
    "lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), "
    "' ip 10.', doc_id % 256, '.0.1')")
_PII_TEXT_DUCK = (
    "text || ' contact user' || doc_id || '@example.com call 555-' || "
    "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "' ip 10.' || (doc_id % 256) || '.0.1'")


def pii_scrub(docs: DataFrame, *, text_expr: str = "text") -> DataFrame:
    """Per-document PII redaction + counts: emails, NANP-style phone
    numbers, IPv4 addresses → ``[EMAIL]``/``[PHONE]``/``[IP]`` tokens.

    Output: ``doc_id, n_emails, n_phones, n_ips, scrubbed_md5`` (the md5
    keeps the gate value-exact without shipping full scrubbed text).
    """
    # Spark SQL single-quoted literals process C-style escapes ('\b' is a
    # backspace byte), so backslashes must be doubled HERE but not in the
    # DuckDB oracle (standard SQL strings keep them literal).
    email = EMAIL_RE.replace("\\", "\\\\")
    phone = PHONE_RE.replace("\\", "\\\\")
    ipv4 = IPV4_RE.replace("\\", "\\\\")
    return docs.selectExpr(
        "doc_id",
        f"({text_expr}) AS _t",
    ).selectExpr(
        "doc_id",
        f"CAST(regexp_count(_t, '{email}') AS BIGINT) AS n_emails",
        f"CAST(regexp_count(_t, '{phone}') AS BIGINT) AS n_phones",
        f"CAST(regexp_count(_t, '{ipv4}') AS BIGINT) AS n_ips",
        f"md5(regexp_replace(regexp_replace(regexp_replace(_t, "
        f"'{email}', '[EMAIL]'), '{phone}', '[PHONE]'), "
        f"'{ipv4}', '[IP]')) AS scrubbed_md5",
    )


def pii_scrub_oracle_sql(*, table: str = "documents",
                         text_expr: str | None = None) -> str:
    t = text_expr or "text"
    return f"""
    WITH src AS (SELECT doc_id, ({t}) AS _t FROM {table})
    SELECT doc_id,
      CAST(len(regexp_extract_all(_t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(_t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
      CAST(len(regexp_extract_all(_t, '{IPV4_RE}')) AS BIGINT) AS n_ips,
      md5(regexp_replace(regexp_replace(regexp_replace(_t,
        '{EMAIL_RE}', '[EMAIL]', 'g'), '{PHONE_RE}', '[PHONE]', 'g'),
        '{IPV4_RE}', '[IP]', 'g')) AS scrubbed_md5
    FROM src"""


def pii_texts():
    """(spark_expr, duckdb_expr) for the deterministic PII-bearing text."""
    return _PII_TEXT_SPARK, _PII_TEXT_DUCK


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style per-document repetition signals over whitespace
    words: duplicate-word fraction, duplicate-2gram fraction, top-word
    frequency fraction, mean word length, and the composite ``keep``
    flag (Rae et al. Table A1-style thresholds).

    Output: ``doc_id, n_words, dup_word_frac, dup_2gram_frac,
    top_word_frac, mean_word_len, keep``.
    """
    return docs.selectExpr(
        "doc_id", "split(text, ' ') AS ws",
    ).selectExpr(
        "doc_id", "ws", "size(ws) AS n",
        # 2grams: element_at is 1-based on both engines' oracle shapes
        "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1), "
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) "
        "ELSE array() END AS grams",
    ).selectExpr(
        "doc_id",
        "CAST(n AS BIGINT) AS n_words",
        "round(1.0 - size(array_distinct(ws)) / CAST(n AS DOUBLE), 4) "
        "AS dup_word_frac",
        "CASE WHEN size(grams) > 0 THEN round(1.0 - "
        "size(array_distinct(grams)) / CAST(size(grams) AS DOUBLE), 4) "
        "ELSE CAST(0.0 AS DOUBLE) END AS dup_2gram_frac",
        "round(array_max(transform(array_distinct(ws), "
        "u -> size(filter(ws, x -> x = u)))) / CAST(n AS DOUBLE), 4) "
        "AS top_word_frac",
        "round(aggregate(ws, CAST(0 AS BIGINT), (a, x) -> a + length(x)) "
        "/ CAST(n AS DOUBLE), 4) AS mean_word_len",
    ).selectExpr(
        "doc_id", "n_words", "dup_word_frac", "dup_2gram_frac",
        "top_word_frac", "mean_word_len",
        # Gopher-flavored composite: enough words, bounded repetition,
        # plausible word lengths
        "(n_words >= 20 AND dup_2gram_frac <= 0.6 AND "
        "top_word_frac <= 0.2 AND mean_word_len >= 2.0 AND "
        "mean_word_len <= 10.0) AS keep",
    )


def repetition_oracle_sql(*, table: str = "documents") -> str:
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM {table}),
    g AS (
      SELECT doc_id, ws, len(ws) AS n,
        CASE WHEN len(ws) >= 2 THEN
          list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
        ELSE [] END AS grams
      FROM w)
    SELECT doc_id,
      CAST(n AS BIGINT) AS n_words,
      ROUND(1.0 - len(list_distinct(ws)) / CAST(n AS DOUBLE), 4)
        AS dup_word_frac,
      CASE WHEN len(grams) > 0 THEN ROUND(1.0 -
        len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 4)
      ELSE 0.0 END AS dup_2gram_frac,
      ROUND(list_max(list_transform(list_distinct(ws),
        u -> len(list_filter(ws, x -> x = u)))) / CAST(n AS DOUBLE), 4)
        AS top_word_frac,
      ROUND(list_sum(list_transform(ws, x -> len(x)))
        / CAST(n AS DOUBLE), 4) AS mean_word_len,
      (n >= 20
       AND (CASE WHEN len(grams) > 0 THEN ROUND(1.0 -
            len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 4)
            ELSE 0.0 END) <= 0.6
       AND ROUND(list_max(list_transform(list_distinct(ws),
           u -> len(list_filter(ws, x -> x = u)))) / CAST(n AS DOUBLE), 4)
           <= 0.2
       AND ROUND(list_sum(list_transform(ws, x -> len(x)))
           / CAST(n AS DOUBLE), 4) BETWEEN 2.0 AND 10.0) AS keep
    FROM g"""


def vocab_stats(docs: DataFrame, *, k: int = 20) -> DataFrame:
    """Corpus vocabulary statistics: the top-``k`` terms by document
    frequency with total term frequency — the Zipf-head profile a corpus
    audit starts from. Same no-token-stream-shuffle shape as
    :func:`tfidf_keywords`: per-doc (term, tf) rows from distinct-term
    column expressions feed ONE vocab-keyed aggregate.

    Output ``(term, df, tf_total, rank)`` ordered by (df DESC, term).

    Top-k shape: a bounded sort (``orderBy().limit(k)`` → Spark's
    ``TakeOrderedAndProject``, a per-partition partial top-k merged on
    the driver) instead of an unpartitioned ``row_number`` window, which
    would funnel the ENTIRE vocabulary aggregate through one task at
    corpus scale (round-3 ADVICE). Ranks are then assigned over just the
    k surviving rows.
    """
    from pyspark.sql import Window
    tf = docs.selectExpr(
        "doc_id", "split(text, ' ') AS ws",
    ).selectExpr(
        "doc_id",
        "explode(transform(array_distinct(ws), "
        "w -> struct(w AS term, size(filter(ws, x -> x = w)) AS tf))) "
        "AS t",
    ).selectExpr("t.term AS term", "t.tf AS tf").filter("term != ''")
    agg = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"))
    top = agg.orderBy(F.desc("df"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    return (top.withColumn("rank", F.row_number().over(w))
            .selectExpr("term", "df", "tf_total",
                        "CAST(rank AS BIGINT) AS rank"))


def vocab_oracle_sql(*, k: int = 20, table: str = "documents") -> str:
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM {table}),
    tf AS (
      SELECT t.term, t.tf
      FROM w, UNNEST(list_transform(list_distinct(ws),
        u -> struct_pack(term := u,
                         tf := len(list_filter(ws, x -> x = u))))) AS u(t)
      WHERE t.term != ''),
    agg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(tf) AS BIGINT) AS tf_total
            FROM tf GROUP BY term),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rnk
          FROM agg)
    SELECT term, df, tf_total, CAST(rnk AS BIGINT) AS rank
    FROM r WHERE rnk <= {k}"""


def tfidf_keywords(docs: DataFrame, *, k: int = 3) -> DataFrame:
    """Per-document top-``k`` keywords by tf·idf with the RATIONAL idf
    variant ``score = tf · N / df`` (no logarithm): libm ``log`` is not
    guaranteed identically rounded across engines, while tf, N and df
    are small integers whose product/quotient is exact in doubles — so
    the driver gate stays bit-exact by construction. Ranking by a
    monotone transform of log-idf ranking per fixed tf; the variant is
    documented, not hidden.

    Scale shape: term frequencies are computed per document with pure
    column expressions (distinct terms + counts — no token-stream
    groupBy); only the (doc_id, term, tf) rows — bounded by per-doc
    vocabulary, not text length — reach the df aggregate and the top-k
    window.

    Output ``(doc_id, term, tf, df, score_r, rank)``.
    """
    n_docs = docs.count()
    tf = docs.selectExpr(
        "doc_id",
        "split(text, ' ') AS ws",
    ).selectExpr(
        "doc_id",
        "explode(transform(array_distinct(ws), "
        "w -> struct(w AS term, size(filter(ws, x -> x = w)) AS tf))) "
        "AS t",
    ).selectExpr("doc_id", "t.term AS term", "t.tf AS tf") \
     .filter("term != ''")
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term"))
    return (tf.join(df, "term")
            .selectExpr(
                "doc_id", "term", "CAST(tf AS BIGINT) AS tf",
                "CAST(df AS BIGINT) AS df",
                f"CAST(tf AS DOUBLE) * {n_docs} / df AS score")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .selectExpr("doc_id", "term", "tf", "df",
                        "round(score, 4) AS score_r",
                        "CAST(rank AS BIGINT) AS rank"))


def tfidf_oracle_sql(*, k: int = 3, table: str = "documents") -> str:
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM {table}),
    tf AS (
      SELECT doc_id, t.term, t.tf
      FROM w, UNNEST(list_transform(list_distinct(ws),
        u -> struct_pack(term := u,
                         tf := len(list_filter(ws, x -> x = u))))) AS u(t)
      WHERE t.term != ''),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM {table}),
    s AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n) / df.df
               AS score
      FROM tf JOIN df USING (term)),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS rnk
          FROM s)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, ROUND(score, 4) AS score_r,
           CAST(rnk AS BIGINT) AS rank
    FROM r WHERE rnk <= {k}"""
