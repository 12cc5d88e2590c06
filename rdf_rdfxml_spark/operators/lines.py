"""Corpus-frequency LINE-level boilerplate detection and removal.

The span family (operators/spans.py) finds verbatim-duplicated
character ranges via winnowing fingerprints; real web pipelines
(CCNet, Wenzek et al., LREC'20 §4.1; RefinedWeb; Dolma) additionally
dedup at the natural LINE granularity: navigation menus, cookie
banners, "Powered by" footers and copyright lines repeat verbatim
across thousands of pages, and the standard cure is to drop every
line whose corpus document-frequency reaches a threshold while
keeping each document's unique remainder in order.

Spark-first shape (all JVM-side column ops — no UDF anywhere):

1.  ``posexplode(split(text, '\\n'))`` → one ``(doc_id, pos, line)``
    row per line; narrow, no shuffle.
2.  Document frequency per line body: ``(line, doc_id)`` DISTINCT
    (map-side partial aggregation collapses within-doc repeats — a
    page repeating its own nav bar contributes once) then a
    ``count`` per line. Both stages partial-aggregate, so a
    corpus-wide boilerplate line ("Powered by …" on every page — the
    hot key by construction) arrives at its reducer as one row per
    map task, never as raw row traffic. Blank lines (``trim`` empty)
    are never counted and never removed: structure is kept, only
    content lines are dedup candidates.
3.  The blocklist — lines with ``df >= min_df`` — is bounded by
    ``total_lines / min_df`` rows and is tiny in practice; Catalyst
    broadcasts the LEFT ANTI probe against it (AQE falls back to a
    shuffle anti-join past the broadcast threshold, still linear).
    Each input line matches the blocklist SET at most once — a
    set-membership probe, so per the CLAUDE.md span-dedup rule it
    needs NO mega-bucket cap: full-corpus duplication cannot create
    a pair explosion here.
4.  Reassembly is per-document: ``array_sort(collect_list(struct(pos,
    line)))`` + ``array_join`` — PARTITION-BY-doc_id state bounded by
    one document's size, never corpus-wide.

Determinism: pure string equality end-to-end, no hashing at all —
the DuckDB oracles replay the same split / count / anti-join /
ordered ``string_agg`` bit-identically (counts are BIGINT both
sides). Trailing empty lines survive ``split`` in BOTH engines
(Spark ``split(str, re, -1)``; DuckDB ``string_split``) — pinned by
tests/test_lines.py.

Reference parity note: ruby-rdf/rdf-rdfxml has no curation surface;
this exists for the brief's training-data pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default document-frequency threshold: a line present in this many
#: distinct documents is boilerplate. CCNet-family pipelines use low
#: two-digit thresholds at web scale.
LINE_MIN_DF = 10

#: Loud oracle bound on lines per document (the generate_series
#: constant — DuckDB's table-function form cannot take a lateral
#: column bound, the documented dialect seam).
ORACLE_LINE_BOUND = 100_000


def _lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) → (doc_id, pos, line), 0-based line positions.
    ``limit=-1`` keeps trailing empty strings so reassembly is exact."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n", -1))
        .alias("pos", "line"))


def boilerplate_lines(docs: DataFrame, *, min_df: int = LINE_MIN_DF,
                      text_col: str = "text") -> DataFrame:
    """The corpus-wide boilerplate blocklist: ``(line, df)`` for every
    non-blank line body appearing in >= ``min_df`` distinct documents
    (``df`` = distinct-document frequency, BIGINT)."""
    lines = _lines(docs, text_col)
    return (lines
            .filter(F.trim(F.col("line")) != "")
            .select("line", "doc_id").distinct()
            .groupBy("line").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= min_df))


def line_dedup(docs: DataFrame, *, min_df: int = LINE_MIN_DF,
               text_col: str = "text") -> DataFrame:
    """Remove every boilerplate line (df >= ``min_df``) from every
    document, keeping remaining lines in order: ``(doc_id, n_removed,
    clean_chars, clean_text)`` for EVERY input document. Blank lines
    are always kept; a document consisting entirely of boilerplate
    cleans to the empty string."""
    lines = _lines(docs, text_col)
    block = boilerplate_lines(docs, min_df=min_df,
                              text_col=text_col).select("line")
    kept = lines.join(block, "line", "left_anti")
    per = (kept.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "line"))),
                        lambda x: x["line"]), "\n").alias("clean_text")))
    base = docs.select(
        "doc_id",
        F.size(F.split(F.col(text_col), "\n", -1)).cast("long")
        .alias("n_lines"))
    return (base.join(per, "doc_id", "left")
            .select("doc_id",
                    (F.col("n_lines") - F.coalesce(F.col("n_kept"),
                                                   F.lit(0)))
                    .cast("long").alias("n_removed"),
                    F.length(F.coalesce(F.col("clean_text"), F.lit("")))
                    .cast("long").alias("clean_chars"),
                    F.coalesce(F.col("clean_text"), F.lit(""))
                    .alias("clean_text")))


# --------------------------------------------------------------------------
# DuckDB oracle twins
# --------------------------------------------------------------------------

def _lines_cte(*, table: str, pfx: str = "") -> str:
    """CTE chain ending in ``{pfx}l(doc_id, pos, line)`` with the loud
    per-document line-count guard (ORACLE_LINE_BOUND). ``pfx`` keeps
    names collision-free when spliced into composed pipeline oracles."""
    return f"""{pfx}guard AS (
      SELECT CASE WHEN MAX(len(string_split(text, chr(10))))
                    > {ORACLE_LINE_BOUND}
             THEN error('oracle line bound {ORACLE_LINE_BOUND} '
                        'exceeded in {table}')
             ELSE 1 END AS ok FROM {table}),
    {pfx}l AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             list_extract(string_split(text, chr(10)),
                          CAST(i AS INTEGER)) AS line
      FROM {table}, {pfx}guard,
           generate_series(1, {ORACLE_LINE_BOUND}) s(i)
      WHERE {pfx}guard.ok = 1
        AND i <= len(string_split(text, chr(10))))"""


def line_dedup_ctes(*, min_df: int = LINE_MIN_DF,
                    table: str = "documents",
                    out: str = "line_cleaned") -> str:
    """The full line-dedup pipeline as a spliceable CTE chain ending in
    ``{out}(doc_id, n_removed, text)`` — used by
    :func:`line_dedup_oracle_sql` and composed into larger pipeline
    oracles (the spans.py ``dup_span_removal_ctes`` pattern). Internal
    names carry the ``ld_`` prefix to stay collision-free."""
    return f"""{_lines_cte(table=table, pfx="ld_")},
    ld_block AS (
      SELECT line FROM ld_l WHERE trim(line) <> ''
      GROUP BY line HAVING COUNT(DISTINCT doc_id) >= {min_df}),
    ld_kept AS (
      SELECT l.doc_id, l.pos, l.line
      FROM ld_l l ANTI JOIN ld_block USING (line)),
    ld_per AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS ctext
      FROM ld_kept GROUP BY doc_id),
    {out} AS (
      SELECT d.doc_id,
             CAST(len(string_split(d.text, chr(10)))
                  - COALESCE(p.n_kept, 0) AS BIGINT) AS n_removed,
             COALESCE(p.ctext, '') AS text
      FROM {table} d LEFT JOIN ld_per p USING (doc_id))"""


def boilerplate_lines_oracle_sql(*, min_df: int = LINE_MIN_DF,
                                 table: str = "documents",
                                 prefix_cte: str = "") -> str:
    """DuckDB twin of :func:`boilerplate_lines`. ``prefix_cte`` lets a
    caller splice a corpus-construction CTE in front (e.g. the lined
    synthetic corpus the entry queries build from ``documents``)."""
    return f"""WITH {prefix_cte}{_lines_cte(table=table)}
    SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM l WHERE trim(line) <> ''
    GROUP BY line HAVING COUNT(DISTINCT doc_id) >= {min_df}"""


def line_dedup_oracle_sql(*, min_df: int = LINE_MIN_DF,
                          table: str = "documents",
                          prefix_cte: str = "") -> str:
    """DuckDB twin of :func:`line_dedup` — same blocklist, ANTI JOIN,
    ordered ``string_agg`` reassembly."""
    return f"""WITH {prefix_cte}{line_dedup_ctes(min_df=min_df,
                                                 table=table,
                                                 out="line_cleaned")}
    SELECT doc_id, n_removed,
           CAST(len(text) AS BIGINT) AS clean_chars,
           text AS clean_text
    FROM line_cleaned"""
