"""Eval-set decontamination: flag documents that share token n-grams
with a benchmark/eval text set.

The standard pre-training hygiene stage (the GPT-3 appendix-C /
PaLM-style 13-gram rule, parameterized here): a training document is
CONTAMINATED when any of its token n-grams also appears in a held-out
benchmark suite; contaminated documents are dropped or quarantined so
downstream eval numbers measure generalization, not memorization.

Semantics (mirrored bit-exactly by the DuckDB oracle):

* tokens  = the non-empty pieces of ``lower(text)`` split on a single
  space (the corpus-portable tokenization sketch.py's MinHash uses);
* n-grams = every run of ``n`` consecutive tokens, joined with spaces;
* output  = one row per contaminated document:
  ``(doc_id, n_hit_ngrams)`` where ``n_hit_ngrams`` counts DISTINCT
  eval n-grams the document contains. Clean documents emit no row
  (an anti-join against this result IS the decontaminated corpus).

Scale shape (100 TB): benchmark suites are tiny — a few MB of text,
at most a few million distinct n-grams — so the eval side is
``F.broadcast``; the document side is a narrow scan -> generator
explode -> broadcast hash join -> partial-agg groupBy on doc_id.
No shuffle ever carries raw n-gram strings: the only exchange is the
final (doc_id, gram-count) hash aggregation, and map-side partial
aggregation collapses it to one row per (doc, partition) first. The
n-gram explode is a Spark GENERATOR (never materialized per-row in
Python), stays inside whole-stage codegen, and prunes every column
but id + text at the parquet scan.

Reference parity note: ruby-rdf/rdf-rdfxml has no decontamination
surface; this implements the brief's training-data pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngram_expr(text_col: str, n: int) -> str:
    """SQL expression: ``lower(text)`` -> non-empty space tokens ->
    array of space-joined n-grams (empty array when fewer than ``n``
    tokens — Spark's ``sequence`` descends when stop < start, so the
    short-doc case MUST be guarded, not clamped)."""
    toks = f"filter(split(lower({text_col}), ' '), t -> t <> '')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE array() END"
    )


def eval_ngram_set(eval_texts: DataFrame, *, n: int = 8,
                   text_col: str = "text") -> DataFrame:
    """Distinct token n-grams of the eval/benchmark texts — the
    blocklist side. One column ``gram``; small enough to broadcast."""
    return (eval_texts
            .select(F.explode(F.expr(_ngram_expr(text_col, n)))
                    .alias("gram"))
            .distinct())


def decontaminate(docs: DataFrame, eval_texts: DataFrame, *, n: int = 8,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Contaminated documents: ``(doc_id, n_hit_ngrams)`` for every
    document sharing >= 1 token n-gram with ``eval_texts``.

    ``docs.join(result, id_col, "left_anti")`` is the clean corpus.
    """
    grams = (docs
             .select(F.col(id_col),
                     F.explode(F.expr(_ngram_expr(text_col, n)))
                     .alias("gram")))
    hits = grams.join(F.broadcast(eval_ngram_set(eval_texts, n=n,
                                                 text_col=text_col)),
                      "gram")
    return (hits.groupBy(id_col)
            .agg(F.countDistinct("gram").alias("n_hit_ngrams")))


def oracle_gram_list(n: int) -> str:
    """DuckDB list comprehension producing the n-grams of a ``toks``
    column — the oracle twin of :func:`_ngram_expr` (inclusive list
    slice ``toks[i:i+n-1]``). Shared by the standalone oracle and the
    composed corpus-assembly oracle."""
    return (f"[array_to_string(toks[i:i+{n - 1}], ' ') "
            f"for i in range(1, greatest(len(toks)-{n - 1}, 0)+1)]")


def decontaminate_oracle_sql(*, n: int = 8, eval_pred: str,
                             table: str = "documents") -> str:
    """DuckDB twin: same tokenization, same n-gram window (inclusive
    list slice ``toks[i:i+n-1]``), eval set selected by ``eval_pred``
    over the same table, COUNT(DISTINCT) -> BIGINT both dialects."""
    grams = oracle_gram_list(n)
    return f"""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                 t -> t <> '') AS toks
      FROM {table}),
    g AS (SELECT doc_id, unnest({grams}) AS gram FROM tok),
    eg AS (SELECT DISTINCT gram FROM g WHERE {eval_pred})
    SELECT doc_id, COUNT(DISTINCT gram) AS n_hit_ngrams
    FROM g JOIN eg USING (gram)
    GROUP BY doc_id"""
