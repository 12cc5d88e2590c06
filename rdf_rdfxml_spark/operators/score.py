"""Precision/recall scoring of produced vs golden triple sets (the north
rule's correctness metric; SURVEY.md §2.5 set ops).

Blank-node isomorphism is handled by canonical relabeling on *both* sides
(the reference compares via graph isomorphism, spec/suite_spec.rb:44-47;
our D1 ids are deterministic, golden sets use ``_:bN`` labels). At test
scale the relabeling runs per-document inside an Arrow-batched grouped-map
stage — per-document graphs are small, so the canonical form is cheap and
the scoring join is a plain set intersect on canonical triple strings.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.nt import canonicalize_bnodes


def _rows_to_terms(pdf: pd.DataFrame):
    triples = []
    for r in pdf.itertuples(index=False):
        s = (r.s_kind, r.s)
        if r.o_kind == "literal":
            o = ("literal", r.o, r.o_lang, r.o_dt)
        else:
            o = (r.o_kind, r.o)
        triples.append((s, r.p, o))
    return triples


def canonical_lines(triples_df: DataFrame,
                    group_col: str = "doc_sha") -> DataFrame:
    """(group, canonical NT line) — one row per triple after per-group
    canonical bnode relabeling."""

    def canon(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lines = canonicalize_bnodes(_rows_to_terms(pdf))
        return pd.DataFrame({group_col: [key[0]] * len(lines),
                             "line": list(lines)})

    return (triples_df
            .select(group_col, "s", "s_kind", "p", "o", "o_kind",
                    "o_lang", "o_dt")
            .groupBy(group_col)
            .applyInPandas(canon, schema=f"{group_col} string, line string"))


def pr_score(produced: DataFrame, golden: DataFrame,
             group_col: str = "doc_sha") -> DataFrame:
    """One-row DataFrame: n_produced, n_golden, n_matched, precision,
    recall — intersection on canonical per-group triple lines."""
    p = canonical_lines(produced, group_col).withColumn("src", F.lit(1))
    g = canonical_lines(golden, group_col)
    matched = p.join(g, [group_col, "line"], "inner").count()
    n_p = p.count()
    n_g = g.count()
    spark = produced.sparkSession
    precision = matched / n_p if n_p else 0.0
    recall = matched / n_g if n_g else 0.0
    return spark.createDataFrame(
        [(n_p, n_g, matched, precision, recall)],
        "n_produced long, n_golden long, n_matched long, "
        "precision double, recall double")
