"""The north-rule correctness gate, stated explicitly: triple P/R vs the
golden sets over the full fixture corpus (manifest-style, FIXTURES.md §3),
computed by the distributed scoring job. Gate: P/R ≥ 0.95 (measured 1.0).
"""
import hashlib

from rdf_rdfxml_spark.operators.score import pr_score
from rdf_rdfxml_spark.plans.pipeline import construct_graph
from rdf_rdfxml_spark.sources.fixtures import corpus

INPUT_COLS = ("repo", "path", "commit", "lang", "content", "base_uri")


def _golden_rows(rows):
    out = []
    for r in rows:
        if r["negative"]:
            continue
        sha = hashlib.sha256(r["content"].encode()).hexdigest()
        for s, p, o in r["golden"]:
            out.append({
                "doc_sha": sha, "s": s[1], "s_kind": s[0], "p": p,
                "o": o[1], "o_kind": o[0],
                "o_lang": o[2] if o[0] == "literal" else None,
                "o_dt": o[3] if o[0] == "literal" else None,
            })
    return out


def test_pr_gate_full_corpus(spark):
    rows = corpus(instances_per_category=3)
    docs = spark.createDataFrame([{k: r[k] for k in INPUT_COLS}
                                  for r in rows])
    g = construct_graph(docs, strict=True)
    golden = spark.createDataFrame(_golden_rows(rows))
    score = pr_score(g.triples, golden).first()
    assert score["n_golden"] > 100
    assert score["precision"] >= 0.95   # north-rule gate
    assert score["recall"] >= 0.95
    # and in fact exact parity on the fixture corpus
    assert score["precision"] == 1.0 and score["recall"] == 1.0

    # negative manifest entries: rejected into the error channel, zero
    # triples (W3C TestXMLNegativeSyntax semantics)
    neg_shas = {hashlib.sha256(r["content"].encode()).hexdigest()
                for r in rows if r["negative"]}
    err_shas = {r["doc_sha"] for r in g.errors.collect()}
    triple_shas = {r["doc_sha"] for r in
                   g.triples.select("doc_sha").distinct().collect()}
    assert neg_shas <= err_shas
    assert not (neg_shas & triple_shas)
