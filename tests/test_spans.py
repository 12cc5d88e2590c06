"""Duplicated-span detection/removal (operators/spans.py).

Pins the winnowing-anchor guarantee (every cross-doc shared substring of
length >= k + window - 1 is covered by a span in BOTH docs, up to the
documented < k + window edge trim), the no-false-positive direction on a
disjoint corpus, the removal reconstruction, and hostile edges (None,
short docs, fully-duplicated docs)."""

import hashlib

import pytest

from rdf_rdfxml_spark.operators import spans as SP

K, W = SP.SPAN_K, SP.SPAN_WINDOW
EDGE = K + W  # max chars a span may be trimmed at each edge


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(tag, n):
    # deterministic high-entropy filler with no 16-char substring shared
    # across different tags (hex of tagged sha256 blocks)
    out = []
    i = 0
    while sum(len(x) for x in out) < n:
        out.append(hashlib.sha256(f"{tag}:{i}".encode()).hexdigest())
        i += 1
    return "".join(out)[:n]


def test_shared_block_covered_in_both_docs(spark):
    block = _uniq("shared", 120)
    a = _uniq("a", 80) + block + _uniq("a2", 80)
    b = _uniq("b", 95) + block + _uniq("b2", 60)
    df = _df(spark, [(1, a), (2, b)])
    spans = {d: [] for d in (1, 2)}
    for r in SP.dup_spans(df).collect():
        spans[r.doc_id].append((r.span_start, r.span_end))
    for doc_id, text, off in ((1, a, 80), (2, b, 95)):
        got = spans[doc_id]
        assert len(got) == 1, got
        s, e = got[0]
        # span lies inside the shared block and covers all but < EDGE
        # chars at each end
        assert off <= s < off + EDGE
        assert off + 120 - EDGE < e <= off + 120 - 1
        # and the flagged text really is identical across the two docs
        assert text[s:e + 1] in block


def test_disjoint_corpus_has_no_spans(spark):
    df = _df(spark, [(i, _uniq(f"doc{i}", 300)) for i in range(6)])
    assert SP.dup_spans(df).count() == 0
    stats = {r.doc_id: r for r in SP.dup_span_stats(df).collect()}
    assert len(stats) == 6
    assert all(r.n_spans == 0 and r.dup_chars == 0 for r in stats.values())
    clean = {r.doc_id: r.clean_text for r in SP.dup_span_removal(df).collect()}
    for i in range(6):
        assert clean[i] == _uniq(f"doc{i}", 300)


def test_removal_reconstruction_matches_spans(spark):
    block = _uniq("blk", 90)
    rows = [(1, _uniq("x", 50) + block + _uniq("y", 50)),
            (2, block + _uniq("z", 70)),
            (3, _uniq("w", 40))]
    df = _df(spark, rows)
    spans = {}
    for r in SP.dup_spans(df).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    clean = {r.doc_id: r.clean_text for r in SP.dup_span_removal(df).collect()}
    for doc_id, text in rows:
        kept, prev = [], 0
        for s, e in sorted(spans.get(doc_id, [])):
            kept.append(text[prev:s])
            prev = e + 1
        kept.append(text[prev:])
        assert clean[doc_id] == "".join(kept)


def test_identical_docs_mostly_removed(spark):
    t = _uniq("same", 400)
    df = _df(spark, [(1, t), (2, t)])
    stats = {r.doc_id: r for r in SP.dup_span_stats(df).collect()}
    for r in stats.values():
        assert r.n_spans == 1
        assert r.dup_chars >= 400 - 2 * EDGE
    clean = {r.doc_id: r.clean_text for r in SP.dup_span_removal(df).collect()}
    # edge trim leaves < EDGE chars per side; the removed middle is gone
    for c in clean.values():
        assert len(c) <= 2 * EDGE
        assert t[EDGE:-EDGE] not in c


def test_hostile_edges_do_not_raise(spark):
    df = _df(spark, [(1, None), (2, ""), (3, "tiny"),
                     (4, _uniq("ok", K + W - 1))])
    assert SP.dup_spans(df).count() == 0
    # stats cover every non-null-text doc via the left join
    stats = {r.doc_id: r for r in SP.dup_span_stats(df).collect()}
    assert stats[2].n_chars == 0 and stats[3].n_spans == 0
    clean = {r.doc_id: r.clean_text for r in SP.dup_span_removal(df).collect()}
    assert clean[3] == "tiny"


def test_self_dup_keeps_first_occurrence(spark):
    block = _uniq("rep", 100)
    # block appears twice inside doc 1, once in doc 2 (no intra repeat)
    t1 = _uniq("p", 60) + block + _uniq("q", 60) + block + _uniq("r", 40)
    t2 = _uniq("s", 50) + block + _uniq("t", 50)
    df = _df(spark, [(1, t1), (2, t2)])
    spans = {}
    for r in SP.self_dup_spans(df).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert 2 not in spans  # no intra-doc repetition in doc 2
    got = spans[1]
    assert len(got) == 1
    s, e = got[0]
    second = 60 + 100 + 60  # start of the second occurrence
    # only the SECOND occurrence is flagged, within edge-trim bounds
    assert second <= s < second + EDGE
    assert second + 100 - EDGE < e <= second + 100 - 1
    stats = {r.doc_id: r for r in SP.self_dup_span_stats(df).collect()}
    assert stats[1].n_spans == 1 and stats[1].rep_chars == e - s + 1
    assert stats[2].n_spans == 0 and stats[2].rep_chars == 0


def test_min_docs_threshold(spark):
    block = _uniq("tri", 100)
    df = _df(spark, [(i, _uniq(f"pre{i}", 60) + block) for i in range(3)])
    assert SP.dup_spans(df, min_docs=2).count() == 3
    assert SP.dup_spans(df, min_docs=3).count() == 3
    assert SP.dup_spans(df, min_docs=4).count() == 0


def test_bigram_lm_scores_vs_reference(spark):
    """operators/lm.py pinned against a pure-Python add-one bigram LM
    (integer ppm arithmetic replicated exactly)."""
    from collections import Counter

    from rdf_rdfxml_spark.operators.lm import PPM, bigram_lm_scores
    texts = ["the cat sat on the mat",
             "the cat ate the cat food",
             "completely different words here",
             "the", ""]  # <2 tokens → 0
    toks = [t.split() for t in texts]
    c12 = Counter(p for tk in toks for p in zip(tk, tk[1:]))
    c1 = Counter(w for tk in toks for w in tk)
    v = len(c1)
    exp = {}
    for d, tk in enumerate(toks):
        bgs = list(zip(tk, tk[1:]))
        if not bgs:
            exp[d] = (0, 0)
            continue
        ppms = [((c12[bg] + 1) * PPM) // (c1[bg[0]] + v) for bg in bgs]
        exp[d] = (len(bgs), sum(ppms) // len(bgs))
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.mean_bigram_ppm)
           for r in bigram_lm_scores(df).collect()}
    assert got == exp
    # repeated phrasing scores above out-of-distribution text
    assert got[0][1] > got[2][1]
