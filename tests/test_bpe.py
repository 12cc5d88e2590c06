"""BPE merge learning (operators/bpe.py) — pinned against an
independent pure-Python reference implementation (Sennrich-style greedy
left-to-right merges, every-position pair counting, count DESC / left /
right tie-break)."""

from collections import Counter

import pytest

from rdf_rdfxml_spark.operators import bpe as B


def _ref_bpe(texts, m):
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) for w in wf}
    out = []
    for step in range(1, m + 1):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (l, r), c = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((step, l, r, c))
        for w, syms in words.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            words[w] = ns
    return out


def _run(spark, texts, m):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = [tuple(r) for r in
           B.bpe_train_merges(df, n_merges=m).orderBy("step").collect()]
    return got


def test_matches_reference_nmt_corpus(spark):
    texts = ["low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest"]
    assert _run(spark, texts, 8) == _ref_bpe(texts, 8)


def test_self_overlapping_runs_count_and_merge_greedily(spark):
    # "aaaa": pair (a,a) counts 3 per occurrence (every position), and
    # one merge pass yields [aa, aa] (greedy non-overlap), never [aa,a,a]
    texts = ["aaaa aaaa b"]
    got = _run(spark, texts, 2)
    assert got == _ref_bpe(texts, 2)
    assert got[0][1:3] == ("a", "a")
    assert got[1][1:3] == ("aa", "aa")


def test_tie_break_is_lexicographic(spark):
    # zz and yy both count 2 — 'y' < 'z' must win deterministically
    texts = ["zz zz yy yy"]
    got = _run(spark, texts, 1)
    assert got == _ref_bpe(texts, 1)
    assert got[0][1:3] == ("y", "y")


def test_multidoc_frequency_weighting(spark):
    texts = ["cat cat cat dog", "dog dog cat mouse mouse"]
    assert _run(spark, texts, 6) == _ref_bpe(texts, 6)


def test_vocab_matches_reference_encode(spark):
    texts = ["low low low lower newest newest widest cat cat", "aaaa cat"]
    m = 6
    # reference: replay merges on the word table, inventory final symbols
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) for w in wf}
    for _step, l, r, _c in _ref_bpe(texts, m):
        for w, syms in words.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            words[w] = ns
    exp = Counter()
    for w, syms in words.items():
        for s in syms:
            exp[s] += wf[w]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.token: r.freq for r in B.bpe_vocab(df, n_merges=m).collect()}
    assert got == dict(exp)


def test_token_counts_match_reference_encode(spark):
    texts = ["low low lower newest newest widest", "aaaa low cat", ""]
    m = 5
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) for w in wf}
    for _step, l, r, _c in _ref_bpe(texts, m):
        for w, syms in words.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            words[w] = ns
    exp = {d: sum(len(words[w]) for w in t.split(" ") if w)
           for d, t in enumerate(texts)}
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens
           for r in B.bpe_token_counts(df, n_merges=m).collect()}
    assert got == exp
    assert got[2] == 0  # empty doc present with zero tokens


def test_exhausted_corpus_raises(spark):
    # single 2-char word: one pair exists, second merge must fail loudly
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exhausted"):
        B.bpe_train_merges(df, n_merges=5)


def test_oracle_bound_guard_fires():
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        [(1, "x" * (B.ORACLE_WORD_BOUND + 1))], columns=["doc_id", "text"]))
    with pytest.raises(duckdb.Error, match="word bound"):
        con.sql(B.bpe_oracle_sql(n_merges=1)).fetchall()
