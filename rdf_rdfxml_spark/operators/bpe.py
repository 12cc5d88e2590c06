"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

``vocab_stats`` measures a corpus' existing token distribution; training a
tokenizer needs the other direction — LEARN the merge table from the
corpus. This is the classic subword BPE of Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units" (ACL 2016,
arXiv:1508.07909): start from characters, repeatedly count adjacent
symbol pairs across the corpus and merge the most frequent pair,
``n_merges`` times. The learned ``(step, left, right, pair_count)``
table IS the tokenizer.

Spark-first shape — the key scale property of BPE training is that after
ONE corpus-scale pass (word frequencies), every iteration runs on the
*word-frequency table* (vocabulary-sized, millions of rows at 100 TB —
not corpus-sized):

* word freqs: ``split`` + hash-aggregate with map-side partial agg — the
  only stage that ever touches the full corpus;
* per iteration, all JVM-side column ops on the cached vocab table:
  adjacent pairs via ``transform`` over symbol arrays (no UDF), weighted
  hash-agg on (left, right), and a global top-1 — ``orderBy().limit(1)``
  is a per-partition top-1 + single-row final, not a full sort;
* only the winning pair (ONE row) ever reaches the driver per iteration
  — model-sized driver state, like the pagerank loop (graph.py);
* merge application is a per-row ``aggregate`` fold over the symbol
  array (greedy left-to-right, the reference semantics). A symbol
  created by this pass can never re-match within the pass: the fold
  compares ``last(acc) == left``, and the just-merged symbol
  ``left||right`` is strictly longer than ``left`` — so the fold equals
  the simultaneous scan of the iteration-start sequence.
* each level is persisted and the previous level freed — the lineage
  stays one level deep instead of M HOF layers re-evaluated per action.

Simplifications vs the paper, stated loudly: no end-of-word marker
symbol (merges are word-internal either way; the marker only
disambiguates suffixes) and case-sensitive verbatim words. Ties on the
pair count break (count DESC, left ASC, right ASC) — deterministic and
binary-collation-identical in both engines.

The DuckDB oracle replays every level relationally in generated SQL:
pair counting per position, the same top-1 ordering, and greedy
non-overlapping merge via gaps-and-islands (consecutive candidate
positions — only possible when left == right — keep alternating
occurrences, exactly the fold's behavior). A constant
``ORACLE_WORD_BOUND`` replaces the lateral series bound (DuckDB cannot
take column args there) with a loud ``error()`` guard, the
sketch.length_guard_cte pattern. Level CTEs are ``AS MATERIALIZED``:
each lvl{k} is referenced three times (pair count, candidate scan, next
level), and inlining recomputes it 3^k times — measured 100×+ on an
8-level chain; materialization makes the chain linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Oracle-side cap on word length (symbols per word at level 0). The
#: Spark operator is unbounded; the oracle errors loudly if exceeded.
ORACLE_WORD_BOUND = 64


def word_freqs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (word, freq): the single corpus-scale pass."""
    return (docs
            .select(F.explode(F.split(F.col("text"), " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _chars_col():
    return F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")


def _pairs(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word frequency (every position
    counts, including self-overlapping runs — the reference counting)."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s AS lft, syms[i + 1] AS rgt))")
    return (words
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p.lft", "p.rgt")
            .agg(F.sum("freq").alias("pair_count")))


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) in every symbol array
    — a JVM-side fold, no UDF."""
    l, r = F.lit(left), F.lit(right)
    merged = F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.concat(F.element_at(acc, -1), x)))
        ).otherwise(F.concat(acc, F.array(x))))
    return words.select("word", "freq", merged.alias("syms"))


def _train_chain(docs: DataFrame, n_merges: int, finish=None):
    """The ONE training loop all three public operators share: word
    freqs → ``n_merges`` iterations of (pair count → global top-1 →
    merge application). Returns ``(finish(final_words), merges)`` where
    ``merges`` is the learned ``[(step, left, right, count), ...]``;
    ``finish`` (if given) must materialize its result EAGERLY
    (localCheckpoint/collect) because every persisted handle — including
    the final level — is freed before returning, also on the
    exhaustion-error path."""
    words = (word_freqs(docs)
             .select("word", "freq", _chars_col().alias("syms")))
    handles = [words.persist()]
    merges = []
    try:
        for step in range(1, n_merges + 1):
            top = (_pairs(words)
                   .orderBy(F.desc("pair_count"), F.asc("lft"),
                            F.asc("rgt"))
                   .limit(1).collect())
            if not top:
                raise ValueError(
                    f"corpus exhausted at merge {step}: "
                    f"< {n_merges} pairs")
            lft, rgt = top[0]["lft"], top[0]["rgt"]
            merges.append((step, lft, rgt, int(top[0]["pair_count"])))
            words = _apply_merge(words, lft, rgt).persist()
            handles.append(words)
            if len(handles) > 2:
                handles.pop(0).unpersist()
        return (finish(words) if finish is not None else None), merges
    finally:
        for h in handles:
            h.unpersist()


def bpe_vocab(docs: DataFrame, *, n_merges: int = 10) -> DataFrame:
    """Corpus subword vocabulary AFTER applying the learned merges:
    train ``n_merges`` BPE merges, then inventory the final symbol
    streams — ``(token, freq)`` with freq = total corpus occurrences.
    The encode-side consequence of :func:`bpe_train_merges` (what the
    tokenizer's unigram distribution looks like); all three public
    operators run the single shared :func:`_train_chain` loop, so they
    cannot drift."""

    def finish(words):
        return (words.select(F.explode("syms").alias("token"), "freq")
                .groupBy("token").agg(F.sum("freq").alias("freq"))
                .localCheckpoint())

    out, _merges = _train_chain(docs, n_merges, finish)
    return out


def bpe_vocab_oracle_sql(*, n_merges: int = 10,
                         table: str = "documents") -> str:
    body = "".join(_level_sql(k) for k in range(n_merges))
    return f"""{_chain_head_sql(table)}{body}
    SELECT sym AS token, CAST(SUM(freq) AS BIGINT) AS freq
    FROM (SELECT UNNEST(syms) AS sym, freq FROM lvl{n_merges})
    GROUP BY sym"""


def bpe_token_counts(docs: DataFrame, *, n_merges: int = 10) -> DataFrame:
    """Per-document BPE token counts — the encode step a dataloader
    budget actually uses: train ``n_merges`` merges (the shared
    :func:`_train_chain` loop), then count each document's tokens under
    the learned segmentation. Because training runs on this same
    corpus, encoding is a LOOKUP into the final word-symbol table
    (every corpus word is in the vocab by construction): explode doc
    words, join the model-sized word table (broadcast-able), sum symbol
    counts. Returns ``(doc_id, n_bpe_tokens)`` for every document (0
    for empty/whitespace docs). Whitespace ``token_count`` is what the
    packing ops budget with; this is the tokenizer-true budget."""

    def finish(words):
        lens = words.select("word", F.size("syms").cast("long").alias("n"))
        doc_words = (docs
                     .select("doc_id",
                             F.explode(F.split(F.col("text"), " "))
                             .alias("word"))
                     .filter(F.col("word") != ""))
        return (docs.select("doc_id")
                .join(doc_words.join(lens, "word")
                      .groupBy("doc_id")
                      .agg(F.sum("n").alias("n_bpe_tokens")),
                      "doc_id", "left")
                .fillna(0, ["n_bpe_tokens"])
                .localCheckpoint())

    out, _merges = _train_chain(docs, n_merges, finish)
    return out


def bpe_token_counts_oracle_sql(*, n_merges: int = 10,
                                table: str = "documents") -> str:
    body = "".join(_level_sql(k) for k in range(n_merges))
    return f"""{_chain_head_sql(table)}{body},
    wlen AS (SELECT word, CAST(len(syms) AS BIGINT) AS n
             FROM lvl{n_merges}),
    dw AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
      FROM {table}),
    per AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bpe_tokens
      FROM dw JOIN wlen USING (word)
      WHERE word != '' GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
    FROM {table} d LEFT JOIN per p USING (doc_id)"""


def bpe_train_merges(docs: DataFrame, *, n_merges: int = 10) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus (the shared
    :func:`_train_chain` loop). Returns a DataFrame ``(step, left,
    right, pair_count)`` (step 1-based, in merge order) — the merge
    table a tokenizer applies at encode time.

    Raises if the corpus runs out of pairs before ``n_merges`` (the
    oracle twin then mismatches on row count — loud either way)."""
    _none, merges = _train_chain(docs, n_merges)
    return docs.sparkSession.createDataFrame(
        merges, "step long, left string, right string, pair_count long")


# --------------------------------------------------------------------------
# DuckDB oracle twin (generated SQL, one CTE block per merge level)
# --------------------------------------------------------------------------

def _level_sql(k: int) -> str:
    """CTEs advancing lvl{k} → top{k} (the winning pair) → lvl{k+1}."""
    return f""",
    pairs{k} AS (
      SELECT syms[CAST(i AS INTEGER)] AS lft,
             syms[CAST(i AS INTEGER) + 1] AS rgt,
             CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM lvl{k}, _wordguard, generate_series(1, {ORACLE_WORD_BOUND}) g(i)
      WHERE _wordguard.ok = 1 AND i <= len(syms) - 1
      GROUP BY 1, 2),
    top{k} AS (
      SELECT {k + 1} AS step, lft, rgt, pair_count FROM pairs{k}
      ORDER BY pair_count DESC, lft, rgt LIMIT 1),
    cand{k} AS (
      SELECT l.word, l.freq, l.syms, CAST(i AS BIGINT) AS p
      FROM lvl{k} l, generate_series(1, {ORACLE_WORD_BOUND}) g(i), top{k} t
      WHERE i <= len(l.syms) - 1
        AND l.syms[CAST(i AS INTEGER)] = t.lft
        AND l.syms[CAST(i AS INTEGER) + 1] = t.rgt),
    runs{k} AS (
      SELECT word, p,
             p - ROW_NUMBER() OVER (PARTITION BY word ORDER BY p) AS run
      FROM cand{k}),
    keep{k} AS MATERIALIZED (
      SELECT word, p FROM (
        SELECT word, p,
               MIN(p) OVER (PARTITION BY word, run) AS run_start
        FROM runs{k})
      WHERE (p - run_start) % 2 = 0),
    lvl{k + 1} AS MATERIALIZED (
      SELECT l.word, l.freq,
             list(CASE WHEN kq.p IS NOT NULL
                       THEN l.syms[CAST(q AS INTEGER)] ||
                            l.syms[CAST(q AS INTEGER) + 1]
                       ELSE l.syms[CAST(q AS INTEGER)] END
                  ORDER BY q) AS syms
      FROM lvl{k} l
      CROSS JOIN generate_series(1, {ORACLE_WORD_BOUND}) g(q)
      LEFT JOIN keep{k} kq ON kq.word = l.word AND kq.p = q
      LEFT JOIN keep{k} kp ON kp.word = l.word AND kp.p = q - 1
      WHERE q <= len(l.syms) AND kp.p IS NULL
      GROUP BY l.word, l.freq)"""


def _chain_head_sql(table: str) -> str:
    return f"""WITH w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM {table})
      WHERE word != '' GROUP BY word),
    _wordguard AS (
      SELECT CASE WHEN MAX(len(word)) > {ORACLE_WORD_BOUND}
             THEN error('oracle word bound {ORACLE_WORD_BOUND} exceeded')
             ELSE 1 END AS ok FROM w0),
    lvl0 AS MATERIALIZED (
      SELECT word, freq,
             (SELECT list(substring(w.word, CAST(i AS INTEGER), 1)
                          ORDER BY i)
              FROM generate_series(1, {ORACLE_WORD_BOUND}) g(i)
              WHERE i <= len(w.word)) AS syms
      FROM w0 w)"""


def bpe_oracle_sql(*, n_merges: int = 10, table: str = "documents") -> str:
    body = "".join(_level_sql(k) for k in range(n_merges))
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST(step AS BIGINT) AS step, lft AS left, rgt AS right, "
        f"pair_count FROM top{k}" for k in range(n_merges))
    return f"""{_chain_head_sql(table)}{body}
    {unions}"""
