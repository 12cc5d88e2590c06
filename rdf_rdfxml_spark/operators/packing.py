"""Token-chunk packing: map every document to its global token-offset
span under concatenate-and-chunk training semantics.

Pre-training consumes a corpus as ONE token stream: documents are
concatenated in a fixed order and the stream is cut into fixed-length
context windows ("chunks") of ``context_len`` tokens; a document may
straddle a chunk boundary. This operator computes, per document:

    start_offset  -- global token offset where the document begins
    n_tokens      -- its token count (non-empty space-split pieces)
    first_chunk   -- start_offset DIV context_len
    last_chunk    -- (start_offset + n_tokens - 1) DIV context_len
                     (empty docs: first_chunk)
    n_chunks      -- last_chunk - first_chunk + 1

which is exactly the index a dataloader needs to answer "which
documents feed chunk k" (range-join chunks against [first, last]).

Scale shape (100 TB): the naive formulation is a global window
cumsum — a SINGLE-PARTITION sort at any real size. This implements
the classic two-level prefix scan instead:

  1. bucket   = doc_id DIV bucket_size  (monotone in doc_id, so
     bucket order == document order; no shuffle to assign);
  2. per-bucket token sums  -> a TINY table (n_docs / bucket_size
     rows); the only global window runs over it — thousands of rows
     on one task, never the corpus;
  3. bucket offsets broadcast-join back; within-bucket cumsum is a
     window PARTITIONED BY bucket (parallel, bounded partitions).

Every exchange is by ``bucket`` (bounded, uniform by construction);
the corpus-wide rows are never globally sorted on one executor.
Prefix sums are inherently two-pass: the level-1 aggregate re-derives
token counts from a second pruned (id, text) scan. Callers packing
the same corpus repeatedly should persist the token-count projection
(``docs.select(id, n_tokens)`` is ~24 bytes/doc) to trade that scan
for cache space — at one-shot usage the rescan is the cheaper side.
Deterministic: pure function of (doc_id, text) — no RNG, no
timestamps — so retries and resumes reproduce identical chunk ids
(CLAUDE.md's determinism invariant).

Reference parity note: ruby-rdf/rdf-rdfxml has no packing surface;
this implements the brief's training-data pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_chunks(docs: DataFrame, *, context_len: int = 512,
                      bucket_size: int = 64,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-document global token spans under concatenate-and-chunk
    semantics (module docstring). Order = ascending ``id_col``."""
    assert context_len > 0 and bucket_size > 0
    tok = docs.select(
        F.col(id_col),
        F.expr(f"CAST(size(filter(split({text_col}, ' '), "
               f"t -> t <> '')) AS BIGINT)").alias("n_tokens"),
        F.expr(f"{id_col} DIV {bucket_size}").alias("_bkt"),
    )
    # level 1: one row per bucket -- the only global window runs here,
    # over n_docs/bucket_size rows, not the corpus.
    bucket_tot = tok.groupBy("_bkt").agg(
        F.sum("n_tokens").alias("_bkt_tokens"))
    w_glob = (Window.orderBy("_bkt")
              .rowsBetween(Window.unboundedPreceding, -1))
    bucket_off = bucket_tot.select(
        "_bkt",
        F.coalesce(F.sum("_bkt_tokens").over(w_glob),
                   F.lit(0)).alias("_bkt_off"))
    # level 2: parallel within-bucket cumsum + broadcast offsets back.
    w_local = (Window.partitionBy("_bkt").orderBy(id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    packed = (tok
              .withColumn("_local_off",
                          F.coalesce(F.sum("n_tokens").over(w_local),
                                     F.lit(0)))
              .join(F.broadcast(bucket_off), "_bkt")
              .withColumn("start_offset",
                          F.col("_bkt_off") + F.col("_local_off")))
    return packed.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {context_len}").alias("first_chunk"),
        F.expr(
            f"CASE WHEN n_tokens > 0 THEN "
            f"(start_offset + n_tokens - 1) DIV {context_len} "
            f"ELSE start_offset DIV {context_len} END"
        ).alias("last_chunk"),
    ).withColumn("n_chunks",
                 F.col("last_chunk") - F.col("first_chunk") + F.lit(1))


def chunk_manifest(docs: DataFrame, *, context_len: int = 512,
                   bucket_size: int = 64,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Invert :func:`pack_token_chunks` to the dataloader's question:
    for every context window ("chunk") of the concatenated token
    stream, which documents feed it and with how many tokens.

    One row per chunk: ``(chunk_id, n_docs, chunk_tokens, min_doc_id,
    max_doc_id)``. Every chunk except possibly the last has
    ``chunk_tokens == context_len`` by construction — the test-suite
    invariant. Empty documents feed no chunk.

    Scale shape: the per-document explode emits ``n_chunks`` rows,
    so the total fan-out is ``total_tokens / context_len + n_docs``
    — linear in the corpus, never quadratic — and the chunk_id
    groupBy is a partial-agg hash aggregation whose per-key width is
    bounded by ``context_len + 1`` feeding documents (a chunk can't
    hold more docs than tokens). No skew possible by construction.
    """
    spans = pack_token_chunks(docs, context_len=context_len,
                              bucket_size=bucket_size, id_col=id_col,
                              text_col=text_col)
    ln = F.lit(context_len).cast("bigint")
    fed = (spans.filter(F.col("n_tokens") > 0)
           .select(F.col(id_col), "n_tokens", "start_offset",
                   F.explode(F.expr("sequence(first_chunk, last_chunk)"))
                   .alias("chunk_id")))
    tokens_in = (
        F.least(F.col("start_offset") + F.col("n_tokens"),
                (F.col("chunk_id") + 1) * ln)
        - F.greatest(F.col("start_offset"), F.col("chunk_id") * ln))
    return (fed.withColumn("_tok_in", tokens_in)
            .groupBy("chunk_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_tok_in").alias("chunk_tokens"),
                 F.min(id_col).alias("min_doc_id"),
                 F.max(id_col).alias("max_doc_id")))


# Any single document spanning more than this many chunks trips the
# oracle's loud guard (constant generate_series bound — DuckDB takes
# no lateral column args). 64 chunks × context_len 512 = 32k tokens.
ORACLE_SPAN_BOUND = 64


def manifest_oracle_sql(*, context_len: int = 512,
                        table: str = "documents",
                        span_bound: int = ORACLE_SPAN_BOUND) -> str:
    """DuckDB twin of :func:`chunk_manifest`: the pack cumsum CTE, a
    constant 0..span_bound-1 series standing in for the per-doc chunk
    explode (guard CTE errors loudly if any document spans more), and
    the same least/greatest overlap arithmetic. COUNT/SUM cast to
    BIGINT (DuckDB SUM(BIGINT) widens to HUGEINT)."""
    ln = context_len
    return f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM {table}),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS start_offset
      FROM tok),
    _spanguard AS (
      SELECT CASE WHEN MAX((n_tokens - 1) // {ln}) + 1 > {span_bound}
             THEN error('oracle span bound {span_bound} exceeded')
             ELSE 1 END AS ok
      FROM tok WHERE n_tokens > 0),
    fed AS (
      SELECT doc_id, n_tokens, start_offset,
             start_offset // {ln} + j AS chunk_id
      FROM c, _spanguard, generate_series(0, {span_bound - 1}) AS g(j)
      WHERE _spanguard.ok = 1 AND n_tokens > 0
        AND start_offset // {ln} + j
              <= (start_offset + n_tokens - 1) // {ln})
    SELECT chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(start_offset + n_tokens,
                          (chunk_id + 1) * {ln})
                    - GREATEST(start_offset, chunk_id * {ln}))
                AS BIGINT) AS chunk_tokens,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM fed GROUP BY chunk_id"""


def pack_oracle_sql(*, context_len: int = 512,
                    table: str = "documents") -> str:
    """DuckDB twin: the two-level scan collapses to a plain window
    cumsum (same ordering, same truncating ``//`` division; every
    column cast to BIGINT to match Spark's LONGs — DuckDB SUM(BIGINT)
    widens to HUGEINT otherwise)."""
    return f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM {table}),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS start_offset
      FROM tok)
    SELECT doc_id, n_tokens, start_offset,
           start_offset // {context_len} AS first_chunk,
           CASE WHEN n_tokens > 0
                THEN (start_offset + n_tokens - 1) // {context_len}
                ELSE start_offset // {context_len}
           END AS last_chunk,
           CASE WHEN n_tokens > 0
                THEN (start_offset + n_tokens - 1) // {context_len}
                ELSE start_offset // {context_len}
           END - start_offset // {context_len} + 1 AS n_chunks
    FROM c"""
