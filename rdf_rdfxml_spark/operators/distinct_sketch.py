"""Approximate distinct-counting sketches: KMV and HyperLogLog.

At 100 TB, "how many unique tokens / n-grams / URLs" cannot be an
exact corpus-wide ``COUNT(DISTINCT …)`` — the distinct shuffle IS the
cost. The two classic mergeable sketches solve it with bounded state:

* **KMV / bottom-k** (Bar-Yossef et al., RANDOM'02): keep the ``k``
  smallest distinct hash values; estimate ``(k-1) * SPACE / kth_min``.
  State = k longs; union of sketches = min-k of the union.
* **HyperLogLog** (Flajolet et al., AofA'07): ``m = 2^p`` buckets,
  each holding the max leading-zero rank of its hashes; estimate
  ``alpha_m * m^2 / Σ 2^-rho``. State = m small ints; union = per-
  bucket max — which is EXACTLY what a partial-aggregating
  ``groupBy(bucket).max(rho)`` computes, so the Spark plan is the
  textbook sketch: one corpus scan, map-side state of m rows per
  task, an m-row exchange, zero data-sized shuffles. Duplicates never
  matter (max is idempotent), so no distinct pass exists anywhere in
  the HLL path.

Cross-engine exactness (CLAUDE.md integer rule): the hash is the
md5-prefix 60-bit integer both engines compute bit-identically (the
spans.py fingerprint pattern); rho comes from ``length(bin(x))``
(integer bit-length — no log2/libm anywhere); the harmonic sum is
``Σ 2^(R - rho)`` in BIGINT (R = 61 - p caps the sum at m·2^R < 2^63);
and the estimator's ``alpha`` is a build-time ppm CONSTANT embedded in
both the Spark job and the generated oracle SQL, so the final integer
division agrees bit-for-bit (Spark folds it in driver-side big-int
arithmetic over the collected m-row state — the state is the sketch,
collecting it is the point; DuckDB widens through HUGEINT and casts
back).

Estimator regime note: the raw HLL estimator is used as-is (no
linear-counting small-range branch — that needs ``ln``, a libm seam);
callers should pick ``p`` so the expected cardinality is >> m, as the
gated query does (16-gram cardinality ~1e5 vs m=1024). Accuracy at
that operating point is the standard ~1.04/√m.

Reference parity note: ruby-rdf/rdf-rdfxml has no sketch surface; this
exists for the brief's training-data pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 60-bit hash space (15 md5 hex digits — the spans.py fingerprint).
HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS

KMV_K = 256
HLL_P = 10
GRAM_K = 16


def _alpha_ppm(m: int) -> int:
    """HLL bias constant for m >= 128, as an exact ppm integer computed
    ONCE at build time and embedded in both engines (no runtime float
    anywhere)."""
    assert m >= 128
    return int(0.7213 / (1.0 + 1.079 / m) * 1_000_000)


def _gram_hashes(docs: DataFrame, *, k: int = GRAM_K,
                 text_col: str = "text") -> DataFrame:
    """One 60-bit hash per k-char gram occurrence (duplicates kept —
    the sketches don't need them removed). Pure codegen: sequence →
    substring transform → explode → md5/conv."""
    # NB: Spark's sequence(1, n) is DESCENDING for n < 1, so short
    # documents need the explicit empty-array arm, not greatest(n, 0)
    return (docs
            .select(F.explode(F.expr(
                f"CASE WHEN length({text_col}) >= {k} THEN "
                f"transform(sequence(1, length({text_col}) - {k - 1}), "
                f"i -> substring({text_col}, i, {k})) "
                f"ELSE CAST(array() AS array<string>) END"))
                .alias("g"))
            .select(F.expr(
                "CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)")
                .alias("h")))


def kmv_distinct(docs: DataFrame, *, k: int = KMV_K,
                 gram_k: int = GRAM_K) -> DataFrame:
    """KMV estimate of the corpus's distinct k-char-gram count:
    one row ``(k, kth_min, est_distinct, exact_distinct)``, all BIGINT.

    The bottom-k scan is ``groupBy(h)`` (map-side partial agg collapses
    duplicate grams to one row per task) + ``TakeOrderedAndProject``
    (per-partition top-k, k·P-row merge) — the relational equivalent of
    a streaming KMV merge. ``exact_distinct`` (for accuracy reporting;
    a 100 TB run would skip it) reuses the same distinct-hash set."""
    spark = docs.sparkSession
    hashes = _gram_hashes(docs, k=gram_k).groupBy("h").agg(
        F.count(F.lit(1)).alias("_c"))
    exact = hashes.count()
    bottom = [r["h"] for r in
              hashes.select("h").orderBy(F.asc("h")).limit(k).collect()]
    if exact <= k - 1:
        est = exact
        kth = bottom[-1] if bottom else 0
    else:
        kth = bottom[k - 1]
        est = (k - 1) * HASH_SPACE // kth
    return spark.createDataFrame(
        [(k, kth, est, exact)],
        "k long, kth_min long, est_distinct long, exact_distinct long")


def hll_state(docs: DataFrame, *, p: int = HLL_P,
              gram_k: int = GRAM_K) -> DataFrame:
    """The HLL register table ``(bucket, rho)`` — max leading-zero rank
    per bucket. This IS the mergeable sketch: union of corpora =
    ``groupBy(bucket).max(rho)`` over unioned states."""
    m = 1 << p
    w = HASH_BITS - p  # rank bits
    return (_gram_hashes(docs, k=gram_k)
            .select((F.col("h") % m).alias("bucket"),
                    F.expr(f"h DIV {m}").alias("rem"))
            .select("bucket", F.expr(
                f"CASE WHEN rem = 0 THEN CAST({w + 1} AS BIGINT) "
                f"ELSE CAST({w} + 1 - length(bin(rem)) AS BIGINT) END")
                .alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("rho")))


def hll_distinct(docs: DataFrame, *, p: int = HLL_P,
                 gram_k: int = GRAM_K) -> DataFrame:
    """HLL estimate of the corpus's distinct k-char-gram count: one row
    ``(m, nonzero_buckets, est_distinct, exact_distinct)``, BIGINT.

    The estimate folds the collected m-row register table in exact
    Python big-int arithmetic (``alpha_ppm·m²·2^R // (1e6·Σ2^(R-rho))``,
    R = 61 - p; empty buckets contribute 2^R); the oracle's HUGEINT
    replay lands on the identical integer."""
    m = 1 << p
    r_top = HASH_BITS - p + 1
    spark = docs.sparkSession
    state = hll_state(docs, p=p, gram_k=gram_k).collect()
    nonzero = len(state)
    s = sum(1 << (r_top - row["rho"]) for row in state)
    s += (m - nonzero) * (1 << r_top)
    est = _alpha_ppm(m) * m * m * (1 << r_top) // (1_000_000 * s)
    exact = _gram_hashes(docs, k=gram_k).distinct().count()
    return spark.createDataFrame(
        [(m, nonzero, est, exact)],
        "m long, nonzero_buckets long, est_distinct long, "
        "exact_distinct long")


# --------------------------------------------------------------------------
# DuckDB oracle twins
# --------------------------------------------------------------------------

def _gram_cte(*, gram_k: int, table: str, bound: int = 100_000) -> str:
    """CTE chain ending in ``hs(h)`` — one 60-bit hash per gram
    occurrence, with the loud length guard (spans.py pattern)."""
    return f"""_gguard AS (
      SELECT CASE WHEN MAX(len(text)) > {bound}
             THEN error('oracle gram bound {bound} exceeded in {table}')
             ELSE 1 END AS ok FROM {table}),
    hs AS (
      SELECT CAST(('0x' || substring(
                 md5(substring(text, CAST(i AS INTEGER), {gram_k})),
                 1, 15))::VARCHAR::UBIGINT AS BIGINT) AS h
      FROM {table}, _gguard, generate_series(1, {bound}) s(i)
      WHERE _gguard.ok = 1 AND i <= len(text) - {gram_k - 1})"""


def kmv_distinct_oracle_sql(*, k: int = KMV_K, gram_k: int = GRAM_K,
                            table: str = "documents") -> str:
    return f"""WITH {_gram_cte(gram_k=gram_k, table=table)},
    d AS (SELECT DISTINCT h FROM hs),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM d),
    kth AS (
      SELECT h AS kth_min FROM d ORDER BY h
      LIMIT 1 OFFSET {k - 1})
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(CASE WHEN ex.exact <= {k - 1}
                THEN COALESCE((SELECT MAX(h) FROM d), 0)
                ELSE kth.kth_min END AS BIGINT) AS kth_min,
           CAST(CASE WHEN ex.exact <= {k - 1} THEN ex.exact
                ELSE CAST({k - 1}::HUGEINT * {HASH_SPACE}::HUGEINT
                          // kth.kth_min AS BIGINT)
                END AS BIGINT) AS est_distinct,
           ex.exact AS exact_distinct
    FROM ex LEFT JOIN kth ON TRUE"""


def hll_distinct_oracle_sql(*, p: int = HLL_P, gram_k: int = GRAM_K,
                            table: str = "documents") -> str:
    m = 1 << p
    w = HASH_BITS - p
    r_top = w + 1
    alpha = _alpha_ppm(m)
    return f"""WITH {_gram_cte(gram_k=gram_k, table=table)},
    reg AS (
      SELECT h % {m} AS bucket,
             MAX(CASE WHEN h // {m} = 0 THEN {w + 1}
                 ELSE {w} + 1 - length(bin(h // {m})) END) AS rho
      FROM hs GROUP BY 1),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nonzero,
             CAST(SUM(1::BIGINT << ({r_top} - rho)) AS HUGEINT) AS s_nz
      FROM reg),
    ex AS (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS exact FROM hs)
    SELECT CAST({m} AS BIGINT) AS m,
           agg.nonzero AS nonzero_buckets,
           CAST({alpha}::HUGEINT * {m} * {m} * ({1 << r_top}::HUGEINT)
                // (1000000::HUGEINT *
                    (agg.s_nz + ({m} - agg.nonzero)::HUGEINT
                     * ({1 << r_top}::HUGEINT)))
                AS BIGINT) AS est_distinct,
           ex.exact AS exact_distinct
    FROM agg, ex"""
