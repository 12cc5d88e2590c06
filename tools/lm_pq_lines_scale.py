"""Scale legs for the round-7 second-wave operators that didn't yet
have one: bigram-LM scoring, PQ ADC top-k, line-frequency boilerplate
removal, and the per-source quota cap.

Corpus protocol matches tools/corpus_ops_scale.py (sf0.01 replicated k
times, doc_id offsets, per-copy marker token). For the LINE family the
replication is again the adversarial case on purpose: header/footer
lines are shared by EVERY copy of every doc, so the df hot key (the
global footer) carries n_docs weight — the partial-agg collapse is
what's being measured. Embeddings replicate by vec_id offset (codes
scan + k-means training both scale with N; the ADC table stays
model-sized).

Expectations:
* bigram_lm_scores — two corpus hash-aggs + a model join: ~linear.
* line_dedup — explode + two partial-agg stages + anti-join + per-doc
  reassembly: ~linear, no pair term even at full duplication.
* source_quota — phase-1 window over (stratum, salt) then a
  bounded-size phase-2: ~linear in the scan, constant reducer.
* ann_pq_topk — k-means training + code scan: ~linear in N.

Host is noisy (CLAUDE.md): best-of-N with all samples printed; quiet
host only.

Usage: python tools/lm_pq_lines_scale.py    (one JSON line)
  SPARK_GRAFT_CORPUS_SCALES="10,100" (default) — 1x is
  overhead-dominated at 500 docs/vectors.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_N", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _timed(fn):
    samples, val = [], None
    for _ in range(ATTEMPTS):
        t0 = time.time()
        val = fn()
        samples.append(round(time.time() - t0, 3))
    return {"wall_sec": min(samples), "samples": samples, "result": val}


def _emb(spark, scale: int):
    from pyspark.sql import functions as F
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    if scale == 1:
        return base
    parts = [base.select(
        (F.col("vec_id") + F.lit(k * 1_000_000_000)).alias("vec_id"),
        "v") for k in range(scale)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    from pyspark.sql import functions as F

    from bench import _mk_session
    from corpus_ops_scale import _corpus
    from rdf_rdfxml_spark.operators.ann import ann_pq_topk
    from rdf_rdfxml_spark.operators.distinct_sketch import hll_state
    from rdf_rdfxml_spark.operators.lines import line_dedup
    from rdf_rdfxml_spark.operators.lm import bigram_lm_scores
    from rdf_rdfxml_spark.operators.sampling import source_quota

    spark = _mk_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    scales = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_CORPUS_SCALES", "10,100").split(",")]
    lo, hi = scales[0], scales[-1]
    out = {"protocol": f"sf0.01 docs+embeddings x{lo} vs x{hi} "
                       f"(deterministic copies; lines at FULL "
                       f"header/footer duplication), "
                       f"best-of-{ATTEMPTS}, local[{CPUS}]",
           "loadavg": round(os.getloadavg()[0], 2)}
    legs = {}
    for scale in (lo, hi):
        docs = _corpus(spark, scale) \
            .repartition(2 * CPUS).persist()
        n_docs = docs.count()
        leg = {"n_docs": n_docs}

        r = _timed(lambda: bigram_lm_scores(docs)
                   .agg(F.sum("mean_bigram_ppm"),
                        F.sum("n_bigrams")).collect())
        leg["bigram_lm_scores"] = {
            "ppm_sum": int(r["result"][0][0]),
            "n_bigrams": int(r["result"][0][1]),
            "wall_sec": r["wall_sec"], "samples": r["samples"]}

        lined = docs.select(
            "doc_id",
            F.concat(F.lit("NAV "), F.col("lang"),
                     F.lit(" home about contact\n\n"), F.col("text"),
                     F.lit("\nPowered by ExampleCMS\nCOPYRIGHT "),
                     F.col("lang")).alias("text"))
        r = _timed(lambda: line_dedup(lined, min_df=10)
                   .agg(F.sum("clean_chars"),
                        F.sum("n_removed")).collect())
        leg["line_dedup"] = {
            "clean_chars": int(r["result"][0][0]),
            "n_removed": int(r["result"][0][1]),
            "wall_sec": r["wall_sec"], "samples": r["samples"]}

        r = _timed(lambda: source_quota(
            docs, 100, stratum_col="lang")
            .agg(F.count(F.lit(1)), F.sum("rank")).collect())
        leg["source_quota"] = {
            "n_kept": int(r["result"][0][0]),
            "rank_sum": int(r["result"][0][1]),
            "wall_sec": r["wall_sec"], "samples": r["samples"]}

        # the SKETCH path alone (register build + m-row collect) — the
        # exact-distinct rider in hll_distinct is reporting, not sketch
        r = _timed(lambda: len(hll_state(docs).collect()))
        leg["hll_state"] = {"nonzero_buckets": r["result"],
                            "wall_sec": r["wall_sec"],
                            "samples": r["samples"]}
        legs[f"{scale}x"] = leg
        docs.unpersist()

        emb = _emb(spark, scale).repartition(2 * CPUS).persist()
        leg["n_vectors"] = emb.count()
        r = _timed(lambda: ann_pq_topk(emb)
                   .agg(F.sum("adc_l2sq"), F.count(F.lit(1))).collect())
        leg["ann_pq_topk"] = {
            "adc_sum": int(r["result"][0][0]),
            "n_rows": int(r["result"][0][1]),
            "wall_sec": r["wall_sec"], "samples": r["samples"]}
        emb.unpersist()

    ratio = hi // lo
    for op in ("bigram_lm_scores", "line_dedup", "source_quota",
               "hll_state", "ann_pq_topk"):
        w1 = legs[f"{lo}x"][op]["wall_sec"]
        w10 = legs[f"{hi}x"][op]["wall_sec"]
        legs[f"wall_ratio_{op}"] = round(w10 / w1, 2)
        print(f"[scale] {op}: {w1}s -> {w10}s "
              f"({legs[f'wall_ratio_{op}']}x at {ratio}x data)",
              file=sys.stderr)
    out.update(legs)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
