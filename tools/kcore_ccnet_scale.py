"""Scale legs for k-core peeling and the composed CCNet pipeline.

k-core graph: the gated 3-tier cascade construction replayed over a
replicated doc_id universe (cliques survive; chain/tier-1/tier-2 peel
in rounds 1-3 at every scale — peel DEPTH is structure-bound, so wall
should scale with the per-round linear work, not with extra rounds),
plus a full-degree hub variant: one node attached to EVERY clique
node, the worst-case skew shape — the hub must behave as a semi-join
build row, never a fan-out source.

CCNet: lined corpus (headers/footers on every copy) through line
dedup → bigram LM on cleaned text → NTILE terciles. All stages are
hash-aggs/joins over narrow rows plus one fixed-width-row global sort
for the tercile split.

Host is noisy (CLAUDE.md): best-of-N with all samples printed; quiet
host only.

Usage: python tools/kcore_ccnet_scale.py   (one JSON line)
  SPARK_GRAFT_CORPUS_SCALES="10,100" (default).
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


def _timed(fn):
    samples, val = [], None
    for _ in range(ATTEMPTS):
        t0 = time.time()
        val = fn()
        samples.append(round(time.time() - t0, 3))
    return {"wall_sec": min(samples), "samples": samples, "result": val}


def _kcore_edges(spark, d, *, hub: bool):
    from pyspark.sql import functions as F
    cl = (d.alias("x").join(
        d.alias("y"),
        F.expr("x.doc_id DIV 5 = y.doc_id DIV 5 "
               "AND x.doc_id < y.doc_id"))
        .selectExpr("concat('k', x.doc_id) AS src",
                    "concat('k', y.doc_id) AS dst"))
    ch = d.selectExpr("concat('c', doc_id) AS src",
                      "concat('c', doc_id + 1) AS dst")
    t1 = d.selectExpr("concat('t1_', doc_id DIV 3) AS src",
                      "concat('c', doc_id) AS dst")
    t2 = d.selectExpr("concat('t2_', doc_id DIV 9) AS src",
                      "concat('t1_', doc_id DIV 3) AS dst")
    anchor = (d.filter("doc_id % 9 = 0")
              .selectExpr("concat('t2_', doc_id DIV 9) AS src",
                          "concat('k', doc_id) AS dst"))
    e = cl.unionByName(ch).unionByName(t1).unionByName(t2) \
        .unionByName(anchor)
    if hub:
        e = e.unionByName(
            d.selectExpr("'HUB' AS src", "concat('k', doc_id) AS dst"))
    return e


def main():
    from pyspark.sql import functions as F

    from bench import _mk_session
    from corpus_ops_scale import _corpus
    from rdf_rdfxml_spark.operators.graph import bfs_depths, kcore
    from rdf_rdfxml_spark.operators.lines import line_dedup
    from rdf_rdfxml_spark.operators.lm import bigram_lm_scores
    from rdf_rdfxml_spark.operators.quantiles import exact_quantiles

    spark = _mk_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    scales = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_CORPUS_SCALES", "10,100").split(",")]
    lo, hi = scales[0], scales[-1]
    out = {"protocol": f"sf0.01 docs x{lo} vs x{hi} (deterministic "
                       f"copies; kcore over the 3-tier cascade graph "
                       f"± full-degree hub), best-of-{ATTEMPTS}, "
                       f"local[{CPUS}]",
           "loadavg": round(os.getloadavg()[0], 2)}
    legs = {}
    for scale in (lo, hi):
        docs = _corpus(spark, scale) \
            .repartition(2 * CPUS).persist()
        n_docs = docs.count()
        leg = {"n_docs": n_docs}
        d = docs.select("doc_id")

        r = _timed(lambda: kcore(_kcore_edges(spark, d, hub=False), 4)
                   .agg(F.count(F.lit(1)), F.sum("core_deg")).collect())
        leg["kcore"] = {"core_nodes": int(r["result"][0][0]),
                        "deg_sum": int(r["result"][0][1]),
                        "wall_sec": r["wall_sec"],
                        "samples": r["samples"]}
        r = _timed(lambda: kcore(_kcore_edges(spark, d, hub=True), 4)
                   .agg(F.count(F.lit(1)), F.sum("core_deg")).collect())
        leg["kcore_hub"] = {"core_nodes": int(r["result"][0][0]),
                            "deg_sum": int(r["result"][0][1]),
                            "wall_sec": r["wall_sec"],
                            "samples": r["samples"]}

        lined = docs.select(
            "doc_id",
            F.concat(F.lit("NAV "), F.col("lang"),
                     F.lit(" home about contact\n\n"), F.col("text"),
                     F.lit("\nPowered by ExampleCMS\nCOPYRIGHT "),
                     F.col("lang")).alias("text"))

        def _ccnet():
            from pyspark.sql import Window
            cleaned = line_dedup(lined, min_df=10)
            scores = bigram_lm_scores(
                cleaned.select("doc_id",
                               F.col("clean_text").alias("text")))
            w = Window.orderBy(F.desc("mean_bigram_ppm"),
                               F.asc("doc_id"))
            b = scores.withColumn("bucket",
                                  F.ntile(3).over(w).cast("long"))
            return (b.join(cleaned.select("doc_id", "clean_chars"),
                           "doc_id")
                    .groupBy("bucket")
                    .agg(F.count(F.lit(1)).alias("n_docs"),
                         F.sum("clean_chars").alias("clean_chars"))
                    .agg(F.sum("n_docs"), F.sum("clean_chars"))
                    .collect())
        r = _timed(_ccnet)
        leg["ccnet_stats"] = {"n_docs": int(r["result"][0][0]),
                              "clean_chars": int(r["result"][0][1]),
                              "wall_sec": r["wall_sec"],
                              "samples": r["samples"]}

        r = _timed(lambda: exact_quantiles(
            docs, "size(filter(split(text, ' '), t -> t <> ''))")
            .agg(F.sum("value"), F.min("n")).collect())
        leg["token_quantiles"] = {
            "value_sum": int(r["result"][0][0]),
            "n": int(r["result"][0][1]),
            "wall_sec": r["wall_sec"], "samples": r["samples"]}

        # BFS over per-copy binary trees on the LOCAL doc index
        # (copy = id DIV 1e9, local = id % 1e9 — DIV 2 on the raw
        # offset ids would leave every copy's tree unrooted), all
        # copies joined to one root R: constant depth ~10 at every
        # scale, frontier width grows with the corpus
        tree = d.filter("doc_id % 1000000000 >= 1").selectExpr(
            "concat('c', doc_id DIV 1000000000, '_', "
            "(doc_id % 1000000000) DIV 2) AS src",
            "concat('c', doc_id DIV 1000000000, '_', "
            "doc_id % 1000000000) AS dst")
        roots = (d.filter("doc_id % 1000000000 = 0")
                 .selectExpr("'R' AS src",
                             "concat('c', doc_id DIV 1000000000, "
                             "'_0') AS dst"))
        bfs_edges = tree.unionByName(roots)
        r = _timed(lambda: bfs_depths(bfs_edges, "R")
                   .agg(F.count(F.lit(1)), F.max("depth")).collect())
        leg["bfs_depths"] = {"n_reached": int(r["result"][0][0]),
                             "max_depth": int(r["result"][0][1]),
                             "wall_sec": r["wall_sec"],
                             "samples": r["samples"]}
        legs[f"{scale}x"] = leg
        docs.unpersist()

    ratio = hi // lo
    for op in ("kcore", "kcore_hub", "ccnet_stats", "token_quantiles",
               "bfs_depths"):
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
