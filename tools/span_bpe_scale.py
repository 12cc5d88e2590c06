"""10x vs 100x scale legs for duplicated-span detection/removal and BPE
merge learning (the round-7 additions after the corpus-ops legs).

Corpus protocol matches tools/corpus_ops_scale.py: the sf0.01 documents
table replicated k times with doc_id offsets and a per-copy marker token
appended. For the SPAN family this is the adversarial case on purpose —
every document now exists in k near-identical copies, so essentially
EVERY selected fingerprint is duplicated and the hit/semi-join/island
stages run at their maximum possible row counts (the dup-fp set is as
large as the fingerprint set itself). Expectations:

* dup_span_stats / dup_span_removal — every stage is linear (document-
  local mapInArrow, hash-agg with partial agg, left-semi probe, per-doc
  windows): wall ~linear in corpus size even at full duplication.
* bpe_train_merges — ONE corpus-scale pass (word freqs), then
  vocabulary-sized iterations. Copies add only k new marker words, so
  the iteration cost is constant: wall should be strongly SUB-linear,
  the measured signature of the "iterate on the vocab table, not the
  corpus" design.

Host is noisy (CLAUDE.md): best-of-N with all samples printed; quiet
host only.

Usage: python tools/span_bpe_scale.py    (one JSON line, ~4 min)
  SPARK_GRAFT_CORPUS_SCALES="10,100" (default) — 1x is
  overhead-dominated at 500 docs.
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


def _corpus(spark, scale: int):
    # the SAME replication protocol as the other corpus legs — imported,
    # not copied, so the two harnesses' numbers stay comparable
    from corpus_ops_scale import _corpus as _shared
    return _shared(spark, scale).select("doc_id", "text")


def _timed(fn):
    samples, val = [], None
    for _ in range(ATTEMPTS):
        t0 = time.time()
        val = fn()
        samples.append(round(time.time() - t0, 3))
    return {"wall_sec": min(samples), "samples": samples, "result": val}


def main():
    from pyspark.sql import functions as F

    from bench import _mk_session
    from rdf_rdfxml_spark.operators.bpe import bpe_train_merges
    from rdf_rdfxml_spark.operators.spans import (
        dup_span_removal, dup_span_stats,
    )

    spark = _mk_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    scales = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_CORPUS_SCALES", "10,100").split(",")]
    lo, hi = scales[0], scales[-1]
    out = {"protocol": f"sf0.01 docs x{lo} vs x{hi} (deterministic "
                       f"copies; spans at FULL duplication), "
                       f"best-of-{ATTEMPTS}, local[{CPUS}]",
           "loadavg": round(os.getloadavg()[0], 2)}
    legs = {}
    for scale in (lo, hi):
        docs = _corpus(spark, scale) \
            .repartition(2 * CPUS).persist()
        n_docs = docs.count()
        leg = {"n_docs": n_docs}

        r = _timed(lambda: dup_span_stats(docs)
                   .agg(F.sum("dup_chars"), F.sum("n_spans")).collect())
        leg["dup_span_stats"] = {
            "dup_chars": int(r["result"][0][0]),
            "n_spans": int(r["result"][0][1]),
            "wall_sec": r["wall_sec"], "samples": r["samples"]}
        r = _timed(lambda: dup_span_removal(docs)
                   .agg(F.sum("clean_chars")).collect())
        leg["dup_span_removal"] = {
            "clean_chars": int(r["result"][0][0]),
            "wall_sec": r["wall_sec"], "samples": r["samples"]}
        r = _timed(lambda: bpe_train_merges(docs, n_merges=10).count())
        leg["bpe_train"] = {"n_merges": r["result"],
                            "wall_sec": r["wall_sec"],
                            "samples": r["samples"]}
        legs[f"{scale}x"] = leg
        docs.unpersist()

    ratio = hi // lo
    for op in ("dup_span_stats", "dup_span_removal", "bpe_train"):
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
