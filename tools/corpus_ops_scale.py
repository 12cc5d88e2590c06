"""1x vs 10x scale legs for the round-7 corpus pipeline operators:
eval-set decontamination, token packing, the chunk->document manifest,
and the mixture plan.

Corpus: the sf0.01 documents table at 1x; the 10x leg unions ten
deterministic copies (doc_id offset by k*10^9, a per-copy marker token
appended so texts are distinct but n-gram-overlapping — the hard case
for decontamination, since every copy shares nearly all n-grams with
the eval slice). Expectations:

* decontaminate — corpus side 10x, eval blocklist 10x, hit rows ~10x:
  wall should scale ~linearly (broadcast join; the only shuffle is the
  per-doc gram-count partial agg).
* pack_token_chunks / chunk_manifest — strictly linear row counts; the
  only single-partition stage is the per-bucket sums (10x more buckets
  is still tiny), so wall ~linear.
* mix_plan — one corpus scan + a constant-size stratum aggregate.

The host is noisy (CLAUDE.md): best-of-N per leg with all samples
printed; run on a quiet host only.

Usage: python tools/corpus_ops_scale.py   (one JSON line; ~3 min)
  SPARK_GRAFT_CORPUS_SCALES="10,100" for deeper legs (default "1,10";
  the 500-doc sf0.01 base is overhead-dominated at 1x, so the
  committed evidence uses 10x vs 100x where compute dominates).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_N", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _corpus(spark, scale: int):
    from pyspark.sql import functions as F
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "lang", "text")
    if scale == 1:
        return base
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(k * 1_000_000_000)).alias("doc_id"),
            "lang",
            F.concat(F.col("text"), F.lit(f" copymark{k}")).alias("text"))
        for k in range(scale)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _timed(fn):
    samples, val = [], None
    for _ in range(ATTEMPTS):
        t0 = time.time()
        val = fn()
        samples.append(round(time.time() - t0, 3))
    return {"wall_sec": min(samples), "samples": samples, "result": val}


def main():
    from rdf_rdfxml_spark.operators.decontam import decontaminate
    from rdf_rdfxml_spark.operators.packing import (
        chunk_manifest, pack_token_chunks,
    )
    from rdf_rdfxml_spark.operators.sampling import mix_plan
    from bench import _mk_session

    spark = _mk_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    scales = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_CORPUS_SCALES", "1,10").split(",")]
    lo, hi = scales[0], scales[-1]
    out = {"protocol": f"sf0.01 docs x{lo} vs x{hi} (deterministic "
                       f"copies), best-of-{ATTEMPTS}, local[{CPUS}]",
           "loadavg": round(os.getloadavg()[0], 2)}
    legs = {}
    for scale in (lo, hi):
        docs = _corpus(spark, scale).persist()
        n_docs = docs.count()
        dd = docs.select("doc_id", "text")
        leg = {"n_docs": n_docs}

        r = _timed(lambda: decontaminate(
            dd, dd.filter("doc_id % 10 = 3"), n=8).count())
        leg["decontaminate"] = {"n_flagged": r["result"],
                                "wall_sec": r["wall_sec"],
                                "samples": r["samples"]}
        r = _timed(lambda: pack_token_chunks(
            dd, context_len=512, bucket_size=64).count())
        leg["pack"] = {"n_rows": r["result"], "wall_sec": r["wall_sec"],
                       "samples": r["samples"]}
        r = _timed(lambda: chunk_manifest(
            dd, context_len=512, bucket_size=64).count())
        leg["manifest"] = {"n_chunks": r["result"],
                           "wall_sec": r["wall_sec"],
                           "samples": r["samples"]}
        r = _timed(lambda: mix_plan(
            docs.select("lang", "text"), stratum_col="lang").count())
        leg["mix_plan"] = {"n_strata": r["result"],
                           "wall_sec": r["wall_sec"],
                           "samples": r["samples"]}
        legs[f"{scale}x"] = leg
        docs.unpersist()

    ratio = hi // lo
    for op in ("decontaminate", "pack", "manifest", "mix_plan"):
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
