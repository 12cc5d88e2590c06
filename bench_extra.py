"""Round-8 optimization harness (bench.py is FROZEN for measurement —
this file carries the guide §1 instrumentation instead).

Modes:
  python bench_extra.py time [query ...]     -- best-of-N wall per query
                                                (same corpus/session as bench)
  python bench_extra.py plans [query ...]    -- dump explain("formatted") per
                                                query to plans/r08/<q>_<tag>.txt
  python bench_extra.py noop [query ...]     -- time with the noop sink
                                                (guide §1.4) instead of count()

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_N (default 3),
BENCH_EXTRA_TAG (plan file suffix, default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time


def _mk_session(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.appName("rdf-rdfxml-bench-extra")
            .master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
            .config("spark.driver.memory", "24g")
            .getOrCreate())


HEADLINE = ["rdfxml_extract_basic", "rdfxml_reification",
            "rdfxml_error_channel", "rdfxml_write", "triples_dedup_global",
            "entity_linking", "entity_linking_salted", "dedup_exact",
            "minhash_lsh", "dedup_verified_pairs", "simhash",
            "ann_cosine_topk", "ann_lsh_bucketed",
            "dedup_embedding_bucketed", "text_quality", "events_windowed"]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    attempts = int(os.environ.get("BENCH_EXTRA_N", "3"))
    tag = os.environ.get("BENCH_EXTRA_TAG", "before")
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or HEADLINE

    spark = _mk_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as E
    qmap = {**E.queries(), **E.extra_queries()}

    # warm-up: spin executors + Python workers (same as bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()
    qmap["rdfxml_extract_basic"](spark, sf_dir).count()

    if mode == "plans":
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "plans", "r08")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = qmap[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(p)
            print(f"wrote {name}_{tag}.txt ({p.count('Exchange')} Exchange)")
        spark.stop()
        return

    results, samples = {}, {}
    loadavg0 = round(os.getloadavg()[0], 2)
    for name in names:
        ss = []
        for _ in range(attempts):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qmap[name](spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            ss.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = min(ss)
        samples[name] = ss
        print(f"[extra] {name}: {min(ss)}s  samples={ss}", file=sys.stderr)
    print(json.dumps({"mode": mode, "sf": sf_dir, "loadavg0": loadavg0,
                      "loadavg1": round(os.getloadavg()[0], 2),
                      "sum_best": round(sum(results.values()), 3),
                      "best": results, "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
