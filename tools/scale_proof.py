"""Scale-up proof run (round-2 verdict next-round #2): the flagship and
dedup suite at 1x and 10x corpus size, same plans, recorded side by side.

Replication is deterministic and *similarity-preserving within a replica*:

* documents: each replica r applies an alphabet ROTATION by r to the text
  (``translate``) — a bijection on characters, so every within-replica
  shingle set is bijected and within-replica jaccard/near-dup structure is
  EXACTLY preserved, while cross-replica texts share almost no shingles
  (no artificial 45x cross-replica near-dup blowup, which a plain copy
  would cause — a real 10x corpus has ~10x the pairs, not 45x).
* embeddings: each replica r rotates the 64 dimensions by r — an
  orthogonal permutation, so within-replica cosines are exactly preserved
  and cross-replica vectors decorrelate.

IVF cells scale with sqrt(N): n_cells 8 at 1x -> 25 at 10x, checking that
the bucketed dedup's sum-of-cell-squared cost tracks ~linearly when the
cell count follows the data.

Usage: python tools/scale_proof.py [30x] [recall]
  (prints one JSON line; ~5 min base, +~10 min per extra mode)
  30x     — add a 30x leg for the flagship + minhash + verified-pairs +
            components + containment (round-3 verdict #9 / round-5 #2:
            catch any Σ|cell|²/fan-out constant creeping past the 10x
            validation; components records propagation rounds and
            containment records candidate-pair fan-out so supra-linear
            growth is attributable to diameter/output, not plan decay).
  recall  — production-threshold (0.7) trained-IVF dedup vs numpy
            brute force at 1x and 10x — plus 30x when combined with the
            30x mode — k ∝ N, two-level through the TRAINED coarse
            quantizer (round-5 verdict #1).
Protocol per CLAUDE.md: best-of-2 per (query, scale) leg, quiet host.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from bench import _mk_session
    spark = _mk_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def rep_documents(spark, replicate: int):
    """documents replicated with per-replica alphabet rotation."""
    from pyspark.sql import functions as F
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    if replicate == 1:
        return base
    az = string.ascii_lowercase
    branches = []
    for r in range(replicate):
        rot = az[r:] + az[:r]
        branches.append(base.selectExpr(
            f"doc_id + {r} * 10000000 AS doc_id",
            f"translate(text, '{az}', '{rot}') AS text"))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def rep_embeddings(spark, replicate: int):
    """embeddings replicated with per-replica dimension rotation."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    if replicate == 1:
        return base
    branches = []
    for r in range(replicate):
        if r == 0:
            expr = "v"
        else:
            expr = (f"concat(slice(v, {r + 1}, size(v) - {r}), "
                    f"slice(v, 1, {r}))")
        branches.append(base.selectExpr(
            f"vec_id + {r} * 10000000 AS vec_id", f"({expr}) AS v"))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def best_of(n, fn):
    best, result = None, None
    for _ in range(n):
        t0 = time.time()
        result = fn()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    return round(best, 2), result


def main():
    from pyspark.sql import functions as F  # noqa: F401
    from bench import _bench_docs
    from rdf_rdfxml_spark.operators.ann import (
        dedup_embedding_bucketed, kmeans_cells,
    )
    from rdf_rdfxml_spark.operators.extract import extract
    from rdf_rdfxml_spark.operators.graph import connected_components
    from rdf_rdfxml_spark.operators.metrics import skew_ratio
    from rdf_rdfxml_spark.operators.sketch import (
        minhash_candidates, simhash, verify_candidates, winnow_fingerprints,
    )
    from rdf_rdfxml_spark.plans.pipeline import construct_graph

    spark = _session()
    spread = 2 * spark.sparkContext.defaultParallelism
    out = {"sf": SF_DIR.rstrip("/").split("sf")[-1], "cpus": CPUS,
           "protocol": "best-of-2 per leg; 10x via similarity-preserving "
                       "replication (alphabet/dimension rotation)"}

    # warm-up
    spark.range(1000).selectExpr("sum(id)").collect()
    construct_graph(_bench_docs(spark, SF_DIR, 2), strict=True,
                    repartition=None).triples.count()

    modes = set(sys.argv[1:])

    # ---- flagship kg_construct: replicate 40 (r2 bench shape) vs 400 ----
    kg_legs = [("1x", 40), ("10x", 400)]
    if "30x" in modes:
        kg_legs.append(("30x", 1200))
    for label, rep in kg_legs:
        docs = _bench_docs(spark, SF_DIR, rep)
        wall, n = best_of(
            2, lambda d=docs: construct_graph(
                d, strict=True, repartition=None).triples.count())
        out[f"kg_{label}_sec"] = wall
        out[f"kg_{label}_triples"] = n
        out[f"kg_{label}_triples_per_sec"] = round(n / wall)
        out[f"kg_{label}_skew"] = round(
            skew_ratio(extract(_bench_docs(spark, SF_DIR, rep))), 3)

    # ---- sketch suite over documents: 1x (5k docs) vs 10x (50k docs),
    # plus an optional 30x leg (minhash + verified-pairs only) ----
    doc_legs = [("1x", 1), ("10x", 10)]
    if "30x" in modes:
        doc_legs.append(("30x", 30))
    for label, rep in doc_legs:
        docs = rep_documents(spark, rep).repartition(spread).persist()
        n_docs = docs.count()
        out[f"docs_{label}"] = n_docs

        wall, pairs = best_of(
            2, lambda d=docs: minhash_candidates(d).count())
        out[f"minhash_{label}_sec"] = wall
        out[f"minhash_{label}_pairs"] = pairs

        wall, verified = best_of(
            2, lambda d=docs: verify_candidates(
                d, minhash_candidates(d)).count())
        out[f"verify_{label}_sec"] = wall
        out[f"verify_{label}_pairs"] = verified

        # components + containment run at EVERY scale incl. 30x (round-5
        # verdict #2: both tails measured supra-linear at 10x — 2.6x and
        # 3.9x — and need the constant attributed past 10x). Telemetry:
        # components records rounds (diameter) so wall = rounds ×
        # per-round join cost is separable; containment records the
        # candidate-pair count Σ c·(c-1)/2 over capped fp buckets (the
        # join fan-out) next to the output pair count.
        cc_stats: dict = {}
        wall, comps = best_of(
            2, lambda d=docs, s=cc_stats: connected_components(
                minhash_candidates(d), stats=s).count())
        out[f"components_{label}_sec"] = wall
        out[f"components_{label}_nodes"] = comps
        out[f"components_{label}_rounds"] = cc_stats.get("rounds")
        out[f"components_{label}_edges"] = out[f"minhash_{label}_pairs"]

        from rdf_rdfxml_spark.operators.sketch import (
            containment_pairs as _cp, winnow_fingerprints as _wf,
        )
        wall, pairs = best_of(2, lambda d=docs: _cp(d).count())
        out[f"containment_{label}_sec"] = wall
        out[f"containment_{label}_pairs"] = pairs
        buckets = (_wf(docs).groupBy("fp").count()
                   .selectExpr(
                       "count(*) AS n_fps",
                       "max(count) AS max_bucket",
                       "sum(CASE WHEN count > 200 THEN 1 ELSE 0 END) "
                       "AS n_capped",
                       "sum(CASE WHEN count <= 200 THEN "
                       "count * (count - 1) / 2 ELSE 0 END) AS cand_pairs")
                   .first())
        out[f"containment_{label}_fps"] = buckets["n_fps"]
        out[f"containment_{label}_max_bucket"] = buckets["max_bucket"]
        out[f"containment_{label}_capped_fps"] = int(buckets["n_capped"])
        out[f"containment_{label}_cand_pairs"] = int(buckets["cand_pairs"])

        if label == "30x":  # 30x: flagship + minhash + verify +
            docs.unpersist()  # components + containment (the two tails)
            continue

        wall, _ = best_of(2, lambda d=docs: simhash(d).count())
        out[f"simhash_{label}_sec"] = wall

        wall, fps = best_of(
            2, lambda d=docs: winnow_fingerprints(d).count())
        out[f"winnow_{label}_sec"] = wall
        out[f"winnow_{label}_fps"] = fps

        from rdf_rdfxml_spark.operators.curation import tfidf_keywords
        wall, kws = best_of(
            2, lambda d=docs: tfidf_keywords(d).count())
        out[f"tfidf_{label}_sec"] = wall
        out[f"tfidf_{label}_rows"] = kws
        docs.unpersist()

    # ---- trained-IVF embedding dedup: n_cells follows k ∝ N (the dedup
    # regime — constant cell size; the √N search heuristic applied here
    # measured N^1.5 in r3 and 69x in an r4 control run) ----
    for label, rep, cells in (("1x", 1, 8), ("10x", 10, 80)):
        emb = rep_embeddings(spark, rep).repartition(spread).persist()
        n_vec = emb.count()
        out[f"vectors_{label}"] = n_vec
        _, centroids = kmeans_cells(emb, k=cells, iters=2)
        wall, pairs = best_of(
            2, lambda e=emb, c=centroids: dedup_embedding_bucketed(
                e, centroids=c, n_cells=len(c)).count())
        out[f"ivf_dedup_{label}_sec"] = wall
        out[f"ivf_dedup_{label}_pairs"] = pairs
        out[f"ivf_dedup_{label}_cells"] = cells
        emb.unpersist()

    # ---- production-threshold (0.7) trained dedup recall vs numpy,
    # flat vs two-level assignment (k ∝ N makes flat N·k quadratic) ----
    if "recall" in modes:
        import numpy as np
        from rdf_rdfxml_spark.operators.ann import (
            dedup_embedding_twolevel, train_coarse_quantizer,
            with_neardup_twins,
        )
        recall_legs = [("1x", 1), ("10x", 10)]
        if "30x" in modes:
            recall_legs.append(("30x", 30))
        for label, rep in recall_legs:
            emb = with_neardup_twins(
                rep_embeddings(spark, rep).repartition(spread)).persist()
            n_vec = emb.count()
            cells = 8 * rep  # k ∝ N: the dedup regime (constant cell size)
            _, centroids = kmeans_cells(emb, k=cells, iters=2)
            wall, rows_got = best_of(
                2, lambda e=emb, c=centroids: dedup_embedding_bucketed(
                    e, centroids=c, threshold=0.7).collect())
            got = {(r["a"], r["b"]) for r in rows_got}
            # round 5: two-level runs through the TRAINED coarse
            # quantizer (driver-side Lloyd's over the centroid table) —
            # the production default; training cost is included in the
            # first timing sample's setup, not the measured wall (it is
            # model-sized: k vectors, k' clusters).
            coarse = train_coarse_quantizer(centroids)
            wall2, rows_two = best_of(
                2, lambda e=emb, c=centroids, q=coarse:
                dedup_embedding_twolevel(
                    e, c, threshold=0.7, coarse_centroids=q).collect())
            got_two = {(r["a"], r["b"]) for r in rows_two}
            # numpy brute-force ground truth (chunked row blocks)
            all_rows = emb.collect()
            ids = np.array([r["vec_id"] for r in all_rows])
            V = np.array([r["v"] for r in all_rows])
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            truth = set()
            for i0 in range(0, len(ids), 4000):
                S = Vn[i0:i0 + 4000] @ Vn.T
                for a, b in zip(*np.nonzero(S >= 0.7)):
                    ga, gb = int(ids[i0 + a]), int(ids[b])
                    if ga < gb:
                        truth.add((ga, gb))
            out[f"prod_dedup_{label}_sec"] = wall
            out[f"prod_dedup_{label}_vectors"] = n_vec
            out[f"prod_dedup_{label}_cells"] = cells
            out[f"prod_dedup_{label}_true_pairs"] = len(truth)
            out[f"prod_dedup_{label}_recall"] = round(
                len(got & truth) / max(1, len(truth)), 4)
            out[f"prod_dedup_{label}_precision"] = round(
                len(got & truth) / max(1, len(got)), 4)
            out[f"prod_dedup_twolevel_{label}_sec"] = wall2
            out[f"prod_dedup_twolevel_{label}_recall"] = round(
                len(got_two & truth) / max(1, len(truth)), 4)
            out[f"prod_dedup_twolevel_{label}_precision"] = round(
                len(got_two & truth) / max(1, len(got_two)), 4)
            emb.unpersist()

    # headline ratios (10x work in <= ~10x time = linear or better)
    for k in ("kg", "minhash", "verify", "components", "simhash",
              "winnow", "containment", "tfidf", "ivf_dedup", "prod_dedup"):
        a, b = out.get(f"{k}_1x_sec"), out.get(f"{k}_10x_sec")
        if a and b:
            out[f"{k}_time_ratio_10x"] = round(b / a, 2)
        c = out.get(f"{k}_30x_sec")
        if a and c:
            out[f"{k}_time_ratio_30x"] = round(c / a, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
