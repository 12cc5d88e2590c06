"""KMV / HyperLogLog distinct sketches (operators/distinct_sketch.py)."""

from pyspark.sql import functions as F

from rdf_rdfxml_spark.operators.distinct_sketch import (
    GRAM_K, _gram_hashes, hll_distinct, hll_state, kmv_distinct,
)


def _docs(spark, n=300, words=40):
    # deterministic word-soup docs, plenty of distinct 16-grams
    rows = [(i, " ".join(f"w{(i * 9973 + j * 131) % 99991:05d}"
                         for j in range(words))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_docs_produce_no_partial_grams(spark):
    # Spark sequence(1, n<1) is DESCENDING — the guard must yield zero
    # grams for texts shorter than k, not junk substrings
    d = spark.createDataFrame([(1, "tiny"), (2, ""), (3, None)],
                              "doc_id long, text string")
    assert _gram_hashes(d, k=GRAM_K).count() == 0


def test_kmv_estimate_within_tolerance(spark):
    row = kmv_distinct(_docs(spark)).collect()[0]
    exact = row["exact_distinct"]
    assert exact > 5000
    # k=256 → σ ≈ 6.3%; allow 4σ
    assert abs(row["est_distinct"] - exact) / exact < 0.25


def test_kmv_small_cardinality_is_exact(spark):
    d = spark.createDataFrame([(1, "abcdefghijklmnopqr")],
                              "doc_id long, text string")
    row = kmv_distinct(d).collect()[0]  # 3 grams << k
    assert row["est_distinct"] == row["exact_distinct"] == 3


def test_hll_estimate_within_tolerance(spark):
    row = hll_distinct(_docs(spark)).collect()[0]
    exact = row["exact_distinct"]
    # m=1024 → σ ≈ 3.3%; allow 4σ
    assert abs(row["est_distinct"] - exact) / exact < 0.13
    assert row["m"] == 1024 and row["nonzero_buckets"] <= 1024


def test_hll_state_merges_by_bucket_max(spark):
    # THE sketch property: state(A ∪ B) == per-bucket max of the states
    a = _docs(spark, n=100)
    b = _docs(spark, n=100).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail words here"))
        .alias("text"))
    merged = (hll_state(a).unionByName(hll_state(b))
              .groupBy("bucket").agg(F.max("rho").alias("rho")))
    direct = hll_state(a.unionByName(b))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_sketches_are_deterministic(spark):
    d = _docs(spark, n=50)
    assert kmv_distinct(d).collect() == kmv_distinct(d).collect()
    assert hll_distinct(d).collect() == hll_distinct(d).collect()


# --- exact histogram quantiles -------------------------------------------

def _ref_quantiles(values, qs):
    s = sorted(values)
    n = len(s)
    # min v with cum*100 >= q*n  ==  s[ceil(q*n/100) - 1]
    return {q: s[-(-q * n // 100) - 1] for q in qs}


def test_exact_quantiles_vs_sorted_list(spark):
    from rdf_rdfxml_spark.operators.quantiles import exact_quantiles
    vals = [((i * 37) % 100) for i in range(500)] + [7] * 200 + [0] * 50
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    qs = (1, 5, 25, 50, 75, 95, 99, 100)
    got = {r["q"]: r["value"]
           for r in exact_quantiles(df, "x", qs=qs).collect()}
    assert got == _ref_quantiles(vals, qs)


def test_exact_quantiles_skips_nulls(spark):
    from rdf_rdfxml_spark.operators.quantiles import exact_quantiles
    df = spark.createDataFrame([(1,), (None,), (3,), (None,)], "x long")
    got = {r["q"]: (r["value"], r["n"])
           for r in exact_quantiles(df, "x", qs=(50, 100)).collect()}
    assert got == {50: (1, 2), 100: (3, 2)}


# --- BFS depths ----------------------------------------------------------

def test_bfs_depths_vs_brute_force(spark):
    from collections import deque
    from rdf_rdfxml_spark.operators.graph import bfs_depths
    el = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
          ("x", "y"),                 # unreachable island
          ("b", "a"), ("a", "a")]     # duplicate + self-loop
    adj = {}
    for s, t in el:
        if s != t:
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
    ref, dq = {"a": 0}, deque(["a"])
    while dq:
        u = dq.popleft()
        for w in sorted(adj.get(u, ())):
            if w not in ref:
                ref[w] = ref[u] + 1
                dq.append(w)
    df = spark.createDataFrame(el, "src string, dst string")
    got = {r["node"]: r["depth"] for r in bfs_depths(df, "a").collect()}
    assert got == ref
    assert "x" not in got and "y" not in got


def test_bfs_tree_depth_is_bit_length(spark):
    from rdf_rdfxml_spark.operators.graph import bfs_depths
    el = [(f"n{i // 2}", f"n{i}") for i in range(1, 64)]
    df = spark.createDataFrame(el, "src string, dst string")
    got = {r["node"]: r["depth"] for r in bfs_depths(df, "n0").collect()}
    assert got == {f"n{i}": i.bit_length() for i in range(64)}


def test_grouped_quantiles_match_per_group_rule(spark):
    from rdf_rdfxml_spark.operators.quantiles import grouped_quantiles
    rows = [("a", (i * 13) % 50) for i in range(300)]
    rows += [("b", i % 7) for i in range(40)]
    df = spark.createDataFrame(rows, "source string, x long")
    qs = (25, 50, 95)
    got = {(r["stratum"], r["q"]): r["value"]
           for r in grouped_quantiles(df, "x", qs=qs).collect()}
    for s in ("a", "b"):
        vals = [x for g, x in rows if g == s]
        ref = _ref_quantiles(vals, qs)
        for q in qs:
            assert got[(s, q)] == ref[q], (s, q)
