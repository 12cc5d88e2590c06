"""Line-level boilerplate removal (operators/lines.py) and the
per-source quota cap (operators/sampling.py source_quota)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from rdf_rdfxml_spark.operators.lines import boilerplate_lines, line_dedup
from rdf_rdfxml_spark.operators.sampling import source_quota


def _corpus(spark):
    # 5 docs share "BANNER"; 3 share "footer"; bodies unique; doc 6 is
    # ALL boilerplate; doc 7 exercises blank + trailing-empty lines.
    rows = [(i, f"BANNER\nbody {i}\nfooter") for i in range(3)]
    rows += [(3, "BANNER\nbody 3"), (4, "BANNER\nbody 4"),
             (6, "BANNER"), (7, "BANNER\n\nbody 7\n")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_df_counts(spark):
    out = {r["line"]: r["df"]
           for r in boilerplate_lines(_corpus(spark), min_df=3).collect()}
    assert out == {"BANNER": 7, "footer": 3}


def test_line_dedup_rebuilds_in_order(spark):
    got = {r["doc_id"]: (r["n_removed"], r["clean_text"])
           for r in line_dedup(_corpus(spark), min_df=3).collect()}
    assert got[0] == (2, "body 0")          # banner + footer cut
    assert got[3] == (1, "body 3")
    assert got[6] == (1, "")                # all-boilerplate doc
    # blank line and the trailing empty line are structure, never removed
    assert got[7] == (1, "\nbody 7\n")
    for doc_id, (_, text) in got.items():
        assert "BANNER" not in text


def test_line_dedup_threshold_keeps_rare_lines(spark):
    # min_df above every df: nothing removed, texts verbatim
    src = _corpus(spark)
    got = {r["doc_id"]: (r["n_removed"], r["clean_text"])
           for r in line_dedup(src, min_df=100).collect()}
    for r in src.collect():
        assert got[r["doc_id"]] == (0, r["text"])


def _quota_input(spark):
    # hot source: 40 of 49 docs in one domain
    rows = [(i, "hot") for i in range(40)]
    rows += [(100 + i, f"cold{i % 3}") for i in range(9)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_source_quota_matches_single_window(spark):
    docs = _quota_input(spark)
    got = source_quota(docs, 5, n_salts=8)
    # the logical spec: ONE window over (u32, id)
    from rdf_rdfxml_spark.operators.sampling import _u32_expr
    w = Window.partitionBy("source").orderBy("_u", "doc_id")
    want = (docs.withColumn("_u", F.expr(_u32_expr("quota:v1", "doc_id")))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 5).select("doc_id", "source", "rank"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_source_quota_caps_and_keeps_small_strata(spark):
    docs = _quota_input(spark)
    per = {r["source"]: r["n"]
           for r in source_quota(docs, 5).groupBy("source")
           .agg(F.count("*").alias("n")).collect()}
    assert per["hot"] == 5
    for s in ("cold0", "cold1", "cold2"):
        assert per[s] == 3  # under quota: every doc kept
    ranks = [r["rank"] for r in source_quota(docs, 5).collect()]
    assert min(ranks) == 1 and max(ranks) == 5


def test_mix_execute_hits_allocation_and_caps(spark):
    from rdf_rdfxml_spark.operators.sampling import mix_execute
    # big stratum down-sampled, tiny stratum up-weighted past supply
    rows = [(i, "big", "tok " * 50) for i in range(2000)]
    rows += [(10_000 + i, "tiny", "tok " * 50) for i in range(5)]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")
    got = {r["stratum"]: r
           for r in mix_execute(docs, token_budget=20_000).collect()}
    # tiny: alloc exceeds its 250-token supply → cut caps at 2^32,
    # EVERYTHING kept
    assert got["tiny"]["n_kept"] == 5
    assert got["tiny"]["kept_tokens"] == 250
    assert got["tiny"]["alloc_tokens"] > 250
    # big: realized token mass within 4σ of the allocation
    # (Bernoulli on 2000 docs; σ/alloc ≈ 1/√n_kept ≈ 2-3%)
    big = got["big"]
    assert abs(big["kept_tokens"] - big["alloc_tokens"]) \
        < 0.15 * big["alloc_tokens"]
    # determinism
    again = {r["stratum"]: r["kept_tokens"]
             for r in mix_execute(docs, token_budget=20_000).collect()}
    assert again["big"] == big["kept_tokens"]


def test_mix_execute_zero_token_stratum_keeps_nothing(spark):
    from rdf_rdfxml_spark.operators.sampling import mix_execute
    rows = [(1, "full", "a b c"), (2, "empty", ""), (3, "empty", " ")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")
    got = {r["stratum"] for r in
           mix_execute(docs, token_budget=100).collect()}
    assert got == {"full"}  # no DIV-by-zero row, no NULL cut
