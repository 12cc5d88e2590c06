"""ntile_desc_by_histogram must equal NTILE(k) OVER (ORDER BY v DESC,
id ASC) bit-for-bit — including massed ties straddling bucket
boundaries, n not divisible by k, and n < k (the regimes the gate
corpora don't stress). Round-8 focused test for the CCNet tercile
rewrite (round-7 verdict "what's wrong" #1)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from rdf_rdfxml_spark.operators.quantiles import ntile_desc_by_histogram


def _reference(df, k):
    w = Window.orderBy(F.desc("v"), F.asc("doc_id"))
    return {(r["doc_id"], r["bucket"]) for r in
            df.withColumn("bucket", F.ntile(k).over(w).cast("long"))
            .select("doc_id", "bucket").collect()}


def _histogram(df, k):
    return {(r["doc_id"], r["bucket"]) for r in
            ntile_desc_by_histogram(df, "v", "doc_id", n_buckets=k)
            .select("doc_id", "bucket").collect()}


def _check(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, v long")
    assert _histogram(df, k) == _reference(df, k)


def test_tied_values_across_boundaries(spark):
    # one value owns most of the corpus and straddles both cuts
    rows = ([(i, 500) for i in range(20)]
            + [(100 + i, 900) for i in range(3)]
            + [(200 + i, 100) for i in range(4)])
    _check(spark, rows, 3)


def test_all_one_value(spark):
    _check(spark, [(i, 7) for i in range(10)], 3)


def test_n_not_divisible(spark):
    for n in (4, 5, 7, 10, 11):
        _check(spark, [(i, i % 4) for i in range(n)], 3)


def test_fewer_rows_than_buckets(spark):
    _check(spark, [(0, 5), (1, 5)], 3)
    _check(spark, [(0, 5)], 3)


def test_distinct_values(spark):
    _check(spark, [(i, 1000 - i) for i in range(30)], 3)
    _check(spark, [(i, 1000 - i) for i in range(30)], 4)
