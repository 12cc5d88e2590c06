"""Streaming, multimodal plumbing, P/R scoring, CLI driver."""
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from rdf_rdfxml_spark.operators.multimodal import (
    decode_image, extract_features, synth_media,
)
from rdf_rdfxml_spark.operators.score import pr_score
from rdf_rdfxml_spark.plans.pipeline import construct_graph
from rdf_rdfxml_spark.sources.fixtures import corpus
from rdf_rdfxml_spark.streaming.stream import (
    stream_construct, stream_documents, windowed_event_counts,
)

INPUT_COLS = ("repo", "path", "commit", "lang", "content", "base_uri")


def _docs_df(spark, rows):
    return spark.createDataFrame([{k: r[k] for k in INPUT_COLS}
                                  for r in rows])


# --- streaming ---------------------------------------------------------------

def test_stream_construct_available_now(spark, tmp_path):
    rows = [r for r in corpus(2) if not r["negative"]]
    src = str(tmp_path / "in")
    _docs_df(spark, rows).drop("base_uri").write.parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_construct(stream_documents(spark, src, max_files_per_trigger=2),
                         out, ckpt).start()
    q.awaitTermination(120)
    triples = spark.read.parquet(out)
    batch = construct_graph(_docs_df(spark, rows), dedup=False).triples
    assert triples.count() == batch.count()
    # restart with no new files: no duplicates (checkpoint held)
    q2 = stream_construct(stream_documents(spark, src), out, ckpt).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == batch.count()


def test_windowed_event_counts_static(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # watermark on a static DF is a no-op; check rollup consistency
    w = windowed_event_counts(e)
    total = w.agg(F.sum("n")).first()[0]
    assert total == e.count()


# --- multimodal ---------------------------------------------------------------

def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"payload")
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert a.shape == (8, 8, 3) and a.dtype.name == "uint8"
    assert (a == b).all()  # deterministic


def test_extract_features_spark(spark):
    media = synth_media(spark, 32)
    feats = extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(r["error"] is None for r in rows)
    assert all(len(r["feature"]) == 128 for r in rows)  # 64 bytes hex
    # same payload → same feature (deterministic across partitions)
    again = {r["media_id"]: r["feature"]
             for r in extract_features(media.repartition(8),
                                       fake_decode=True).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_extract_features_real_decoder_errors_isolated(spark):
    media = synth_media(spark, 4)
    feats = extract_features(media, fake_decode=False).collect()
    assert all(r["feature"] is None for r in feats)
    assert all("NotImplementedError" in r["error"] for r in feats)


# --- P/R scoring ---------------------------------------------------------------

def test_pr_score_perfect_and_degraded(spark):
    rows = [r for r in corpus(2) if not r["negative"]]
    g = construct_graph(_docs_df(spark, rows)).triples.cache()
    perfect = pr_score(g, g).first()
    assert perfect["precision"] == 1.0 and perfect["recall"] == 1.0
    # drop whole documents from golden (per-doc canonical forms stay
    # intact) → recall 1, precision < 1
    some_docs = [r["doc_sha"] for r in
                 g.select("doc_sha").distinct().limit(5).collect()]
    golden_subset = g.filter(~F.col("doc_sha").isin(some_docs))
    r = pr_score(g, golden_subset).first()
    assert r["recall"] == 1.0 and r["precision"] < 1.0
    # bnode relabel-invariance: rename our bnode ids, score still perfect
    renamed = (g.withColumn(
        "s", F.when(F.col("s_kind") == "bnode",
                    F.concat(F.lit("zz"), F.col("s"))).otherwise(F.col("s")))
        .withColumn(
        "o", F.when(F.col("o_kind") == "bnode",
                    F.concat(F.lit("zz"), F.col("o"))).otherwise(F.col("o"))))
    r2 = pr_score(renamed, g).first()
    assert r2["precision"] == 1.0 and r2["recall"] == 1.0


# --- CLI -----------------------------------------------------------------------

def test_cli_end_to_end(spark, tmp_path):
    src = str(tmp_path / "docs")
    rows = [r for r in corpus(1)]
    _docs_df(spark, rows).write.parquet(src)
    out = str(tmp_path / "triples")
    err = str(tmp_path / "errors")
    proc = subprocess.run(
        [sys.executable, "-m", "rdf_rdfxml_spark.cli", "--input", src,
         "--output", out, "--errors-output", err, "--master", "local[4]",
         "--buckets", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "statements/second." in proc.stdout
    assert spark.read.parquet(out).count() > 0
    assert spark.read.parquet(err).count() > 0  # negative fixtures
