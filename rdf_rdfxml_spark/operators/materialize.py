"""Materialization + checkpoint/resume (SURVEY.md §2.4 D4/D5).

Triples are written as Parquet partitioned by a hash bucket of the subject
(``pmod(xxhash64(s), n_buckets)``): subject-co-located partitions make
downstream graph joins (s↔s merges, star queries) partition-prunable, and
hashing avoids the skew a ``repo`` partition would have at 10¹²-file scale
(one giant repo ≠ one giant partition). Bucket count is the knob to keep
files near the 128 MB–1 GB sweet spot.

Resume protocol (D5): documents are assigned to deterministic work units
``unit = (first 60 bits of sha256(content)) mod n_units`` — a pure function
of content that DuckDB can also compute, so the driver gate can verify the
assignment and the left_anti pending-set relationally. A manifest table records
completed units; on restart, pending work = ``left_anti`` join against the
manifest. Blank-node ids and doc_sha lineage are deterministic functions of
content (D1), so a re-run of any unit is byte-identical — append-mode
writes stay idempotent at the unit grain.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def with_bucket(triples: DataFrame, n_buckets: int = 256,
                col: str = "s") -> DataFrame:
    return triples.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int"))


def materialize(triples: DataFrame, path: str, *, n_buckets: int = 256,
                mode: str = "overwrite") -> None:
    (with_bucket(triples, n_buckets)
     .write.mode(mode).partitionBy("bucket").parquet(path))


def unit_expr(sha_col, n_units: int):
    """Work-unit id from a sha256 hex column: first 15 hex chars (60 bits,
    fits BIGINT exactly in Spark and DuckDB) mod ``n_units``. Engine-
    portable on purpose — the resume protocol is oracle-checked."""
    return F.pmod(
        F.conv(F.substring(sha_col, 1, 15), 16, 10).cast("bigint"),
        F.lit(n_units)).cast("int")


def assign_units(documents: DataFrame, n_units: int) -> DataFrame:
    return documents.withColumn(
        "unit", unit_expr(F.sha2(F.col("content"), 256), n_units))


def pending_units(spark: SparkSession, documents_with_units: DataFrame,
                  manifest_path: str) -> DataFrame:
    """Documents whose work unit is not yet recorded complete."""
    try:
        manifest = spark.read.parquet(manifest_path).select("unit")
    except Exception:
        return documents_with_units
    return documents_with_units.join(manifest, "unit", "left_anti")


def record_units(spark: SparkSession, units: list[int],
                 manifest_path: str) -> None:
    rows = [(int(u), int(time.time())) for u in units]
    spark.createDataFrame(rows, "unit int, completed_at long") \
        .write.mode("append").parquet(manifest_path)


def resumable_run(
    spark: SparkSession,
    documents: DataFrame,
    output_path: str,
    manifest_path: str,
    *,
    n_units: int = 64,
    units_per_batch: int = 16,
    strict: bool = True,
    n_buckets: int = 16,
) -> dict:
    """Process pending units in deterministic batches, appending triples and
    manifest rows per batch. Safe to kill and restart at any point: at-least-
    once unit execution + deterministic output = exactly-once table state
    after dedup-on-read (or idempotent overwrite of unit partitions).

    Returns counters for observability.
    """
    from .extract import extract, triples_channel

    docs_u = assign_units(documents, n_units)
    pending = pending_units(spark, docs_u, manifest_path)
    unit_ids = sorted(
        r["unit"] for r in pending.select("unit").distinct().collect())
    done = 0
    triples_written = 0
    for i in range(0, len(unit_ids), units_per_batch):
        batch_units = unit_ids[i:i + units_per_batch]
        batch_docs = pending.filter(F.col("unit").isin(batch_units))
        extracted = extract(batch_docs, strict=strict)
        triples = with_bucket(triples_channel(extracted), n_buckets)
        # Observation piggybacks the count on the write job — no extra pass.
        obs = Observation(f"written_batch_{i}")
        triples = triples.observe(obs, F.count(F.lit(1)).alias("n"))
        triples.write.mode("append").partitionBy("bucket").parquet(output_path)
        triples_written += int(obs.get["n"])
        record_units(spark, batch_units, manifest_path)
        done += len(batch_units)
    return {"units_total": len(unit_ids), "units_done": done,
            "triples_written": triples_written}
