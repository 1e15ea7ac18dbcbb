"""The production extraction job: resume → extract → commit → lineage.

North-rule semantics (BASELINE.json): every run commits per-partition
lineage and metrics (doc ranges, checksums, span counts, wall time) to a
metrics table, and resumes from the last snapshot via anti-join on
completed doc_ids. Reference analogs: batch summary sink
(batch_processor_enhanced.py:233-270), audit append (google_sheets.py:
111-203), has_output resume check (i2j_ui/app/main.py:851-858).

Layout (plain parquet standing in for Iceberg — jars not in this image;
`sources.tables.have_iceberg` gates a real catalog):

    <output_dir>/results/run_id=<run>/   doc_id, spans, checksum, part_id
    <output_dir>/metrics/run_id=<run>/   per-partition lineage rows

Commit protocol: results are written first (Spark's file-commit makes the
run directory appear atomically on rename); metrics are then derived from a
COLUMN-PRUNED re-scan of the committed results (doc_id/checksum/part_id
only — a tiny fraction of the bytes), so lineage always reflects durable
data — a crash between the two writes leaves committed results that the
next run's metrics pass will simply re-derive. Resume reads doc_id across
all committed run dirs; the anti-join is a plain equi-join Catalyst
executes as sort-merge (or broadcast when the completed set is small).

Per-task wall time comes from a SparkListener scoped to the commit job's
job group (plans/task_metrics.py) — the scheduler's own TaskEnd durations,
joined onto the lineage rows by partition id; the run-level wall clock is
kept alongside (and is the fallback when the listener cannot attach).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import checksum_spans_col, extract_inline
from .snapshots import commit_snapshot
from .task_metrics import per_task_durations

RESULTS = "results"
METRICS = "metrics"


def _results_root(output_dir: str) -> str:
    return os.path.join(output_dir, RESULTS)


def completed_doc_ids(spark: SparkSession, output_dir: str) -> DataFrame | None:
    """doc_ids already extracted across all COMMITTED runs (None if none).

    Only run dirs carrying the job-commit marker (_SUCCESS) count: a run
    that crashed between task and job commit must look incomplete so its
    docs are re-extracted, never silently skipped. (With Iceberg this is
    the snapshot boundary; on plain files the marker plays that role.)"""
    root = _results_root(output_dir)
    if not os.path.isdir(root):  # first run (local FS; catalog check on Iceberg)
        return None
    committed = [
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("run_id=")
        and os.path.exists(os.path.join(root, d, "_SUCCESS"))
    ]
    if not committed:
        return None
    return spark.read.parquet(*committed).select("doc_id")


def run_extract_job(
    spark: SparkSession,
    documents_interleaved: DataFrame,
    output_dir: str,
    run_id: str | None = None,
) -> dict:
    """Extract all not-yet-completed docs; commit results + lineage.

    Returns run stats {run_id, n_docs, wall_ms, resumed_skipped}.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.monotonic()

    done = completed_doc_ids(spark, output_dir)
    remaining = documents_interleaved
    skipped = 0
    if done is not None:
        # resume: left-anti on completed ids (J6 / north_rule)
        remaining = documents_interleaved.join(done, "doc_id", "left_anti")

    extracted = (
        extract_inline(remaining)
        .withColumn("checksum", checksum_spans_col(F.col("spans")))
        .withColumn("part_id", F.spark_partition_id())
    )

    run_results = os.path.join(_results_root(output_dir), f"run_id={run_id}")
    with per_task_durations(spark, f"extract-commit-{run_id}") as task_ms:
        extracted.write.mode("errorifexists").parquet(run_results)

    # lineage from the COMMITTED files, light columns only (column pruning
    # keeps this scan tiny relative to the span payload)
    committed = spark.read.parquet(run_results).select(
        "doc_id", "checksum", "part_id", F.size("spans").alias("n_spans")
    )
    wall_ms = int((time.monotonic() - t0) * 1000)
    metrics = (
        committed.groupBy("part_id")
        .agg(
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
            F.count("*").alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            # order-insensitive partition checksum (xor: no ANSI overflow)
            F.expr("bit_xor(checksum)").alias("checksum"),
        )
        .withColumn("wall_time_ms", F.lit(wall_ms))
        .withColumn("committed_at", F.current_timestamp())
    )
    if task_ms:
        # scheduler-reported per-task duration for the commit job, joined
        # by partition index (narrow plan: write-task index == part_id);
        # the tiny map is broadcast
        tm = spark.createDataFrame(
            [(int(k), int(v)) for k, v in task_ms.items()],
            "part_id int, task_wall_ms bigint",
        )
        metrics = metrics.join(F.broadcast(tm), "part_id", "left")
    else:  # listener unavailable: keep schema stable
        metrics = metrics.withColumn("task_wall_ms", F.lit(None).cast("bigint"))
    # run_id comes from the partition directory on read-back (a literal
    # column here would collide with the inferred partition column)
    run_metrics = os.path.join(output_dir, METRICS, f"run_id={run_id}")
    metrics.write.mode("errorifexists").parquet(run_metrics)

    n_docs = committed.count()
    if done is not None:
        skipped = done.count()
    # snapshot commit (Iceberg-analog): manifest chains to the parent and
    # manifests publish via an os.link CAS; readers resolve the max
    # on-disk manifest (CURRENT is a debug hint only) — time-travel readers see
    # exactly the runs committed at a snapshot (plans/snapshots.py)
    run_ck = committed.selectExpr("bit_xor(checksum)").collect()[0][0]
    snap = commit_snapshot(output_dir, run_id, n_docs, run_ck or 0)
    return {
        "run_id": run_id,
        "n_docs": n_docs,
        "wall_ms": int((time.monotonic() - t0) * 1000),
        "resumed_skipped": skipped,
        "snapshot_id": snap["snapshot_id"],
    }


def read_results(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(_results_root(output_dir))


def read_metrics(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, METRICS))
