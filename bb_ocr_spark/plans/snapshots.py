"""Snapshot log: Iceberg-analog commit semantics on plain files.

Iceberg's table state is a chain of immutable snapshot manifests plus an
atomically-swapped current pointer; readers see exactly the runs a
snapshot references, never a half-written directory. This module gives
the extraction job the same contract without the catalog jars (which this
image lacks — `sources.tables.have_iceberg` gates the real binding):

    <output_dir>/snapshots/snap-<n>.json   immutable manifest: run_ids,
                                           parent, counts, checksum, ts
    <output_dir>/snapshots/CURRENT         pointer file, os.replace()'d
                                           (atomic on POSIX)

Time travel = read exactly the run dirs a manifest lists. A run directory
that crashed before its snapshot commit is invisible to snapshot readers
(and the resume anti-join already ignores it via the _SUCCESS marker).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

SNAP_DIR = "snapshots"


def _snap_dir(output_dir: str) -> str:
    return os.path.join(output_dir, SNAP_DIR)


def current_snapshot(output_dir: str) -> dict | None:
    cur = os.path.join(_snap_dir(output_dir), "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        snap_file = f.read().strip()
    with open(os.path.join(_snap_dir(output_dir), snap_file)) as f:
        return json.load(f)


def commit_snapshot(
    output_dir: str, run_id: str, n_docs: int, checksum: int
) -> dict:
    """Append an immutable manifest chaining to the parent, then swap the
    CURRENT pointer atomically. The manifest lists ALL run_ids visible at
    this snapshot (parent's runs + this one), so a reader needs exactly
    one manifest."""
    os.makedirs(_snap_dir(output_dir), exist_ok=True)
    parent = current_snapshot(output_dir)
    snap_id = (parent["snapshot_id"] + 1) if parent else 1
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": parent["snapshot_id"] if parent else None,
        "run_ids": (parent["run_ids"] if parent else []) + [run_id],
        "n_docs_total": (parent["n_docs_total"] if parent else 0) + n_docs,
        "run_checksum": checksum,
        "committed_at_ms": int(time.time() * 1000),
    }
    name = f"snap-{snap_id:06d}.json"
    final = os.path.join(_snap_dir(output_dir), name)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, final)  # manifest appears whole or not at all
    cur_tmp = os.path.join(_snap_dir(output_dir), "CURRENT.tmp")
    with open(cur_tmp, "w") as f:
        f.write(name)
    os.replace(cur_tmp, os.path.join(_snap_dir(output_dir), "CURRENT"))
    return manifest


def read_results_as_of(
    spark: SparkSession, output_dir: str, snapshot_id: int
) -> DataFrame:
    """Time travel: exactly the runs the manifest lists — later runs and
    uncommitted directories are invisible."""
    path = os.path.join(_snap_dir(output_dir), f"snap-{snapshot_id:06d}.json")
    with open(path) as f:
        manifest = json.load(f)
    dirs = [
        os.path.join(output_dir, "results", f"run_id={r}")
        for r in manifest["run_ids"]
    ]
    return spark.read.parquet(*dirs)
