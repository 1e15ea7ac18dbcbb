"""Snapshot log: Iceberg-analog commit semantics on plain files.

Iceberg's table state is a chain of immutable snapshot manifests plus an
atomically-swapped current pointer; readers see exactly the runs a
snapshot references, never a half-written directory. This module gives
the extraction job the same contract without the catalog jars (which this
image lacks — `sources.tables.have_iceberg` gates the real binding):

    <output_dir>/snapshots/snap-<n>.json   immutable manifest: run_ids,
                                           parent, counts, checksum, ts
                                           (published via os.link —
                                           create-exclusive CAS; no-link
                                           mounts: O_EXCL reservation +
                                           atomic os.replace publish)
    <output_dir>/snapshots/CURRENT         human-readable hint; readers
                                           resolve the max manifest

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
    """The table's current state = the highest-id manifest ON DISK.

    Manifests are published atomically (os.link in commit_snapshot), so
    the max snap file is always a complete, committed manifest — reading
    it directly makes the reader view race-free by construction. The
    CURRENT pointer file is still maintained as a human-readable
    convenience/debug hint, but it is NOT load-bearing: a check-then-act
    pointer swap between two racing committers could move it backwards
    and hide the latest commit until the next one."""
    return _latest_manifest(output_dir)


def _latest_manifest(output_dir: str) -> dict | None:
    """Highest-numbered manifest on disk — the commit-time parent AND the
    reader view. Using a pointer file as the parent would livelock two
    concurrent committers (the loser keeps re-minting the same id until
    the winner swaps the pointer) and can lose a commit outright.
    Ordered NUMERICALLY by the parsed snap id — a lexical sort breaks the
    moment ids outgrow the zero-padding ('snap-1000000.json' sorts before
    'snap-999999.json', which would livelock the 1,000,001st commit).
    Cost is one listdir per read/commit-retry — O(#snapshots) directory
    entries; past ~10^5 snapshots add manifest compaction (fold the chain
    into a new base manifest and prune), which Iceberg tables need at
    that commit count anyway."""
    d = _snap_dir(output_dir)
    if not os.path.isdir(d):
        return None
    snaps = [
        n for n in os.listdir(d) if n.startswith("snap-") and n.endswith(".json")
    ]
    if not snaps:
        return None
    # Descending by id, skipping unparsable entries: on the no-hardlink
    # fallback path the max file can transiently be an empty O_EXCL
    # reservation (bytes land via os.replace an instant later) or, after
    # a reserver crash, a dead zero-byte file until a later committer
    # takes it over — either way the previous manifest is the committed
    # state and the reader must not wedge on the torn one.
    for name in sorted(
        snaps, key=lambda n: int(n[len("snap-"):-len(".json")]), reverse=True
    ):
        try:
            with open(os.path.join(d, name)) as f:
                return json.load(f)
        except (OSError, ValueError):
            continue
    return None


def _publish_without_link(tmp: str, final: str) -> bool:
    """Publish `tmp` as `final` on filesystems without hard links.

    Two-step: (1) reserve the snapshot id with an EMPTY O_CREAT|O_EXCL
    file — the create-exclusive race arbiter, zero payload bytes; then
    (2) land the already-fully-written tmp with os.replace, which is
    atomic, so the manifest is either absent/empty or complete — never
    truncated (the previous fallback json.dump'ed into the live file,
    and a crash mid-write wedged the chain permanently: every later
    committer saw the file exist, treated it as a lost race, and
    re-read an unparsable manifest forever).

    If the reservation already exists it is either a committed manifest
    (parsable → genuine lost race → False) or another committer's
    in-flight/dead reservation (unparsable). In-flight resolves in the
    microseconds between its reserve and replace, so wait briefly; a
    reservation still empty after the grace window means the reserver
    died between the two steps — adopt it via os.replace. A takeover
    that races the not-actually-dead reserver is resolved by the
    caller's read-back verification (both publishes are complete
    manifests; whoever's bytes survive wins, the other retries), so a
    commit can be delayed by a crash but not lost or torn."""
    try:
        fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        for _ in range(20):  # ~2s grace for an in-flight publisher
            try:
                with open(final) as f:
                    json.load(f)
                return False  # complete manifest — we lost the id race
            except (OSError, ValueError):
                time.sleep(0.1)
        # dead reservation — adopt it (see docstring for the race story)
    os.replace(tmp, final)
    return True


def commit_snapshot(
    output_dir: str, run_id: str, n_docs: int, checksum: int
) -> dict:
    """Append an immutable manifest chaining to the parent. The manifest
    lists ALL run_ids visible at this snapshot (parent's runs + this
    one), so a reader needs exactly one manifest.

    Concurrency: commit is a CAS, as Iceberg requires — the manifest is
    fully written to a tmp file and published with os.link() (create-
    exclusive + atomic); a committer that loses the race on snap-<n>
    retries against the new parent, so no commit is ever silently lost.
    Idempotent: a run_id already in the parent chain returns the existing
    manifest (streaming foreachBatch replays hit this). Readers resolve
    the current state from the max on-disk manifest (current_snapshot),
    so the commit is visible the instant the link lands; the CURRENT
    pointer file is refreshed only as a non-load-bearing debug hint (a
    racing hint write can lag, never the reader view)."""
    os.makedirs(_snap_dir(output_dir), exist_ok=True)
    while True:
        parent = _latest_manifest(output_dir)
        if parent and run_id in parent["run_ids"]:
            return parent  # already committed (replay) — no duplicate entry
        snap_id = (parent["snapshot_id"] + 1) if parent else 1
        manifest = {
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "run_ids": (parent["run_ids"] if parent else []) + [run_id],
            "n_docs_total": (parent["n_docs_total"] if parent else 0) + n_docs,
            "run_checksum": checksum,
            "committed_at_ms": int(time.time() * 1000),
        }
        import threading  # noqa: PLC0415

        uniq = f"{os.getpid()}-{threading.get_ident()}"
        name = f"snap-{snap_id:06d}.json"
        final = os.path.join(_snap_dir(output_dir), name)
        tmp = f"{final}.tmp-{uniq}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, final)  # the CAS: fails iff snap_id was taken
        except FileExistsError:
            os.unlink(tmp)
            continue  # lost the race — rebuild against the new parent
        except OSError:
            # filesystem without hard links (some object-store mounts:
            # EPERM/ENOTSUP) — see _publish_without_link. The O_EXCL open
            # there is ONLY the id reservation; the bytes always arrive
            # via an atomic os.replace of the fully-written tmp, so no
            # reader or crash ever observes a truncated live manifest.
            if not _publish_without_link(tmp, final):
                if os.path.exists(tmp):
                    os.unlink(tmp)
                continue  # lost the race — rebuild against the new parent
            # replace is publish-atomic but not compare-and-swap: a
            # takeover race (another committer adopting what looked like
            # a dead reservation) can overwrite this publish. Verify the
            # landed bytes carry our run_id; if not, we lost — retry on
            # the new parent, so no commit is ever silently dropped.
            try:
                with open(final) as f:
                    landed = json.load(f)
            except (OSError, ValueError):
                landed = None
            if not landed or run_id not in landed["run_ids"]:
                continue
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        cur_path = os.path.join(_snap_dir(output_dir), "CURRENT")
        # tmp name must be unique per THREAD, not just per process: two
        # in-process committers sharing one tmp path race write/replace
        # and the loser's os.replace hits FileNotFoundError
        cur_tmp = f"{cur_path}.tmp-{uniq}"
        with open(cur_tmp, "w") as f:
            f.write(name)
        os.replace(cur_tmp, cur_path)  # debug hint only, see docstring
        return manifest


def write_run_once(df: DataFrame, out_dir: str) -> None:
    """Replay-safe run-directory write for DETERMINISTIC outputs (same
    input → same rows, e.g. a streaming epoch's batch): a complete dir
    (_SUCCESS) is kept, a partial one (crash mid-write) is cleared and
    rewritten. NOT for state-dependent outputs — if the rows depend on
    other runs' committed state (incremental curation), an uncommitted
    dir may be stale and must be rewritten; see curate_incremental."""
    import shutil  # noqa: PLC0415

    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    df.write.mode("errorifexists").parquet(out_dir)


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
