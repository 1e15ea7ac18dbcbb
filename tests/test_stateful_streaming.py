"""applyInPandasWithState: monotone per-key seq numbers survive across
micro-batches (maxFilesPerTrigger forces multiple batches)."""

from __future__ import annotations

import os
import shutil

import pytest

from bb_ocr_spark.streaming.events import read_events_stream, run_to_memory
from bb_ocr_spark.streaming.stateful import seq_numbered_stream


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    # several files → several micro-batches (maxFilesPerTrigger=4)
    d = str(tmp_path_factory.mktemp("ev_split"))
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    df.repartition(8).write.mode("overwrite").parquet(d)
    shutil.rmtree(os.path.join(d, "_temporary"), ignore_errors=True)
    return d


def test_seq_numbers_monotone_across_batches(spark, split_events_dir):
    stream = seq_numbered_stream(read_events_stream(spark, split_events_dir))
    run_to_memory(stream, "seq_out", output_mode="append")
    rows = spark.sql("SELECT * FROM seq_out").collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    n_events = spark.read.parquet(split_events_dir).count()
    assert sum(len(v) for v in by_user.values()) == n_events
    for uid, rs in by_user.items():
        seqs = sorted(r["seq"] for r in rs)
        assert seqs == list(range(1, len(rs) + 1)), f"user {uid} seq gap"
        # running_count mirrors seq; running_value is non-decreasing in seq
        rs.sort(key=lambda r: r["seq"])
        assert all(r["running_count"] == r["seq"] for r in rs)


def test_tws_equals_apply_in_pandas_with_state(spark, split_events_dir):
    # the modern transformWithStateInPandas form must emit exactly the
    # rows of the applyInPandasWithState form on a multi-batch stream
    from bb_ocr_spark.streaming.stateful import have_tws, seq_numbered_stream_tws

    if not have_tws():
        with pytest.raises(NotImplementedError):
            seq_numbered_stream_tws(read_events_stream(spark, split_events_dir))
        pytest.skip("transformWithStateInPandas needs protobuf (absent here)")

    stream = seq_numbered_stream_tws(read_events_stream(spark, split_events_dir))
    run_to_memory(stream, "seq_out_tws", output_mode="append")
    a = {
        tuple(r) for r in spark.sql(
            "SELECT user_id, event_id, seq, running_count, running_value FROM seq_out_tws"
        ).collect()
    }
    stream2 = seq_numbered_stream(read_events_stream(spark, split_events_dir))
    run_to_memory(stream2, "seq_out_ref", output_mode="append")
    b = {
        tuple(r) for r in spark.sql(
            "SELECT user_id, event_id, seq, running_count, running_value FROM seq_out_ref"
        ).collect()
    }
    assert a == b and a
