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


def test_seq_batch_kernel_matches_row_loop_and_is_vectorized():
    # the vectorized kernel must be value-identical to the per-row loop it
    # replaced (bit-identical: cumsum accumulates sequentially) and beat it
    # by a wide margin on a 10^5-event micro-batch
    import time

    import numpy as np
    import pandas as pd

    from bb_ocr_spark.streaming.stateful import _seq_batch

    rng = np.random.RandomState(7)
    n = 100_000
    pdf = pd.DataFrame(
        {
            "user_id": np.full(n, 42, dtype="int64"),
            "event_id": rng.permutation(n).astype("int64"),
            "ts": rng.randint(0, 10_000, n).astype("int64"),
            "value": np.round(rng.rand(n) * 100, 3),
        }
    )

    def row_loop(pdf, key0, seq, cnt, total):
        pdf = pdf.sort_values(["ts", "event_id"])
        out = []
        for _, row in pdf.iterrows():
            seq += 1
            cnt += 1
            total += float(row["value"])
            # np.round here, matching the kernel: python round() is
            # decimal-correct and differs from IEEE scale-rounding by 0.01
            # at representation boundaries (e.g. totals near x.x95); the
            # operator's contract is np.round in BOTH stateful forms
            out.append(
                (key0, int(row["event_id"]), seq, cnt, float(np.round(total, 2)))
            )
        return (
            pd.DataFrame(
                out,
                columns=[
                    "user_id", "event_id", "seq",
                    "running_count", "running_value",
                ],
            ),
            seq, cnt, total,
        )

    t0 = time.time()
    want, wseq, wcnt, wtotal = row_loop(pdf, 42, 7, 7, 3.25)
    t_loop = time.time() - t0
    t0 = time.time()
    got, gseq, gcnt, gtotal = _seq_batch(pdf, 42, 7, 7, 3.25)
    t_vec = time.time() - t0

    assert (gseq, gcnt) == (wseq, wcnt)
    assert gtotal == wtotal  # sequential cumsum == sequential loop, bitwise
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )
    # iterrows is interpreter-speed; even on the noisiest host the
    # vectorized kernel wins by far more than 3x on 1e5 rows
    assert t_vec * 3 < t_loop, (t_vec, t_loop)

    # empty chunk: state passes through untouched
    out, s, c, t = _seq_batch(pdf.head(0), 42, 5, 5, 1.0)
    assert out is None and (s, c, t) == (5, 5, 1.0)
