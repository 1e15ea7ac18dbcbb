"""Multimodal plumbing: binary media columns round-trip through real Spark
(mapInPandas generation → parquet → Arrow-batch feature extraction) with
deterministic results at any parallelism; the real decoder is stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bb_ocr_spark.sources.media import (
    decode_image,
    extract_image_features,
    fake_decode,
    fake_encode,
    frame_sample_plan,
    generate_media_df,
    have_real_decoder,
    resize_stub,
)


def test_fake_codec_roundtrip():
    b = fake_encode("media://d/1", 20, 10)
    w, h, arr = fake_decode(b)
    assert (w, h) == (20, 10) and arr.shape == (10, 20)
    assert fake_encode("media://d/1", 20, 10) == b  # deterministic


def test_decoder_stubbed():
    if not have_real_decoder():
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff")


def test_media_pipeline(spark, tmp_path):
    refs = spark.createDataFrame(
        [(f"media://doc{i}/{j}",) for i in range(20) for j in range(3)],
        "media_ref string",
    )
    media = generate_media_df(spark, refs)
    path = str(tmp_path / "media")
    media.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 60
    assert dict(back.dtypes)["content"] == "binary"

    feats = extract_image_features(back)
    rows = {r["media_ref"]: r for r in feats.collect()}
    assert len(rows) == 60
    r = rows["media://doc0/0"]
    assert r["width"] >= 16 and 0 <= r["mean_val"] <= 255
    assert sum(r["histogram"]) == r["width"] * r["height"]

    # determinism across parallelism: features at 1 partition == 8 partitions
    feats1 = {
        r["media_ref"]: (r["mean_val"], r["std_val"], r["edge_energy"])
        for r in extract_image_features(back.repartition(1)).collect()
    }
    feats8 = {
        r["media_ref"]: (r["mean_val"], r["std_val"], r["edge_energy"])
        for r in extract_image_features(back.repartition(8)).collect()
    }
    assert feats1 == feats8

    # metadata-only stage must prune the binary column from the scan
    meta_stage = resize_stub(back, max_side=32).select(
        "media_ref", "resize_ratio", "target_width", "target_height"
    )
    scan = meta_stage._jdf.queryExecution().executedPlan().toString()
    assert "content" not in scan.split("ReadSchema")[-1], "binary column not pruned"
    small = meta_stage.filter(F.col("resize_ratio") < 1.0).collect()
    for r in small:
        assert max(r["target_width"], r["target_height"]) <= 32


def test_frame_sample_plan():
    assert frame_sample_plan(10, 3) == [0, 3, 6, 9]
    assert frame_sample_plan(2, 0) == [0, 1]


def test_video_frame_sampling(spark):
    import numpy as np
    import pandas as pd

    from bb_ocr_spark.sources.media import (
        fake_decode_video,
        fake_encode_video,
        sample_video_frames,
    )

    vids = pd.DataFrame(
        {
            "media_ref": ["v0", "v1", "bad"],
            "content": [
                fake_encode_video("v0", 8, 6, 20),
                fake_encode_video("v1", 4, 4, 3),
                b"not a video",
            ],
        }
    )
    df = spark.createDataFrame(vids)
    out = sample_video_frames(df, every_n=8).collect()
    by_ref = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], []).append(r)
    # 20 frames sampled every 8 -> indices 0, 8, 16
    assert sorted(r["frame_idx"] for r in by_ref["v0"]) == [0, 8, 16]
    # sampled frame bytes equal the container's frame plane exactly
    _, _, _, frame = fake_decode_video(fake_encode_video("v0", 8, 6, 20))
    got8 = next(r for r in by_ref["v0"] if r["frame_idx"] == 8)
    assert bytes(got8["content"]) == frame(8).tobytes()
    assert got8["frame_mean"] == round(float(frame(8).mean()), 6)
    assert [r["frame_idx"] for r in by_ref["v1"]] == [0]
    # error-as-column: the corrupt payload yields one row with the error
    assert len(by_ref["bad"]) == 1 and by_ref["bad"][0]["error"]
    assert by_ref["bad"][0]["frame_idx"] is None


def test_audio_window_features(spark):
    import numpy as np
    import pandas as pd

    from bb_ocr_spark.sources.media import (
        audio_window_features,
        fake_decode_audio,
        fake_encode_audio,
    )

    auds = pd.DataFrame(
        {
            "media_ref": ["a0", "short", "bad"],
            "content": [
                fake_encode_audio("a0", 4096),
                fake_encode_audio("short", 100),  # < one window -> no rows
                b"junk",
            ],
        }
    )
    df = spark.createDataFrame(auds)
    out = audio_window_features(df, window=1024).collect()
    rows = [r for r in out if r["media_ref"] == "a0"]
    assert [r["win_idx"] for r in sorted(rows, key=lambda r: r["win_idx"])] == [0, 1, 2, 3]
    # numpy reference for window 1
    rate, pcm = fake_decode_audio(fake_encode_audio("a0", 4096))
    x = pcm[1024:2048].astype("float64")
    want_rms = round(float(np.sqrt((x * x).mean())), 6)
    want_zc = int((np.diff(np.signbit(x)) != 0).sum())
    r1 = next(r for r in rows if r["win_idx"] == 1)
    assert r1["rms"] == want_rms and r1["zero_crossings"] == want_zc
    assert r1["start_sec"] == round(1024 / rate, 6)
    assert not any(r["media_ref"] == "short" for r in out)
    bad = [r for r in out if r["media_ref"] == "bad"]
    assert len(bad) == 1 and bad[0]["error"]
