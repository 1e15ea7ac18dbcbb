"""FIXTURES.md §1 skew tail at full size: a 10^5-span doc must extract and
assemble correctly (and without OOM) on both the inline and the salted
exploded paths."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bb_ocr_spark import oracle
from bb_ocr_spark.operators.assemble import assemble_spans, explode_spans, filter_spans
from bb_ocr_spark.operators.extract import extract_inline

N_SPANS = 100_000


def _mega_doc():
    rng = random.Random("mega:1e5")
    spans = []
    for off in range(N_SPANS):
        r = rng.random()
        if r < 0.7:
            spans.append(
                {
                    "kind": "text",
                    "text": f"line {off} word{rng.randrange(50)} content",
                    "media_ref": None,
                    "offset": off,
                }
            )
        elif r < 0.85:
            spans.append(
                {"kind": "media", "text": None, "media_ref": f"m://x/{off}", "offset": off}
            )
        else:
            spans.append(
                {"kind": "boilerplate", "text": "footer nav", "media_ref": None, "offset": off}
            )
    rng.shuffle(spans)
    return spans


def test_mega_doc_both_paths(spark):
    spans = _mega_doc()
    golden = oracle.extract_doc(spans)
    assert len(golden) > 50_000

    rows = [("mega", [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])]
    df = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )

    inline = extract_inline(df).collect()[0]["spans"]
    assert [(s["kind"], s["text"], s["media_ref"]) for s in inline] == golden

    salted = assemble_spans(
        filter_spans(explode_spans(df)), salt_threshold=512, salt_buckets=16
    ).collect()[0]["spans"]
    assert [(s["kind"], s["text"], s["media_ref"]) for s in salted] == golden

    # salting must actually engage: phase-1 groups > 1
    exploded = filter_spans(explode_spans(df))
    n_groups = (
        exploded.withColumn("salt", F.pmod(F.col("offset"), F.lit(16)))
        .select("doc_id", "salt")
        .distinct()
        .count()
    )
    assert n_groups == 16
