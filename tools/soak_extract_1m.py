"""Flagship extraction at 1M interleaved docs (~25M spans, incl. the
0.1% mega-doc tail at 2k-8k spans) — a decade more scale than the
100k-doc soak, cross-validated:

  - extract_inline (the zero-shuffle hot path) and the salted
    exploded-assembly path must agree on BOTH the total span count and
    the order-sensitive per-doc checksum xor — two independent plans,
    one answer;
  - throughput is reported as docs/sec and spans/sec with JVM peak RSS.

Corpus is generated once under /tmp/bb_ocr_soak (deterministic datagen;
the write is itself a distributed 1M-doc mapInPandas job and is timed
too — ingest evidence). Usage: python tools/soak_extract_1m.py
→ writes BENCH/SOAK_1M_r04.md + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bb_ocr_spark import datagen  # noqa: E402
from bb_ocr_spark.session import get_spark  # noqa: E402
from tools.soak_bench import jvm_peak_rss_gb  # noqa: E402

N_DOCS = 1_000_000
PATH = f"/tmp/bb_ocr_soak/spans_v{datagen.DATAGEN_VERSION}_{N_DOCS}"


def main() -> None:
    spark = get_spark("bb_ocr_soak_1m", cores=32, shuffle_partitions=64)
    gen_s = None
    if not os.path.isdir(PATH):
        t0 = time.monotonic()
        datagen.write_parquet(spark, N_DOCS, PATH, partitions=64)
        gen_s = round(time.monotonic() - t0, 1)
    spans = spark.read.parquet(PATH)

    from bb_ocr_spark.operators.assemble import (
        assemble_spans,
        explode_spans,
        filter_spans,
    )
    from bb_ocr_spark.operators.extract import (
        checksum_spans_col,
        extract_inline,
    )

    def run(df):
        out = df.withColumn("ck", checksum_spans_col(F.col("spans")))
        row = out.selectExpr(
            "bit_xor(ck) AS x", "sum(size(spans)) AS n_spans",
            "count(*) AS n_docs",
        ).collect()[0]
        return row["x"], int(row["n_spans"]), int(row["n_docs"])

    # warm-up pass (JIT + page cache), then min-of-2 timed
    run(extract_inline(spans))
    inline_best = None
    for _ in range(2):
        t0 = time.monotonic()
        ck_i, n_spans_i, n_docs_i = run(extract_inline(spans))
        dt = time.monotonic() - t0
        inline_best = dt if inline_best is None or dt < inline_best else inline_best

    t0 = time.monotonic()
    ck_a, n_spans_a, n_docs_a = run(
        assemble_spans(filter_spans(explode_spans(spans)))
    )
    assemble_s = round(time.monotonic() - t0, 1)

    assert n_docs_i == N_DOCS, n_docs_i
    assert (ck_i, n_spans_i) == (ck_a, n_spans_a), (
        (ck_i, n_spans_i), (ck_a, n_spans_a),
    )
    # assembly drops docs whose spans ALL died (only-boilerplate docs);
    # inline keeps them as empty arrays — doc counts differ by exactly
    # the empty set
    empties = (
        extract_inline(spans).filter(F.size("spans") == 0).count()
    )
    assert n_docs_i - n_docs_a == empties, (n_docs_i, n_docs_a, empties)

    result = {
        "n_docs": N_DOCS,
        "n_spans_out": n_spans_i,
        "gen_sec": gen_s,
        "extract_sec": round(inline_best, 1),
        "extract_docs_per_sec": round(N_DOCS / inline_best, 0),
        "extract_spans_per_sec": round(n_spans_i / inline_best, 0),
        "assemble_salted_sec": assemble_s,
        "checksum_equal": True,
        "jvm_peak_gb": jvm_peak_rss_gb(),
    }
    with open(os.path.join(REPO, "BENCH", "SOAK_1M_r04.md"), "w") as f:
        f.write(
            "# SOAK — 1M-document extraction (round 4)\n\n"
            "One decade past the 100k soak: 1,000,000 interleaved docs "
            "(~25M spans incl. the 0.1% mega-doc tail at 2k-8k spans), "
            "local[32], 64 shuffle partitions, default heap. The "
            "zero-shuffle inline path and the salted exploded-assembly "
            "path — two independent plans — must agree on the total span "
            "count AND the order-sensitive per-doc checksum xor; doc-count "
            "difference must equal exactly the all-boilerplate empty set.\n\n"
            f"```json\n{json.dumps(result, indent=2)}\n```\n\n"
            "No OOM at default heap; the mega-doc tail rides the salted "
            "two-phase assembly without a hot reduce key. Wall times carry "
            "this host's documented 2-6x noise; the checksum equality and "
            "peak-memory survival are the evidence this file exists for.\n"
        )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
