"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Covers the engine's two workload classes:
  - extraction: interleaved-spans corpus (generated deterministically at a
    size scaled to the sf dir) through the flagship zero-shuffle pipeline,
    the HTML tokenizer, the exploded/salted assembly path, and metadata
    extraction — reported also as docs/sec;
  - relational: every __spark_entry__.queries() entry at the sf dir.

Scaling-efficiency evidence (N vs 4N cores) lives in tools/scaling_bench.py
(separate JVMs per parallelism level) → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bb_ocr_spark import datagen  # noqa: E402
from bb_ocr_spark.functions.metadata import (  # noqa: E402
    extract_metadata_df,
    extract_metadata_full_df,
)
from bb_ocr_spark.operators.assemble import (  # noqa: E402
    assemble_spans,
    explode_spans,
    filter_spans,
)
from bb_ocr_spark.operators.extract import extract_inline  # noqa: E402
from bb_ocr_spark.operators.tokenizer import tokenize_html_expr  # noqa: E402
from bb_ocr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# docs scaled to sf: sf0.1 → 20k interleaved docs (incl. 20 mega-docs)
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_DOCS = max(int(200_000 * _SF), 2_000)
# the flagship docs/sec is measured on a 10x corpus: at 20k docs the
# wall time is ~all fixed job overhead (the 1M soak measured 98k docs/s
# where the 20k corpus suggested 25k) — 200k docs amortizes it while
# keeping the legacy rows comparable round-over-round
N_DOCS_XL = max(int(2_000_000 * _SF), 20_000)


def _corpus_path(kind: str) -> str:
    return f"/tmp/bb_ocr_bench/{kind}_v{datagen.DATAGEN_VERSION}_{N_DOCS}"


def prepare(spark) -> tuple[str, str, str]:
    """Materialize the interleaved + html corpora once (outside timing)."""
    spans_path = _corpus_path("spans")
    html_path = _corpus_path("html")
    xl_path = f"/tmp/bb_ocr_bench/spans_v{datagen.DATAGEN_VERSION}_{N_DOCS_XL}"
    if not os.path.isdir(spans_path):
        datagen.generate_df(spark, N_DOCS).write.mode("overwrite").parquet(spans_path)
    if not os.path.isdir(html_path):
        datagen.generate_html_df(spark, N_DOCS).write.mode("overwrite").parquet(
            html_path
        )
    if not os.path.isdir(xl_path):
        datagen.generate_df(spark, N_DOCS_XL).write.mode("overwrite").parquet(
            xl_path
        )
    return spans_path, html_path, xl_path


def warm_page_cache(*roots: str) -> None:
    """One untimed byte-level pass over every input parquet file. Spark's
    clearCache() drops executor blocks but the OS page cache persists — so
    without this, whichever timed query FIRST touches a table group after
    a clear absorbs that group's cold-read cost for everyone (r2 driver
    run: json_extract swung 0.35→3.6 s on a byte-identical query because
    it happened to be the first events-table read). Reading the raw bytes
    here pins all inputs hot before any sample is taken."""
    for root in roots:
        if not os.path.isdir(root):
            continue
        for dirpath, _, files in os.walk(root):
            for fn in files:
                if fn.endswith(".parquet"):
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        while f.read(1 << 22):
                            pass


_SPARK = None  # set in main(); timed() clears persisted data between runs
_SAMPLES: dict[str, list[float]] = {}  # per-repeat wall times, keyed by query


def timed(fn, repeats: int = 2, name: str | None = None) -> float:
    """min-of-N wall time: the first run pays cold OS page cache + JIT, so
    a single sample is hostage to 2-6x measured host noise (BENCH/
    BASELINE.md); the min is the reproducible number. Spark-persisted
    data is cleared between repeats — operators that persist internal
    subplans (minhash signatures, the ngram inverted index) must pay
    their full cost in every sample, not coast on the previous run.

    Every individual repeat is recorded in _SAMPLES and emitted as the
    "samples" field of the bench JSON, so a min that disagrees with the
    builder's measurement can be adjudicated from the record alone
    (noise shows as one bad sample among good ones; a real regression
    shows as uniformly slow samples)."""
    best = float("inf")
    samples: list[float] = []
    for _ in range(repeats):
        if _SPARK is not None:
            _SPARK.catalog.clearCache()
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        samples.append(round(dt, 3))
        best = min(best, dt)
    if name is not None:
        _SAMPLES[name] = samples
    return round(best, 3)


def main() -> None:
    global _SPARK
    spark = get_spark("bb_ocr_bench", cores=CPUS, shuffle_partitions=CPUS)
    _SPARK = spark
    spans_path, html_path, xl_path = prepare(spark)
    warm_page_cache(SF_DIR, "/tmp/bb_ocr_bench")
    spans_df = spark.read.parquet(spans_path)
    html_df = spark.read.parquet(html_path)
    spans_xl_df = spark.read.parquet(xl_path)

    q: dict[str, float] = {}

    # extraction workloads (count() forces full computation; results are
    # not collected to the driver)
    q["extract_inline"] = timed(
        lambda: extract_inline(spans_df).selectExpr(
            "sum(size(spans))"
        ).collect(),
        name="extract_inline",
    )
    q["extract_inline_xl"] = timed(
        lambda: extract_inline(spans_xl_df).selectExpr(
            "sum(size(spans))"
        ).collect(),
        name="extract_inline_xl",
    )
    q["tokenize_html"] = timed(
        lambda: tokenize_html_expr(html_df).selectExpr("sum(size(spans))").collect(),
        name="tokenize_html",
    )
    q["assemble_exploded"] = timed(
        lambda: assemble_spans(filter_spans(explode_spans(spans_df)))
        .selectExpr("sum(size(spans))")
        .collect(),
        name="assemble_exploded",
    )
    q["extract_metadata"] = timed(
        lambda: extract_metadata_df(spans_df).selectExpr(
            "count(isbn_13)", "count(year)", "count(genre)"
        ).collect(),
        name="extract_metadata",
    )
    q["extract_metadata_fullpipe"] = timed(
        lambda: extract_metadata_full_df(spans_df)
        .selectExpr("bit_xor(xxhash64(struct(*)))")
        .collect(),
        repeats=3,
        name="extract_metadata_fullpipe",
    )

    # relational workloads: every driver-contract query at SF_DIR.
    # bit_xor(xxhash64(struct(*))) forces evaluation of EVERY output column
    # — count(*) would let Catalyst prune projection-only queries down to a
    # bare parquet scan and time nothing but IO
    import __spark_entry__ as E

    # the query CALLABLE runs inside the timer, not just the collect:
    # iterative operators (dup_clusters' label-propagation loop with its
    # per-round checkpoints) do their real work at construction time, and
    # timing only the final collect would report a pre-computed result
    for name, fn in E.queries().items():
        q[name] = timed(
            lambda fn=fn: fn(spark, SF_DIR)
            .selectExpr("bit_xor(xxhash64(struct(*)))")
            .collect(),
            name=name,
        )

    total = round(sum(q.values()), 3)
    docs_per_sec = round(N_DOCS_XL / q["extract_inline_xl"], 1)
    print(
        json.dumps(
            {
                "metric": "total_runtime",
                "value": total,
                "unit": "sec",
                "queries": q,
                "sf": _SF,
                "n_interleaved_docs": N_DOCS,
                "n_interleaved_docs_xl": N_DOCS_XL,
                "extract_docs_per_sec": docs_per_sec,
                "cpus": CPUS,
                "samples": _SAMPLES,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
