"""Per-query isolation bench (round 6 optimization work).

bench.py is FROZEN for driver measurement; this separate harness times an
arbitrary subset of declared queries with the same methodology (same
session factory, same ``bit_xor(xxhash64(struct(*)))`` full-evaluation
collect, min-of-N with clearCache between repeats) so individual
optimizations can be measured without paying for the whole suite.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        ngram_jaccard dup_clusters [--repeats 2] [--plans plans/r06/tag]

With --plans PREFIX, writes ``PREFIX/<query>.txt`` containing
``.explain('formatted')`` output for each query before timing it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bb_ocr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as E

    args = [a for a in sys.argv[1:]]
    repeats = 2
    plans_prefix = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        elif args[i] == "--plans":
            plans_prefix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    allq = dict(E.queries())
    allq.update(E.extra_queries())
    if not names:
        names = list(E.queries())
    unknown = [n for n in names if n not in allq]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("bb_ocr_bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    out: dict[str, object] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = allq[name]
        if plans_prefix is not None:
            os.makedirs(plans_prefix, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(os.path.join(plans_prefix, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    df._jdf.queryExecution(), "formatted"
                ))
            spark.catalog.clearCache()
        best = float("inf")
        ss: list[float] = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).selectExpr(
                "bit_xor(xxhash64(struct(*)))"
            ).collect()
            dt = time.monotonic() - t0
            ss.append(round(dt, 3))
            best = min(best, dt)
        out[name] = round(best, 3)
        samples[name] = ss
        print(f"## {name}: {best:.3f}s {ss}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out,
                      "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
