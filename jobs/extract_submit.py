"""spark-submit entrypoint for the extraction job.

Cluster usage (north_rule packaging contract):

    python tools/make_pyfiles.py                     # -> dist/bb_ocr_spark.zip
    spark-submit --py-files dist/bb_ocr_spark.zip \
        jobs/extract_submit.py \
        --input  <interleaved parquet/iceberg path> \
        --output <results dir> \
        [--run-id RUN] [--generate N]

The session comes from spark-submit's conf on a cluster (master, executor
sizing); locally the bb_ocr_spark defaults apply. `--generate N` materializes
the deterministic synthetic corpus first (driver-free, distributed) — for
smoke runs and scaling measurements.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--generate", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from bb_ocr_spark import datagen
    from bb_ocr_spark.plans.extract_job import run_extract_job

    spark = SparkSession.builder.appName("bb_ocr_extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.generate:
        datagen.write_parquet(spark, args.generate, args.input)

    documents = spark.read.parquet(args.input)
    stats = run_extract_job(spark, documents, args.output, run_id=args.run_id)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
