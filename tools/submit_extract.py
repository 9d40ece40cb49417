"""spark-submit entry point for the extraction job (north rule: launch
via ``spark-submit --py-files`` on a multi-executor cluster).

    spark-submit --master local[32] \
        --py-files /tmp/wtes_spark_pkg.zip \
        tools/submit_extract.py --gen 50000 --out /tmp/extract_out \
        --buckets 256

The script intentionally does NOT import from the repo path — only from
the --py-files zip — so it exercises exactly the cluster deployment
path. Input is either --input (a parquet dir of documents rows) or
--gen N (the deterministic generator). Resumable: re-submitting with the
same --out continues from the checkpoint table.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir of documents(doc_id, spans)")
    ap.add_argument("--gen", type=int, help="generate N synthetic documents")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=256)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("wtes-extract").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")

    from webtableextractionsystem_spark.checkpoint import CheckpointRunner
    from webtableextractionsystem_spark.datagen import gen_documents_df

    if args.gen:
        docs = gen_documents_df(spark, args.gen)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        raise SystemExit("need --input or --gen")

    runner = CheckpointRunner(spark, args.out, num_buckets=args.buckets)
    metrics = runner.run(docs)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
