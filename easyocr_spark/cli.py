"""CLI entrypoint — the spark-submit twin of the reference's
``easyocr -l en -f image.png`` command line (reference
easyocr/cli.py:241-279).

Usage (also works under spark-submit --py-files):

    python -m easyocr_spark.cli --sf-dir /root/testdata/sf0.001 \
        --output /tmp/extracted --state /tmp/ocr_state --resume
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="easyocr-spark")
    p.add_argument("--sf-dir", required=True, help="input table directory")
    p.add_argument("--output", required=True, help="output parquet dir")
    p.add_argument("--state", default=None, help="state table dir (enables resume)")
    p.add_argument("--n-units", type=int, default=32)
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument(
        "--decoder", default="greedy", choices=["greedy", "beamsearch", "wordbeamsearch"]
    )
    p.add_argument(
        "--allowlist",
        default=None,
        help="restrict recognition to these characters (reference "
        "easyocr --allowlist; masks the other softmax classes)",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from easyocr_spark.operators import pipeline
    from easyocr_spark.session import get_spark
    from easyocr_spark.sources import tables
    from easyocr_spark.state import checkpoint

    # only stop the session if this invocation created it (getOrCreate
    # may hand back a caller's live session, e.g. under tests)
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="easyocr_spark_cli", cpus=args.cpus)
    docs = tables.interleaved_documents(spark, args.sf_dir)
    media = tables.media_table(spark, args.sf_dir)
    if args.state:
        snap = checkpoint.input_snapshot_id(args.sf_dir)
        res = checkpoint.run_extraction(
            spark,
            docs,
            media,
            args.output,
            args.state,
            n_units=args.n_units,
            snapshot_id=snap,
            decoder=args.decoder,
            allowlist=args.allowlist,
        )
        print(json.dumps(res))
    else:
        out = pipeline.extract_documents(
            docs, media, decoder=args.decoder, allowlist=args.allowlist
        )
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"docs": spark.read.parquet(args.output).count()}))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
