"""spark-submit job script: documents parquet -> KG edges parquet.

Run on a cluster (north_rule packaging contract):

    spark-submit --master <cluster> --py-files renet2_spark.zip \
        scripts/submit_edges.py --input s3://corpus/documents \
        --output s3://kg/edges

The script imports renet2_spark ONLY from the shipped zip — it adds
nothing to sys.path itself (tests/test_submit.py runs it from a
foreign cwd to prove that).
"""

import argparse

from pyspark.sql import SparkSession


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("renet2_spark_submit").getOrCreate()
    from renet2_spark.plans.pipeline import build_edges  # from --py-files

    docs = spark.read.parquet(args.input).select("doc_id", "text")
    edges = build_edges(spark, docs)
    edges.write.mode("overwrite").parquet(args.output)
    print(f"SUBMIT_OK rows={spark.read.parquet(args.output).count()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
