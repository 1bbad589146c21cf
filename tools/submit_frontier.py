"""spark-submit entry point for the north-rule frontier-throughput job.

Cluster launch (N and 4N executors; the north rule's two-cluster-size
scaling criterion compares the printed ``urls_per_sec``):

    cd /root/repo && zip -qr /tmp/fps_spark.zip facebook_page_scrapy_spark

    spark-submit \\
        --num-executors 8  --executor-cores 4 --executor-memory 8g \\
        --py-files /tmp/fps_spark.zip \\
        tools/submit_frontier.py --n-urls 10000000000 --n-hosts 1000000 \\
        --work-dir /mnt/shared/frontier_bloom

    spark-submit --num-executors 32 ... (same otherwise)

``--work-dir`` must be a SHARED filesystem path on a real cluster (the
bloom shards are opened by executor-side Python workers); omit it on
``--master local[N]`` smoke runs, where a driver tempdir suffices:

    spark-submit --master local[8] --py-files /tmp/fps_spark.zip \\
        tools/submit_frontier.py --n-urls 1000000

Prints ONE JSON line: {"urls": ..., "hosts": ..., "dispatched": ...,
"sec": ..., "urls_per_sec": ..., "parallelism": ...}.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-urls", type=int, default=4_000_000)
    ap.add_argument("--n-hosts", type=int, default=10_000)
    ap.add_argument("--work-dir", default=None,
                    help="shared dir for bloom shards (required on a real cluster)")
    args = ap.parse_args()

    # Under spark-submit the master/executor topology comes from the launch
    # command; never override it here.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("frontier_throughput")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from facebook_page_scrapy_spark.jobs import frontier_throughput

    r = frontier_throughput(
        spark, n_urls=args.n_urls, n_hosts=args.n_hosts, work_dir=args.work_dir
    )
    r["parallelism"] = spark.sparkContext.defaultParallelism
    print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
