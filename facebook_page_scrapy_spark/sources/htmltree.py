"""Distributed HTML file-tree source (the reference's offline-parse input).

Reference semantics reproduced (``Parse_Data_FaceBook/parsing.py:20-47``):
``extract_post_dirs`` walks ``INPUT_DIR/<group_id>/posts/<post_id>/`` and
``get_htmls`` keeps only files matching ``\\.html`` (SURVEY P11). Here the
walk is Spark's ``binaryFile`` source with ``pathGlobFilter=*.html`` — the
extension filter is applied in the FILE INDEX (files never open, the P11
predicate pushed below the scan), and listing parallelizes across the
driver-side index + executor reads instead of a serial ``os.listdir``. At
100 TB of crawl output this is the right shape: one row per file, content
read once, group/post derived from the path — no driver-side directory
walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_html_tree(spark: SparkSession, root: str) -> DataFrame:
    """``root/<group_id>/posts/<post_id>/*.html`` → one row per HTML file:
    ``(path, group_id, post_id, file_name, html)``. Files not ending in
    ``.html`` are excluded by the glob before any read (P11); shallower
    layouts still load with empty group/post columns."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return df.select(
        "path",
        F.regexp_extract("path", r"([^/]+)/posts/[^/]+/[^/]+$", 1).alias("group_id"),
        F.regexp_extract("path", r"/posts/([^/]+)/[^/]+$", 1).alias("post_id"),
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file_name"),
        F.decode(F.col("content"), "utf-8").alias("html"),
    )
