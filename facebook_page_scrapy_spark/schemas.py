"""StructType registry for every engine table (see FIXTURES.md).

Mirrors the reference's data structures with typed Spark schemas:

- ``SPAN`` / ``DOCUMENTS``: the canonical interleaved text+media document shape
  from BASELINE.json ``input_hint`` — what the reference extractor produces per
  post HTML (text spans: ``Parse_Data_FaceBook/Parser.py:65-69``; media refs:
  ``Parser.py:52-63``; DOM order is the per-row invariant).
- ``FRONTIER``: the queue lists of the spiders
  (``Crawl_Data_FaceBook/spiders/Facebook_group_post.py:38``,
  ``Facebook_group_reaction.py:40-43``) as one table with priority classes
  CR_PAGE=1..CR_REACTION=4 (``Facebook_group_post.py:19-22``).
- ``POSTS`` / ``COMMENTS``: POST_OBJECT / COMMENT_OBJ (``db_config.py:90-135``)
  with typed nulls instead of drop_none (``Parser.py:11-19``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- canonical interleaved-span document (input_hint) ----------------------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'media'
        T.StructField("text", T.StringType(), False),  # '' when kind='media'
        T.StructField("media_ref", T.StringType(), False),  # '' when kind='text'
        T.StructField("offset", T.IntegerType(), False),  # 0-based DOM order
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN, containsNull=False), False),
    ]
)

# ---- crawl frontier ---------------------------------------------------------
# priority classes, reference Facebook_group_post.py:19-22
KIND_PRIORITY = {"page": 1, "post": 2, "comment": 3, "reaction": 4}

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("group_id", T.StringType(), True),
        T.StructField("post_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("enqueued_seq", T.LongType(), False),
        T.StructField("discovered_ts", T.LongType(), False),
        T.StructField("state", T.StringType(), False),  # pending|fetched|failed
        T.StructField("attempts", T.IntegerType(), False),
    ]
)

RAW_PAGES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("fetched_ts", T.LongType(), False),
        T.StructField("html", T.StringType(), False),
    ]
)

# ---- extracted records (POST_OBJECT db_config.py:90-118) --------------------
POSTS = T.StructType(
    [
        T.StructField("post_id", T.StringType(), False),
        T.StructField("page_id", T.StringType(), False),
        T.StructField("post_url", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("username", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("fetched_time", T.TimestampType(), True),
        T.StructField("publish_time", T.TimestampType(), True),
        T.StructField("images", T.ArrayType(T.StringType()), True),
        T.StructField("reactions", T.MapType(T.StringType(), T.IntegerType()), True),
        T.StructField("reaction_count", T.IntegerType(), True),
        T.StructField("comment_count", T.IntegerType(), True),
        T.StructField("share_count", T.IntegerType(), True),
        T.StructField("comments_full", T.ArrayType(T.StringType()), True),
        T.StructField("complete_crawl_comment", T.BooleanType(), True),
        T.StructField("medical_label", T.BooleanType(), True),
        T.StructField("spans", T.ArrayType(SPAN, containsNull=False), True),
    ]
)

# COMMENT_OBJ db_config.py:120-135
COMMENTS = T.StructType(
    [
        T.StructField("comment_id", T.StringType(), False),
        T.StructField("post_id", T.StringType(), False),
        T.StructField("page_id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("username", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("comment_url", T.StringType(), True),
        T.StructField("reaction_count", T.IntegerType(), True),
        T.StructField("reply_count", T.IntegerType(), True),
    ]
)

# ---- config tables ----------------------------------------------------------
SEEDS = T.StructType([T.StructField("group_id", T.StringType(), False)])

IDENTITIES = T.StructType(
    [
        T.StructField("identity_id", T.StringType(), False),
        T.StructField("blocked", T.BooleanType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
    ]
)

HOST_BUDGET = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("tokens_per_round", T.IntegerType(), False),
        T.StructField("min_interval_s", T.DoubleType(), False),
    ]
)

# ---- synthetic crawl world (parity tests) -----------------------------------
SITE_GRAPH = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("out_links", T.ArrayType(T.StringType(), False), False),
        T.StructField("doc_id", T.StringType(), False),
    ]
)

# ---- checkpoint lineage (north rule) ----------------------------------------
LINEAGE = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("frontier_offset", T.LongType(), False),
        T.StructField("bloom_shard_version", T.IntegerType(), False),
        T.StructField("fetched_count", T.LongType(), False),
        T.StructField("deduped_count", T.LongType(), False),
        T.StructField("parsed_count", T.LongType(), False),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)
