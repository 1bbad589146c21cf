from __future__ import annotations

from pyspark.sql import functions as F

from facebook_page_scrapy_spark.functions import urls


def canon_many(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [r.c for r in df.select(urls.canonicalize(F.col("url")).alias("c")).collect()]


def test_lowercase_scheme_host_and_fbclid(spark):
    got = canon_many(
        spark,
        [
            "HTTPS://MBASIC.Facebook.COM/groups/g1?b=2&a=1&fbclid=JUNK123",
            "https://mbasic.facebook.com/groups/g1?a=1&b=2",
            "https://mbasic.facebook.com:443/groups/g1?fbclid",
            "http://example.com:80/Path/Is/CaseSensitive",
            "https://m.facebook.com/groups/g1#frag",
        ],
    )
    assert got[0] == "https://mbasic.facebook.com/groups/g1?a=1&b=2"
    assert got[0] == got[1]
    assert got[2] == "https://mbasic.facebook.com/groups/g1"
    assert got[3] == "http://example.com/Path/Is/CaseSensitive"
    # m. -> mbasic. rewrite (debug_empty_text.py:115) + fragment dropped
    assert got[4] == "https://mbasic.facebook.com/groups/g1"


def test_empty_path_and_idempotence(spark):
    raw = ["https://Example.COM?z=1&y=2", "https://example.com/?y=2&z=1"]
    got = canon_many(spark, raw)
    assert got[0] == "https://example.com/?y=2&z=1"
    assert got[0] == got[1]
    # idempotent
    assert canon_many(spark, got) == got


def test_classify_and_extract(spark):
    rows = [
        ("https://mbasic.facebook.com/groups/abc", "page", "abc", None),
        ("https://mbasic.facebook.com/groups/abc/permalink/123/?refid=18", "post", "abc", "123"),
        ("https://mbasic.facebook.com/groups/abc/posts/123/?p=10", "comment", "abc", "123"),
        ("https://mbasic.facebook.com/ufi/reaction/?ft_ent_identifier=9", "reaction", "", "9"),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in rows], "url string")
    out = df.select(
        F.col("url"),
        urls.classify_kind(F.col("url")).alias("kind"),
        urls.group_id_of(F.col("url")).alias("gid"),
        urls.post_id_of(F.col("url")).alias("pid"),
    ).collect()
    for (u, kind, gid, pid), r in zip(rows, out):
        assert r.kind == kind, u
        assert r.gid == gid, u
        assert r.pid == pid, u


def test_priority_order_matches_reference(spark):
    # CR_PAGE=1 .. CR_REACTION=4 (Facebook_group_post.py:19-22)
    df = spark.createDataFrame(
        [("page",), ("post",), ("comment",), ("reaction",)], "kind string"
    )
    got = {r.kind: r.p for r in df.select("kind", urls.priority_of(F.col("kind")).alias("p")).collect()}
    assert got == {"page": 1, "post": 2, "comment": 3, "reaction": 4}


def test_comment_offset(spark):
    df = spark.createDataFrame(
        [("https://mbasic.facebook.com/groups/a/posts/1/?p=30",), ("https://x.com/",)],
        "url string",
    )
    got = [r.o for r in df.select(urls.comment_offset_of(F.col("url")).alias("o")).collect()]
    assert got == [30, None]
