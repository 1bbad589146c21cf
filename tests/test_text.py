from __future__ import annotations

from pyspark.sql import functions as F

from facebook_page_scrapy_spark.functions import text as tx


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame([("the quick brown fox, jumps!",), ("",)], "t string")
    out = df.select(
        tx.token_count_ws(F.col("t")).alias("ws"),
        tx.token_count_bpe(F.col("t")).alias("bpe"),
        tx.punct_count(F.col("t")).alias("punct"),
        tx.quality_score(F.col("t")).alias("q"),
        tx.fingerprint(F.col("t")).alias("fp"),
    ).collect()
    assert out[0].ws == 5
    # the|quick|brown|fox|,|jumps|! -> 7
    assert out[0].bpe == 7
    assert out[0].punct == 2
    assert 0.0 <= out[0].q <= 1.0
    assert out[0].fp > 0
    assert out[1].ws == 0 and out[1].bpe == 0 and out[1].fp == 0


def test_langid_deterministic(spark):
    df = spark.createDataFrame(
        [("the cat is in the hat",), ("el gato y la casa de que",), ("zzz qqq",)], "t string"
    )
    got = [r.l for r in df.select(tx.langid(F.col("t")).alias("l")).collect()]
    assert got == ["en", "es", "unknown"]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d e f",)], "t string")
    got = df.select(tx.shingles(F.col("t"), 5).alias("s")).collect()[0].s
    assert got == ["a b c d e", "b c d e f"]
    # shorter than k -> empty
    df2 = spark.createDataFrame([("a b",)], "t string")
    assert df2.select(tx.shingles(F.col("t"), 5).alias("s")).collect()[0].s == []
