"""Semantic property tests for the DSIR importance-weight and span
context-budget operators: the driver oracle proves cross-engine equality;
these prove the outputs mean what the operators promise (DSIR up-weights
the target slice; truncation keeps an in-order prefix within budget)."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_page_scrapy_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_dsir_upweights_the_target_slice(spark):
    """The whole point of DSIR: documents drawn from the target
    distribution (here the English slice) must score higher on average
    than the rest of the raw pool, by a wide margin."""
    out = Q.q_dsir_weights(spark, SF_DIR)
    rows = (
        out.groupBy((F.col("lang") == "en").alias("is_target"))
        .agg(F.avg("dsir_e6").alias("mean_w"), F.count("*").alias("n"))
        .collect()
    )
    means = {r.is_target: r.mean_w for r in rows}
    # Laplace smoothing (+1/+B with n_t << n_r) biases every sum slightly
    # negative, so compare slices, not signs: the target slice must sit far
    # above the rest (measured ~ -0.4M vs -3.4M micro-units at sf0.001).
    assert means[True] > means[False] + 1_000_000
    # and not vacuous: both slices populated
    ns = {r.is_target: r.n for r in rows}
    assert ns[True] >= 50 and ns[False] >= 50


def test_dsir_feature_count_is_bigram_count(spark):
    """n_feat must equal the document's bigram count (word_count - 1,
    floored at 0) — the exact normalizer a resampler divides by."""
    from facebook_page_scrapy_spark.functions import text as T

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.size(T.words(F.lower(F.col("text")))).alias("nw")
    )
    out = Q.q_dsir_weights(spark, SF_DIR).join(docs, "doc_id")
    bad = out.filter(
        F.col("n_feat") != F.greatest(F.col("nw") - 1, F.lit(0))
    ).count()
    assert bad == 0


def test_span_budget_kept_is_an_in_order_prefix(spark):
    """Once a span exceeds the budget, every later span in that doc is
    dropped too (costs are non-negative so cum_tok is monotone): kept
    must be 1..1 0..0 per doc, with span 0 always surviving."""
    out = Q.q_span_budget_truncate(spark, SF_DIR)
    w = F.min(F.when(F.col("kept") == 0, F.col("span_idx")))
    per = out.groupBy("doc_id").agg(
        w.alias("first_drop"),
        F.max(F.when(F.col("kept") == 1, F.col("span_idx"))).alias("last_keep"),
        F.min(F.when(F.col("span_idx") == 0, F.col("kept"))).alias("first_kept"),
    )
    assert per.filter(F.col("first_kept") != 1).count() == 0
    # prefix property: the last kept index sits strictly before the first drop
    assert (
        per.filter(
            F.col("first_drop").isNotNull()
            & (F.col("last_keep") >= F.col("first_drop"))
        ).count()
        == 0
    )


def test_span_budget_costs_and_running_total(spark):
    out = Q.q_span_budget_truncate(spark, SF_DIR)
    # media spans cost exactly the fixed vision-token constant
    assert (
        out.filter(
            (F.col("kind") == "media") & (F.col("cost_tok") != Q._MEDIA_TOK_COST)
        ).count()
        == 0
    )
    # cum_tok is the exact running sum of cost_tok in span order
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("span_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chk = out.withColumn("rs", F.sum("cost_tok").over(w))
    assert chk.filter(F.col("rs") != F.col("cum_tok")).count() == 0
    # kept prefix (beyond the forced first span) fits the budget
    assert (
        out.filter(
            (F.col("kept") == 1)
            & (F.col("span_idx") > 0)
            & (F.col("cum_tok") > Q._SPAN_BUDGET)
        ).count()
        == 0
    )
