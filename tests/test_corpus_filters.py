"""Semantic invariants for the r4 late-addition operator family
(quality filters, sub-document dedup, embedding analytics, crawl
scheduling, LM statistics) — the oracle gate (tools/check_oracles.py)
pins cross-engine value equality; these pin the *meaning* of the
numbers with independent naive recomputation on the sf0.001 corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from facebook_page_scrapy_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


def test_gopher_flags_consistent(spark):
    rows = Q.q_gopher_quality_filters(spark, SF).collect()
    assert rows
    for r in rows:
        expect = int(
            20 <= r["n_words"] <= 400
            and 2500 <= r["mean_word_len_e3"] <= 8000
            and r["stop_frac_e6"] >= 10000
        )
        assert r["keep_gopher"] == expect


def test_c4_counts_and_fingerprint(spark):
    rows = {r["doc_id"]: r for r in Q.q_c4_line_filters(spark, SF).collect()}
    docs = _docs(spark)
    import hashlib

    for doc_id, text in docs.items():
        words = [w for w in text.split(" ") if w]
        lines = [
            " ".join(words[i : i + 12]) for i in range(0, len(words), 12)
        ]
        kept = [
            ln
            for ln in lines
            if len(ln.split(" ")) >= 3 and "slow" not in ln.split(" ")
        ]
        r = rows[doc_id]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        assert r["kept_fp"] == hashlib.md5("\n".join(kept).encode()).hexdigest()


def test_entropy_bounds(spark):
    rows = Q.q_doc_char_entropy(spark, SF).collect()
    for r in rows:
        # alphabet is [a-z ] => H <= log2(27) bits
        assert 0 <= r["entropy_ubits"] <= int(math.log2(27) * 1e6) + 1


def test_line_dedup_naive_parity(spark):
    rows = {r["doc_id"]: r for r in Q.q_line_dedup(spark, SF).collect()}
    docs = _docs(spark)
    from collections import Counter

    all_lines = {}
    for doc_id, text in docs.items():
        words = [w for w in text.split(" ") if w]
        all_lines[doc_id] = [
            " ".join(words[i : i + 12]) for i in range(0, len(words), 12)
        ]
    freq = Counter(ln for lines in all_lines.values() for ln in lines)
    for doc_id, lines in all_lines.items():
        dups = sum(1 for ln in lines if freq[ln] >= 2)
        assert rows[doc_id]["n_lines"] == len(lines)
        assert rows[doc_id]["n_dup_lines"] == dups
    # the synthetic corpus plants boilerplate overlap: some dup lines exist
    assert sum(r["n_dup_lines"] for r in rows.values()) > 0


def test_soft_dedup_group_mass(spark):
    rows = Q.q_soft_dedup_weights(spark, SF).collect()
    for r in rows:
        assert r["weight_e6"] * r["dup_count"] <= 1_000_000
        assert (r["weight_e6"] + 1) * r["dup_count"] > 1_000_000
    assert any(r["dup_count"] > 1 for r in rows)  # planted shared heads


def test_pca_unit_norm_and_determinism(spark):
    a = {r["dim"]: r["pc1_e6"] for r in Q.q_pca_power_iteration(spark, SF).collect()}
    b = {r["dim"]: r["pc1_e6"] for r in Q.q_pca_power_iteration(spark, SF).collect()}
    assert a == b  # bit-stable across runs (quantized intermediates)
    norm2 = sum((v / 1e6) ** 2 for v in a.values())
    assert abs(norm2 - 1.0) < 1e-3


def test_pq_self_assignment(spark):
    rows = {r["vec_id"]: r for r in Q.q_pq_codes(spark, SF).collect()}
    for vid in range(8):
        r = rows[vid]
        for s in range(8):
            assert r[f"code{s}"] == vid  # a codebook vector encodes to itself
    for r in rows.values():
        for s in range(8):
            assert 0 <= r[f"code{s}"] < 8


def test_opic_cash_conservation(spark):
    rows = Q.q_opic_scores(spark, SF).collect()
    total_cash = sum(r["cash_e6"] for r in rows)
    # forwarding moves cash, sinks retain it: total is conserved (±rounding)
    assert abs(total_cash - len(rows) * 1_000_000) <= len(rows)


def test_mercator_occupancy_totals(spark):
    rows = Q.q_mercator_queues(spark, SF).collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n_urls"] for r in rows) == n_events
    assert all(1 <= r["front_q"] <= 4 and 0 <= r["back_q"] < 31 for r in rows)


def test_span_transitions_cover_every_span(spark):
    rows = Q.q_span_kind_transitions(spark, SF).collect()
    spans = Q._built_spans(spark, SF)
    assert sum(r["n_transitions"] for r in rows) == spans.count()
    assert {r["from_kind"] for r in rows} <= {"START", "text", "media"}


def test_media_integrity_planted_loss(spark):
    rows = Q.q_media_ref_integrity(spark, SF).collect()
    n_media = sum(r["n_media"] for r in rows)
    n_orph = sum(r["n_orphans"] for r in rows)
    assert all(0 <= r["n_orphans"] <= r["n_media"] for r in rows)
    # store drops (doc_id*7+span_idx)%5==0 => ~20% planted orphan rate
    assert 0.10 < n_orph / n_media < 0.30


def test_kn_counts_sum_to_bigram_count(spark):
    rows = Q.q_kn_continuation_counts(spark, SF).collect()
    docs = _docs(spark)
    bigrams = set()
    for text in docs.values():
        w = [x for x in text.split(" ") if x]
        bigrams.update(zip(w, w[1:]))
    assert sum(r["n_precede"] for r in rows) == len(bigrams)
    assert sum(r["n_follow"] for r in rows) == len(bigrams)


def test_rake_degree_dominates_freq(spark):
    rows = Q.q_rake_keywords(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["degree"] >= r["freq"]  # phrase_len >= 1 per occurrence
        assert r["rake_e6"] >= 1_000_000


def test_unigram_scores_negative_and_bounded(spark):
    rows = Q.q_unigram_lm_scores(spark, SF).collect()
    vocab = set()
    for text in _docs(spark).values():
        vocab.update(x for x in text.split(" ") if x)
    floor = math.log(1.0 / sum(len([x for x in t.split(" ") if x]) for t in _docs(spark).values()))
    for r in rows:
        assert floor * 1e6 <= r["avg_logp_e6"] < 0
