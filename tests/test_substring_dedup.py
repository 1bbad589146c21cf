"""Unit tests for the exact-substring / mixing / classifier operator family
(duplicate_ngrams, dup_span_coverage, quality_classifier, source_mixing,
domain_quality_rollup, doc_containment) on hand-crafted documents — the
driver's oracle gate covers the generated corpus; these pin per-row semantics
on cases small enough to verify by hand."""

from __future__ import annotations

import pytest

from facebook_page_scrapy_spark import queries as Q

P = 2147483647
QC_MULT = 2654435761

BASE16 = " ".join(f"w{i}" for i in range(16))          # exactly one 16-gram
OTHER20 = " ".join(f"z{i}" for i in range(20))          # 5 grams, all unique
# a 40-word doc fully containing BASE16's word set: containment 1.0 but
# Jaccard only 16/40 = 0.4 — the pair class a Jaccard-LSH gate misses
CONTAINER40 = BASE16 + " " + " ".join(f"q{i}" for i in range(24))


@pytest.fixture()
def docs_dir(spark, tmp_path):
    rows = [
        (1, BASE16, "en", "s1", len(BASE16)),
        (2, BASE16, "en", "s1", len(BASE16)),            # exact dup of 1
        (3, "pad " + BASE16, "en", "s2", len(BASE16) + 4),  # contains 1's gram
        (4, OTHER20, "en", "s2", len(OTHER20)),
        (5, "x", "en", "s2", 1),                         # shorter than a window
        (6, CONTAINER40, "en", "s2", len(CONTAINER40)),  # fully contains 1
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_duplicate_ngrams_hand_computed(spark, docs_dir):
    rows = Q.q_duplicate_ngrams(spark, docs_dir).collect()
    # exactly one 16-word span is shared: BASE16, carried by docs 1, 2, 3
    # and by CONTAINER40's opening window in doc 6
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_docs, r.n_occ, r.first_doc) == (4, 4, 1)


def test_dup_span_coverage_hand_computed(spark, docs_dir):
    got = {r.doc_id: r for r in Q.q_dup_span_coverage(spark, docs_dir).collect()}
    assert (got[1].n_grams, got[1].n_dup, got[1].coverage_e6) == (1, 1, 1000000)
    assert (got[2].n_grams, got[2].n_dup, got[2].coverage_e6) == (1, 1, 1000000)
    # doc 3: windows ["pad w0..w14", "w0..w15"]; only the second is shared
    assert (got[3].n_grams, got[3].n_dup, got[3].coverage_e6) == (2, 1, 500000)
    assert (got[4].n_grams, got[4].n_dup, got[4].coverage_e6) == (5, 0, 0)
    # shorter than one window: present with zeros, no div-by-zero
    assert (got[5].n_grams, got[5].n_dup, got[5].coverage_e6) == (0, 0, 0)
    # doc 6: 25 windows, only the opening BASE16 window is shared
    assert (got[6].n_grams, got[6].n_dup, got[6].coverage_e6) == (25, 1, 40000)


def _word_fp(w: str) -> int:
    padded = (w + "xxxxxxxx")[:8]
    return sum(ord(c) * 131**j for j, c in enumerate(padded))


def _qc_weight(w: str) -> int:
    return ((_word_fp(w) % P) % 64) * QC_MULT % 1997 - 998


def test_quality_classifier_matches_reference_arithmetic(spark, docs_dir):
    got = {r.doc_id: r for r in Q.q_quality_classifier(spark, docs_dir).collect()}
    for doc_id, text in ((1, BASE16), (4, OTHER20), (5, "x")):
        expected = sum(_qc_weight(w) for w in text.split(" ") if w)
        assert got[doc_id].score == expected
        assert got[doc_id].keep == (1 if expected > 0 else 0)
    assert set(got) == {1, 2, 3, 4, 5, 6}  # every doc scored, none dropped


def test_source_mixing_deterministic_threshold(spark, docs_dir):
    rows = Q.q_source_mixing(spark, docs_dir).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3, 4, 5, 6}
    for r in rows:
        assert 50000 <= r.weight_ppm <= 950000
        assert r.u == r.doc_id * QC_MULT % 1000000
        assert r.kept == (1 if r.u < r.weight_ppm else 0)
    # same source -> same weight (it is a per-source dim, not per-doc noise)
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, set()).add(r.weight_ppm)
    assert all(len(ws) == 1 for ws in by_source.values())


def test_domain_quality_rollup_consistency(spark, docs_dir):
    rows = {r.source: r for r in Q.q_domain_quality_rollup(spark, docs_dir).collect()}
    assert rows["s1"].n_docs == 2 and rows["s2"].n_docs == 4
    for r in rows.values():
        assert r.avg_quality_e6 == r.sum_quality_e6 // r.n_docs
        assert r.low_quality == (1 if r.avg_quality_e6 < 600000 else 0)


def test_doc_containment_exact_recall(spark, docs_dir):
    rows = Q.q_doc_containment(spark, docs_dir).collect()
    pair = {(r.doc_a, r.doc_b): r for r in rows}
    # identical docs: containment 1.0 both ways
    assert pair[(1, 2)].cont_a == 1.0 and pair[(1, 2)].cont_b == 1.0
    # the pair class a Jaccard-LSH gate misses: doc 1 (16 words) fully
    # inside doc 6 (40 words), Jaccard 0.4 but cont_a = 1.0 — the exact
    # prefix filter MUST find it
    assert pair[(1, 6)].cont_a == 1.0
    assert pair[(2, 6)].cont_a == 1.0
    # prefix filtering is exact: the output equals the quadratic ground
    # truth recomputed from the word sets — no misses, no extras
    texts = {1: BASE16, 2: BASE16, 3: "pad " + BASE16, 4: OTHER20,
             5: "x", 6: CONTAINER40}
    expected = {}
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            wa, wb = set(texts[i].split()), set(texts[j].split())
            ca = round(len(wa & wb) / len(wa), 6)
            cb = round(len(wa & wb) / len(wb), 6)
            if ca >= 0.9 or cb >= 0.9:
                expected[(i, j)] = (ca, cb)
    assert {(k, (r.cont_a, r.cont_b)) for k, r in pair.items()} == set(
        expected.items()
    )
