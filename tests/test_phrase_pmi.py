"""Independent-implementation parity for the phrase-search and PMI
collocation operators: the driver oracle proves Spark↔DuckDB equality; these
prove both match a naive pure-Python scan (the semantics, not the engines)."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from facebook_page_scrapy_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return {
        int(d): [w for w in t_.split(" ") if w != ""]
        for d, t_ in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }


def test_phrase_search_matches_naive_scan(spark):
    docs = _docs()
    expected = set()
    for qid in Q._PHRASE_SEED_DOCS:
        phrase = docs[qid][: Q._PHRASE_LEN]
        assert len(phrase) == Q._PHRASE_LEN
        for did, ws in docs.items():
            for i in range(len(ws) - Q._PHRASE_LEN + 1):
                if ws[i : i + Q._PHRASE_LEN] == phrase:
                    expected.add((qid, did, i + 1))  # 1-based match_pos
    got = {
        (r.query_id, r.doc_id, r.match_pos)
        for r in Q.q_phrase_search(spark, SF_DIR).collect()
    }
    assert got == expected
    # non-vacuous: each seed doc matches its own prefix at position 1
    for qid in Q._PHRASE_SEED_DOCS:
        assert (qid, qid, 1) in got


def test_pmi_collocations_match_naive_counts(spark):
    docs = _docs()
    uni: Counter = Counter()
    bi: Counter = Counter()
    for ws in docs.values():
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n = sum(uni.values())
    expected = {
        (w1, w2, c, uni[w1], uni[w2], ((c * 1_000_000) // uni[w1]) * n // uni[w2])
        for (w1, w2), c in bi.items()
        if c >= Q._PMI_MIN_COUNT
    }
    got = {
        (r.w1, r.w2, r.c_xy, r.c_x, r.c_y, r.pmi_e6)
        for r in Q.q_pmi_collocations(spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # non-vacuous at sf0.001
