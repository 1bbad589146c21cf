"""Naive-Python parity for tokenizer_fertility and lang_mix_by_source —
reimplements the langid argmax chain and the BPE-ish pre-tokenizer from the
published definitions (functions/text.py) and compares exactly."""

from __future__ import annotations

import re
from collections import defaultdict

import pyarrow.parquet as pq

from facebook_page_scrapy_spark import queries as Q
from facebook_page_scrapy_spark.functions import text as T

SF_DIR = "/root/testdata/sf0.001"
BPE = re.compile(T.BPE_REGEX)


def _langid(text: str) -> str:
    ws = [w for w in text.split(" ") if w]
    best_l, best_h = None, 0
    for lg, sw in T.STOPWORDS.items():
        h = sum(1 for w in ws if w.lower() in sw)
        if best_l is None or h > best_h:
            best_l, best_h = lg, h
    return best_l if best_h > 0 else "unknown"


def _docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"])
    return list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("source").to_pylist(),
            t.column("text").to_pylist(),
        )
    )


def test_tokenizer_fertility_matches_naive(spark):
    agg = defaultdict(lambda: [0, 0, 0])  # lang -> [n_docs, sum_ws, sum_bpe]
    corpus = [(d, t) for d, _, t in _docs()] + list(Q._FERT_PLANTED)
    for _, text in corpus:
        n_ws = len([w for w in text.split(" ") if w])
        if n_ws == 0:
            continue
        a = agg[_langid(text)]
        a[0] += 1
        a[1] += n_ws
        a[2] += len(BPE.findall(text))
    expected = {
        (lg, n, ws, bpe, (bpe * 1_000_000) // ws)
        for lg, (n, ws, bpe) in agg.items()
    }
    got = {
        (r.langid, r.n_docs, r.sum_ws, r.sum_bpe, r.fertility_e6)
        for r in Q.q_tokenizer_fertility(spark, SF_DIR).collect()
    }
    assert got == expected
    # the planted docs keep the readout discriminating
    assert any(f > 1_000_000 for *_, f in got)


def test_lang_mix_by_source_matches_naive(spark):
    cnt = defaultdict(int)
    tot = defaultdict(int)
    for _, src, text in _docs():
        cnt[(src, _langid(text))] += 1
        tot[src] += 1
    expected = {
        (s, lg, n, (n * 1_000_000) // tot[s]) for (s, lg), n in cnt.items()
    }
    got = {
        (r.source, r.langid, r.n_docs, r.share_e6)
        for r in Q.q_lang_mix_by_source(spark, SF_DIR).collect()
    }
    assert got == expected
