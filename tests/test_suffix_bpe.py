"""Tests for the round-2 additions: prefix-doubled suffix ranks, the
large-star/small-star CC scale path, and distributed BPE training.

The driver's oracle gate covers the generated corpus (suffix_ranks,
neardup_clusters_star, bpe_pair_counts carry exact DuckDB oracles); these
tests pin the semantics on hand-checkable inputs and assert the parity
claims the docstrings make (star CC == propagation CC; distributed BPE ==
a pure-Python reference trainer on the same vocabulary).
"""

from __future__ import annotations

import pytest

from facebook_page_scrapy_spark import queries as Q

P = Q._MH_P
SF_DIR = "/root/testdata/sf0.001"


def _fp(word: str) -> int:
    padded = (word + "xxxxxxxx")[:8]
    return sum(ord(c) * (131 ** j) for j, c in enumerate(padded)) % P


def _ref_suffix_ranks(texts: list[tuple[int, str]], horizon: int):
    """(gpos, doc_id, rank): dense rank of each position's horizon-truncated
    suffix over the concatenated token stream, docs in doc_id order."""
    stream: list[tuple[int, int]] = []  # (doc_id, fp)
    for doc_id, text in sorted(texts):
        for w in text.split(" "):
            if w:
                stream.append((doc_id, _fp(w)))
    fps = [fp for _, fp in stream]
    sufs = [tuple(fps[i : i + horizon]) for i in range(len(fps))]
    order = {s: r + 1 for r, s in enumerate(sorted(set(sufs)))}
    return [(i, stream[i][0], order[sufs[i]]) for i in range(len(stream))]


@pytest.fixture()
def tiny_docs(spark, tmp_path):
    rows = [
        (1, "a b c a b c a b", "en", "s1", 15),
        (2, "b c a b x", "en", "s1", 9),
        (3, "zz", "en", "s2", 2),
        (4, "", "en", "s2", 0),  # empty: excluded from the stream
        (5, "a b c a b c a b", "en", "s2", 15),  # exact dup of doc 1
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path), rows


def test_suffix_ranks_hand_computed(spark, tiny_docs):
    path, rows = tiny_docs
    got = sorted(
        (r.gpos, r.doc_id, r.sa_rank)
        for r in Q.q_suffix_ranks(spark, path).collect()
    )
    want = sorted(_ref_suffix_ranks([(d, t) for d, t, *_ in rows], Q._SA_HORIZON))
    assert got == want


def test_suffix_ranks_equal_rank_iff_equal_window(spark, tiny_docs):
    """Positions share a rank exactly when their horizon windows are equal —
    doc 5 repeats doc 1's text, so all of doc 1's suffixes that fit inside
    the repeated span tie with doc 5's."""
    path, rows = tiny_docs
    ranks = {
        r.gpos: r.sa_rank for r in Q.q_suffix_ranks(spark, path).collect()
    }
    stream = []
    for doc_id, text, *_ in sorted(rows):
        for w in text.split(" "):
            if w:
                stream.append(_fp(w))
    h = Q._SA_HORIZON
    for i in ranks:
        for j in ranks:
            same_window = tuple(stream[i : i + h]) == tuple(stream[j : j + h])
            assert (ranks[i] == ranks[j]) == same_window, (i, j)


def test_suffix_ranks_full_matches_reference(spark, tiny_docs):
    """Fixpoint mode == the true suffix array: ranks match a pure-Python
    full-suffix sort and form a permutation 1..n (all distinct)."""
    path, rows = tiny_docs
    got = sorted(
        (r.gpos, r.doc_id, r.sa_rank)
        for r in Q.q_suffix_ranks_full(spark, path).collect()
    )
    want = sorted(_ref_suffix_ranks([(d, t) for d, t, *_ in rows], 10**9))
    assert got == want
    ranks = sorted(r for _, _, r in got)
    assert ranks == list(range(1, len(ranks) + 1))


def test_suffix_ranks_full_refines_horizon_and_collapses_dup_spans(spark, tmp_path):
    """On a corpus with a genuine ≥32-token repeat: the 32-horizon ranks tie
    (sa_dup_spans flags the repeated span) while the full ranks are strictly
    finer — they never invert the horizon order (prefix property) and leave
    no rank-group duplicates (dup detection from a full SA is LCP-based,
    not rank-equality)."""
    shared = " ".join(f"s{i}" for i in range(40))
    rows = [
        (1, shared + " enda", "en", "s1", 4),
        (2, shared + " endb", "en", "s1", 4),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    path = str(tmp_path)

    dup = Q.q_sa_dup_spans(spark, path).collect()
    assert len(dup) >= 1  # the shared 40-token prefix ties at horizon 32
    assert any(r.n_docs == 2 for r in dup)

    r32 = {r.gpos: r.sa_rank for r in Q.q_suffix_ranks(spark, path).collect()}
    rf = {r.gpos: r.sa_rank for r in Q.q_suffix_ranks_full(spark, path).collect()}
    assert set(r32) == set(rf)
    assert sorted(rf.values()) == list(range(1, len(rf) + 1))  # no ties left
    for i in r32:
        for j in r32:
            if r32[i] < r32[j]:
                assert rf[i] < rf[j], (i, j)


def test_star_cc_matches_propagation(spark):
    prop = {
        (r.doc_id, r.cluster_rep)
        for r in Q.q_neardup_clusters(spark, SF_DIR).collect()
    }
    star = {
        (r.doc_id, r.cluster_rep)
        for r in Q.q_neardup_clusters_star(spark, SF_DIR).collect()
    }
    assert star == prop
    assert len(star) > 0


def _ref_bpe(vocab: dict[str, int], n_merges: int):
    """Pure-Python reference BPE trainer with the same tie-break
    (count desc, left asc, right asc) and greedy left-to-right merges."""
    syms = {w: [ord(c) for c in w] for w in vocab}
    merges = []
    for step in range(n_merges):
        counts: dict[tuple[int, int], int] = {}
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + vocab[w]
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        new = Q._BPE_NEW_SYM + step
        merges.append((step, a, b, new, n))
        for w, s in syms.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(new)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = res
    return merges


def test_bpe_learn_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    vocab: dict[str, int] = {}
    for r in docs:
        for w in r.text.split(" "):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    want = _ref_bpe(vocab, Q._BPE_MERGES)
    got = [
        (r.step, r.left_sym, r.right_sym, r.new_sym, r.pair_count)
        for r in Q.q_bpe_learn(spark, SF_DIR).orderBy("step").collect()
    ]
    assert got == want
    assert len(got) == Q._BPE_MERGES


def test_bpe_pair_counts_hand(spark, tmp_path):
    rows = [
        (1, "ab ab ba", "en", "s1", 8),
        (2, "aab", "en", "s1", 3),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.a, r.b): r.n
        for r in Q.q_bpe_pair_counts(spark, str(tmp_path)).collect()
    }
    # vocab: ab×2, ba×1, aab×1 → pairs: (a,b): 2 (from "ab") + 1 (from "aab"),
    # (b,a): 1, (a,a): 1
    assert got == {
        (ord("a"), ord("b")): 3,
        (ord("b"), ord("a")): 1,
        (ord("a"), ord("a")): 1,
    }


def test_bpe_encode_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    vocab: dict[str, int] = {}
    for r in docs:
        for w in r.text.split(" "):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    merges = _ref_bpe(vocab, Q._BPE_MERGES)

    def enc_len(wd: str) -> int:
        s = [ord(c) for c in wd]
        for _, a, b, new, _n in merges:
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(new)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            s = res
        return len(s)

    want = {}
    for r in docs:
        ws = [w for w in r.text.split(" ") if w]
        nb = sum(enc_len(w) for w in ws)
        want[r.doc_id] = (
            len(ws), nb, (1000000 * nb) // len(ws) if ws else 0,
        )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.tokens_per_word_e6)
        for r in Q.q_bpe_encode(spark, SF_DIR).collect()
    }
    assert got == want
    # merges actually fire: some doc must compress below its char count
    assert any(
        got[d.doc_id][1] < sum(len(w) for w in d.text.split(" ") if w)
        for d in docs
    )
