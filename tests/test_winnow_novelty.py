"""Independent-implementation parity for winnowing, gram novelty, and host
triangles: the driver oracle proves Spark↔DuckDB equality; these prove the
selection/counting logic against naive pure-Python over the same inputs."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import pyarrow.parquet as pq

from facebook_page_scrapy_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _gram_stream(spark):
    """(doc_id -> [(pos, hash), ...] ordered by pos) from the shared helper —
    hash-impl-agnostic: tests the selection math, not the fingerprint fn."""
    rows = Q._doc_grams(spark, SF_DIR).collect()
    by_doc: dict = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append((r.pos, r.gram_hash))
    for v in by_doc.values():
        v.sort()
    return by_doc


def test_winnowing_matches_naive_and_covers_every_window(spark):
    by_doc = _gram_stream(spark)
    w = Q._WINNOW_W
    expected = set()
    for did, grams in by_doc.items():
        for i in range(len(grams) - w + 1):
            window = grams[i : i + w]
            mh = min(h for _, h in window)
            # rightmost minimal hash
            pos = max(p for p, h in window if h == mh)
            expected.add((did, pos + 1, mh))  # 1-based fp_pos
    got = {
        (r.doc_id, r.fp_pos, r.gram_hash)
        for r in Q.q_winnowing_fingerprints(spark, SF_DIR).collect()
    }
    assert got == expected
    # the winnowing guarantee: every full window contains a selected pos
    sel = defaultdict(set)
    for did, pos, _ in got:
        sel[did].add(pos - 1)
    for did, grams in by_doc.items():
        for i in range(len(grams) - w + 1):
            assert any(p in sel[did] for p, _ in grams[i : i + w])


def test_gram_novelty_matches_naive(spark):
    by_doc = _gram_stream(spark)
    first: dict = {}
    for did in sorted(by_doc):
        for _, h in by_doc[did]:
            first.setdefault(h, did)
    expected = set()
    for did, grams in by_doc.items():
        hs = {h for _, h in grams}
        novel = sum(1 for h in hs if first[h] == did)
        expected.add((did, len(hs), novel, (novel * 1_000_000) // len(hs)))
    got = {
        (r.doc_id, r.n_grams, r.n_novel, r.novelty_e6)
        for r in Q.q_gram_novelty(spark, SF_DIR).collect()
    }
    assert got == expected


def _host_edges():
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id"])
    edges = set()
    for eid, uid in zip(
        t.column("event_id").to_pylist(), t.column("user_id").to_pylist()
    ):
        a, b = f"n{uid % 97}", f"n{(uid * 31 + eid) % 97}"
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return edges


def test_host_triangles_match_naive_enumeration(spark):
    edges = _host_edges()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    counts = {v: 0 for v in adj}
    for v in adj:
        for x, y in combinations(sorted(adj[v]), 2):
            if (min(x, y), max(x, y)) in edges:
                counts[v] += 1
    counts = {v: c // 1 for v, c in counts.items()}
    got = {
        (r.host, r.n_triangles)
        for r in Q.q_host_triangles(spark, SF_DIR).collect()
    }
    assert got == set(counts.items())
    assert sum(counts.values()) > 0  # non-vacuous: the graph has triangles


def test_host_communities_match_naive_lpa(spark):
    edges = _host_edges()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {v: int(v[1:]) for v in adj}
    per_iter = []
    for _ in range(Q._LPA_ITERS):
        new = {}
        for v in adj:
            votes: dict = defaultdict(int)
            for u in adj[v]:
                votes[labels[u]] += 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
        per_iter.append(labels)
    expected = {
        (v,) + tuple(it[v] for it in per_iter) + (per_iter[-1][v],) for v in adj
    }
    got = {
        (r.node,)
        + tuple(r[f"c{i}"] for i in range(1, Q._LPA_ITERS + 1))
        + (r.community,)
        for r in Q.q_host_communities(spark, SF_DIR).collect()
    }
    assert got == expected
    # sensitivity: iteration-1 labels are non-degenerate (many distinct votes)
    assert len({t[1] for t in got}) > 1


def test_host_kcore_matches_naive_peeling(spark):
    edges = _host_edges()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = {v: 1 for v in adj}
    expected_cols = {v: [v] for v in adj}
    for _ in range(Q._KCORE_ITERS):
        deg = {
            v: sum(1 for u in adj[v] if alive[u] == 1) for v in adj
        }
        new_alive = {
            v: 1 if alive[v] == 1 and deg[v] >= Q._KCORE_K else 0 for v in adj
        }
        for v in adj:
            expected_cols[v] += [deg[v], new_alive[v]]
        alive = new_alive
    expected = {tuple(cols) for cols in expected_cols.values()}
    got = {
        (r.node, r.d1, r.a1, r.d2, r.a2, r.d3, r.a3)
        for r in Q.q_host_kcore(spark, SF_DIR).collect()
    }
    assert got == expected
    # non-vacuous at sf0.001: some peeled, some survive
    survivors = sum(1 for t in got if t[-1] == 1)
    assert 0 < survivors < len(got)


def test_link_reciprocity_matches_naive(spark):
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id"])
    directed = set()
    for eid, uid in zip(
        t.column("event_id").to_pylist(), t.column("user_id").to_pylist()
    ):
        a, b = f"n{uid % 97}", f"n{(uid * 31 + eid) % 97}"
        if a != b:
            directed.add((a, b))
    expected = {}
    for a in {s for s, _ in directed}:
        outs = [d for s, d in directed if s == a]
        rec = sum(1 for d in outs if (d, a) in directed)
        expected[a] = (len(outs), rec, (rec * 1_000_000) // len(outs))
    got = {
        r.host: (r.n_out, r.n_recip, r.recip_e6)
        for r in Q.q_link_reciprocity(spark, SF_DIR).collect()
    }
    assert got == expected
    assert any(v[1] > 0 for v in got.values())  # reciprocal pairs exist
    assert any(v[1] < v[0] for v in got.values())  # and not everything is


def test_event_transitions_match_naive(spark):
    t = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    streams = defaultdict(list)
    for eid, uid, ts, et in zip(
        t.column("event_id").to_pylist(),
        t.column("user_id").to_pylist(),
        t.column("ts").to_pylist(),
        t.column("event_type").to_pylist(),
    ):
        streams[uid].append((ts, eid, et))
    cnt = defaultdict(int)
    for seq in streams.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    tot = defaultdict(int)
    for (a, _), n in cnt.items():
        tot[a] += n
    expected = {
        (a, b, n, (n * 1_000_000) // tot[a]) for (a, b), n in cnt.items()
    }
    got = {
        (r.from_type, r.to_type, r.n, r.share_e6)
        for r in Q.q_event_transitions(spark, SF_DIR).collect()
    }
    assert got == expected
