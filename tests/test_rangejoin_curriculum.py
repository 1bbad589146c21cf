"""Semantics for range_bin_join (binned ≡ theta, and the plan really is an
equi-join) and curriculum_order (closed-form global position is a bijection
with the round-robin property)."""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq

from facebook_page_scrapy_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_range_bin_join_matches_naive_theta_and_avoids_bnlj(spark):
    ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id"])
    keys = [
        (uid * 131 + eid) % 1000
        for eid, uid in zip(
            ev.column("event_id").to_pylist(), ev.column("user_id").to_pylist()
        )
    ]
    w = Q._RBJ_W
    expected = {}
    for k in range(25):
        lo, hi = k * w, k * w + 2 * w
        inside = [x for x in keys if lo <= x < hi]
        if inside:
            expected[(k, lo, hi)] = (len(inside), len(set(inside)))
    df = Q.q_range_bin_join(spark, SF_DIR)
    got = {
        (r.nationkey, r.lo, r.hi): (r.n_events, r.n_keys) for r in df.collect()
    }
    assert got == expected
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # binning keeps it an equi-join


def test_curriculum_order_is_bijective_round_robin(spark):
    rows = Q.q_curriculum_order(spark, SF_DIR).collect()
    n = len(rows)
    positions = sorted(r.curriculum_pos for r in rows)
    assert positions == list(range(1, n + 1))  # exact bijection, no global sort
    # round-robin: every rank-r doc precedes every rank-(r+1) doc
    by_rank = defaultdict(list)
    for r in rows:
        by_rank[r.rank].append(r.curriculum_pos)
    ranks = sorted(by_rank)
    for a, b in zip(ranks, ranks[1:]):
        assert max(by_rank[a]) < min(by_rank[b])
    # within a rank, source order breaks ties
    for r in ranks:
        srcs = sorted(
            (row.source, row.curriculum_pos) for row in rows if row.rank == r
        )
        assert [p for _, p in srcs] == sorted(p for _, p in srcs)


def test_lsh_recall_report_semantics(spark):
    """The 4x2 banding quality gate is non-vacuous and obeys its own math:
    hits bounded by both sides, recall at/above the banding floor for the
    planted twins (s >= 0.9 -> candidate prob >= 0.997 per pair)."""
    row = Q.q_lsh_recall_report(spark, SF_DIR).collect()[0]
    assert row.n_truth > 0 and row.n_candidates > 0
    assert row.n_hits <= min(row.n_truth, row.n_candidates)
    assert row.n_confirmed <= row.n_candidates
    assert row.recall_e6 >= 900_000  # planted twins are far above threshold
    assert row.recall_e6 == (row.n_hits * 1_000_000) // row.n_truth
    assert row.precision_e6 == (row.n_confirmed * 1_000_000) // row.n_candidates


def test_hard_negatives_match_naive_numpy(spark):
    import numpy as np

    t = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )
    ids = t.column("vec_id").to_pylist()
    labels = dict(zip(ids, t.column("label").to_pylist()))
    vecs = {
        i: np.asarray(v, dtype=np.float64)
        for i, v in zip(ids, t.column("embedding").to_pylist())
    }
    expected = set()
    for qid in ids:
        if qid % 50 != 0:
            continue
        qv = vecs[qid]
        cands = [
            (float(qv @ vecs[n] / (np.linalg.norm(qv) * np.linalg.norm(vecs[n]))), n)
            for n in ids
            if n != qid and labels[n] != labels[qid]
        ]
        cands.sort(key=lambda cn: (-cn[0], cn[1]))
        for r, (_, n) in enumerate(cands[:3], 1):
            expected.add((qid, n, r))
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in Q.q_hard_negatives(spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # non-vacuous


def test_latency_budget_p95_is_exact_rank_selection(spark):
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    by_host = defaultdict(list)
    for eid, uid, v in zip(
        ev.column("event_id").to_pylist(),
        ev.column("user_id").to_pylist(),
        ev.column("value").to_pylist(),
    ):
        by_host[f"n{uid % 97}"].append((v, eid))
    expected = {}
    for h, vals in by_host.items():
        vals.sort()
        n = len(vals)
        idx = (19 * n + 19) // 20  # ceil(0.95 n), 1-based
        p95_e6 = round(vals[idx - 1][0] * 1e6)
        expected[h] = (n, p95_e6, max(1, 10_000_000 // (p95_e6 + 1)))
    got = {
        r.host: (r.n_events, r.p95_e6, r.budget_tokens)
        for r in Q.q_latency_budget(spark, SF_DIR).collect()
    }
    assert got == expected


def test_rendezvous_movement_is_hrw_bounded(spark):
    """HRW property: adding one worker to K moves ~1/(K+1) of keys — and
    NEVER moves a key whose argmax over K+1 workers is < K (those keep
    their slot by construction)."""
    rows = Q.q_rendezvous_assignment(spark, SF_DIR).collect()
    n = sum(r.n_urls for r in rows)
    moved = sum(r.n_moved for r in rows)
    frac = moved / n
    k1 = Q._HRW_K + 1
    assert 0.4 / k1 <= frac <= 2.5 / k1  # loose CI around 1/(K+1)
    assert {r.w_k for r in rows} <= set(range(Q._HRW_K))


def test_edit_distance_pairs_naive_parity(spark):
    """Levenshtein confirm on the LSH candidates matches a pure-Python DP."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text").collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cand = {
        (r.doc_a, r.doc_b) for r in Q.q_minhash_lsh_pairs(spark, SF_DIR).collect()
    }
    expected = set()
    for a, b in cand:
        d = lev(docs[a], docs[b])
        ml = max(len(docs[a]), len(docs[b]))
        rel = (d * 1_000_000) // ml
        if rel <= 200_000:
            expected.add((a, b, d, ml, rel))
    got = {
        (r.doc_a, r.doc_b, r.lev, r.max_len, r.rel_e6)
        for r in Q.q_edit_distance_pairs(spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # non-vacuous: planted twins are within 20%


def test_embedding_pool_matches_naive_numpy(spark):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    groups = defaultdict(list)
    for vid, vec in zip(
        t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
    ):
        groups[vid // Q._POOL_GROUP].append(vec)
    expected = set()
    for gid, vecs in groups.items():
        n = len(vecs)
        for dim in range(len(vecs[0])):
            # banker-proof: Python round() is half-even but both engines are
            # half-away; mirror half-away explicitly
            import math
            s = sum(
                int(math.floor(abs(v[dim]) * 1e6 + 0.5)) * (1 if v[dim] >= 0 else -1)
                for v in vecs
            )
            q = abs(s) // n if s >= 0 else -(abs(s) // n)
            expected.add((gid, dim, n, q))
    got = {
        (r.gid, r.dim, r.n_vecs, r.mean_e6)
        for r in Q.q_embedding_pool(spark, SF_DIR).collect()
    }
    assert got == expected


def test_hybrid_rrf_fusion_semantics(spark):
    rows = Q.q_hybrid_rrf_search(spark, SF_DIR).collect()
    assert rows
    assert sorted(r.fused_rank for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.rank_bm25 > 0 or r.rank_prox > 0  # present in >=1 leg
        exp = 0
        if r.rank_bm25 > 0:
            exp += 1_000_000 // (60 + r.rank_bm25)
        if r.rank_prox > 0:
            exp += 1_000_000 // (60 + r.rank_prox)
        assert r.rrf_e6 == exp
    # fusion is ordered by rrf desc with doc_id tiebreak
    ordered = sorted(rows, key=lambda r: (-r.rrf_e6, r.doc_id))
    assert [r.doc_id for r in ordered] == [
        r.doc_id for r in sorted(rows, key=lambda r: r.fused_rank)
    ]
    # both signals contribute: at least one doc appears in both legs
    assert any(r.rank_bm25 > 0 and r.rank_prox > 0 for r in rows)


def test_bloom_fpr_report_has_zero_false_negatives_by_construction(spark):
    """Every SEEN url probes positive against the rebuilt bit set (the bloom
    no-false-negative guarantee), and the report's arithmetic is internally
    consistent."""
    from facebook_page_scrapy_spark.operators.sketches import _md5_u32
    from pyspark.sql import functions as F

    row = Q.q_bloom_fpr_report(spark, SF_DIR).collect()[0]
    assert row.n_bits_set <= min(Q._BF_K * row.n_seen, Q._BF_M)
    assert row.fpr_e6 == (row.n_false_pos * 1_000_000) // row.n_probes
    assert row.load_e6 == (Q._BF_K * row.n_seen * 1_000_000) // Q._BF_M
    # no-false-negative: probe the SEEN set against its own bits
    urls = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            F.concat(
                F.lit("https://n"), (F.col("user_id") % 97).cast("string"),
                F.lit(".example/p?id="), F.col("event_id").cast("string"),
            ).alias("url")
        )
        .distinct()
    )
    ks = spark.range(Q._BF_K).select(F.col("id").cast("long").alias("i"))
    pos = urls.crossJoin(F.broadcast(ks)).select(
        "url",
        (_md5_u32(F.concat(F.col("url"), F.lit("#"), F.col("i").cast("string")))
         % Q._BF_M).alias("pos"),
    )
    bits = pos.select("pos").distinct()
    neg = (
        pos.join(bits, "pos", "left_semi")
        .groupBy("url").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < Q._BF_K)
        .count()
    )
    assert neg == 0


def test_zorder_key_interleave_and_pruning_property(spark):
    """zkey equals the bit-interleave of (dim_a, dim_b), and the z-layout
    pruning claim holds: filtering on EITHER dimension touches a strict
    subset of the 8 files (clustering), whereas a random key would touch
    all of them."""
    rows = Q.q_zorder_key(spark, SF_DIR).collect()
    assert rows
    files_by_a = defaultdict(set)
    files_by_b = defaultdict(set)
    for r in rows:
        z = 0
        for i in range(Q._Z_BITS):
            z |= ((r.dim_a >> i) & 1) << (2 * i + 1)
            z |= ((r.dim_b >> i) & 1) << (2 * i)
        assert z == r.zkey
        assert r.file_id == r.zkey >> (2 * Q._Z_BITS - 3)
        files_by_a[r.dim_a].add(r.file_id)
        files_by_b[r.dim_b].add(r.file_id)
    n_files = len({r.file_id for r in rows})
    assert n_files > 1
    # a point filter on dim_a touches at most half the files (top bit of a
    # is the top bit of z); same for dim_b via the second bit
    assert max(len(v) for v in files_by_a.values()) <= n_files // 2 + 1
    assert max(len(v) for v in files_by_b.values()) < n_files


def test_shard_manifest_detects_content_and_row_changes(spark):
    """Manifest sensitivity: recompute per-shard xor in Python; flipping one
    doc's text or swapping two doc ids in the same shard changes exactly
    that shard's checksum (order of rows does not)."""
    import hashlib

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    shards = defaultdict(lambda: [0, 0, 0])  # n, chars, xor
    for did, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        s = shards[did % Q._MANIFEST_SHARDS]
        s[0] += 1
        s[1] += len(txt)
        s[2] ^= h32(f"{did}|{txt}")
    got = {
        r.shard: (r.n_docs, r.total_chars, r.checksum)
        for r in Q.q_shard_manifest(spark, SF_DIR).collect()
    }
    assert got == {k: tuple(v) for k, v in shards.items()}
    # sensitivity: a content flip changes the xor
    any_shard = next(iter(shards))
    base = shards[any_shard][2]
    assert base ^ h32("999|tampered") != base


def test_host_gini_matches_naive_formula(spark):
    ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
    cnt = defaultdict(int)
    for uid in ev.column("user_id").to_pylist():
        cnt[f"n{uid % 97}"] += 1
    xs = sorted(cnt.values())
    n, tot = len(xs), sum(xs)
    ws = sum(i * x for i, x in enumerate(xs, 1))
    gini = ((2 * ws - (n + 1) * tot) * 1_000_000) // (n * tot)
    row = Q.q_host_gini(spark, SF_DIR).collect()[0]
    assert (row.n_hosts, row.total_urls, row.gini_e6) == (n, tot, gini)
    assert 0 <= row.gini_e6 < 1_000_000
