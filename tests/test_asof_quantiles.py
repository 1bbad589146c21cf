"""Hand-computed cases for the as-of join and exact-quantile operators
(the driver's oracle gate covers the generated corpus; these pin the tie
and boundary semantics on inputs small enough to verify by eye)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_page_scrapy_spark import queries as Q

EPOCH = 1704067200


@pytest.fixture()
def asof_events(spark, tmp_path):
    # (event_id, offset_s, user, type, value)
    rows = [
        (1, 10, 7, "purchase", 5.0),    # update at t+10
        (2, 10, 7, "purchase", 9.0),    # same-ts duplicate: max event_id wins
        (3, 5, 7, "view", 0.0),         # probe BEFORE any update -> -1
        (4, 10, 7, "click", 0.0),       # probe AT update ts -> 9.0 (<= semantics)
        (5, 20, 7, "view", 0.0),        # probe after -> 9.0
        (6, 30, 7, "purchase", 2.0),    # later update
        (7, 40, 7, "click", 0.0),       # -> 2.0
        (8, 40, 8, "view", 0.0),        # other user, no updates -> -1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, off long, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.lit(EPOCH) + F.col("off")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_budget_join_hand(spark, asof_events):
    got = {
        r.event_id: r.asof_value
        for r in Q.q_asof_budget_join(spark, asof_events).collect()
    }
    assert got == {3: -1.0, 4: 9.0, 5: 9.0, 7: 2.0, 8: -1.0}


def test_asof_null_update_wins(spark, tmp_path):
    """An update whose value is NULL still wins the as-of match (ASOF JOIN
    semantics): an older non-NULL value must not leak forward past it."""
    rows = [
        (1, 10, 7, "purchase", 5.0),
        (2, 20, 7, "purchase", None),   # latest update, NULL value
        (3, 30, 7, "view", 0.0),        # -> -1.0, NOT 5.0
    ]
    spark.createDataFrame(
        rows, "event_id long, off long, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.lit(EPOCH) + F.col("off")).alias("ts"),
        "user_id", "event_type", "value", F.lit("{}").alias("props"),
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.event_id: r.asof_value
           for r in Q.q_asof_budget_join(spark, str(tmp_path)).collect()}
    assert got == {3: -1.0}


def test_asof_same_ts_null_nonnull_dedup(spark, tmp_path):
    """The build-side dedup over a (user_id, ts) group mixing NULL and
    non-NULL values must be decided by event_id alone (max event_id wins,
    NULL-safe) — the max_by(value, event_id) divergence flagged in round-2
    ADVICE: DuckDB's max_by skips NULL-arg rows while Spark's does not."""
    rows = [
        # user 7: NULL at the max event_id -> dedup keeps NULL -> -1.0
        (1, 10, 7, "purchase", 5.0),
        (2, 10, 7, "purchase", None),
        (3, 20, 7, "view", 0.0),
        # user 8: non-NULL at the max event_id over an earlier NULL -> 7.0
        (4, 10, 8, "purchase", None),
        (5, 10, 8, "purchase", 7.0),
        (6, 20, 8, "click", 0.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, off long, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.lit(EPOCH) + F.col("off")).alias("ts"),
        "user_id", "event_type", "value", F.lit("{}").alias("props"),
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.event_id: r.asof_value
           for r in Q.q_asof_budget_join(spark, str(tmp_path)).collect()}
    assert got == {3: -1.0, 6: 7.0}


def test_length_deciles_hand(spark, tmp_path):
    # 10 docs with token lengths 1..10 -> decile d has rank d and value d
    rows = [(i, " ".join(["w"] * i), "en", "s1", 2 * i) for i in range(1, 11)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        (r.decile, r.rank, r.len_tokens)
        for r in Q.q_length_deciles(spark, str(tmp_path)).collect()
    )
    assert got == [(d, d, d) for d in range(1, 11)]


def test_length_deciles_with_ties(spark, tmp_path):
    # 5 docs of length 3 and 5 of length 8: any rank <=5 reads 3, >5 reads 8
    rows = [(i, " ".join(["w"] * (3 if i <= 5 else 8)), "en", "s1", 1)
            for i in range(1, 11)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.decile: r.len_tokens
           for r in Q.q_length_deciles(spark, str(tmp_path)).collect()}
    assert got == {d: (3 if d <= 5 else 8) for d in range(1, 11)}


def test_kmeans_step_hand(spark, tmp_path):
    # 8 distinct directions seed the 8 centroids (quantization rescales
    # every vector to max-abs 127, so each seed's codes are its direction
    # at radius 127); two extra vectors land where hand arithmetic says.
    seeds = [
        (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0]), (4, [1.0, -1.0]),
        (5, [-1.0, 0.0]), (6, [0.0, -1.0]), (7, [-1.0, 1.0]), (8, [-1.0, -1.0]),
    ]
    extras = [
        (9, [0.5, 0.0]),   # codes (127, 0): cluster 0, d2 = 0
        (10, [0.9, 1.0]),  # codes (114, 127): nearest is seed (1,1) -> 13^2
    ]
    rows = [(i, v, 0) for i, v in seeds + extras]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        # new_codes ships as a comma-joined string (driver-hashable)
        r.cluster: (r.n_members, r.wss, [int(x) for x in r.new_codes.split(",")])
        for r in Q.q_kmeans_step(spark, str(tmp_path)).collect()
    }
    assert got[0] == (2, 0, [127, 0])
    assert got[2] == (2, 169, [120, 127])  # floor((127+114)/2) = 120
    for singleton, codes in [
        (1, [0, 127]), (3, [127, -127]), (4, [-127, 0]),
        (5, [0, -127]), (6, [-127, 127]), (7, [-127, -127]),
    ]:
        assert got[singleton] == (1, 0, codes)


def _edge_event(eid_base: int, s: int, d: int):
    """Build an events row that _link_edges_df maps to edge n<s> -> n<d>:
    src = user_id % 97, dst = (user_id*31 + event_id) % 97."""
    e = (d - 31 * s) % 97
    return (eid_base * 97 + e, e, s)


def test_seed_distance_hand(spark, tmp_path):
    # n0 -> n20 -> n21 ; disconnected n30 -> n31 ;
    # chain n1 -> n40 -> ... -> n46 (n46 is 7 hops out: beyond the cap)
    wanted_edges = [(0, 20), (20, 21), (30, 31), (1, 40)] + [
        (40 + i, 41 + i) for i in range(6)
    ]
    rows = []
    for k, (s, d) in enumerate(wanted_edges):
        eid, _e, _s = _edge_event(k + 1, s, d)
        rows.append((eid, s))
    df = spark.createDataFrame(rows, "event_id long, user_id long").select(
        "event_id",
        F.timestamp_seconds(F.lit(EPOCH) + F.col("event_id")).alias("ts"),
        "user_id",
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.host: r.dist
           for r in Q.q_seed_distance(spark, str(tmp_path)).collect()}
    want = {"n0": 0, "n20": 1, "n21": 2, "n30": -1, "n31": -1, "n1": 0}
    for i in range(6):  # n40..n45 at hops 1..6
        want[f"n{40 + i}"] = i + 1
    want["n46"] = -1  # 7 hops: beyond the cap
    assert got == want


def test_kmeans_train_matches_reference(spark):
    """3-iteration Lloyd's parity with a pure-Python reference over the
    sf0.001 embeddings (HALF_UP rounding replicates Spark's F.round)."""
    import math

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()

    def half_up(v: float) -> int:
        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    codes = {}
    for r in sorted(emb, key=lambda r: r.vec_id):
        v = [float(x) for x in r.embedding]
        m = max(abs(x) for x in v) if v else 0.0
        s = 127.0 / m if m > 0 else 1.0
        codes[r.vec_id] = [half_up(x * s) for x in v]
    K = Q._KMEANS_K
    seeds = sorted(codes)[:K]
    cent = {k: list(codes[vid]) for k, vid in enumerate(seeds)}
    prev = None
    want = []
    for it in range(Q._KMEANS_ITERS):
        assign, wss = {}, 0
        for vid, c in codes.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(c, cent[k])), k)
                for k in cent
            )
            assign[vid] = best[1]
            wss += best[0]
        moved = (
            len(codes) if prev is None
            else sum(1 for vid in codes if assign[vid] != prev[vid])
        )
        want.append((it, moved, wss))
        for k in cent:
            members = [codes[vid] for vid in codes if assign[vid] == k]
            if members:
                cent[k] = [
                    math.floor(sum(col) / len(members)) for col in zip(*members)
                ]
        prev = assign
    got = [
        (r.iter, r.moved, r.wss)
        for r in Q.q_kmeans_train(spark, sf).orderBy("iter").collect()
    ]
    assert got == want
    assert len(got) == Q._KMEANS_ITERS
