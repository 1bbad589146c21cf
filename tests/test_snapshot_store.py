"""SnapshotStore stage/publish invariants (the table-format commit split
introduced so the crawl round can overlap its bloom shard job with the
snapshot's delta writes — crawl.py run_round)."""

from __future__ import annotations

from facebook_page_scrapy_spark.state.snapshot import SnapshotStore


def _df(spark, n, tag):
    return spark.range(n).selectExpr("id", f"'{tag}' AS tag")


def test_staged_files_invisible_until_publish(spark, tmp_path):
    """Crash atomicity: a crash between stage and publish must leave the
    previous snapshot intact — staged delta files exist on disk but no
    reader can see them until the manifest rename."""
    store = SnapshotStore(str(tmp_path / "snap"))
    store.commit({"t": _df(spark, 5, "a")})
    assert store.latest() == 1
    assert store.read(spark, "t").count() == 5

    # stage a second delta but never publish (simulated crash)
    sid = store.manifest()["snapshot_id"] + 1
    written = store.stage(sid, {"t": _df(spark, 7, "b")})
    assert len(written) == 1
    assert store.latest() == 1  # no new snapshot visible
    assert store.read(spark, "t").count() == 5  # reader unchanged

    # a later commit (the "resume") proceeds from the published state and
    # simply strands the orphaned staged files
    store.commit({"t": _df(spark, 3, "c")})
    assert store.latest() == 2
    assert store.read(spark, "t").count() == 8  # 5 + 3, never the orphaned 7


def test_publish_after_stage_equals_commit(spark, tmp_path):
    """stage + publish is exactly commit: same manifest chain, same
    merge-on-read composition, same meta carriage."""
    a = SnapshotStore(str(tmp_path / "a"))
    b = SnapshotStore(str(tmp_path / "b"))
    a.commit({"t": _df(spark, 4, "x")}, meta={"round": 1})
    sid = b.manifest()["snapshot_id"] + 1
    b.publish(sid, b.stage(sid, {"t": _df(spark, 4, "x")}), meta={"round": 1})
    assert a.manifest()["meta"] == b.manifest()["meta"]
    assert a.read(spark, "t").count() == b.read(spark, "t").count() == 4

    # staged-in-two-parts publish (the round's stat-independent deltas
    # first, lineage after) composes identically to a single commit
    a.commit({"t": _df(spark, 2, "y"), "u": _df(spark, 6, "z")})
    sid = b.manifest()["snapshot_id"] + 1
    staged = b.stage(sid, {"t": _df(spark, 2, "y")})
    staged += b.stage(sid, {"u": _df(spark, 6, "z")})
    b.publish(sid, staged)
    assert b.read(spark, "t").count() == a.read(spark, "t").count() == 6
    assert b.read(spark, "u").count() == a.read(spark, "u").count() == 6


def test_publish_rejects_stale_sid(spark, tmp_path):
    """publish asserts the snapshot chain is unbroken — a concurrent commit
    between stage and publish must fail loudly, not fork history."""
    import pytest

    store = SnapshotStore(str(tmp_path / "snap"))
    store.commit({"t": _df(spark, 1, "a")})
    sid = store.manifest()["snapshot_id"] + 1
    written = store.stage(sid, {"t": _df(spark, 1, "b")})
    store.commit({"t": _df(spark, 1, "c")})  # someone else commits sid
    with pytest.raises(AssertionError):
        store.publish(sid, written)
