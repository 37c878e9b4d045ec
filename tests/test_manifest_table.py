"""Crash-consistency and concurrency ring for the atomic-manifest commit
protocol (plans/manifest_table.py; r10 verdict What's-missing #2).

The protocol's claim is precise: a writer killed at ANY point before the
hard-link publish leaves the previous version as the readable head, and
of N racing writers exactly one wins a version.  These tests exercise
the exact kill windows (the prepare/publish split exists for this) and
the CAS race, plus the fsync ordering the docstring promises."""

import os

import pytest

from gordo_components_spark.plans.manifest_table import CommitConflict, ManifestTable


@pytest.fixture()
def frames(spark):
    a = spark.range(10).selectExpr("id", "id * 2 AS v")
    b = spark.range(10).selectExpr("id", "id * 3 AS v")
    return a, b


def test_commit_read_roundtrip_and_time_travel(spark, frames, tmp_path):
    a, b = frames
    t = ManifestTable(str(tmp_path / "tbl"))
    assert t.current_version() is None
    assert t.commit(a) == 1
    assert t.commit(b) == 2
    cur = ManifestTable(str(tmp_path / "tbl"))  # fresh reader instance
    assert cur.current_version() == 2
    assert sorted(r.v for r in cur.read(spark).collect()) == [i * 3 for i in range(10)]
    # time travel: v1 is immutable and still exact after v2's commit
    assert sorted(r.v for r in cur.read(spark, version=1).collect()) == [
        i * 2 for i in range(10)
    ]


def test_crash_before_publish_reader_sees_old_snapshot(spark, frames, tmp_path):
    # THE crash-consistency window: the new snapshot directory and the
    # fsynced manifest temp file both exist on disk, but the writer died
    # before the hard-link CAS — a fresh reader must still serve v1.
    a, b = frames
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(a)
    prepared = t.prepare_snapshot(b, version=2)  # steps 1+2, then "kill"
    del prepared
    reader = ManifestTable(str(tmp_path / "tbl"))
    assert reader.current_version() == 1
    assert sorted(r.v for r in reader.read(spark).collect()) == [
        i * 2 for i in range(10)
    ]
    # the orphan snapshot is garbage, not corruption: a later commit of
    # the same frame succeeds as a NEW snapshot under the next version
    assert t.commit(b) == 2
    assert sorted(r.v for r in reader.read(spark).collect()) == [
        i * 3 for i in range(10)
    ]


def test_cas_exactly_one_writer_wins_a_version(spark, frames, tmp_path):
    a, b = frames
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(a)
    w1 = ManifestTable(str(tmp_path / "tbl"))
    w2 = ManifestTable(str(tmp_path / "tbl"))
    p1 = w1.prepare_snapshot(a, version=2)
    p2 = w2.prepare_snapshot(b, version=2)
    assert w1.publish(p1) == 2
    with pytest.raises(CommitConflict):
        w2.publish(p2)
    # the loser's commit() retry path lands on the next version
    assert w2.commit(b) == 3
    assert ManifestTable(str(tmp_path / "tbl")).current_version() == 3


def test_manifest_contents_fsynced_before_publish(spark, frames, tmp_path, monkeypatch):
    # protocol-order pin: fsync(manifest temp fd) must happen BEFORE the
    # os.link publish, and a directory fsync after — otherwise a power
    # loss can expose a pointer to unwritten bytes.
    a, _ = frames
    calls = []
    real_fsync, real_link = os.fsync, os.link
    monkeypatch.setattr(os, "fsync", lambda fd: (calls.append("fsync"), real_fsync(fd))[1])
    monkeypatch.setattr(
        os, "link", lambda s, d: (calls.append("link"), real_link(s, d))[1]
    )
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(a)
    assert "fsync" in calls and "link" in calls
    assert calls.index("fsync") < calls.index("link")
    assert "fsync" in calls[calls.index("link") + 1 :]  # dir fsync after


def test_snapshot_paths_relative_table_relocatable(spark, frames, tmp_path):
    # materialized_cache installs the table dir via os.replace from a
    # pid-tmp path — manifests must not bake in the build location.
    a, _ = frames
    src = tmp_path / "build-tmp"
    t = ManifestTable(str(src))
    t.commit(a)
    man = t.manifest(1)
    assert not os.path.isabs(man["snapshot"])
    dst = tmp_path / "installed"
    os.replace(str(src), str(dst))
    moved = ManifestTable(str(dst))
    assert sorted(r.v for r in moved.read(spark).collect()) == [
        i * 2 for i in range(10)
    ]


def test_registered_faces_read_through_manifest(spark, sf_dir):
    # the harness faces: current version is the upsert compaction,
    # version 1 the raw base — row counts pin both (value parity is the
    # oracle's job).
    from gordo_components_spark.registry import load_all

    reg = load_all()
    base = reg["pipe_manifest_time_travel"].fn(spark, sf_dir)
    cur = reg["pipe_manifest_upsert"].fn(spark, sf_dir)
    n_base, n_cur = base.count(), cur.count()
    assert n_base > 0
    # latest-wins compaction: one row per event_id, and the base is
    # append-only history (>= distinct keys)
    assert n_cur == base.select("event_id").distinct().count()


def test_vacuum_expires_old_snapshots_keeps_retained(spark, frames, tmp_path):
    # Delta's VACUUM contract: data retention shorter than log retention
    # — expired versions raise clearly, retained versions (and orphan
    # crash leftovers) behave; current stays intact.
    a, b = frames
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(a)  # v1
    t.commit(b)  # v2
    t.commit(a)  # v3
    orphan = t.prepare_snapshot(b, version=99)  # crash leftover, no pointer
    removed = t.vacuum(keep_last=2)
    # v1's snapshot and the orphan are gone; v2/v3 retained
    assert len(removed) == 2
    assert t.versions() == [1, 2, 3]  # history kept
    assert sorted(r.v for r in t.read(spark, version=3).collect()) == [
        i * 2 for i in range(10)
    ]
    assert sorted(r.v for r in t.read(spark, version=2).collect()) == [
        i * 3 for i in range(10)
    ]
    with pytest.raises(Exception):
        t.read(spark, version=1).collect()
    # the orphan's manifest temp is also swept
    assert not any(
        f.startswith(".tmp-") for f in os.listdir(tmp_path / "tbl" / "manifests")
    )
    del orphan


def test_streaming_sink_batching_invariant_and_idempotent(spark, sf_dir):
    # the transactional-sink claim: streamed-in contents equal the batch
    # read bit-exactly, one version per micro-batch, and a replayed
    # batch-id re-commits as a no-op.
    from gordo_components_spark.registry import load_all
    from gordo_components_spark.sources.tables import load_table

    out = load_all()["stream_manifest_sink"].fn(spark, sf_dir)
    n_versions = out.select("table_version").head()[0]
    assert n_versions == 3  # one append commit per replay file
    batch = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    assert out.count() == batch.count()
    got = sorted(
        (r.event_id, r.user_id, r.event_type, r.ts, r.value)
        for r in out.drop("table_version").collect()
    )
    want = sorted(
        (r.event_id, r.user_id, r.event_type, r.ts, r.value)
        for r in batch.collect()
    )
    assert got == want


def test_commit_append_txn_idempotence(spark, frames, tmp_path):
    a, b = frames
    t = ManifestTable(str(tmp_path / "tbl"))
    v1 = t.commit_append(a, txn_id="batch-0")
    v_dup = t.commit_append(a, txn_id="batch-0")  # replay: no-op
    assert v1 == v_dup == 1
    v2 = t.commit_append(b, txn_id="batch-1")
    assert v2 == 2
    assert t.read(spark).count() == 20  # a + b, not a + a + b
