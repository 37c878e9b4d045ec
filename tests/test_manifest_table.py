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


# -- file-granular commits (round 12; VERDICT r11 what's-missing #1) ------


def _inode_map(root, rels):
    """(rel dir -> {filename: (inode, mtime_ns)}) for every parquet part."""
    out = {}
    for rel in rels:
        d = os.path.join(root, rel)
        out[rel] = {
            f: (os.stat(os.path.join(d, f)).st_ino, os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }
    return out


@pytest.fixture()
def clustered_tbl(spark, tmp_path):
    # 400 rows, k = 0..99, v = 2*id, clustered on k into 8 range-band dirs
    df = spark.range(400).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 100 AS BIGINT) AS k"
    )
    t = ManifestTable(str(tmp_path / "tbl"))
    assert t.commit_clustered(df, "k", n_dirs=8) == 1
    return t


def test_commit_clustered_layout_stats_and_roundtrip(spark, clustered_tbl):
    t = clustered_tbl
    man = t.manifest(1)
    rels = man["snapshots"]
    assert len(rels) == 8
    stats = man["dir_stats"]
    for rel in rels:
        mn, mx = stats[rel]["k"]
        assert 0 <= mn <= mx <= 99
    # bands are disjoint and ordered
    bounds = sorted(tuple(stats[r]["k"]) for r in rels)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(bounds, bounds[1:]):
        assert a_hi < b_lo
    # the union reads back every row, band column dropped
    got = t.read(spark)
    assert got.columns == ["id", "v", "k"]
    assert sorted(r.id for r in got.collect()) == list(range(400))


def test_granular_delete_rewrites_only_covering_dirs(spark, clustered_tbl):
    # THE untouched-inode pin: a key-scoped erasure with stats pruning
    # must carry every non-covering dir into the new version by
    # REFERENCE — identical path, identical inode, identical mtime — and
    # rewrite only the band(s) whose [min, max] interval covers the keys.
    t = clustered_tbl
    v1_rels = t.manifest(1)["snapshots"]
    before = _inode_map(t.root, v1_rels)
    assert t.commit_delete(spark, "k IN (7, 11)", prune=("k", [7, 11])) == 2
    man = t.manifest(2)
    # 7 and 11 share the low band: exactly one dir removed, one added
    assert len(man["removed"]) == 1 and len(man["added"]) == 1
    untouched = [r for r in man["snapshots"] if r in v1_rels]
    assert len(untouched) == 7
    after = _inode_map(t.root, untouched)
    for rel in untouched:
        assert after[rel] == before[rel], f"{rel} was rewritten"
    # rewritten band inherits the old (still-valid) stats bounds
    assert man["dir_stats"][man["added"][0]]["k"] == t.manifest(1)["dir_stats"][
        man["removed"][0]
    ]["k"]
    # correctness: exactly the k=7 and k=11 rows are gone; v1 untouched
    got = sorted(r.k for r in t.read(spark).collect())
    assert 7 not in got and 11 not in got
    assert len(got) == 400 - 8
    assert t.read(spark, version=1).count() == 400


def test_granular_delete_probe_keeps_statless_dirs(spark, frames, tmp_path):
    # dirs without stats (plain appends) fall back to the LIMIT-1
    # existence probe: a no-match dir is kept by reference, not rewritten.
    a, b = frames  # a: v = 2*id (even), b: v = 3*id
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(a)
    t.commit_append(b)
    rels = t.manifest(2)["snapshots"]
    before = _inode_map(t.root, rels)
    # v = 9 exists only in b (3*3); a has only even values
    assert t.commit_delete(spark, "v = 9") == 3
    man = t.manifest(3)
    assert man["removed"] == [rels[1]] and len(man["added"]) == 1
    assert rels[0] in man["snapshots"]
    assert _inode_map(t.root, [rels[0]]) == {rels[0]: before[rels[0]]}
    assert t.read(spark).count() == 19


def test_granular_delete_drops_fully_erased_dir(spark, clustered_tbl):
    # erasing a whole band is RemoveFile with no AddFile: the dir leaves
    # the list entirely and the data remains only in history.
    t = clustered_tbl
    lo_rel = min(
        t.manifest(1)["snapshots"], key=lambda r: t.manifest(1)["dir_stats"][r]["k"][0]
    )
    lo, hi = t.manifest(1)["dir_stats"][lo_rel]["k"]
    assert t.commit_delete(spark, f"k BETWEEN {lo} AND {hi}") == 2
    man = t.manifest(2)
    assert lo_rel not in man["snapshots"]
    assert man["removed"] == [lo_rel] and man["added"] == []
    assert t.read(spark).where(f"k BETWEEN {lo} AND {hi}").count() == 0
    assert t.read(spark, version=1).count() == 400


def test_granular_delete_partial_commit_crash_is_invisible(spark, clustered_tbl, monkeypatch):
    # the partial-commit kill window: rewrite dirs written, CAS never
    # reached — readers still see v1 bit-exactly; the orphan rewrite dir
    # is vacuumable garbage; a clean retry then succeeds.
    t = clustered_tbl

    def boom(prepared):
        raise KeyboardInterrupt("crash before CAS")

    monkeypatch.setattr(t, "publish", boom)
    with pytest.raises(KeyboardInterrupt):
        t.commit_delete(spark, "k IN (7)", prune=("k", [7]))
    monkeypatch.undo()
    reader = ManifestTable(t.root)
    assert reader.current_version() == 1
    assert reader.read(spark).count() == 400
    orphans = [
        d for d in os.listdir(os.path.join(t.root, "snapshots")) if d.startswith("delete-")
    ]
    assert orphans  # the written-but-unpublished rewrite dir
    t.vacuum(keep_last=2)
    assert not any(
        d.startswith("delete-")
        for d in os.listdir(os.path.join(t.root, "snapshots"))
    )
    assert t.commit_delete(spark, "k IN (7)", prune=("k", [7])) == 2
    assert t.read(spark).where("k = 7").count() == 0


def test_granular_delete_cas_race_rederives_from_new_head(spark, clustered_tbl):
    # two deletes racing for the same version: the loser must re-derive
    # from the winner's head so BOTH erasures land in the final table.
    t = clustered_tbl
    w2 = ManifestTable(t.root)
    real_publish = w2.publish
    fired = []

    def racing_publish(prepared):
        if not fired:
            fired.append(True)
            t.commit_delete(spark, "k = 7", prune=("k", [7]))  # w1 wins v2
        return real_publish(prepared)

    w2.publish = racing_publish
    v = w2.commit_delete(spark, "k = 11", prune=("k", [11]))
    assert v == 3  # lost v2, re-derived, won v3
    got = {r.k for r in w2.read(spark).collect()}
    assert 7 not in got and 11 not in got


def test_granular_delete_txn_idempotent(spark, clustered_tbl):
    t = clustered_tbl
    v = t.commit_delete(spark, "k = 7", prune=("k", [7]), txn_id="gdpr-x")
    n_dirs = len(os.listdir(os.path.join(t.root, "snapshots")))
    v_dup = t.commit_delete(spark, "k = 7", prune=("k", [7]), txn_id="gdpr-x")
    assert v == v_dup == 2
    assert t.current_version() == 2
    # the replay wrote nothing: no new data dirs appeared
    assert len(os.listdir(os.path.join(t.root, "snapshots"))) == n_dirs


def test_fixture_gdpr_commit_carried_dirs_by_reference(spark, sf_dir):
    # fixture-level pin of the verdict's "done" bar: in the shared
    # 5-version table, v4 (GDPR erasure) must have rewritten at most the
    # band dirs covering users (3, 7, 11) and carried the rest verbatim.
    from gordo_components_spark.operators.extensions_pipeline import (
        _manifest_table_root,
    )

    root = _manifest_table_root(spark, sf_dir)
    t = ManifestTable(root)
    v3, v4 = t.manifest(3), t.manifest(4)
    assert v4["txn_id"] == "gdpr-erasure-001"
    assert 1 <= len(v4["removed"]) <= 3  # the covering bands only
    carried = [r for r in v4["snapshots"] if r in v3["snapshots"]]
    assert len(carried) == len(v3["snapshots"]) - len(v4["removed"])
    # and the pruned-read current version still chains through v5
    assert t.current_version() == 5


def test_granular_merge_replaces_inserts_and_keeps_other_bands(spark, clustered_tbl):
    # commit_merge: replaces keyed rows, inserts new keys, rewrites only
    # the covering bands; out-of-range inserts land in ONE new dir with
    # their own stats.
    t = clustered_tbl  # 400 rows, id 0..399, k = id % 100, 8 bands on k
    v1_rels = t.manifest(1)["snapshots"]
    before = _inode_map(t.root, v1_rels)
    updates = spark.createDataFrame(
        [
            (7, 7, 7_000),     # replace: id 7 lives in the k=7 band
            (400, 7, 7_400),   # insert into the same band (new key)
            (900, 500, 9_000), # insert OUTSIDE every k interval
        ],
        "id long, k long, v long",
    ).selectExpr("id", "v", "k")  # column order differs from the table: unionByName must align
    assert t.commit_merge(spark, updates, key_col="id", prune_col="k") == 2
    man = t.manifest(2)
    assert len(man["removed"]) == 1  # only the band covering k=7
    assert len(man["added"]) == 2  # its rewrite + the out-of-range insert dir
    untouched = [r for r in man["snapshots"] if r in v1_rels]
    assert len(untouched) == 7
    assert _inode_map(t.root, untouched) == {r: before[r] for r in untouched}
    got = {r.id: (r.k, r.v) for r in t.read(spark).collect()}
    assert len(got) == 402  # 400 base - 0 + 2 inserts, id 7 replaced not duplicated
    assert got[7] == (7, 7_000)
    assert got[400] == (7, 7_400)
    assert got[900] == (500, 9_000)
    assert got[8] == (8, 16)  # untouched row intact (v = 2*id)
    # the insert dir's stats cover its own range for future pruning
    ins_rel = [r for r in man["added"] if man["dir_stats"][r]["k"] == [500, 500]]
    assert len(ins_rel) == 1


def test_granular_merge_requires_clustered_stats(spark, frames, tmp_path):
    a, _ = frames
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(a)  # full snapshot: no dir stats
    upd = a.limit(1)
    with pytest.raises(ValueError, match="stats on every data dir"):
        t.commit_merge(spark, upd, key_col="id", prune_col="v")


def test_granular_merge_txn_idempotent(spark, clustered_tbl):
    t = clustered_tbl
    upd = spark.createDataFrame([(7, 7, 1)], "id long, k long, v long")
    v = t.commit_merge(spark, upd, key_col="id", prune_col="k", txn_id="m-1")
    n_dirs = len(os.listdir(os.path.join(t.root, "snapshots")))
    v_dup = t.commit_merge(spark, upd, key_col="id", prune_col="k", txn_id="m-1")
    assert v == v_dup == 2
    assert len(os.listdir(os.path.join(t.root, "snapshots"))) == n_dirs


def test_fixture_merge_commit_carried_dirs_by_reference(spark, sf_dir):
    from gordo_components_spark.operators.extensions_pipeline import (
        _manifest_merge_root,
    )

    root = _manifest_merge_root(spark, sf_dir)
    t = ManifestTable(root)
    v1, v2 = t.manifest(1), t.manifest(2)
    assert v2["txn_id"] == "merge-001" and v2["merge_key"] == "event_id"
    assert 1 <= len(v2["removed"]) <= 2  # bands covering users 5 and 9
    carried = [r for r in v2["snapshots"] if r in v1["snapshots"]]
    assert len(carried) == len(v1["snapshots"]) - len(v2["removed"])


def test_compact_merges_only_small_dirs_by_footer_counts(spark, tmp_path):
    # bin-packing OPTIMIZE: footer-count planning, interval-union stats,
    # bulk dir untouched (inode identity), rows bit-identical.
    t = ManifestTable(str(tmp_path / "tbl"))
    big = spark.range(0, 300).selectExpr("id", "id * 2 AS v")
    t.commit_append(big)
    for lo in (300, 320, 340):
        t.commit_append(
            spark.range(lo, lo + 20).selectExpr("id", "id * 2 AS v")
        )
    rels = t.manifest(4)["snapshots"]
    before = _inode_map(t.root, rels)
    big_rel = rels[0]
    assert t.commit_compact(spark, small_rows=100, txn_id="c-1") == 5
    man = t.manifest(5)
    assert man["compacted"] and len(man["removed"]) == 3 and len(man["added"]) == 1
    assert big_rel in man["snapshots"]
    assert _inode_map(t.root, [big_rel]) == {big_rel: before[big_rel]}
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(360))
    # idempotent replay writes nothing new
    n_dirs = len(os.listdir(os.path.join(t.root, "snapshots")))
    assert t.commit_compact(spark, small_rows=100, txn_id="c-1") == 5
    assert len(os.listdir(os.path.join(t.root, "snapshots"))) == n_dirs
    # a further compact is a no-op (only one small dir candidate left)
    assert t.commit_compact(spark, small_rows=100) == 5


def test_compact_stats_interval_union(spark, clustered_tbl):
    # compacting two clustered bands unions their [min, max] so the
    # merged dir still prunes for granular deletes.
    t = clustered_tbl
    stats1 = t.manifest(1)["dir_stats"]
    rels = t.manifest(1)["snapshots"]
    # bands hold 52 rows (width-13 k-ranges x 4 ids per k; the tail band
    # 36); threshold 60 packs all eight
    v = t.commit_compact(spark, small_rows=60)
    assert v == 2
    man = t.manifest(2)
    assert len(man["snapshots"]) == 1
    merged_rel = man["added"][0]
    ks = [stats1[r]["k"] for r in rels]
    assert man["dir_stats"][merged_rel]["k"] == [
        min(k[0] for k in ks),
        max(k[1] for k in ks),
    ]
    assert t.read(spark).count() == 400


def test_merge_rejects_overlapping_intervals_after_gappy_compact(spark, clustered_tbl):
    # the round-12 latent-dup pin: compacting NON-contiguous small bands
    # produces interval-union stats that overlap surviving bands; a merge
    # routed on overlapping intervals would duplicate keys (one update
    # row unioned into two rewrites), so commit_merge must refuse.
    t = clustered_tbl
    man1 = t.manifest(1)
    # delete the contents of two non-adjacent bands' key ranges so those
    # dirs shrink below the compact threshold while others stay above
    rels = sorted(man1["snapshots"], key=lambda r: man1["dir_stats"][r]["k"][0])
    lo0, hi0 = man1["dir_stats"][rels[0]]["k"]
    lo7, hi7 = man1["dir_stats"][rels[-1]]["k"]
    t.commit_delete(
        spark,
        f"(k BETWEEN {lo0} AND {hi0 - 1}) OR (k BETWEEN {lo7 + 1} AND {hi7})",
    )
    # bands 0 and 7 are now tiny (one k value each); compact packs them
    # into ONE dir whose union interval [lo0, hi7] spans every band
    v = t.commit_compact(spark, small_rows=10)
    assert v == 3
    merged_rel = t.manifest(3)["added"][0]
    assert t.manifest(3)["dir_stats"][merged_rel]["k"] == [lo0, hi7]  # spans the gap
    upd = spark.createDataFrame([(30, 60, 1)], "id long, k long, v long")
    with pytest.raises(ValueError, match="disjoint"):
        t.commit_merge(spark, upd, key_col="id", prune_col="k")


# ---- round-13 ring: null-safety, single-pass commits, gap banding, ----
# ---- schema evolution, changefeed (ADVICE r12 + VERDICT r12 items) ----


def test_delete_retains_null_predicate_rows(spark, tmp_path):
    # ADVICE r12 (high): Delta's DELETE removes rows where the condition
    # is TRUE — a NULL predicate must RETAIN the row.  The old survivor
    # filter `NOT (pred)` silently dropped NULL-predicate rows.
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, None)], "id long, v double"
    )
    t.commit_append(df)
    assert t.commit_delete(spark, "v > 20.0") == 2
    got = {r.id: r.v for r in t.read(spark).collect()}
    # only id=3 (v=30, TRUE) deleted; NULL-v rows 2 and 4 retained
    assert set(got) == {1, 2, 4}
    assert got[2] is None and got[4] is None


def test_merge_rejects_null_prune_col_updates(spark, clustered_tbl):
    # ADVICE r12 (medium): a NULL routing key matches no band interval
    # AND no gap comparison — the row would silently vanish.  Fail loud.
    upd = spark.createDataFrame([(7, None, 1)], "id long, k long, v long")
    with pytest.raises(ValueError, match="NULL"):
        clustered_tbl.commit_merge(spark, upd, key_col="id", prune_col="k")


def test_clustered_rejects_partially_null_key_before_write(spark, tmp_path):
    # ADVICE r12 (low): a partially-null cluster column used to crash
    # with TypeError AFTER landing a __HIVE_DEFAULT_PARTITION__ band.
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, 1), (2, None), (3, 3)], "id long, k long"
    )
    with pytest.raises(ValueError, match="non-null"):
        t.commit_clustered(df, "k", n_dirs=2)
    # nothing landed: the refusal happened before any snapshot write
    assert t.current_version() is None
    assert os.listdir(os.path.join(t.root, "snapshots")) == []


def test_compact_footer_counts_recurse_into_partitioned_dirs(spark, tmp_path):
    # ADVICE r12 (medium): a hive-partitioned BULK dir keeps its part
    # files under key=value subdirs; top-level-only footer listing
    # reported 0 rows and compact rewrote the bulk wholesale.
    t = ManifestTable(str(tmp_path / "tbl"))
    bulk = spark.range(300).selectExpr("id", "id % 3 AS p", "id * 2 AS v")
    t.commit(bulk.repartition(2, "p"), partition_by=("p",))
    bulk_rel = t.manifest(1)["snapshot"]
    assert t._dir_rows(bulk_rel) == 300  # recursive footer count
    for lo in (300, 320):
        t.commit_append(
            spark.range(lo, lo + 20).selectExpr("id", "id % 3 AS p", "id * 2 AS v")
        )
    before = _inode_map(
        t.root, [os.path.join(bulk_rel, d) for d in os.listdir(os.path.join(t.root, bulk_rel)) if d.startswith("p=")]
    )
    assert t.commit_compact(spark, small_rows=100) == 4
    man = t.manifest(4)
    # the partitioned bulk carried BY REFERENCE — not classified small
    assert bulk_rel in man["snapshots"] and bulk_rel not in man["removed"]
    after = _inode_map(
        t.root, [os.path.join(bulk_rel, d) for d in os.listdir(os.path.join(t.root, bulk_rel)) if d.startswith("p=")]
    )
    assert after == before
    got = t.read(spark)
    assert sorted(r.id for r in got.collect()) == list(range(340))
    # the partition column survived the mixed read (per-dir unionByName)
    assert set(got.columns) == {"id", "p", "v"}
    assert got.where("p IS NULL").count() == 0


def test_compact_merges_small_partitioned_dir_keeps_partition_column(spark, tmp_path):
    # the other half of the mixed-layout finding: a SMALL partitioned
    # dir merged with flat dirs must recover its partition column from
    # its own layout, not drop or conflict on it.
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(spark.range(300).selectExpr("id", "id % 3 AS p"))
    small = spark.range(300, 320).selectExpr("id", "id % 3 AS p")
    t.commit(
        t.read(spark, 1).unionByName(small), partition_by=("p",)
    )  # v2: whole table partitioned — now append two flat smalls
    t.commit_append(spark.range(320, 330).selectExpr("id", "id % 3 AS p"))
    t.commit_append(spark.range(330, 340).selectExpr("id", "id % 3 AS p"))
    # partitioned snapshot is the bulk (320 rows); two flat dirs small
    assert t.commit_compact(spark, small_rows=50) == 5
    got = t.read(spark)
    assert sorted(r.id for r in got.collect()) == list(range(340))
    assert got.where("p IS NULL").count() == 0


def test_merge_gap_banded_inserts_stay_mergeable(spark, clustered_tbl):
    # VERDICT r12 what's-wrong #3: inserts straddling the clustered
    # bands (below AND above) used to land in ONE dir whose interval
    # spanned every band — the NEXT merge then hit the disjointness
    # ValueError.  Gap banding keeps consecutive merges granular.
    t = clustered_tbl  # k in [0, 99], 8 bands
    updates = spark.createDataFrame(
        [(1000, -50, 1), (1001, 500, 2)], "id long, k long, v long"
    ).selectExpr("id", "v", "k")
    assert t.commit_merge(spark, updates, key_col="id", prune_col="k") == 2
    man = t.manifest(2)
    # two gap dirs (below-all and above-all), zero bands rewritten
    assert man["removed"] == [] and len(man["added"]) == 2
    ivs = sorted(tuple(man["dir_stats"][r]["k"]) for r in man["added"])
    assert ivs == [(-50, -50), (500, 500)]
    # the second merge routes WITHOUT a re-cluster
    upd2 = spark.createDataFrame(
        [(1000, -50, 9), (7, 7, 7000)], "id long, k long, v long"
    ).selectExpr("id", "v", "k")
    assert t.commit_merge(spark, upd2, key_col="id", prune_col="k") == 3
    got = {r.id: (r.k, r.v) for r in t.read(spark).collect()}
    assert got[1000] == (-50, 9)  # replaced in its gap dir
    assert got[1001] == (500, 2)
    assert got[7] == (7, 7000)
    assert len(got) == 402


def test_merge_into_fully_erased_table_inserts_all(spark, tmp_path):
    # ADVICE r12 (low): after a delete erases every dir the head has
    # snapshots=[]; merge used to raise an opaque IndexError.
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_clustered(
        spark.range(40).selectExpr("id", "id AS k", "id * 2 AS v"), "k", n_dirs=4
    )
    t.commit_delete(spark, "k >= 0")  # erase everything
    assert t.manifest(2)["snapshots"] == []
    assert t.read(spark).count() == 0  # empty table still readable
    upd = spark.createDataFrame([(1, 1, 10), (2, 2, 20)], "id long, k long, v long")
    assert t.commit_merge(spark, upd, key_col="id", prune_col="k") == 3
    got = {r.id: r.v for r in t.read(spark).collect()}
    assert got == {1: 10, 2: 20}
    man = t.manifest(3)
    assert man["dir_stats"][man["added"][0]]["k"] == [1, 2]


def test_commit_jobs_independent_of_dir_count(spark, tmp_path):
    # VERDICT r12 what's-wrong #2: the probe+rewrite used to run 1-2
    # driver-serial Spark jobs PER touched dir.  The single-pass shape's
    # job count must not grow with the number of data dirs.
    def jobs_for_delete(n_dirs: int, tag: str) -> int:
        t = ManifestTable(str(tmp_path / f"tbl-{tag}"))
        for i in range(n_dirs):
            t.commit_append(
                spark.range(i * 10, i * 10 + 10).selectExpr("id", "id AS v")
            )
        sc = spark.sparkContext
        sc.setJobGroup(f"del-{tag}", "job-count probe")
        try:
            t.commit_delete(spark, "id % 2 = 0")  # touches EVERY dir
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(f"del-{tag}"))

    assert jobs_for_delete(3, "a") == jobs_for_delete(12, "b")


def test_schema_evolution_add_column_reads_null_for_old_dirs(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(spark.range(5).selectExpr("id", "id * 2 AS v"))
    t.commit_append(
        spark.range(5, 8).selectExpr("id", "id * 2 AS v", "id * 10 AS extra")
    )
    got = t.read(spark)
    assert got.columns == ["id", "v", "extra"]  # parent order + added
    rows = {r.id: r.extra for r in got.collect()}
    assert all(rows[i] is None for i in range(5))  # old dirs serve NULL
    assert rows[7] == 70
    # time travel: v1 predates the column and keeps its own schema
    assert ManifestTable(t.root).read(spark, version=1).columns == ["id", "v"]
    # evolution survives downstream granular commits (schema carried)
    t.commit_delete(spark, "id = 0")
    assert t.read(spark).columns == ["id", "v", "extra"]
    assert t.read(spark).count() == 7


def test_schema_evolution_rejects_type_change(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(spark.range(3).selectExpr("id", "id * 2 AS v"))
    bad = spark.range(3, 5).selectExpr("id", "CAST(v AS STRING) AS v").selectExpr(
        "id", "v"
    ) if False else spark.range(3, 5).selectExpr("id", "CAST(id AS STRING) AS v")
    with pytest.raises(ValueError, match="ADD COLUMN only"):
        t.commit_append(bad)
    assert t.current_version() == 1  # nothing published


def test_changefeed_delete_and_merge_deltas(spark, clustered_tbl):
    t = clustered_tbl  # 400 rows, k = id % 100, v = 2 * id
    t.commit_delete(spark, "k IN (7, 11)", prune=("k", [7, 11]))  # v2
    upd = spark.createDataFrame(
        [(8, 8, 8000), (1000, 500, 1)], "id long, k long, v long"
    )
    t.commit_merge(spark, upd, key_col="id", prune_col="k")  # v3
    # v1 -> v2: pure delete — the 8 erased rows, nothing inserted
    cf = t.changefeed(spark, 1, 2)
    assert set(cf.columns) == {"id", "v", "k", "_change_type"}
    dels = cf.where("_change_type = 'delete'").collect()
    assert sorted(r.k for r in dels) == [7, 7, 7, 7, 11, 11, 11, 11]
    assert cf.where("_change_type = 'insert'").count() == 0
    # v2 -> v3: replace surfaces as delete+insert pair; new key as insert
    cf2 = {
        (r.id, r._change_type): (r.k, r.v)
        for r in t.changefeed(spark, 2, 3).collect()
    }
    assert cf2 == {
        (8, "delete"): (8, 16),
        (8, "insert"): (8, 8000),
        (1000, "insert"): (500, 1),
    }
    # composed feed v1 -> v3 nets out identically (dir-set diff, not log)
    cf13 = t.changefeed(spark, 1, 3)
    assert cf13.where("_change_type = 'delete'").count() == 9  # 8 erased + old id=8
    assert cf13.where("_change_type = 'insert'").count() == 2


def test_watch_constants_hardened(spark, sf_dir):
    # ROUND13_NOTES #7: both documented-but-unguarded constants now have
    # loud failure paths.  _CM_D > 16 would index past md5's 32 hex
    # digits (import-time assert); a GDPR subject missing from the
    # fixture domain would make the erasure face vacuously green.
    from gordo_components_spark.operators import relational_extra as rx

    assert rx._CM_D <= 16
    from gordo_components_spark.operators.extensions_pipeline import (
        _assert_gdpr_subjects_present,
    )
    from gordo_components_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    _assert_gdpr_subjects_present(ev, sf_dir)  # current domain holds
    with pytest.raises(ValueError, match="vacuously green"):
        _assert_gdpr_subjects_present(ev.where("user_id <> 7"), sf_dir)


def test_delete_prune_promise_violation_fails_loud(spark, clustered_tbl):
    # round-13 review hardening: prune=(col, keys) is a PROMISE the
    # stats skip relies on; a predicate matching keys outside the spec
    # would silently under-delete in pruned dirs.  The candidate-dir
    # probe witnesses violations among the rows it scans anyway and
    # must refuse.  (A violation confined ENTIRELY to pruned dirs is
    # undetectable by construction — zero I/O means zero witnesses —
    # so the spec stays a documented promise; this guard catches the
    # common shape: the predicate is broader than the spec wherever
    # the spec made us look.)
    t = clustered_tbl
    # k=7 and k=8 share the low band: the spec says only 7, the scan of
    # that band witnesses matching k=8 rows -> loud refusal
    with pytest.raises(ValueError, match="outside the prune keys"):
        t.commit_delete(spark, "k IN (7, 8)", prune=("k", [7]))
    assert t.current_version() == 1  # nothing committed
    # honest spec still works
    assert t.commit_delete(spark, "k IN (7, 8)", prune=("k", [7, 8])) == 2


def test_merge_rejects_duplicate_update_keys(spark, clustered_tbl):
    # Delta MERGE semantics: multiple source rows per target key are
    # ambiguous — refuse rather than land a duplicate key.
    upd = spark.createDataFrame(
        [(7, 7, 1), (7, 7, 2)], "id long, k long, v long"
    )
    with pytest.raises(ValueError, match="duplicate"):
        clustered_tbl.commit_merge(spark, upd, key_col="id", prune_col="k")
    assert clustered_tbl.current_version() == 1


def test_merge_rejects_cross_band_duplicate_keys(spark, clustered_tbl):
    # ADVICE r13: a duplicate key whose prune_col values DIFFER routes
    # its copies to different bands — each band's countDistinct sees
    # one copy, the per-band duplicate check passes, and both copies
    # would silently land.  The rollup grand-total cross-check (global
    # distinct keys vs sum of per-band distincts) must refuse: this is
    # a clustering-key-immutability violation (k=7 and k=93 fall in
    # different 8-band dirs of the 0..99 layout).
    upd = spark.createDataFrame(
        [(7, 7, 1), (7, 93, 2)], "id long, k long, v long"
    )
    with pytest.raises(ValueError, match="immutable"):
        clustered_tbl.commit_merge(spark, upd, key_col="id", prune_col="k")
    assert clustered_tbl.current_version() == 1


def test_read_pruned_skips_non_covering_dirs(spark, clustered_tbl):
    # round-13 data-skipping read: a range read plans from the
    # manifest's per-dir intervals — Spark only ever receives the
    # covering dirs' paths (inputFiles is a strict subset), and the
    # residual filter keeps the result exact.
    t = clustered_tbl  # 400 rows, k = id % 100, 8 width-13 bands
    got = t.read_pruned(spark, "k", 30, 40)
    want = t.read(spark).where("k BETWEEN 30 AND 40")
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )
    all_dirs = {os.path.join(t.root, r) for r in t.manifest(1)["snapshots"]}
    read_dirs = {
        os.path.normpath(os.path.dirname(f.removeprefix("file:")))
        for f in got.inputFiles()
    }
    assert read_dirs  # something was read
    assert read_dirs < all_dirs  # STRICT subset: non-covering dirs skipped
    # [30, 40] spans at most ceil(11/13)+1 = 2 bands
    assert len(read_dirs) <= 2
    # stats-less dirs are always read (no evidence either way): append
    # one and re-check exactness
    t.commit_append(
        spark.createDataFrame([(9000, 1, 35)], "id long, v long, k long")
    )
    got2 = t.read_pruned(spark, "k", 30, 40)
    assert got2.where("id = 9000").count() == 1


def test_read_pruned_empty_range_returns_empty_exact_schema(spark, clustered_tbl):
    t = clustered_tbl
    got = t.read_pruned(spark, "k", 1000, 2000)  # beyond every interval
    assert got.count() == 0
    assert got.columns == ["id", "v", "k"]


@pytest.mark.parametrize(
    "seed,double_key",
    [(20260816, False), (1307, False), (41404, False), (77, True)],
)
def test_manifest_model_based_random_ops(spark, tmp_path, seed, double_key):
    # Model-based ring (round 13; widened round 14 per VERDICT r13
    # what's-wrong #2): a seeded random sequence of commits runs against
    # an in-memory reference dict; after EVERY commit the table must
    # read back exactly the model, and at the end every retained version
    # must time-travel to its own recorded state.  This is the
    # cross-product the per-feature tests can't enumerate
    # (delete-after-merge-after-compact-after-evolve...).  The round-14
    # alphabet covers all 8 commit types — append, delete, merge (both
    # routing paths, chosen at random), compact, cluster, full snapshot,
    # schema-evolving append, restat — at 3 seeds x 14 ops.
    # GORDO_SPARK_RING_OPS lifts the per-seed op count for a
    # nightly-style deep soak (ROUND15_NOTES #2) without inflating the
    # default suite budget: GORDO_SPARK_RING_OPS=40 python -m pytest
    # tests/test_manifest_table.py -k model_based.
    #
    # double_key (added after the round-14 review found DOUBLE-key
    # misrouting in the bucketed interval join): one seed runs the
    # whole alphabet with a DOUBLE clustering key (values at exact
    # halves, so engine/model equality stays bitwise) — the join
    # routing must refuse non-integral bounds even when the random
    # route_join_min=1 asks for it, restat must refuse the float
    # column, and float [min, max] stats must still prune deletes
    # exactly.
    import random

    n_ops = int(os.environ.get("GORDO_SPARK_RING_OPS", "14"))

    rnd = random.Random(seed)
    t = ManifestTable(str(tmp_path / f"tbl-{seed}"))
    evolved = False
    ktype = "double" if double_key else "long"

    def kval(n):
        return n + 0.5 if double_key else n

    def df_of(rows):
        if evolved:
            data = [
                (i, kv[0], kv[1], kv[2] if len(kv) > 2 else None)
                for i, kv in sorted(rows.items())
            ]
            return spark.createDataFrame(
                data, f"id long, k {ktype}, v long, w long"
            )
        data = [(i, kv[0], kv[1]) for i, kv in sorted(rows.items())]
        return spark.createDataFrame(data, f"id long, k {ktype}, v long")

    def snap(rows):
        # model rows normalized to the CURRENT schema width
        if evolved:
            return {
                i: (kv[0], kv[1], kv[2] if len(kv) > 2 else None)
                for i, kv in rows.items()
            }
        return {i: (kv[0], kv[1]) for i, kv in rows.items()}

    def read_back(version=None):
        got = t.read(spark, version)
        if "w" in got.columns:
            return {r.id: (r.k, r.v, r.w) for r in got.collect()}
        return {r.id: (r.k, r.v) for r in got.collect()}

    model = {i: (kval(i % 50), i * 2) for i in range(200)}
    t.commit_clustered(df_of(model), "k", n_dirs=6)
    history = {1: snap(model)}
    merge_ok = True  # every dir has disjoint-interval stats
    n_merges_applied = 0
    ops_seen = set()
    next_id = 1000
    for step in range(n_ops):
        op = rnd.choice(
            [
                "append",
                "delete",
                "merge",
                "compact",
                "cluster",
                "snapshot",
                "evolve",
                "restat",
            ]
        )
        ops_seen.add(op)
        if op == "append":
            newrows = {
                next_id + j: (kval(rnd.randrange(-20, 120)), rnd.randrange(1000))
                for j in range(rnd.randrange(1, 20))
            }
            next_id += 100
            t.commit_append(df_of(newrows))
            model.update(newrows)
            merge_ok = False  # the append dir carries no stats
        elif op == "delete":
            lo = rnd.randrange(-10, 100)
            hi = lo + rnd.randrange(0, 30)
            t.commit_delete(spark, f"k BETWEEN {lo} AND {hi}")
            model = {
                i: kv for i, kv in model.items() if not (lo <= kv[0] <= hi)
            }
            # deletes keep stats coverage: dirs drop or inherit bounds
        elif op == "merge":
            ups = {}
            for i in rnd.sample(sorted(model), min(5, len(model))):
                ups[i] = (
                    model[i][0],  # k immutable
                    rnd.randrange(5000, 6000),
                ) + ((rnd.randrange(9),) if evolved else ())
            for j in range(3):
                ups[next_id + j] = (
                    kval(rnd.randrange(-20, 120)),
                    rnd.randrange(1000),
                ) + ((rnd.randrange(9),) if evolved else ())
            next_id += 100
            # a merge may legally refuse (stats-less append dirs;
            # gap-spanning compact unions; restat-overlapped appends) —
            # the authority is the commit's own checks; whatever it
            # decides, the data equality assertion below is the judge
            # of mis-routing.  Both routing paths must agree with the
            # model, so the path is picked at random per merge.
            try:
                t.commit_merge(
                    spark,
                    df_of(ups),
                    key_col="id",
                    prune_col="k",
                    route_join_min=rnd.choice([None, 1]),
                )
            except ValueError:
                assert not merge_ok, "merge refused a clustered layout"
                continue  # refused: no commit happened
            model.update(ups)
            n_merges_applied += 1
        elif op == "compact":
            t.commit_compact(spark, small_rows=40)
            merge_ok = False  # union stats may span gaps (overlap)
        elif op == "cluster":
            if not model:
                continue
            t.commit_clustered(df_of(model), "k", n_dirs=4)
            merge_ok = True
        elif op == "snapshot":
            # full-snapshot commit REPLACES the table (no dir stats)
            t.commit(df_of(model))
            merge_ok = False
        elif op == "evolve":
            # ADD-COLUMN evolution via an evolving append: every later
            # read serves w (NULL for pre-evolution rows), every later
            # merge must carry it
            evolved = True
            newrows = {
                next_id + j: (
                    kval(rnd.randrange(-20, 120)),
                    rnd.randrange(1000),
                    rnd.randrange(9),
                )
                for j in range(rnd.randrange(1, 10))
            }
            next_id += 100
            t.commit_append(df_of(newrows))
            model.update(newrows)
            merge_ok = False
        elif op == "restat":
            # pointer-only stats refresh: data identical, bounds exact;
            # merge_ok stays conservative (newly-statted append dirs may
            # legitimately overlap the bands — the merge's own
            # disjointness check is the authority).  A FLOAT key must be
            # refused outright (footer bounds exclude NaN rows).
            if double_key:
                with pytest.raises(ValueError):
                    t.commit_restat(["k"])
                continue
            t.commit_restat(["k"])
        cur = t.current_version()
        history[cur] = snap(model)
        got = read_back()
        assert got == snap(model), f"step {step} op {op} diverged at v{cur}"
    if n_merges_applied == 0 and model:
        # seeds aren't guaranteed to land an APPLIED merge (refusals are
        # legal); force one deterministic cluster -> merge epilogue so
        # every seed exercises real merge routing
        t.commit_clustered(df_of(model), "k", n_dirs=4)
        history[t.current_version()] = snap(model)
        ups = {}
        for i in list(sorted(model))[:3]:
            ups[i] = (model[i][0], 7777) + ((1,) if evolved else ())
        t.commit_merge(
            spark,
            df_of(ups),
            key_col="id",
            prune_col="k",
            route_join_min=rnd.choice([None, 1]),
        )
        model.update(ups)
        history[t.current_version()] = snap(model)
        assert read_back() == snap(model)
        n_merges_applied += 1
    assert n_merges_applied >= 1  # the sequence exercised real merges
    assert len(ops_seen) >= 6  # the alphabet actually got exercised
    for v, m in sorted(history.items()):
        assert read_back(v) == m, f"time travel to v{v} diverged"



def test_restat_tightens_bounds_pointer_only(spark, clustered_tbl):
    # round-13 stats-refresh OPTIMIZE: footer row-group statistics
    # re-derive per-dir bounds with ZERO data read/movement (pointer
    # commit) — inherited-loose rewrite bounds tighten, stats-less
    # append dirs gain bounds, inode identity everywhere.
    t = clustered_tbl  # 8 width-13 bands on k in [0, 99]
    man1 = t.manifest(1)
    rels = sorted(man1["snapshots"], key=lambda r: man1["dir_stats"][r]["k"][0])
    lo0, hi0 = man1["dir_stats"][rels[0]]["k"]
    t.commit_delete(spark, f"k = {hi0}")  # v2: rewrite INHERITS [lo0, hi0]
    new_rel = t.manifest(2)["added"][0]
    assert t.manifest(2)["dir_stats"][new_rel]["k"] == [lo0, hi0]  # loose
    t.commit_append(
        spark.createDataFrame([(5000, 1, 200)], "id long, v long, k long")
    )  # v3: stats-less dir
    rels3 = t.manifest(3)["snapshots"]
    before = _inode_map(t.root, rels3)
    assert t.commit_restat(["k"], txn_id="restat-1") == 4
    man4 = t.manifest(4)
    assert man4["snapshots"] == rels3  # same dirs, pointer-only
    assert _inode_map(t.root, rels3) == before  # zero bytes moved
    assert man4["dir_stats"][new_rel]["k"] == [lo0, hi0 - 1]  # tightened
    app_rel = next(r for r in rels3 if "append-" in r)
    assert man4["dir_stats"][app_rel]["k"] == [200, 200]  # appends statted
    # the erased key's band is now provably clean: nothing reads it
    assert t.read_pruned(spark, "k", hi0, hi0).count() == 0
    # a range inside the tightened band touches exactly one dir
    got = t.read_pruned(spark, "k", hi0 - 1, hi0 - 1)
    read_dirs = {
        os.path.normpath(os.path.dirname(f.removeprefix("file:")))
        for f in got.inputFiles()
    }
    assert len(read_dirs) == 1
    # replay idempotence: no version bump, no new stats churn
    assert t.commit_restat(["k"], txn_id="restat-1") == 4
    assert t.current_version() == 4
    # rows are untouched throughout
    assert t.read(spark).count() == 400 - 4 + 1  # 4 rows had k = hi0


def test_restat_skips_null_bearing_and_missing_columns(spark, tmp_path):
    # a bound must cover every row: a column with NULLs (or absent from
    # a file's footer stats) keeps its OLD bound rather than recording
    # evidence-free tight ones.
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(
        spark.createDataFrame(
            [(1, 5), (2, None), (3, 9)], "id long, k long"
        )
    )
    t.commit_restat(["k", "nope"])
    st = t.manifest(2)["dir_stats"]
    # NULL-bearing k and absent column record no bounds at all
    assert st == {}
    # id is clean: bounds land
    t.commit_restat(["id"])
    (rel,) = t.manifest(3)["snapshots"]
    assert t.manifest(3)["dir_stats"][rel]["id"] == [1, 3]


def test_fixture_restat_makes_erased_band_provably_clean(spark, sf_dir):
    # fixture-level pin of the restat face's I/O claim: BEFORE the
    # stats refresh a user_id = 5 range read must probe the loose
    # [4, 5] band; AFTER it the read touches zero dirs.
    from gordo_components_spark.operators.extensions_pipeline import (
        _manifest_restat_root,
    )

    root = _manifest_restat_root(spark, sf_dir)
    t = ManifestTable(root)
    assert t.manifest(3)["restat"] == ["user_id"]
    loose = t.read_pruned(spark, "user_id", 5, 5, version=2)
    tight = t.read_pruned(spark, "user_id", 5, 5, version=3)
    assert loose.count() == 0 and tight.count() == 0  # both exact
    assert len(loose.inputFiles()) > 0  # v2 had to probe the loose band
    # v3's planner proves the band clean from the manifest alone: the
    # keep-list is empty, so the frame is the schema-only empty read
    assert tight.inputFiles() == []
    # pointer-only: v2 and v3 list identical dirs (same inodes)
    assert t.manifest(3)["snapshots"] == t.manifest(2)["snapshots"]


def test_granular_merge_cas_race_rederives_from_new_head(spark, clustered_tbl):
    # the merge mirror of the delete race pin: two merges racing for one
    # version — the loser must re-derive from the winner's head so BOTH
    # key sets land, and the winner's rewritten dir must not be
    # clobbered or double-anti-joined.
    t = clustered_tbl
    w2 = ManifestTable(t.root)
    real_publish = w2.publish
    fired = []

    def racing_publish(prepared):
        if not fired:
            fired.append(True)
            upd1 = spark.createDataFrame(
                [(7, 7, 7000)], "id long, k long, v long"
            )
            t.commit_merge(spark, upd1, key_col="id", prune_col="k")  # w1 wins v2
        return real_publish(prepared)

    w2.publish = racing_publish
    upd2 = spark.createDataFrame([(11, 11, 1111)], "id long, k long, v long")
    v = w2.commit_merge(spark, upd2, key_col="id", prune_col="k")
    assert v == 3  # lost v2, re-derived on top of the winner
    got = {r.id: (r.k, r.v) for r in w2.read(spark).collect()}
    assert got[7] == (7, 7000) and got[11] == (11, 1111)
    assert len(got) == 400  # both replaces, no duplicates, no losses


def test_legacy_schema_less_table_append_never_narrows_reads(spark, tmp_path):
    # r13 review (high): on a PRE-schema-authority table (r12-era
    # manifests record no schema), an append carrying FEWER columns must
    # not become the recorded authority — that would pin reads to the
    # narrow set and silently hide columns older dirs carry.
    import json as _json

    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(spark.range(3).selectExpr("id", "id*2 AS v", "id*3 AS w"))
    # simulate r12-era history: strip the recorded schema from v1
    mp = os.path.join(t.root, "manifests", "v00000001.json")
    man = _json.load(open(mp))
    del man["schema"]
    os.unlink(mp)
    with open(mp, "w") as fh:
        _json.dump(man, fh)
    t.commit_append(spark.range(3, 5).selectExpr("id", "id*2 AS v"))
    man2 = t.manifest(2)
    assert man2.get("schema") is None  # legacy history stays schema-less
    got = t.read(spark)
    assert "w" in got.columns  # the wide column still surfaces
    assert got.where("w IS NOT NULL").count() == 3


def test_merge_null_key_reports_null_not_duplicate(spark, clustered_tbl):
    # r13 review: countDistinct skips NULLs, so a NULL merge key used to
    # surface as a bogus "duplicate key" error.
    upd = spark.createDataFrame(
        [(None, 7, 1), (8, 8, 2)], "id long, k long, v long"
    )
    with pytest.raises(ValueError, match="id is NULL"):
        clustered_tbl.commit_merge(spark, upd, key_col="id", prune_col="k")


def test_reserved_internal_column_names_raise(spark, tmp_path, clustered_tbl):
    # r13 review: withColumn("__src"/"__band") would silently REPLACE a
    # data column of that name and the partitioned write would erase it.
    t = ManifestTable(str(tmp_path / "tbl"))
    bad = spark.range(5).selectExpr("id", "id AS __band")
    with pytest.raises(ValueError, match="__band.*reserved"):
        t.commit_clustered(bad, "id", n_dirs=2)
    t2 = ManifestTable(str(tmp_path / "tbl2"))
    t2.commit_append(spark.range(5).selectExpr("id", "id AS __src"))
    with pytest.raises(ValueError, match="__src.*reserved"):
        t2.commit_delete(spark, "id = 1")
    upd = spark.createDataFrame([(7, 7, 1)], "id long, k long, v long")
    # merge guard reads the TABLE schema: patch a reserved name into it
    man = clustered_tbl.manifest(1)
    from pyspark.sql.types import StructType

    sch = StructType.fromJson(man["schema"]).add("__src", "long")
    import json as _json

    mp = os.path.join(
        clustered_tbl.root, "manifests", f"v{1:08d}.json"
    )
    man["schema"] = sch.jsonValue()
    os.unlink(mp)
    with open(mp, "w") as fh:
        _json.dump(man, fh)
    with pytest.raises(ValueError, match="__src.*reserved"):
        clustered_tbl.commit_merge(spark, upd, key_col="id", prune_col="k")


def test_restat_keeps_old_bounds_for_non_json_stats(spark, tmp_path):
    # r13 review: timestamp/date/binary footer stats are not JSON-able;
    # restat must keep the old bound rather than crash in the manifest
    # write.
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(
        spark.range(3).selectExpr(
            "id", "timestamp_seconds(id * 3600) AS ts"
        )
    )
    v = t.commit_restat(["ts", "id"])  # must not raise
    assert v == 2
    (rel,) = t.manifest(2)["snapshots"]
    st = t.manifest(2)["dir_stats"][rel]
    assert "ts" not in st  # no JSON-able evidence: no bound recorded
    assert st["id"] == [0, 2]


def _handcraft_flat_dirs(t, n_dirs, rows_per_dir=5):
    # one tiny parquet file per dir via pyarrow (driver-side): building
    # a streaming-append-shaped table through n_dirs Spark writes would
    # dominate the test's runtime without testing anything extra
    import pyarrow as pa
    import pyarrow.parquet as pq

    rels = []
    for d in range(n_dirs):
        rel = os.path.join("snapshots", f"append-handmade-{d}")
        full = os.path.join(t.root, rel)
        os.makedirs(full)
        ids = [d * rows_per_dir + j for j in range(rows_per_dir)]
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "k": pa.array([i % 100 for i in ids], pa.int64()),
                    "v": pa.array([i * 2 for i in ids], pa.int64()),
                }
            ),
            os.path.join(full, "part-0.parquet"),
        )
        rels.append(rel)
    return rels


def test_many_dir_layout_plans_one_scan_node(spark, tmp_path):
    # VERDICT r13 what's-missing #1: at streaming-append dir counts the
    # per-dir union's plan width is O(dirs) and Catalyst planning time
    # becomes the bottleneck.  The all-flat pinned-schema fast path must
    # plan ONE multi-path scan — for the read AND for the granular
    # commit's internal probe/rewrite jobs — however many dirs the
    # manifest carries.
    import re

    from gordo_components_spark.plans import manifest_table as mt
    from pyspark.sql.types import LongType, StructField, StructType

    n_dirs = 400
    t = ManifestTable(str(tmp_path / "tbl"))
    rels = _handcraft_flat_dirs(t, n_dirs)
    schema = StructType(
        [StructField(c, LongType(), True) for c in ("id", "k", "v")]
    )
    t.publish(
        t._write_manifest_tmp(
            1,
            {
                "version": 1,
                "snapshots": rels,
                "dir_stats": {},
                "schema": ManifestTable._schema_json(schema),
            },
        )
    )
    def n_scans(plan):
        # anchored detail-block headers, one per physical scan node
        # (the tree section repeats the name — plain .count() sees 2)
        return len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))

    got = t.read(spark)
    assert got.count() == n_dirs * 5
    assert n_scans(mt.formatted_plan(got)) == 1

    # the delete's probe and survivor write must also stay single-scan:
    # the dir id rides a broadcast lookup over input_file_name's parent,
    # not one F.lit-tagged scan node per dir
    mt.MANIFEST_COMMIT_PLANS.clear()
    mt.arm_plan_capture(True)
    try:
        assert t.commit_delete(spark, "k = 55") == 2
    finally:
        mt.arm_plan_capture(False)
    plans = list(mt.MANIFEST_COMMIT_PLANS)
    assert len(plans) == 2  # probe aggregate + survivor write
    for p in plans:
        assert n_scans(p) == 1, "plan width regressed to O(dirs)"
    assert "BroadcastHashJoin" in plans[0]  # the dir-id lookup join
    assert "BroadcastNestedLoopJoin" not in plans[0]
    # the dir-id mapping routed every row to the right dir: only dirs
    # holding k=55 rows were rewritten, everything else is by-reference
    man = t.manifest(2)
    # ids 55, 155, ..., 1955: one matching row per 100 ids, each in a
    # different 5-row dir
    assert len(man["removed"]) == n_dirs * 5 // 100
    assert t.read(spark).where("k = 55").count() == 0
    assert t.read(spark).count() == n_dirs * 5 - len(man["removed"])


def test_legacy_schemaless_read_keeps_every_dirs_columns(spark, tmp_path):
    # round-14 review finding: a LEGACY manifest (no recorded schema)
    # over heterogeneous flat dirs used the multi-path scan, whose
    # schema comes from ONE file's footer — columns other dirs carry
    # were silently hidden, contradicting the never-narrow-legacy-reads
    # contract (_evolved_schema_json docstring).  Legacy layouts must
    # take the per-dir unionByName fallback.
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = ManifestTable(str(tmp_path / "tbl"))
    for d, cols in enumerate(
        [{"id": [1, 2]}, {"id": [3, 4], "extra": [30, 40]}]
    ):
        full = os.path.join(t.root, "snapshots", f"append-handmade-{d}")
        os.makedirs(full)
        pq.write_table(
            pa.table({c: pa.array(v, pa.int64()) for c, v in cols.items()}),
            os.path.join(full, "part-0.parquet"),
        )
    t.publish(
        t._write_manifest_tmp(
            1,
            {
                "version": 1,
                "snapshots": [
                    "snapshots/append-handmade-0",
                    "snapshots/append-handmade-1",
                ],
                "dir_stats": {},
                # no "schema": a legacy, pre-authority manifest
            },
        )
    )
    got = t.read(spark)
    assert set(got.columns) == {"id", "extra"}
    vals = {r.id: r.extra for r in got.collect()}
    assert vals == {1: None, 2: None, 3: 30, 4: 40}


def test_merge_route_via_join_matches_case_path(spark, tmp_path):
    # VERDICT r13 what's-missing #2: at many-band layouts the CASE-chain
    # routing is O(bands) per row and per plan; the bucketed broadcast
    # interval join must compute the IDENTICAL band-or-gap ids — same
    # rewrites, same gap-insert dirs, same read-back — with a
    # BroadcastHashJoin (equi on the bucket key, range residual), never
    # the BroadcastNestedLoopJoin the census flags.
    from gordo_components_spark.plans import manifest_table as mt

    base = spark.range(400).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 100 AS BIGINT) AS k"
    )
    # replaces in several bands + inserts below / between-bands / above
    upd = spark.createDataFrame(
        [
            (7, 7, 777),       # replace, low band
            (93, 93, 939),     # replace, high band
            (5000, -50, 1),    # insert below every band
            (5001, 550, 2),    # insert above every band
        ],
        "id long, k long, v long",
    )
    results = {}
    for mode, jmin in (("case", None), ("join", 1)):
        t = ManifestTable(str(tmp_path / f"tbl-{mode}"))
        assert t.commit_clustered(base, "k", n_dirs=8) == 1
        mt.MANIFEST_COMMIT_PLANS.clear()
        mt.arm_plan_capture(True)
        try:
            assert (
                t.commit_merge(
                    spark, upd, key_col="id", prune_col="k",
                    route_join_min=jmin,
                )
                == 2
            )
        finally:
            mt.arm_plan_capture(False)
        plans = list(mt.MANIFEST_COMMIT_PLANS)
        if mode == "join":
            joined = "\n".join(plans)
            assert "BroadcastHashJoin" in joined
            assert "BroadcastNestedLoopJoin" not in joined
        man = t.manifest(2)
        results[mode] = {
            "rows": sorted(
                (r.id, r.k, r.v) for r in t.read(spark).collect()
            ),
            "n_removed": len(man["removed"]),
            "n_added": len(man["added"]),
            "stats": sorted(
                tuple(v["k"]) for v in man["dir_stats"].values()
            ),
        }
    assert results["case"] == results["join"]
    # the merge really landed: replaces replaced, inserts inserted
    rows = dict(
        (i, (k, v)) for i, k, v in results["join"]["rows"]
    )
    assert rows[7] == (7, 777) and rows[93] == (93, 939)
    assert rows[5000] == (-50, 1) and rows[5001] == (550, 2)
    # gap inserts are their own dirs: 2 bands rewritten + 2 gap dirs
    assert results["join"]["n_removed"] == 2
    assert results["join"]["n_added"] == 4


def test_merge_route_join_auto_switch_above_threshold(spark, tmp_path):
    # ROUND15_NOTES #1: the equivalence test above FORCES
    # route_join_min=1; nothing covered the AUTO switch at the default
    # threshold.  A ≥_ROUTE_JOIN_MIN_BANDS clustered layout merged with
    # route_join_min=None must pick the bucketed broadcast interval
    # join ON ITS OWN (BroadcastHashJoin in the commit plans, never the
    # BNLJ census anti-pattern) and still land the merge exactly.
    from gordo_components_spark.plans import manifest_table as mt

    n_dirs = mt._ROUTE_JOIN_MIN_BANDS + 4
    base = spark.range(2 * n_dirs).selectExpr(
        "id", "id * 2 AS v", "CAST(id AS BIGINT) AS k"
    )
    t = ManifestTable(str(tmp_path / "tbl-auto"))
    assert t.commit_clustered(base, "k", n_dirs=n_dirs) == 1
    man = t.manifest(1)
    assert len(man["dir_stats"]) >= mt._ROUTE_JOIN_MIN_BANDS  # premise
    upd = spark.createDataFrame(
        [
            (3, 3, 333),                      # replace, low band
            (2 * n_dirs - 1, 2 * n_dirs - 1, 999),  # replace, top band
            (90000, 10**6, 1),                # insert above every band
        ],
        "id long, k long, v long",
    )
    mt.MANIFEST_COMMIT_PLANS.clear()
    mt.arm_plan_capture(True)
    try:
        assert (
            t.commit_merge(spark, upd, key_col="id", prune_col="k") == 2
        )
    finally:
        mt.arm_plan_capture(False)
    joined = "\n".join(mt.MANIFEST_COMMIT_PLANS)
    assert "BroadcastHashJoin" in joined
    assert "BroadcastNestedLoopJoin" not in joined
    rows = {r.id: (r.k, r.v) for r in t.read(spark).collect()}
    assert rows[3] == (3, 333)
    assert rows[2 * n_dirs - 1] == (2 * n_dirs - 1, 999)
    assert rows[90000] == (10**6, 1)
    assert len(rows) == 2 * n_dirs + 1


def test_merge_double_key_falls_back_to_case_chain(spark, tmp_path):
    # Round-14 independent review finding 1 (repro-confirmed): the
    # bucketed interval routing int()-truncates bounds, so a DOUBLE
    # clustering key misroutes a gap value (k=25.0 between bands
    # (…,24.25) and (25.25,…)) INTO a band dir whose recorded stats
    # then exclude a real row — read_pruned returned 0 rows for a row
    # that exists.  Non-integral bounds must take the CASE chain, which
    # compares the original values exactly.
    t = ManifestTable(str(tmp_path / "dbl"))
    base = spark.range(100).selectExpr(
        "id", "id * 2 AS v", "CAST(id AS DOUBLE) + 0.25 AS k"
    )
    assert t.commit_clustered(base, "k", n_dirs=4) == 1
    upd = spark.createDataFrame(
        [(7, 7.25, 777.0), (9000, 25.0, 1.0)],  # replace + GAP insert
        "id long, k double, v double",
    ).selectExpr("id", "CAST(v AS LONG) AS v", "k")
    # route_join_min=1 WOULD take the join path; the integral-bounds
    # guard must reject it and land the gap insert in its own gap dir
    assert (
        t.commit_merge(spark, upd, key_col="id", prune_col="k",
                       route_join_min=1)
        == 2
    )
    rows = {r.id: (r.v, r.k) for r in t.read(spark).collect()}
    assert rows[7] == (777, 7.25)
    assert rows[9000] == (1, 25.0)
    got = t.read_pruned(spark, "k", 25.0, 25.0)
    assert [r.id for r in got.collect()] == [9000]  # was 0 rows pre-fix


def test_merge_temp_column_name_falls_back(spark, tmp_path):
    # Round-14 independent review finding 2: a data column named like a
    # join-path temporary ('__bkt') was silently clobbered —
    # withColumn replaced it, drop removed it, and allowMissingColumns
    # refilled it with NULL in every rewritten dir.  The collision
    # guard must fall back to the CASE chain, which only touches the
    # already-reserved '__src'.
    t = ManifestTable(str(tmp_path / "bkt"))
    base = spark.range(50).selectExpr(
        "id", "id AS k", "id * 11 AS __bkt"
    )
    assert t.commit_clustered(base, "k", n_dirs=4) == 1
    upd = spark.createDataFrame(
        [(3, 3, 333), (2000, 900, 5)], "id long, k long, __bkt long"
    )
    assert (
        t.commit_merge(spark, upd, key_col="id", prune_col="k",
                       route_join_min=1)
        == 2
    )
    rows = {r.id: (r.k, r["__bkt"]) for r in t.read(spark).collect()}
    assert rows[3] == (3, 333)        # update carried the column
    assert rows[2000] == (900, 5)     # insert carried the column
    assert rows[10] == (10, 110)      # untouched rows keep theirs


def test_reserved_name_guards_are_case_insensitive(spark, tmp_path):
    # Round-14 second review pass (repro-confirmed): Spark resolves
    # column names case-insensitively by default, so '__Bkt' was
    # replaced by withColumn('__bkt', …) exactly like the exact-case
    # spelling — it slipped past every case-SENSITIVE reserved-name
    # guard and merged rows came back with __Bkt = NULL.
    t = ManifestTable(str(tmp_path / "case1"))
    base = spark.range(50).selectExpr("id", "id AS k", "id * 11 AS __Bkt")
    assert t.commit_clustered(base, "k", n_dirs=4) == 1
    upd = spark.createDataFrame(
        [(3, 3, 333)], "id long, k long, __Bkt long"
    )
    assert (
        t.commit_merge(spark, upd, key_col="id", prune_col="k",
                       route_join_min=1)
        == 2
    )
    rows = {r.id: r["__Bkt"] for r in t.read(spark).collect()}
    assert rows[3] == 333          # was NULL pre-fix
    assert rows[10] == 110
    # hard-reserved names refuse in any case variant
    t2 = ManifestTable(str(tmp_path / "case2"))
    bad = spark.range(5).selectExpr("id", "id AS k", "id AS __SRC")
    assert t2.commit_clustered(bad, "k", n_dirs=2) == 1
    with pytest.raises(ValueError, match="reserved"):
        t2.commit_merge(
            spark,
            spark.createDataFrame([(1, 1, 9)], "id long, k long, __SRC long"),
            key_col="id",
            prune_col="k",
        )
    with pytest.raises(ValueError, match="reserved"):
        t2.commit_delete(spark, "k = 1")
    with pytest.raises(ValueError, match="reserved"):
        ManifestTable(str(tmp_path / "case3")).commit_clustered(
            spark.range(5).selectExpr("id", "id AS k", "id AS __Band"),
            "k",
            n_dirs=2,
        )


def test_merge_route_join_quotes_hyphenated_key(spark, tmp_path):
    # Input-domain review class: the bucket expression interpolated the
    # prune column raw into SQL, so a legal hyphenated name like 'k-v'
    # parsed as SUBTRACTION of sibling columns k and v — wrong buckets
    # missed every mapping row and the loud left-join guard aborted a
    # merge the backtick-quoted form routes fine.
    t = ManifestTable(str(tmp_path / "hyph"))
    base = spark.range(60).selectExpr(
        "id", "id AS k", "id * 2 AS v", "id AS `k-v`"
    )
    assert t.commit_clustered(base, "k-v", n_dirs=4) == 1
    # rows chosen so the SUBTRACTION k−v lands a DIFFERENT bucket than
    # the true `k-v` value (999−0 → top bucket vs true 3 → bucket 0;
    # 0−50 → bucket 0 vs true 900 → above-gap): pre-fix both miss every
    # mapping row and the left-join guard aborts the commit
    upd = spark.createDataFrame(
        [(3, 999, 0, 3), (900, 0, 50, 900)],
        "id long, k long, v long, `k-v` long",
    )
    assert (
        t.commit_merge(spark, upd, key_col="id", prune_col="k-v",
                       route_join_min=1)
        == 2
    )
    rows = {r.id: (r.k, r.v) for r in t.read(spark).collect()}
    assert rows[3] == (999, 0) and rows[900] == (0, 50)
    assert len(rows) == 61


def test_fast_scan_handles_uri_encodable_root(spark, tmp_path):
    # Round-14 independent review finding 3: input_file_name() returns
    # a percent-encoded URI path (space → %20, % → %25; '+' and
    # non-ASCII stay literal — verified empirically), but the fast-scan
    # dir-id lookup compared it to os.path.abspath — under a root with
    # any encodable char every granular commit failed loud on the
    # unmatched-dir guard.  The decoded comparison must route exactly.
    t = ManifestTable(str(tmp_path / "tbl with sp%ace+plus"))
    base = spark.range(100).selectExpr("id", "id * 2 AS v", "id AS k")
    assert t.commit_clustered(base, "k", n_dirs=6) == 1
    # granular delete drives _scan_dirs' tagged fast path
    assert t.commit_delete(spark, "k BETWEEN 10 AND 12") == 2
    rows = {r.id for r in t.read(spark).collect()}
    assert rows == set(range(100)) - {10, 11, 12}
    # and a merge (probe + rewrite both ride the fast path)
    upd = spark.createDataFrame([(5, 5, 999)], "id long, k long, v long")
    assert (
        t.commit_merge(spark, upd, key_col="id", prune_col="k") == 3
    )
    got = {r.id: r.v for r in t.read(spark).collect()}
    assert got[5] == 999 and len(got) == 97


def test_nan_float_stats_guards(spark, tmp_path, clustered_tbl):
    # VERDICT r13 what's-wrong #4 / next-round #6.
    # (a) commit_restat refuses float columns outright: parquet footer
    # min/max EXCLUDE NaN rows (null_count stays 0), so a recorded bound
    # could not cover every row.
    t = ManifestTable(str(tmp_path / "ftbl"))
    t.commit_append(
        spark.createDataFrame(
            [(1, 1.5), (2, float("nan"))], "id long, x double"
        )
    )
    with pytest.raises(ValueError, match="floating-point"):
        t.commit_restat(["x"])
    # integer restat on the same table still works
    assert t.commit_restat(["id"]) == 2
    assert t.manifest(2)["dir_stats"]
    # (b) NaN bounds in a (hand-crafted/foreign) manifest are no
    # evidence: read_pruned and the delete's stats skip must READ the
    # dir, not prune it.
    import json as _json

    tc = clustered_tbl
    man = tc.manifest(1)
    rel0 = man["snapshots"][0]  # holds k in [0, 12]
    man["dir_stats"][rel0] = {"k": [float("nan"), float("nan")]}
    mp = os.path.join(tc.root, "manifests", "v00000001.json")
    os.unlink(mp)
    with open(mp, "w") as fh:
        _json.dump(man, fh)
    got = tc.read_pruned(spark, "k", 5, 5)
    assert got.where("k = 5").count() == 4  # rows in the NaN-statted dir
    # delete with a prune spec covering k=5: the NaN dir is a candidate
    # (scanned), so the rows actually disappear
    tc.commit_delete(spark, "k = 5", prune=("k", [5]))
    assert tc.read(spark).where("k = 5").count() == 0
    # (c) merge treats NaN prune-col bounds as missing stats: refuse
    with pytest.raises(ValueError, match="stats on every data dir"):
        tc.commit_merge(
            spark,
            spark.createDataFrame([(7, 7, 1)], "id long, k long, v long"),
            key_col="id",
            prune_col="k",
        )


def test_nested_schema_evolution_relaxes_nullability(spark, tmp_path):
    # VERDICT r13 what's-missing #3: an evolved NESTED struct field must
    # not keep nullable=false in the authority — pre-evolution dirs
    # serve NULL structs.
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(spark.range(3).selectExpr("id"))
    evolved = spark.range(3, 6).selectExpr(
        "id", "named_struct('a', id, 'b', id * 2) AS s"
    )
    # the incoming frame's inner fields are non-nullable (built from a
    # non-null id) — the recorded authority must relax them anyway
    assert not evolved.schema["s"].dataType["a"].nullable
    t.commit_append(evolved)
    got = t.read(spark)
    f = got.schema["s"]
    assert f.nullable
    assert all(inner.nullable for inner in f.dataType.fields)
    rows = {r.id: r.s for r in got.collect()}
    assert rows[1] is None and rows[4] == (4, 8)
    # re-appending the same non-null-nested shape is NOT a type change
    t.commit_append(
        spark.range(6, 8).selectExpr(
            "id", "named_struct('a', id, 'b', id * 2) AS s"
        )
    )
    assert t.read(spark).count() == 8


def test_changefeed_rejects_reversed_window(spark, tmp_path, frames):
    a, b = frames
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(a)
    t.commit_append(b)
    with pytest.raises(ValueError, match="from_version"):
        t.changefeed(spark, 2, 1)


def test_delete_on_evolved_column_keeps_pre_evolution_rows(spark, tmp_path):
    # round-14 review probe: a DELETE whose predicate references an
    # evolved column runs over pre-evolution dirs through the fast
    # multi-path scan, which serves NULL for the missing column — the
    # NULL-predicate rows must be RETAINED (Delta DELETE semantics),
    # and the dirs holding them stay by-reference (hits = 0).
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_append(spark.range(3).selectExpr("id"))
    t.commit_append(spark.range(3, 6).selectExpr("id", "id AS w"))
    old_dirs = set(t.manifest(2)["snapshots"])
    t.commit_delete(spark, "w = 4")
    assert {r.id for r in t.read(spark).collect()} == {0, 1, 2, 3, 5}
    man = t.manifest(3)
    # only the dir that actually held w=4 was rewritten
    assert len(man["removed"]) == 1
    assert old_dirs - set(man["removed"]) < set(man["snapshots"])
