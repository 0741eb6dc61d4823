"""Commit-log marker roll-up (VERDICT r3 #3): a long-running stream writes
one marker per micro-batch; without compaction the state directory reaches
10⁵–10⁶ files and every resume pays an object-store LIST over all of them.
Markers roll into immutable chunks; resume reads stay O(1)-ish.
"""

import json

from cdc_tools_spark.lake import fsio
from cdc_tools_spark.state.commit_log import CommitLog, EpochCommit


def _rec(epoch, execution_id="run-x", table="repo_files"):
    return EpochCommit(
        execution_id=execution_id, table_name=table, epoch=epoch,
        from_lsn=epoch * 10, to_lsn=epoch * 10 + 9,
        applied_upserts=epoch % 7, applied_deletes=epoch % 3,
    )


def test_ten_thousand_epochs_resume_with_bounded_listing(tmp_path):
    log = CommitLog(str(tmp_path), "run-x", roll_every=256)
    for e in range(10_000):
        assert log.commit(_rec(e))

    names = fsio.listdir(log.dir)
    # 10k epochs: ≤ roll_every loose markers + a self-compacted handful of
    # chunks (auto-compaction folds adjacent chunks once compact_min_chunks
    # accumulate — VERDICT r4 #3), not 10k files
    assert len(names) < 350
    n_chunks = sum(1 for n in names if n.startswith("chunk-"))
    assert 1 <= n_chunks <= log.compact_min_chunks

    # resume point: newest loose marker (or newest chunk), no history read
    reads = []
    orig = fsio.read_text

    def spy(path):
        reads.append(path)
        return orig(path)

    fresh = CommitLog(str(tmp_path), "run-x", roll_every=256)
    try:
        fsio.read_text = spy
        last = fresh.last_committed()
    finally:
        fsio.read_text = orig
    assert last is not None and last.epoch == 9_999
    assert len(reads) <= 2  # one marker or one chunk — never the history

    # exactness survives the roll-up
    assert fresh.committed_epochs() == list(range(10_000))
    assert fresh.is_committed(5) and fresh.is_committed(9_999)
    assert not fresh.is_committed(10_000)
    recs = fresh.records()
    assert len(recs) == 10_000 and recs[123].applied_upserts == 123 % 7

    # chunk compaction bounds the chunk count itself
    fresh.compact_chunks()
    names = fsio.listdir(fresh.dir)
    assert sum(1 for n in names if n.startswith("chunk-")) == 1
    assert fresh.committed_epochs() == list(range(10_000))


def test_roll_crash_window_never_loses_or_duplicates_epochs(tmp_path):
    """Chunk created but markers not yet deleted (crash mid-roll): readers
    see each epoch in two places and dedupe; re-rolling repairs."""
    from dataclasses import asdict

    log = CommitLog(str(tmp_path), "run-x", roll_every=4)
    for e in range(4):
        fsio.create_exclusive_json(log._path(e), asdict(_rec(e)), indent=None)
    # simulate the crash: chunk exists, markers still present
    recs = [json.loads(fsio.read_text(log._path(e))) for e in range(4)]
    fsio.create_exclusive(
        log.dir + "/chunk-0000000000-0000000003.json",
        json.dumps({"records": recs}),
    )
    assert log.committed_epochs() == [0, 1, 2, 3]
    assert len(log.records()) == 4
    assert log.is_committed(2)
    # next commit triggers a roll that clears the duplicated markers
    log.commit(_rec(4))
    for e in range(8):
        log.commit(_rec(e + 5))
    loose = [n for n in fsio.listdir(log.dir) if n.startswith("epoch-")]
    assert len(loose) < 8
    assert log.committed_epochs() == list(range(13))


def test_unrolled_log_behaves_exactly_as_before(tmp_path):
    log = CommitLog(str(tmp_path), "run-x")
    assert log.last_committed() is None
    assert log.committed_epochs() == []
    log.commit(_rec(0))
    log.commit(_rec(1))
    assert not log.commit(_rec(1))  # marker race: second create is a no-op
    assert log.committed_epochs() == [0, 1]
    assert log.last_committed().epoch == 1


def test_compact_groups_into_bounded_superchunks(tmp_path):
    """Size-tiered compaction: chunks fold into superchunks of at most
    compact_max_records epochs; already-full superchunks never re-merge."""
    from dataclasses import asdict

    log = CommitLog(str(tmp_path), "run-x", roll_every=4,
                    compact_min_chunks=64, compact_max_records=8)
    for e in range(32):
        log.commit(_rec(e))
    # 8 chunks of 4; manual compact with cap 8 -> 4 superchunks of 8
    written = log.compact_chunks()
    assert len(written) == 4
    names = [n for n in fsio.listdir(log.dir) if n.startswith("chunk-")]
    assert len(names) == 4
    for n in names:
        lo, hi = CommitLog._chunk_range(n)
        assert hi - lo + 1 == 8
    # second compact: every chunk already at the cap -> nothing merges
    assert log.compact_chunks() == []
    assert log.committed_epochs() == list(range(32))
    assert log.last_committed().epoch == 31


def test_compact_same_name_incomplete_chunk_is_not_trusted(tmp_path):
    """ADVICE r4: if the merge's target name already exists but is MISSING
    epochs present in other inputs (possible after concurrent rolls), the
    inputs must not be deleted without durably writing the full merge."""
    from dataclasses import asdict

    log = CommitLog(str(tmp_path), "run-x", roll_every=4)
    # two overlapping chunks: [0..3] with only epochs {0,3}, [1..2] full
    fsio.create_exclusive(
        log.dir + "/chunk-0000000000-0000000003.json",
        json.dumps({"records": [asdict(_rec(0)), asdict(_rec(3))]}),
    )
    fsio.create_exclusive(
        log.dir + "/chunk-0000000001-0000000002.json",
        json.dumps({"records": [asdict(_rec(1)), asdict(_rec(2))]}),
    )
    # merged range is 0..3 == the incomplete chunk's own name
    log.compact_chunks()
    assert log.committed_epochs() == [0, 1, 2, 3]  # nothing lost
    assert len(log.records()) == 4
    # and the durable state on disk (fresh reader) agrees
    fresh = CommitLog(str(tmp_path), "run-x")
    assert fresh.committed_epochs() == [0, 1, 2, 3]


def test_resume_point_never_regresses_behind_newest_chunk(tmp_path):
    """ADVICE r4: a stale driver re-creating an OLD epoch's loose marker
    after it was rolled must not drag last_committed behind the chunk."""
    from dataclasses import asdict

    log = CommitLog(str(tmp_path), "run-x", roll_every=4)
    for e in range(8):
        log.commit(_rec(e))  # rolls twice -> epochs 0..7 chunked
    assert not [n for n in fsio.listdir(log.dir) if n.startswith("epoch-")]
    # stale driver re-creates epoch 2's marker
    fsio.create_exclusive_json(log._path(2), asdict(_rec(2)), indent=None)
    fresh = CommitLog(str(tmp_path), "run-x")
    assert fresh.last_committed().epoch == 7  # not 2
    assert fresh.committed_epochs() == list(range(8))


def test_chunk_cache_is_bounded_lru(tmp_path):
    log = CommitLog(str(tmp_path), "run-x", roll_every=2,
                    compact_min_chunks=1000, cache_chunks=3)
    for e in range(20):
        log.commit(_rec(e))
    for e in range(0, 20, 2):  # point-probe every chunk
        assert log.is_committed(e)
    assert len(log._chunk_cache) <= 3


def _synthesize_chunked_history(root, n_epochs, per_chunk):
    """Build a long-stream state dir directly as chunk files (writing 10⁶
    individual markers would test the filesystem, not the reader)."""
    from dataclasses import asdict

    log = CommitLog(str(root), "run-x")
    e = 0
    while e < n_epochs:
        hi = min(e + per_chunk, n_epochs) - 1
        recs = [asdict(_rec(x)) for x in range(e, hi + 1)]
        fsio.create_exclusive(
            log.dir + f"/chunk-{e:010d}-{hi:010d}.json",
            json.dumps({"records": recs}),
        )
        e = hi + 1
    return log


def test_million_epoch_stream_bounded_driver_reads(tmp_path, spark):
    """VERDICT r4 #3 'done' gate: a 10⁶-epoch state dir resumes with O(1)
    reads AND serves the metrics DataFrame without the driver reading the
    chunk files at all (Spark's JSON reader does, distributed)."""
    import os as _os

    n = 1_000_000
    log = _synthesize_chunked_history(tmp_path, n, per_chunk=65_536)

    reads = []
    orig = fsio.read_text

    def spy(path):
        reads.append(path)
        return orig(path)

    fresh = CommitLog(str(tmp_path), "run-x")
    try:
        fsio.read_text = spy
        last = fresh.last_committed()
        df = fresh.as_dataframe(spark)
        total = df.count()
        agg = df.selectExpr(
            "sum(applied_upserts) as u", "max(epoch) as m"
        ).first()
    finally:
        fsio.read_text = orig
    assert last.epoch == n - 1
    assert len(reads) <= 2  # resume: one chunk read; metrics: ZERO driver reads
    assert total == n
    assert agg["m"] == n - 1
    assert agg["u"] == sum(e % 7 for e in range(n))
    assert len(fresh._chunk_cache) <= fresh.cache_chunks


def test_newest_mtime_sees_files_under_directory(tmp_path):
    import os as _os
    import time as _time

    d = tmp_path / "v-dir" / "nested"
    d.mkdir(parents=True)
    f = d / "part-0.parquet"
    f.write_text("x")
    old = _time.time() - 10_000
    _os.utime(tmp_path / "v-dir", (old, old))  # stale dir entry
    assert fsio.mtime(str(tmp_path / "v-dir")) < _time.time() - 9_000
    # newest_mtime ignores the stale dir entry and finds the fresh file
    assert fsio.newest_mtime(str(tmp_path / "v-dir")) > _time.time() - 60
    assert fsio.newest_mtime(str(tmp_path / "missing")) == 0.0


def test_newest_mtime_exact_cap_is_not_truncation(tmp_path):
    """A tree of EXACTLY max_entries files is fully enumerated: the true
    (old) max must come back, not wall clock — otherwise any ≥cap-sized
    version dir reads 'just modified' forever and vacuum never GCs it
    (ADVICE r6, medium)."""
    import os as _os
    import time as _time

    d = tmp_path / "v-big"
    d.mkdir()
    old = _time.time() - 10_000
    for i in range(4):
        f = d / f"part-{i}.parquet"
        f.write_text("x")
        _os.utime(f, (old, old))
    _os.utime(d, (old, old))
    # fully enumerated at the cap: true stale max, vacuum may proceed
    assert fsio.newest_mtime(str(d), max_entries=4) < _time.time() - 9_000
    # one MORE file than the cap: genuine truncation -> fail-safe wall clock
    assert fsio.newest_mtime(str(d), max_entries=3) > _time.time() - 60


def test_lifecycle_interleavings_preserve_history(tmp_path):
    """Property: random interleavings of commit / roll / compact /
    crash-mid-roll (chunk created, markers kept) / stale-second-driver
    marker re-creation preserve EXACT committed history and a
    never-regressing resume point. Derandomized schedules (pure fs ops —
    no Spark), mirroring the maintenance property suite's approach."""
    import random
    from dataclasses import asdict

    for seed in range(40):
        rng = random.Random(seed)
        root = tmp_path / f"s{seed}"
        log = CommitLog(str(root), "run-x", roll_every=4,
                        compact_min_chunks=3, compact_max_records=16)
        committed = []
        next_epoch = 0
        for _ in range(rng.randrange(10, 60)):
            op = rng.random()
            if op < 0.6:
                log.commit(_rec(next_epoch))
                committed.append(next_epoch)
                next_epoch += 1
            elif op < 0.7:
                log.roll()
            elif op < 0.8:
                log.compact_chunks(max_records=rng.choice([4, 16, 10**6]))
            elif op < 0.9 and committed:
                # crash-mid-roll artifact: chunk exists AND its markers do —
                # fabricate by re-creating a rolled epoch's loose marker
                e = rng.choice(committed)
                fsio.create_exclusive_json(log._path(e), asdict(_rec(e)), indent=None)
            else:
                # stale second driver: fresh instance (cold caches) commits
                # the next epoch or re-rolls
                other = CommitLog(str(root), "run-x", roll_every=4,
                                  compact_min_chunks=3, compact_max_records=16)
                if committed and rng.random() < 0.5:
                    other.roll()
                else:
                    other.commit(_rec(next_epoch))
                    committed.append(next_epoch)
                    next_epoch += 1
            # invariants hold at EVERY step, from a cold reader
            fresh = CommitLog(str(root), "run-x")
            assert fresh.committed_epochs() == committed, f"seed {seed}"
            if committed:
                assert fresh.last_committed().epoch == committed[-1], f"seed {seed}"
                recs = fresh.records()
                assert [r.epoch for r in recs] == committed
                assert all(r.applied_upserts == r.epoch % 7 for r in recs)
            else:
                assert fresh.last_committed() is None


def test_as_dataframe_at_superchunk_tier_with_compaction_racing(tmp_path, spark):
    """VERDICT r5 #8: the metrics DataFrame stays EXACT at superchunk-tier
    sizes while compaction races the read, in both race windows:

    * write-before-delete window — a superchunk is durable while its input
      chunks still exist; a reader listing then must dedupe by epoch, not
      double-count;
    * delete-after-listing window — a DataFrame derived from a
      pre-compaction listing whose files are then deleted must either
      return the COMPLETE history or fail loudly (default Spark semantics:
      a vanished input file fails the job) — never a silent partial
      result; re-deriving after the race is exact.
    """
    # -- window 1: superchunk + its inputs coexist -------------------------
    n = 131_072
    d1 = tmp_path / "w1"
    _synthesize_chunked_history(d1, n, per_chunk=4096)
    log = CommitLog(str(d1), "run-x",
                    compact_min_chunks=10**9,  # no auto-compact during commits
                    compact_max_records=65_536)
    for e in range(n, n + 3):  # loose tail riding along
        log.commit(_rec(e))
    # same records, compacted shape, inputs NOT deleted (the durable-but-
    # not-yet-cleaned window of compact_chunks)
    _, chunks = log._listing()
    sixteen = chunks[:16]
    merged = [r for name in sixteen for r in log._chunk_records(name)]
    lo, hi = merged[0]["epoch"], merged[-1]["epoch"]
    fsio.create_exclusive(
        log.dir + f"/chunk-{lo:010d}-{hi:010d}.json",
        json.dumps({"records": merged}),
    )
    overlap = CommitLog(str(d1), "run-x")
    df = overlap.as_dataframe(spark)
    assert df.count() == n + 3  # epoch dedupe, no double-count
    assert overlap.last_committed().epoch == n + 2

    # full compaction then an exact re-read at superchunk tier
    log2 = CommitLog(str(d1), "run-x", compact_min_chunks=2,
                     compact_max_records=65_536)
    log2.compact_chunks()
    df2 = log2.as_dataframe(spark)
    agg = df2.selectExpr("count(*) c", "sum(applied_upserts) u", "max(epoch) m").first()
    assert agg["c"] == n + 3
    assert agg["m"] == n + 2
    assert agg["u"] == sum(e % 7 for e in range(n + 3))

    # -- window 2: inputs deleted after the reader's listing ---------------
    m = 32_768
    d2 = tmp_path / "w2"
    _synthesize_chunked_history(d2, m, per_chunk=4096)
    racer = CommitLog(str(d2), "run-x", compact_min_chunks=2,
                      compact_max_records=65_536)
    stale = racer.as_dataframe(spark)  # listing snapshot taken here
    assert racer.compact_chunks()      # deletes the listed inputs
    try:
        got = stale.count()
    except Exception:
        got = None  # loud failure is acceptable; silent partial is not
    assert got is None or got == m
    fresh = racer.as_dataframe(spark)
    assert fresh.count() == m and racer.last_committed().epoch == m - 1
