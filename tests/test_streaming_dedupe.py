"""Streaming near-dup rejection: micro-batches dedupe against the
stored band index; invariants hold for ANY micro-batch order (file
order is not list order — the replay gotcha), plus targeted
keep-exactly-one checks per duplicate group."""

from __future__ import annotations

import os

from airbnb_pyspark_jobs_spark.operators.dedupe import minhash_lsh_pairs
from airbnb_pyspark_jobs_spark.streaming.dedupe import streaming_minhash_dedup

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = BASE + " extra"
DIFF = "completely different words one two three four five six seven"


def _write_batch(spark, src: str, rows) -> None:
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)


def test_streaming_dedup_keeps_one_per_group(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, BASE),
            (2, DIFF),
            (3, "another unrelated document with its own vocabulary entirely here"),
        ],
    )
    _write_batch(
        spark,
        src,
        [
            (11, BASE),  # exact cross-batch dup of 1
            (12, NEAR),  # near-dup of the BASE group
            (14, NEAR),  # within-batch dup of 12
            (13, "fresh unique text nothing shared with anything previously seen"),
        ],
    )
    _write_batch(
        spark,
        src,
        [
            (21, BASE),  # third copy, different batch
            (22, DIFF),  # cross-batch dup of 2
            (23, "yet more singular content unlike any other ingested document"),
        ],
    )

    warehouse = str(tmp_path / "wh")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_minhash_dedup(
        stream, warehouse, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    accepted_df = spark.read.parquet(os.path.join(warehouse, "accepted"))
    accepted = {r.doc_id for r in accepted_df.select("doc_id").collect()}
    all_ids = {1, 2, 3, 11, 12, 13, 14, 21, 22, 23}
    rejected = all_ids - accepted

    # exactly one survivor per duplicate group, regardless of batch order
    assert len(accepted & {1, 11, 21}) == 1
    assert len(accepted & {2, 22}) == 1
    assert {12, 14} <= rejected  # near-dups of the BASE group never win
    assert {3, 13, 23} <= accepted  # uniques always pass

    # accepted corpus contains NO near-dup pair at the same banding config
    assert minhash_lsh_pairs(accepted_df, threshold=0.5).isEmpty()

    # every rejection is audited with a verified pair
    dups = spark.read.parquet(os.path.join(warehouse, "dups"))
    logged = {r.doc_id_a for r in dups.collect()} | {
        r.doc_id_b for r in dups.collect()
    }
    assert rejected <= logged
    assert dups.filter("jaccard < 0.5").isEmpty()

    # the stored index covers exactly the accepted docs (2 bands each)
    idx = spark.read.parquet(os.path.join(warehouse, "index"))
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} == accepted
    assert idx.count() == 2 * len(accepted)


def test_streaming_dedup_resumes_from_stored_state(spark, tmp_path):
    """A RESTARTED query (same checkpoint, new files) must dedupe new
    batches against the PERSISTED accepted/index state — history is
    loaded from storage, not session memory."""
    src = str(tmp_path / "src")
    warehouse = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_minhash_dedup(stream, warehouse, checkpoint=ckpt)
        q.awaitTermination(180)

    _write_batch(spark, src, [(1, BASE), (2, DIFF)])
    run_available()  # first run drains, then the query terminates

    accepted1 = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(warehouse, "accepted")).collect()
    }
    assert accepted1 == {1, 2}

    # new session of the stream: a dup of doc 1 and a fresh unique doc
    _write_batch(
        spark,
        src,
        [(11, BASE), (12, "entirely novel content appearing after the restart only")],
    )
    run_available()

    accepted2 = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(warehouse, "accepted")).collect()
    }
    assert accepted2 == {1, 2, 12}  # 11 rejected vs STORED doc 1
    dups = spark.read.parquet(os.path.join(warehouse, "dups"))
    assert dups.filter("doc_id_a = 1 AND doc_id_b = 11").count() == 1


def test_streaming_dedup_restart_converges_to_uninterrupted_run(
    spark, tmp_path, monkeypatch
):
    """Kill-and-restart-from-checkpoint (the test_stateful_streaming
    pattern): a query KILLED mid-stream (batch 1 dies before any state
    write — deterministic, injected via the pairing operator) and
    restarted on the SAME checkpoint must converge to identical
    accepted-set AND band-index state as an uninterrupted run over the
    same source — the q111 incremental result is restart-invariant."""
    src = str(tmp_path / "src")
    rows_by_file = [
        [(1, BASE), (2, DIFF)],
        [(11, BASE), (12, NEAR), (13, "fresh unique text nothing shared at all")],
        [(21, BASE), (22, DIFF), (23, "more singular content unlike anything")],
    ]
    for rows in rows_by_file:
        _write_batch(spark, src, rows)

    def drain(warehouse, ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_minhash_dedup(stream, warehouse, checkpoint=ckpt)
        q.awaitTermination(180)

    # uninterrupted reference run
    wh_a, ckpt_a = str(tmp_path / "wh_a"), str(tmp_path / "ckpt_a")
    drain(wh_a, ckpt_a)

    # interrupted run: batch 0 commits, batch 1 dies BEFORE any state
    # write (the pairing operator raises on its 2nd call) — the query
    # fails mid-stream; restart on the same checkpoint replays batch 1
    import airbnb_pyspark_jobs_spark.streaming.dedupe as sd_mod
    from airbnb_pyspark_jobs_spark.operators.dedupe import (
        incremental_minhash_pairs as real_pairs,
    )

    calls = {"n": 0}

    def killer(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected mid-stream crash (batch 1)")
        return real_pairs(*args, **kwargs)

    monkeypatch.setattr(sd_mod, "incremental_minhash_pairs", killer)
    wh_b, ckpt_b = str(tmp_path / "wh_b"), str(tmp_path / "ckpt_b")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_minhash_dedup(stream, wh_b, checkpoint=ckpt_b)
    import pyspark.errors

    try:
        q.awaitTermination(180)
    except pyspark.errors.StreamingQueryException:
        pass
    assert calls["n"] == 2, "the crash must hit batch 1 mid-stream"
    monkeypatch.setattr(sd_mod, "incremental_minhash_pairs", real_pairs)
    drain(wh_b, ckpt_b)  # restart from the same checkpoint, drain the rest

    def state(warehouse):
        acc = {
            r.doc_id
            for r in spark.read.parquet(os.path.join(warehouse, "accepted"))
            .select("doc_id")
            .distinct()
            .collect()
        }
        idx = {
            (r.doc_id, r.band_idx, r.band_hash)
            for r in spark.read.parquet(os.path.join(warehouse, "index"))
            .distinct()
            .collect()
        }
        return acc, idx

    acc_a, idx_a = state(wh_a)
    acc_b, idx_b = state(wh_b)
    assert acc_b == acc_a
    assert idx_b == idx_a
    # and the converged state is the batch-expected keep-first result
    assert len(acc_a & {1, 11, 21}) == 1 and min({1, 11, 21} & acc_a) == 1
    assert len(acc_a & {2, 22}) == 1 and 2 in acc_a
    assert {13, 23} <= acc_a and 12 not in acc_a


def test_streaming_dedup_replay_after_partial_write_is_idempotent(
    spark, tmp_path, monkeypatch
):
    """The WORST crash point: batch 1 dies AFTER its accepted rows are
    written but BEFORE its index rows (injected: the band-index builder
    raises on its batch-1 call). The replay must not see the partial
    accepted state (it would self-reject the whole batch), and the
    overwrite-by-batch layout must leave zero duplicate rows — final
    state identical to an uninterrupted run."""
    src = str(tmp_path / "src")
    rows_by_file = [
        [(1, BASE), (2, DIFF)],
        [(11, BASE), (13, "fresh unique text nothing shared at all")],
    ]
    for rows in rows_by_file:
        _write_batch(spark, src, rows)

    def drain(warehouse, ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_minhash_dedup(stream, warehouse, checkpoint=ckpt)
        q.awaitTermination(180)

    wh_a, ckpt_a = str(tmp_path / "wh_a"), str(tmp_path / "ckpt_a")
    drain(wh_a, ckpt_a)  # uninterrupted reference

    import airbnb_pyspark_jobs_spark.streaming.dedupe as sd_mod
    from airbnb_pyspark_jobs_spark.operators.dedupe import (
        minhash_band_index as real_index,
    )

    calls = {"n": 0}

    def killer(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:  # batch 1, AFTER accepted.write already ran
            raise RuntimeError("injected crash between accepted and index writes")
        return real_index(*args, **kwargs)

    monkeypatch.setattr(sd_mod, "minhash_band_index", killer)
    wh_b, ckpt_b = str(tmp_path / "wh_b"), str(tmp_path / "ckpt_b")
    import pyspark.errors

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_minhash_dedup(stream, wh_b, checkpoint=ckpt_b)
    try:
        q.awaitTermination(180)
    except pyspark.errors.StreamingQueryException:
        pass
    assert calls["n"] == 2
    # the partial write really happened: batch 1's accepted dir exists,
    # its index dir does not
    assert os.path.exists(os.path.join(wh_b, "accepted", "batch_id=1"))
    assert not os.path.exists(os.path.join(wh_b, "index", "batch_id=1"))
    monkeypatch.setattr(sd_mod, "minhash_band_index", real_index)
    drain(wh_b, ckpt_b)

    def state(warehouse):
        acc_df = spark.read.parquet(os.path.join(warehouse, "accepted"))
        acc = sorted((r.doc_id, r.text) for r in acc_df.collect())  # NO distinct
        idx = sorted(
            (r.doc_id, r.band_idx, r.band_hash)
            for r in spark.read.parquet(os.path.join(warehouse, "index")).collect()
        )
        return acc, idx

    assert state(wh_b) == state(wh_a)
    acc_ids = {d for d, _ in state(wh_a)[0]}
    assert acc_ids == {1, 2, 13}  # 11 rejected vs stored doc 1


def test_checkpoint_guard_propagates_corrupt_warehouse_errors(spark, tmp_path):
    """The mismatch guard may treat only a MISSING warehouse as
    'nothing to mismatch' — an unreadable/corrupted state dir must
    propagate, not silently disable the guard (ADVICE r7)."""
    import pytest

    from airbnb_pyspark_jobs_spark.streaming.dedupe import (
        _DOCS_SCHEMA,
        _assert_checkpoint_matches,
    )

    # missing path: fine, nothing to mismatch
    _assert_checkpoint_matches(
        spark, str(tmp_path / "nope"), _DOCS_SCHEMA, batch_id=0
    )

    # corrupt state: a junk file where parquet partitions should be
    bad = tmp_path / "bad" / "batch_id=3"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_text("this is not parquet")
    with pytest.raises(Exception) as ei:
        _assert_checkpoint_matches(spark, str(tmp_path / "bad"), _DOCS_SCHEMA, 0)
    assert "PATH_NOT_FOUND" not in str(ei.value)


def test_streaming_dedup_fresh_checkpoint_over_existing_warehouse_raises(
    spark, tmp_path
):
    """Misuse guard (ADVICE r6): a FRESH checkpoint over an existing
    warehouse restarts batch ids at 0 — without the guard, batch 0 would
    dedupe against nothing (pruning to batch_id < 0) and then OVERWRITE
    the old batch_id=0 partitions. The run must fail loudly with a
    checkpoint/warehouse mismatch instead, leaving the stored state
    untouched."""
    import pyspark.errors

    src = str(tmp_path / "src")
    warehouse = str(tmp_path / "wh")
    _write_batch(spark, src, [(1, BASE), (2, DIFF)])
    _write_batch(spark, src, [(11, BASE), (13, "fresh unique text here")])

    def drain(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_minhash_dedup(stream, warehouse, checkpoint=ckpt)
        q.awaitTermination(180)

    drain(str(tmp_path / "ckpt_good"))  # commits batch_id=0 and 1
    before = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(os.path.join(warehouse, "accepted")).collect()
    )

    try:
        drain(str(tmp_path / "ckpt_fresh"))  # replays from batch 0
        raise AssertionError("fresh checkpoint over existing warehouse must fail")
    except pyspark.errors.StreamingQueryException as e:
        assert "CheckpointWarehouseMismatch" in str(e)

    after = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(os.path.join(warehouse, "accepted")).collect()
    )
    assert after == before  # stored state untouched by the refused run


def test_streaming_video_dedup_keeps_one_clip_per_group(spark, tmp_path):
    """q343's composition on ingest: clips are frame-hashed per batch
    and deduped against the STORED band index — one survivor per
    duplicate clip group across batches, uniques always pass, the
    accepted corpus holds no near-dup pair under the BATCH operator
    (video_near_dup_pairs), every rejection audited, and the index
    never stores frames (band rows over the sequence fingerprint)."""
    import os

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        frame_hashes,
        frame_sequence_docs,
        video_near_dup_pairs,
    )
    from airbnb_pyspark_jobs_spark.streaming.dedupe import streaming_video_dedup

    t_a = "the quick brown fox jumps over a lazy dog near the still river bank at dawn"
    t_b = "carpenters measure seasoned oak planks and join them to sturdy frames today"
    t_c = "ancient lighthouses warn distant ships away from jagged rocks each evening"
    t_d = "silent harbors hold many boats while gulls circle in the grey morning sky"

    def clip(mid: int, text: str) -> Row:
        return Row(
            media_id=mid,
            payload=text.encode(),
            meta=Row(
                modality="video", mime="video/mp4",
                width=None, height=None, n_frames=8, sample_rate=None,
            ),
        )

    src = str(tmp_path / "src")
    batches = [
        [clip(1, t_a), clip(2, t_b)],
        [clip(11, t_a), clip(12, t_c), clip(13, t_c)],  # 11 dups 1; 13 dups 12
        [clip(21, t_b), clip(22, t_d)],                  # 21 dups 2
    ]
    for rows in batches:
        spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_video_dedup(stream, wh, ckpt)
    q.awaitTermination(180)

    accepted = spark.read.parquet(os.path.join(wh, "accepted"))
    ids = {r.doc_id for r in accepted.select("doc_id").collect()}
    assert len(ids & {1, 11}) == 1
    assert len(ids & {12, 13}) == 1
    assert len(ids & {2, 21}) == 1
    assert 22 in ids

    # accepted set is near-dup-free under the BATCH operator on the
    # original payloads (stream == batch semantics)
    all_media = spark.createDataFrame(
        [c for rows in batches for c in rows], MEDIA_SCHEMA
    )
    surv = all_media.join(
        accepted.select(F.col("doc_id").alias("media_id")), "media_id", "left_semi"
    )
    assert video_near_dup_pairs(surv, threshold=0.5).isEmpty()

    # the stored text IS the frame-sequence fingerprint, byte-equal to
    # recomputing it from the payloads (no drift between paths)
    want = {
        (r.media_id, r.frame_seq)
        for r in frame_sequence_docs(frame_hashes(surv)).collect()
    }
    got = {(r.doc_id, r.text) for r in accepted.collect()}
    assert got == want

    # rejections audited with verified jaccard at the threshold
    dups = spark.read.parquet(os.path.join(wh, "dups"))
    logged = {r.doc_id_a for r in dups.collect()} | {
        r.doc_id_b for r in dups.collect()
    }
    rejected = {1, 2, 11, 12, 13, 21, 22} - ids
    assert rejected <= logged
    assert dups.filter("jaccard < 0.5").isEmpty()


def test_standalone_dedup_stream_compaction_cadence(spark, tmp_path):
    """streaming_minhash_dedup's own compact_every_n_batches (round 10):
    the standalone stream folds accepted/index/dups on cadence with
    results equal to a no-compaction run — same contract as the
    composed pipeline's."""
    src = str(tmp_path / "src")
    texts = [
        (i, f"unique document number {i} with tokens w{i}a w{i}b w{i}c w{i}d w{i}e")
        for i in range(1, 6)
    ]
    for i, t in texts:
        _write_batch(spark, src, [(i, t), (100 + i, t)])  # each batch: 1 new + 1 dup

    def run(wh, ckpt, compact_every=None):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_minhash_dedup(
            stream, wh, checkpoint=ckpt, compact_every_n_batches=compact_every
        )
        q.awaitTermination(180)

    wh_a = str(tmp_path / "wh_a")
    run(wh_a, str(tmp_path / "ckpt_a"))
    wh_b = str(tmp_path / "wh_b")
    run(wh_b, str(tmp_path / "ckpt_b"), compact_every=2)

    def dirs(wh, sub):
        return sorted(
            d
            for d in os.listdir(os.path.join(wh, sub))
            if d.startswith("batch_id=")
        )

    for sub in ("accepted", "index", "dups"):
        assert len(dirs(wh_a, sub)) == 5  # one per batch, unbounded
        # r11 tiered folds: fires at 2 and 4 each fold their cadence
        # window into a level-1 run (-2, -3); the O(corpus) base merge
        # waits for > max_l1_runs (4) runs, not reached here
        assert dirs(wh_b, sub) == [
            "batch_id=-2", "batch_id=-3", "batch_id=4",
        ], sub
        a = spark.read.parquet(os.path.join(wh_a, sub)).drop("batch_id")
        b = spark.read.parquet(os.path.join(wh_b, sub)).drop("batch_id")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_streaming_video_dedup_real_mpng_decode(spark, tmp_path):
    """VERDICT r10 #3: the streaming ingest twin runs the REAL frame
    decode — a re-encoded upload of an accepted MPNG clip (same pixels,
    different PNG bytes) must be rejected against the stored
    frame-sequence fingerprints, which only happens if frames are
    actually decoded (raw payload bytes differ)."""
    import os
    import struct
    import zlib

    from pyspark.sql import Row

    from airbnb_pyspark_jobs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        mpng_encode,
    )
    from airbnb_pyspark_jobs_spark.streaming.dedupe import streaming_video_dedup

    def png_gray(px, w, h, level=9):
        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        raw = b"".join(
            b"\x00" + bytes(px[y * w : (y + 1) * w]) for y in range(h)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, level))
            + chunk(b"IEND", b"")
        )

    def pattern(i, level=9):
        return png_gray([200] * (8 * i) + [40] * (8 * (8 - i)), 8, 8, level)

    def clip(mid, frames):
        return Row(
            media_id=mid,
            payload=mpng_encode(frames),
            meta=Row(
                modality="video", mime="video/x-mpng",
                width=8, height=8, n_frames=len(frames), sample_rate=None,
            ),
        )

    frames_a = [pattern(i % 8) for i in range(8)]
    frames_b = [
        png_gray([40 + i] * 32 + [200 + i] * 32, 8, 8) for i in range(8)
    ]
    batches = [
        [clip(1, frames_a), clip(2, frames_b)],
        # re-encoded A: identical pixels, different compressed bytes
        [clip(11, [pattern(i % 8, level=1) for i in range(8)])],
    ]
    assert batches[1][0].payload != batches[0][0].payload

    src = str(tmp_path / "src")
    for rows in batches:
        spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_video_dedup(stream, wh, ckpt)
    q.awaitTermination(180)

    accepted = spark.read.parquet(os.path.join(wh, "accepted"))
    ids = {r.doc_id for r in accepted.select("doc_id").collect()}
    assert ids == {1, 2}  # the re-encoded 11 rejected via real decode
