"""Composed pipeline stages 5-6 (VERDICT r7 #3): the e2e ingest
pipeline additionally maintains an SCD2 source dimension and emits CEP
dup-flood alerts — batch-equality against the batch-wise composition
(q22 / q250 semantics) plus a mid-pipeline crash-and-restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.scd2 import (
    Scd2Spec,
    scd2_initial,
    scd2_merge,
)
from airbnb_pyspark_jobs_spark.streaming.cep import read_dup_bursts
from airbnb_pyspark_jobs_spark.streaming.pipeline import streaming_corpus_pipeline

BASE = (
    "the quick brown fox jumps over a lazy dog and runs to some river "
    "in bright morning light for fun"
)
DIFF = (
    "a silent harbor holds many boats and sailors wait for wind to rise "
    "while gulls circle in that grey sky"
)
UNIQ = (
    "carpenters measure seasoned oak planks and join them to sturdy "
    "frames in a workshop full of the finest tools"
)
UNIQ2 = (
    "ancient lighthouses warn distant ships away from jagged rocks as "
    "keepers climb their spiral stairs each cold evening"
)

SCHEMA = "doc_id long, text string, source string, lang string"
GAP, MIN_RUN = 5, 3


def _mk(suffix: str) -> str:
    """A near-duplicate of BASE (couple of extra tokens -> Jaccard ~0.9)."""
    return BASE + " " + suffix


BATCH0 = [
    (1, BASE, "crawl", "en"),
    (2, DIFF, "crawl", "en"),
    (3, UNIQ, "mirror", "en"),
]
BATCH1 = [
    (11, _mk("alpha beta"), "mirror", "en"),   # rejected: near-dup of 1
    (12, _mk("gamma delta"), "mirror", "en"),  # rejected
    (13, _mk("epsilon zeta"), "mirror", "en"), # rejected -> burst of 3 (open)
    (14, DIFF + " encore", "crawl", "fr"),     # rejected; crawl lang flips en->fr
    (15, _mk("eta theta"), "spam", "en"),      # rejected
    (16, _mk("iota kappa"), "spam", "en"),     # rejected -> spam run=2 (< MIN_RUN)
]
BATCH2 = [
    (19, _mk("lambda mu"), "spam", "en"),      # gap 19-16=3 <= 5: CONTINUES -> run=3
    (21, _mk("nu xi"), "mirror", "en"),        # gap 21-13=8 > 5: closes burst(11,3)
    (22, _mk("omicron pi"), "mirror", "en"),
    (23, _mk("rho sigma"), "mirror", "en"),    # new mirror burst of 3 (open)
    (24, UNIQ2, "crawl", "fr"),                # accepted; crawl stays fr
]


def _write_batch(spark, src: str, rows) -> None:
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain(
    spark, src: str, warehouse: str, ckpt: str, compact_every: int | None = None
) -> None:
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_corpus_pipeline(
        stream,
        warehouse,
        ckpt,
        psi_mn_cents=0,
        psi_ext_cents=3000,
        n_buckets=10,
        min_tokens=5,
        num_hashes=8,
        bands=4,  # 2 rows/band: candidate recall ~1 at the J~0.9 dups here
        source_col="source",
        cep_gap=GAP,
        cep_min_run=MIN_RUN,
        compact_every_n_batches=compact_every,
    )
    q.awaitTermination(240)


def _spec() -> Scd2Spec:
    return Scd2Spec(
        natural_key=["source"], tracked_cols=["lang"], surrogate_key="source_key"
    )


def _dim_rows(spark, warehouse: str):
    dim = spark.read.parquet(os.path.join(warehouse, "dim_source"))
    return sorted(
        (r.source_key, r.source, r.lang, r.is_valid, str(r.start_dt), str(r.end_dt))
        for r in dim.collect()
    )


def _expected_dim_rows(spark):
    """Batch-wise SCD2 composition with the pipeline's as-of stamps
    (epoch + batch_id seconds) — q22 semantics, same operator."""
    spec = _spec()

    def snap(rows):
        best: dict[str, tuple] = {}
        for doc_id, _t, source, lang in rows:
            if source not in best or doc_id > best[source][0]:
                best[source] = (doc_id, lang)
        return spark.createDataFrame(
            [(s, lang) for s, (_d, lang) in best.items()], "source string, lang string"
        )

    dim = scd2_initial(snap(BATCH0), spec, F.lit(0).cast("timestamp"))
    for i, rows in ((1, BATCH1), (2, BATCH2)):
        dim = scd2_merge(dim, snap(rows), spec, F.lit(i).cast("timestamp"))
    return sorted(
        (r.source_key, r.source, r.lang, r.is_valid, str(r.start_dt), str(r.end_dt))
        for r in dim.collect()
    )


def test_composed_dim_and_cep_equal_batch_composition(spark, tmp_path):
    src = str(tmp_path / "src")
    for rows in (BATCH0, BATCH1, BATCH2):
        _write_batch(spark, src, rows)
    wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
    _drain(spark, src, wh, ckpt)

    # dedup sanity: every _mk() variant near-dups BASE (id 1) and is
    # rejected; the distinct texts survive
    acc = {r.doc_id for r in spark.read.parquet(os.path.join(wh, "accepted")).collect()}
    assert acc == {1, 2, 3, 24}

    # stage 5: the maintained dimension == batch-wise scd2 composition
    assert _dim_rows(spark, wh) == _expected_dim_rows(spark)
    dim = spark.read.parquet(os.path.join(wh, "dim_source"))
    crawl = dim.filter("source = 'crawl'").collect()
    assert len(crawl) == 2  # en -> fr flip versioned, history preserved
    assert {r.lang for r in crawl if r.is_valid} == {"fr"}
    assert dim.filter("source = 'mirror'").count() == 1  # never changed

    # stage 6: final bursts == one-pass gaps-and-islands over the FULL
    # rejected stream (q250 semantics, source-keyed over doc_id)
    all_rows = BATCH0 + BATCH1 + BATCH2
    rejected = sorted(
        (s, d) for d, _t, s, _l in all_rows if d not in acc
    )
    expected: list[tuple[str, int, int]] = []
    by_src: dict[str, list[int]] = {}
    for s, d in rejected:
        by_src.setdefault(s, []).append(d)
    for s, ids in by_src.items():
        start, run, last = ids[0], 1, ids[0]
        for d in ids[1:]:
            if d - last > GAP:
                if run >= MIN_RUN:
                    expected.append((s, start, run))
                start, run = d, 1
            else:
                run += 1
            last = d
        if run >= MIN_RUN:
            expected.append((s, start, run))
    got = sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh, min_run=MIN_RUN).collect()
    )
    assert got == sorted(expected)
    # the designed cases really happened: one closed mirror burst, one
    # still-open mirror burst, one spam burst CONTINUED across batches
    assert ("mirror", 11, 3) in got and ("mirror", 21, 3) in got
    assert ("spam", 15, 3) in got


def test_composed_dim_cep_restart_converges(spark, tmp_path, monkeypatch):
    """Crash between the dim merge and the CEP state write on batch 1,
    restart from the same checkpoint: the replayed batch must re-merge
    the dimension byte-stable and the final warehouse must equal an
    uninterrupted run's."""
    import pyspark.errors

    src = str(tmp_path / "src")
    for rows in (BATCH0, BATCH1, BATCH2):
        _write_batch(spark, src, rows)

    wh_a, ckpt_a = str(tmp_path / "wh_a"), str(tmp_path / "ckpt_a")
    _drain(spark, src, wh_a, ckpt_a)  # uninterrupted reference

    import airbnb_pyspark_jobs_spark.streaming.cep as cep_mod

    real = cep_mod.dup_burst_batch
    calls = {"n": 0}

    def killer(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:  # batch 1, AFTER the dim merge committed
            raise RuntimeError("injected crash before CEP state write")
        return real(*args, **kwargs)

    monkeypatch.setattr(cep_mod, "dup_burst_batch", killer)
    wh_b, ckpt_b = str(tmp_path / "wh_b"), str(tmp_path / "ckpt_b")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = streaming_corpus_pipeline(
        stream, wh_b, ckpt_b,
        psi_mn_cents=0, psi_ext_cents=3000, n_buckets=10, min_tokens=5,
        num_hashes=8, bands=4,
        source_col="source", cep_gap=GAP, cep_min_run=MIN_RUN,
    )
    try:
        q.awaitTermination(240)
    except pyspark.errors.StreamingQueryException:
        pass
    assert calls["n"] == 2, "the crash must hit batch 1 mid-pipeline"
    # partial-write evidence: dim merged for batch 1, CEP state not
    crawl = (
        spark.read.parquet(os.path.join(wh_b, "dim_source"))
        .filter("source = 'crawl'")
        .count()
    )
    assert crawl == 2  # the en->fr flip from batch 1 already landed
    assert not os.path.exists(os.path.join(wh_b, "cep_state", "batch_id=1"))

    monkeypatch.setattr(cep_mod, "dup_burst_batch", real)
    _drain(spark, src, wh_b, ckpt_b)  # restart from the same checkpoint

    assert _dim_rows(spark, wh_b) == _dim_rows(spark, wh_a)
    bursts = lambda wh: sorted(  # noqa: E731
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh, min_run=MIN_RUN).collect()
    )
    assert bursts(wh_b) == bursts(wh_a)
    acc = lambda wh: sorted(  # noqa: E731
        r.doc_id for r in spark.read.parquet(os.path.join(wh, "accepted")).collect()
    )
    assert acc(wh_b) == acc(wh_a)


def _run_cep(spark, tmp_path, name, batches, gap=5, min_run=3):
    import os as _os

    from airbnb_pyspark_jobs_spark.streaming.cep import dup_burst_batch

    wh = str(tmp_path / name)
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "source string, doc_id long")
        dup_burst_batch(df, wh, bid, gap=gap, min_run=min_run)
    _os.makedirs(_os.path.join(wh, "cep_state"), exist_ok=True)
    return sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh, min_run=min_run).collect()
    )


def test_dup_burst_batching_invariance(spark, tmp_path):
    """The final burst set is invariant to WHERE the micro-batch
    boundaries fall (ids arrive in order per source) — one batch, two
    batches at an arbitrary cut, and one-row-per-batch all agree."""
    seq = [("s", i) for i in (1, 2, 3, 10, 11, 20, 21, 22, 23, 40)] + [
        ("t", i) for i in (5, 6, 7, 8)
    ]
    one = _run_cep(spark, tmp_path, "one", [seq])
    # expected islands: s:[1-3](3), s:[10,11](2<3), s:[20-23](4), s:[40](1); t:[5-8](4)
    assert one == [("s", 1, 3), ("s", 20, 4), ("t", 5, 4)]
    two = _run_cep(spark, tmp_path, "two", [seq[:5], seq[5:]])
    rowwise = _run_cep(spark, tmp_path, "rw", [[r] for r in seq])
    assert one == two == rowwise


def test_dup_burst_batch_replay_idempotent(spark, tmp_path):
    """Replaying a batch (crash-recovery) rewrites identical state and
    alerts — reads prune to batch_id < N, so the replay never sees its
    own partial output."""
    import os as _os

    from airbnb_pyspark_jobs_spark.streaming.cep import dup_burst_batch

    wh = str(tmp_path / "replay")
    b0 = [("s", 1), ("s", 2), ("s", 3)]
    b1 = [("s", 4), ("s", 20)]
    dup_burst_batch(spark.createDataFrame(b0, "source string, doc_id long"), wh, 0)
    dup_burst_batch(spark.createDataFrame(b1, "source string, doc_id long"), wh, 1)
    first = sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    # burst [1..4] closed by 20 at size 4; [20] alone below min_run
    assert first == [("s", 1, 4)]
    dup_burst_batch(  # replay batch 1
        spark.createDataFrame(b1, "source string, doc_id long"), wh, 1
    )
    again = sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    assert again == first
    assert _os.path.exists(_os.path.join(wh, "cep_state", "batch_id=1"))


def test_cep_state_compaction_preserves_semantics(spark, tmp_path):
    """Folding the per-batch state partitions into the batch_id=-1 base
    changes nothing the reader or subsequent batches can see, and the
    partition count drops to one."""
    import os as _os

    from airbnb_pyspark_jobs_spark.streaming.cep import (
        compact_cep_state,
        dup_burst_batch,
    )

    wh = str(tmp_path / "wc")
    batches = [
        [("s", 1), ("s", 2), ("t", 100)],
        [("s", 3)],          # s run -> 3 (open burst)
        [("t", 101)],
    ]
    for bid, rows in enumerate(batches):
        dup_burst_batch(
            spark.createDataFrame(rows, "source string, doc_id long"), wh, bid
        )
    before = sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    assert before == [("s", 1, 3)]
    n = compact_cep_state(spark, wh)
    assert n == 3
    state_dirs = [
        d
        for d in _os.listdir(_os.path.join(wh, "cep_state"))
        if d.startswith("batch_id=")
    ]
    assert state_dirs == ["batch_id=-1"]
    assert (
        sorted(
            (r.source, r.burst_start, r.n_dups)
            for r in read_dup_bursts(spark, wh).collect()
        )
        == before
    )
    # the stream continues against the compacted base: s gap 4<=5
    # continues the burst to 4; t reaches min_run via its carried state
    dup_burst_batch(
        spark.createDataFrame(
            [("s", 7), ("t", 102)], "source string, doc_id long"
        ),
        wh,
        3,
    )
    after = sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    assert after == [("s", 1, 4), ("t", 100, 3)]


def test_read_dup_bursts_sane_during_crash_window(spark, tmp_path):
    """A batch's alerts committed but its state write lost (the write
    order inside dup_burst_batch): a read before the replay reports the
    in-flight burst ONCE at its newest size, not twice."""
    import shutil

    from airbnb_pyspark_jobs_spark.streaming.cep import dup_burst_batch

    wh = str(tmp_path / "cw")
    dup_burst_batch(
        spark.createDataFrame(
            [("s", 1), ("s", 2), ("s", 3)], "source string, doc_id long"
        ),
        wh,
        0,
    )
    # batch 1 CLOSES the burst (gap 20-3 > 5): 'closed' alert written...
    dup_burst_batch(
        spark.createDataFrame([("s", 20)], "source string, doc_id long"), wh, 1
    )
    # ...then the crash window: batch 1's state write lost. Without the
    # per-burst fold the read would report (s,1,3) TWICE - the orphan
    # closed alert plus batch 0's still-live state row.
    shutil.rmtree(os.path.join(wh, "cep_state", "batch_id=1"))
    got = sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    assert got == [("s", 1, 3)]
    # replay converges the warehouse; the at-rest read is identical
    dup_burst_batch(
        spark.createDataFrame([("s", 20)], "source string, doc_id long"), wh, 1
    )
    assert sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    ) == [("s", 1, 3)]


def test_dup_burst_backward_id_starts_new_burst(spark, tmp_path):
    """An out-of-order (backward) id across micro-batches starts a NEW
    burst instead of silently merging into the stored one (ADVICE r8:
    the unsigned gap check was true for ANY backward id). The backward
    batch also CLOSES the stored burst."""
    from airbnb_pyspark_jobs_spark.streaming.cep import dup_burst_batch

    wh = str(tmp_path / "bw")
    dup_burst_batch(
        spark.createDataFrame(
            [("s", 10), ("s", 11), ("s", 12)], "source string, doc_id long"
        ),
        wh,
        0,
    )
    # 7 < last_id=12: backward, must NOT extend [10..12] to run 4
    dup_burst_batch(
        spark.createDataFrame(
            [("s", 7), ("s", 8)], "source string, doc_id long"
        ),
        wh,
        1,
    )
    got = sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    # stored burst closed at its true size; [7,8] open below min_run
    assert got == [("s", 10, 3)]


def test_cep_params_persisted_and_enforced(spark, tmp_path):
    """(gap, min_run) persist with the warehouse on first write; a
    writer OR reader using different thresholds raises instead of
    silently mixing alert sets (ADVICE r8). A reader passing nothing
    gets the writer's threshold."""
    import pytest

    from airbnb_pyspark_jobs_spark.streaming.cep import (
        CepParamsMismatchError,
        dup_burst_batch,
    )

    wh = str(tmp_path / "pp")
    dup_burst_batch(
        spark.createDataFrame(
            [("s", 1), ("s", 2)], "source string, doc_id long"
        ),
        wh,
        0,
        gap=5,
        min_run=2,
    )
    # default reader picks up the persisted min_run=2
    got = sorted(
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    assert got == [("s", 1, 2)]
    # matching explicit value: fine
    assert read_dup_bursts(spark, wh, min_run=2).count() == 1
    with pytest.raises(CepParamsMismatchError):
        read_dup_bursts(spark, wh, min_run=3)
    with pytest.raises(CepParamsMismatchError):
        dup_burst_batch(
            spark.createDataFrame([("s", 3)], "source string, doc_id long"),
            wh,
            1,
            gap=9,
            min_run=2,
        )


def _long_batches():
    """7 batches: BATCH0, then six batches each carrying one genuinely
    distinct doc (disjoint token sets -> accepted) plus two near-dups
    of doc 1 on source 'flood' with CONSECUTIVE ids -> one ever-growing
    cross-batch burst, so the CEP state is touched every batch."""
    out = [BATCH0]
    nid = 30
    for i in range(1, 7):
        uniq = " ".join(f"w{i}x{j}" for j in range(20))
        out.append(
            [
                (1000 + i, uniq, "crawl", "en"),
                (nid, _mk(f"a{i}"), "flood", "en"),
                (nid + 1, _mk(f"b{i}"), "flood", "en"),
            ]
        )
        nid += 2
    return out


def _state_dirs(wh: str, sub: str) -> list[str]:
    return sorted(
        d
        for d in os.listdir(os.path.join(wh, sub))
        if d.startswith("batch_id=")
    )


def _psi_totals(spark, wh: str):
    return sorted(
        (r.event_type, r.bucket, r.n)
        for r in spark.read.option(
            "basePath", os.path.join(wh, "psi")
        )
        .parquet(os.path.join(wh, "psi"))
        .groupBy("event_type", "bucket")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .collect()
    )


def _index_rows(spark, wh: str):
    return sorted(
        (r.doc_id, r.band_idx, r.band_hash)
        for r in spark.read.parquet(os.path.join(wh, "index")).collect()
    )


def _dup_pairs(spark, wh: str):
    return sorted(
        (r.doc_id_a, r.doc_id_b, r.kind)
        for r in spark.read.parquet(os.path.join(wh, "dups")).collect()
    )


def test_pipeline_compaction_cadence_bounds_state(spark, tmp_path):
    """VERDICT r8 #2 + r9 #1: with compact_every_n_batches set, the
    running pipeline folds PSI partials, CEP state AND the dedup store
    (accepted/index/dups) every N batches — ALL FIVE state dirs stay
    bounded over a long run while accepted docs, band index, dup
    pairs, PSI totals and the final burst set equal a no-compaction
    run's."""
    src = str(tmp_path / "src")
    for rows in _long_batches():
        _write_batch(spark, src, rows)

    wh_a, ckpt_a = str(tmp_path / "wh_a"), str(tmp_path / "ckpt_a")
    _drain(spark, src, wh_a, ckpt_a)  # no compaction: one dir per batch
    wh_b, ckpt_b = str(tmp_path / "wh_b"), str(tmp_path / "ckpt_b")
    _drain(spark, src, wh_b, ckpt_b, compact_every=2)

    # batch 0 rejects nothing (no cep dir); every batch writes psi and
    # the three dedup-store dirs
    assert len(_state_dirs(wh_a, "cep_state")) == 6
    assert len(_state_dirs(wh_a, "psi")) == 7
    for sub in ("accepted", "index", "dups"):
        assert len(_state_dirs(wh_a, sub)) == 7
    # compactions at batches 2/4/6: PSI/CEP fold everything below them
    # (bounded state, full fold is cheap); the dedup store folds
    # TIERED (r11) — each fire folds only its cadence window into a
    # fresh level-1 run (-2, -3, -4), and the O(corpus) base merge
    # waits until runs exceed max_l1_runs (default 4, not reached in
    # 3 fires). Fan-in stays bounded by cadence + K + 1 either way.
    for sub in ("cep_state", "psi"):
        assert _state_dirs(wh_b, sub) == ["batch_id=-1", "batch_id=6"], sub
    for sub in ("accepted", "index", "dups"):
        assert _state_dirs(wh_b, sub) == [
            "batch_id=-2", "batch_id=-3", "batch_id=-4", "batch_id=6",
        ], sub

    acc = lambda wh: sorted(  # noqa: E731
        r.doc_id
        for r in spark.read.parquet(os.path.join(wh, "accepted")).collect()
    )
    assert acc(wh_b) == acc(wh_a)
    assert _index_rows(spark, wh_b) == _index_rows(spark, wh_a)
    assert _dup_pairs(spark, wh_b) == _dup_pairs(spark, wh_a)
    assert _psi_totals(spark, wh_b) == _psi_totals(spark, wh_a)
    bursts = lambda wh: sorted(  # noqa: E731
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    assert bursts(wh_b) == bursts(wh_a)
    # the designed long burst really spans the whole run
    assert ("flood", 30, 12) in bursts(wh_b)


def test_pipeline_restart_mid_compaction_converges(spark, tmp_path, monkeypatch):
    """Kill the pipeline INSIDE a compaction's crash window (fold + 
    manifest written, swap not) — the restart's compaction attempt must
    finish the swap via the manifest protocol and the final warehouse
    must equal an uninterrupted run's."""
    import pyspark.errors

    src = str(tmp_path / "src")
    for rows in _long_batches():
        _write_batch(spark, src, rows)

    wh_a, ckpt_a = str(tmp_path / "wh_a"), str(tmp_path / "ckpt_a")
    _drain(spark, src, wh_a, ckpt_a, compact_every=2)  # uninterrupted ref

    # crash AFTER the manifest is written, BEFORE the base renames into
    # place: fail the first rename of a __compact_tmp dir
    real_rename = os.rename
    state = {"crashed": False}

    def crashing_rename(a, b):
        if "__compact_tmp" in str(a) and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash mid-compaction (before swap)")
        return real_rename(a, b)

    monkeypatch.setattr(os, "rename", crashing_rename)
    wh_b, ckpt_b = str(tmp_path / "wh_b"), str(tmp_path / "ckpt_b")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = streaming_corpus_pipeline(
        stream, wh_b, ckpt_b,
        psi_mn_cents=0, psi_ext_cents=3000, n_buckets=10, min_tokens=5,
        num_hashes=8, bands=4,
        source_col="source", cep_gap=GAP, cep_min_run=MIN_RUN,
        compact_every_n_batches=2,
    )
    try:
        q.awaitTermination(240)
    except pyspark.errors.StreamingQueryException:
        pass
    assert state["crashed"], "the crash must hit a compaction swap"
    # crash-window evidence: the manifest survived under the psi tmp dir
    assert os.path.exists(
        os.path.join(wh_b, "psi", "__compact_tmp", "_FOLDED.json")
    )

    monkeypatch.setattr(os, "rename", real_rename)
    _drain(spark, src, wh_b, ckpt_b, compact_every=2)  # same checkpoint

    assert not os.path.exists(os.path.join(wh_b, "psi", "__compact_tmp"))
    assert _psi_totals(spark, wh_b) == _psi_totals(spark, wh_a)
    acc = lambda wh: sorted(  # noqa: E731
        r.doc_id
        for r in spark.read.parquet(os.path.join(wh, "accepted")).collect()
    )
    assert acc(wh_b) == acc(wh_a)
    bursts = lambda wh: sorted(  # noqa: E731
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    assert bursts(wh_b) == bursts(wh_a)
    assert _dim_rows(spark, wh_b)  # dimension readable after recovery


def test_compaction_cadence_rejects_remote_warehouse(spark):
    """ADVICE r9: the compactors are driver-local filesystem
    maintenance — setting compact_every_n_batches against an hdfs://
    warehouse must raise up front, not silently never fire."""
    import pytest

    from airbnb_pyspark_jobs_spark.streaming.dedupe import streaming_minhash_dedup

    with pytest.raises(ValueError, match="local"):
        streaming_corpus_pipeline(
            None, "hdfs://nn/wh", "/tmp/ckpt",
            psi_mn_cents=0, psi_ext_cents=3000,
            compact_every_n_batches=2,
        )
    with pytest.raises(ValueError, match="local"):
        streaming_minhash_dedup(
            None, "s3a://bucket/wh", "/tmp/ckpt", compact_every_n_batches=2
        )


def test_pipeline_restart_mid_dedup_compaction_converges(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 #1: crash the DEDUP STORE's compaction BETWEEN the
    destructive steps — the folded input dirs under ``accepted/`` are
    already rmtree'd, the base rename has not landed (the exact window
    the r9 manifest-ordering bug lived in). The restart must finish the
    swap via the manifest and converge to an uninterrupted run's
    accepted/index/dups content — in particular, later batches must
    still dedup against the FULL folded history (a lost fold here would
    silently re-accept every stored doc's near-dups)."""
    import pyspark.errors

    src = str(tmp_path / "src")
    for rows in _long_batches():
        _write_batch(spark, src, rows)

    wh_a, ckpt_a = str(tmp_path / "wh_a"), str(tmp_path / "ckpt_a")
    _drain(spark, src, wh_a, ckpt_a, compact_every=2)  # uninterrupted ref

    # fail the rename of accepted/'s __compact_tmp into its base: at
    # that point finish() has already deleted the folded batch dirs
    real_rename = os.rename
    state = {"crashed": False}

    def crashing_rename(a, b):
        if (
            "__compact_tmp" in str(a)
            and f"accepted{os.sep}" in str(a) + os.sep
            and not state["crashed"]
        ):
            state["crashed"] = True
            raise RuntimeError("injected crash mid-dedup-compaction")
        return real_rename(a, b)

    monkeypatch.setattr(os, "rename", crashing_rename)
    wh_b, ckpt_b = str(tmp_path / "wh_b"), str(tmp_path / "ckpt_b")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = streaming_corpus_pipeline(
        stream, wh_b, ckpt_b,
        psi_mn_cents=0, psi_ext_cents=3000, n_buckets=10, min_tokens=5,
        num_hashes=8, bands=4,
        source_col="source", cep_gap=GAP, cep_min_run=MIN_RUN,
        compact_every_n_batches=2,
    )
    try:
        q.awaitTermination(240)
    except pyspark.errors.StreamingQueryException:
        pass
    assert state["crashed"], "the crash must hit the accepted/ swap"
    # crash-window evidence: inputs destroyed, manifest survived, base
    # not yet in place — ONLY the manifest protocol can recover this
    tmp = os.path.join(wh_b, "accepted", "__compact_tmp")
    assert os.path.exists(os.path.join(tmp, "_FOLDED.json"))
    assert not any(
        d.startswith("batch_id=") and int(d.split("=")[1]) < 2
        for d in os.listdir(os.path.join(wh_b, "accepted"))
    )

    monkeypatch.setattr(os, "rename", real_rename)
    _drain(spark, src, wh_b, ckpt_b, compact_every=2)  # same checkpoint

    for sub in ("accepted", "index", "dups"):
        assert not os.path.exists(os.path.join(wh_b, sub, "__compact_tmp"))
    acc = lambda wh: sorted(  # noqa: E731
        r.doc_id
        for r in spark.read.parquet(os.path.join(wh, "accepted")).collect()
    )
    assert acc(wh_b) == acc(wh_a)
    assert _index_rows(spark, wh_b) == _index_rows(spark, wh_a)
    assert _dup_pairs(spark, wh_b) == _dup_pairs(spark, wh_a)
    bursts = lambda wh: sorted(  # noqa: E731
        (r.source, r.burst_start, r.n_dups)
        for r in read_dup_bursts(spark, wh).collect()
    )
    assert bursts(wh_b) == bursts(wh_a)


def test_cep_params_cached_after_first_validation(spark, tmp_path, monkeypatch):
    """ADVICE r9: after one successful check, later batches must not
    re-read the cep_params parquet (a fixed driver-side read on the
    hot foreachBatch path) — and a cached warehouse still raises on a
    mismatching writer."""
    import pytest

    from airbnb_pyspark_jobs_spark.streaming import cep as CEP

    wh = str(tmp_path / "wh")
    calls = {"n": 0}
    real = CEP._read_params

    def counting(spark_, warehouse):
        calls["n"] += 1
        return real(spark_, warehouse)

    monkeypatch.setattr(CEP, "_read_params", counting)
    rows = lambda ids: spark.createDataFrame(  # noqa: E731
        [("s", i) for i in ids], "source string, doc_id long"
    )
    CEP.dup_burst_batch(rows([1, 2]), wh, 0, gap=5, min_run=2)
    n_after_first = calls["n"]
    assert n_after_first >= 1
    CEP.dup_burst_batch(rows([3]), wh, 1, gap=5, min_run=2)
    CEP.dup_burst_batch(rows([4]), wh, 2, gap=5, min_run=2)
    assert calls["n"] == n_after_first  # later batches: cache, no read
    with pytest.raises(CEP.CepParamsMismatchError):
        CEP.dup_burst_batch(rows([5]), wh, 3, gap=9, min_run=2)


def test_cep_params_cache_effective_for_file_uri_warehouse(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10: the staleness probe ran os.path.isdir on the RAW
    warehouse string, which is always False for file:-prefixed URIs —
    the cache entry was evicted and re-validated from parquet every
    batch, so the ADVICE-r9 optimization never took effect for file:
    warehouses. The probe now strips the scheme: later batches must
    skip the parquet read, and a DELETED params dir must still evict."""
    import shutil

    from airbnb_pyspark_jobs_spark.streaming import cep as CEP

    wh = "file:" + str(tmp_path / "wh")
    calls = {"n": 0}
    real = CEP._read_params

    def counting(spark_, warehouse):
        calls["n"] += 1
        return real(spark_, warehouse)

    monkeypatch.setattr(CEP, "_read_params", counting)
    rows = lambda ids: spark.createDataFrame(  # noqa: E731
        [("s", i) for i in ids], "source string, doc_id long"
    )
    CEP.dup_burst_batch(rows([1, 2]), wh, 0, gap=5, min_run=2)
    n_after_first = calls["n"]
    CEP.dup_burst_batch(rows([3]), wh, 1, gap=5, min_run=2)
    CEP.dup_burst_batch(rows([4]), wh, 2, gap=5, min_run=2)
    assert calls["n"] == n_after_first  # cache hit despite file: scheme
    # staleness handling still works through the scheme: a deleted
    # params record drops the cache entry and re-validates
    shutil.rmtree(tmp_path / "wh" / "cep_params")
    CEP.dup_burst_batch(rows([5]), wh, 3, gap=5, min_run=2)
    assert calls["n"] == n_after_first + 1
