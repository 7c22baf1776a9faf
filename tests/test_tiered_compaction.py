"""Tiered (LSM-style) dedup-store compaction (VERDICT r10 #1): the r10
single-level fold rewrote the ENTIRE committed corpus every cadence
fire — O(corpus) I/O per fire, quadratic over a run's lifetime. The r11
two-tier fold (L0 batch dirs → level-1 runs every fire; runs → base
only past ``max_l1_runs``) must (a) keep the store's CONTENT and dedup
semantics identical, (b) bound directory fan-in, (c) rewrite MATERIALLY
fewer bytes than the naive fold (asserted via the ``COMPACTION_IO``
counter — the only way to keep the claim from regressing), and
(d) survive crashes BETWEEN the two new steps and INSIDE either step's
manifest window (the r9 lesson: the windows between destructive steps
are where the bugs live)."""

from __future__ import annotations

import os

import pytest

from airbnb_pyspark_jobs_spark.streaming.dedupe import (
    _read_state,
    compact_dedup_state,
    dedup_batch,
)

_DOCS_SCHEMA = "doc_id long, text string"


def _doc(i: int) -> tuple[int, str]:
    # disjoint token sets -> every doc accepted (no near-dups)
    return (i, " ".join(f"tok{i}x{j}" for j in range(12)))


def _dirs(wh: str, sub: str) -> list[str]:
    return sorted(
        d
        for d in os.listdir(os.path.join(wh, sub))
        if d.startswith("batch_id=")
    )


def _accepted_ids(spark, wh: str) -> list[int]:
    import pyspark.sql.functions as F  # noqa: F401

    return sorted(
        r.doc_id
        for r in spark.read.option("basePath", os.path.join(wh, "accepted"))
        .parquet(os.path.join(wh, "accepted"))
        .select("doc_id")
        .collect()
    )


def _run_store(spark, wh: str, n_batches: int, cadence: int, k) -> None:
    """Drive the real store: one dedup_batch per batch, compaction at
    the cadence exactly as the streaming entry points fire it."""
    for bid in range(n_batches):
        if k != "off" and bid > 0 and bid % cadence == 0:
            compact_dedup_state(spark, wh, before_batch=bid, max_l1_runs=k)
        batch = spark.createDataFrame(
            [_doc(bid * 10 + j) for j in range(2)], _DOCS_SCHEMA
        )
        dedup_batch(batch, wh, bid)


def test_tiered_fold_preserves_content_and_bounds_fanin(spark, tmp_path):
    """8 batches, cadence 2, K=2: fires at 2/4/6 create runs -2/-3/-4;
    the 3rd fire exceeds K and merges into the base. Content equals an
    uncompacted run's, fan-in stays ≤ cadence + K + 1, and dedup still
    rejects against history that lives only in folded tiers."""
    wh_t = str(tmp_path / "tiered")
    wh_n = str(tmp_path / "none")
    _run_store(spark, wh_t, 8, 2, 2)
    _run_store(spark, wh_n, 8, 2, "off")
    # final maintenance fire before a hypothetical batch 8
    compact_dedup_state(spark, wh_t, before_batch=8, max_l1_runs=2)

    assert _accepted_ids(spark, wh_t) == _accepted_ids(spark, wh_n)
    for sub in ("accepted", "index", "dups"):
        ds = _dirs(wh_t, sub)
        assert len(ds) <= 2 + 2 + 1, (sub, ds)
        assert "batch_id=-1" in ds, (sub, ds)  # the base merge fired
    # the replay-pruning reader sees the full folded history
    hist = _read_state(spark, os.path.join(wh_t, "accepted"), _DOCS_SCHEMA, 8)
    assert hist.count() == 16

    # dedup against folded-only history: an exact copy of batch 0's
    # doc must be rejected even though batch_id=0's dir no longer
    # exists (its rows live in the base)
    dup = spark.createDataFrame([_doc(0)], _DOCS_SCHEMA)
    accepted = dedup_batch(
        dup.withColumn("doc_id", dup.doc_id + 900), wh_t, 8
    )
    assert accepted.count() == 0


def test_tiered_rewrite_volume_sublinear_vs_naive(spark, tmp_path):
    """The point of the tiers: total bytes rewritten by compaction must
    be MATERIALLY below the naive fold's over the same run (naive
    rewrites the whole corpus per fire; tiered rewrites the cadence
    window per fire + the corpus once per K windows). Drives the state
    layout directly with sized batches so data, not per-file parquet
    overhead, dominates the counter."""
    from airbnb_pyspark_jobs_spark.streaming import aggregates as AGG

    def write_batches(wh: str) -> None:
        for bid in range(10):
            # distinct ~200-char payloads: dictionary pages carry real
            # data, so bytes_written tracks data volume, not file count
            df = spark.createDataFrame(
                [
                    (bid * 10_000 + j, f"t{bid}b{j}x" * 25)
                    for j in range(2000)
                ],
                _DOCS_SCHEMA,
            )
            df.repartition(1).write.mode("overwrite").parquet(
                os.path.join(wh, "accepted", f"batch_id={bid}")
            )

    def drive(wh: str, k) -> int:
        write_batches(wh)
        AGG.reset_compaction_io()
        for fire in (2, 4, 6, 8, 10):
            compact_dedup_state(spark, wh, before_batch=fire, max_l1_runs=k)
        return AGG.COMPACTION_IO["bytes_written"]

    naive = drive(str(tmp_path / "naive"), None)
    tiered = drive(str(tmp_path / "tiered"), 2)
    # same content either way
    assert (
        spark.read.parquet(os.path.join(str(tmp_path / "naive"), "accepted")).count()
        == spark.read.parquet(
            os.path.join(str(tmp_path / "tiered"), "accepted")
        ).count()
        == 20000
    )
    # naive rewrites 2+4+6+8+10 = 30 batch-volumes; tiered K=2 rewrites
    # 2 per fire + one 6-batch base merge = 16 — assert the margin with
    # slack for file overhead
    assert tiered < 0.7 * naive, (tiered, naive)


def test_crash_between_l1_fold_and_base_merge_converges(spark, tmp_path):
    """The NEW window r11 introduces: step 1 (L0→run) has committed,
    step 2 (runs→base) has not started. A crash there must leave a
    readable store (runs are committed tiers) and the next fire must
    finish the merge."""
    from airbnb_pyspark_jobs_spark.streaming import aggregates as AGG

    wh = str(tmp_path / "wh")
    _run_store(spark, wh, 6, 2, 2)  # fires at 2, 4: runs -2, -3

    real = AGG.compact_partials
    state = {"crashed": False}

    def crashing(spark_, path, key_cols, base_batch_id=-1, **kw):
        # the base merge is the only call aimed at -1 with before_batch=0
        if base_batch_id == -1 and kw.get("before_batch") == 0:
            state["crashed"] = True
            raise RuntimeError("injected crash between L1 fold and base merge")
        return real(spark_, path, key_cols, base_batch_id=base_batch_id, **kw)

    AGG.compact_partials = crashing
    try:
        with pytest.raises(RuntimeError, match="between L1 fold"):
            # fire at 6: folds {4,5} -> -4, runs now 3 > 2 -> merge crashes
            compact_dedup_state(spark, wh, before_batch=6, max_l1_runs=2)
    finally:
        AGG.compact_partials = real
    assert state["crashed"]
    # committed tiers only — store fully readable mid-crash
    assert "batch_id=-1" not in _dirs(wh, "accepted")
    assert (
        _read_state(spark, os.path.join(wh, "accepted"), _DOCS_SCHEMA, 6).count()
        == 12
    )

    # next fire converges: no new L0s, merge fires
    compact_dedup_state(spark, wh, before_batch=6, max_l1_runs=2)
    assert _dirs(wh, "accepted") == ["batch_id=-1"]
    assert (
        _read_state(spark, os.path.join(wh, "accepted"), _DOCS_SCHEMA, 6).count()
        == 12
    )


def test_crash_inside_base_merge_recovers_to_recorded_target(
    spark, tmp_path, monkeypatch
):
    """Crash INSIDE step 2's manifest window (inputs destroyed, rename
    not landed) — and the NEXT compaction call is step 1, aimed at a
    DIFFERENT target (a fresh L1 id). Recovery must land the crashed
    fold at the target RECORDED in the manifest (-1), not the new
    call's: before r11 the manifest held only the input list and the
    caller's target was assumed."""
    wh = str(tmp_path / "wh")
    _run_store(spark, wh, 6, 2, 2)

    real_rename = os.rename
    state = {"crashed": False}

    def crashing_rename(a, b):
        # step 2's rename lands at batch_id=-1; step 1's at -4
        if str(b).endswith(os.path.join("accepted", "batch_id=-1")):
            state["crashed"] = True
            raise RuntimeError("injected crash inside base-merge swap")
        return real_rename(a, b)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="inside base-merge"):
        compact_dedup_state(spark, wh, before_batch=6, max_l1_runs=2)
    monkeypatch.setattr(os, "rename", real_rename)
    assert state["crashed"]
    # the window: runs rmtree'd, base not in place, manifest alive
    tmp = os.path.join(wh, "accepted", "__compact_tmp")
    assert os.path.exists(os.path.join(tmp, "_FOLDED.json"))
    assert not any(d.startswith("batch_id=-") for d in _dirs(wh, "accepted"))

    # next fire: step 1 (target would be a fresh run id) must FIRST
    # finish the crashed fold at its recorded target (-1)
    compact_dedup_state(spark, wh, before_batch=6, max_l1_runs=2)
    assert "batch_id=-1" in _dirs(wh, "accepted")
    assert not os.path.exists(tmp)
    assert (
        _read_state(spark, os.path.join(wh, "accepted"), _DOCS_SCHEMA, 6).count()
        == 12
    )
