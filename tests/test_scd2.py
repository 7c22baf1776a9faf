"""SCD2 invariants (SURVEY §5.3): one current version per key, validity
intervals partition time, unchanged re-run is a no-op, changes expire +
re-version, brand-new keys insert."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.scd2 import (
    Scd2Spec,
    scd2_initial,
    scd2_merge,
    validate_scd2_schema,
)

SPEC = Scd2Spec(
    natural_key=("host_src_id",),
    tracked_cols=("host_name", "response_rate"),
    surrogate_key="host_key",
    audit_col=None,
)

T0, T1, T2 = "2025-01-01 00:00:00", "2025-02-01 00:00:00", "2025-03-01 00:00:00"


def _snapshot(spark, rows):
    return spark.createDataFrame(rows, "host_src_id long, host_name string, response_rate long")


def test_initial_load(spark):
    snap = _snapshot(spark, [(1, "alice", 90), (2, "bob", 80), (2, "bob", 80)])
    dim = scd2_initial(snap, SPEC, T0)
    rows = {r.host_src_id: r for r in dim.collect()}
    assert len(rows) == 2  # dedup on natural key
    assert all(r.is_valid for r in rows.values())
    assert all(r.end_dt is None for r in rows.values())
    assert rows[1].host_key != rows[2].host_key


def test_merge_change_expire_and_new(spark):
    dim0 = scd2_initial(_snapshot(spark, [(1, "alice", 90), (2, "bob", 80)]), SPEC, T0)
    # alice changes, bob unchanged, carol new
    snap1 = _snapshot(spark, [(1, "alice", 95), (2, "bob", 80), (3, "carol", 70)])
    dim1 = scd2_merge(dim0, snap1, SPEC, T1)

    rows = dim1.collect()
    assert len(rows) == 4  # bob current, alice old+new, carol new

    current = {r.host_src_id: r for r in rows if r.is_valid}
    assert set(current) == {1, 2, 3}
    assert current[1].response_rate == 95
    assert current[1].start_dt.isoformat().startswith("2025-02-01")

    expired = [r for r in rows if not r.is_valid]
    assert len(expired) == 1
    assert expired[0].host_src_id == 1
    assert expired[0].response_rate == 90
    assert expired[0].end_dt.isoformat().startswith("2025-02-01")

    # surrogate keys: new alice version differs from old alice version
    keys = [r.host_key for r in rows]
    assert len(set(keys)) == 4


def test_merge_noop_when_unchanged(spark):
    snap = _snapshot(spark, [(1, "alice", 90), (2, "bob", 80)])
    dim0 = scd2_initial(snap, SPEC, T0)
    dim1 = scd2_merge(dim0, snap, SPEC, T1)
    assert sorted(map(tuple, dim0.collect())) == sorted(map(tuple, dim1.collect()))


def test_second_change_keeps_full_history(spark):
    dim0 = scd2_initial(_snapshot(spark, [(1, "alice", 90)]), SPEC, T0)
    dim1 = scd2_merge(dim0, _snapshot(spark, [(1, "alice", 95)]), SPEC, T1)
    dim2 = scd2_merge(dim1, _snapshot(spark, [(1, "alice", 99)]), SPEC, T2)
    rows = sorted(dim2.collect(), key=lambda r: r.start_dt)
    assert [r.response_rate for r in rows] == [90, 95, 99]
    assert [r.is_valid for r in rows] == [False, False, True]
    # validity intervals partition time: end_dt of v(i) == start_dt of v(i+1)
    assert rows[0].end_dt == rows[1].start_dt
    assert rows[1].end_dt == rows[2].start_dt
    assert rows[2].end_dt is None


def test_schema_gate(spark):
    bad = _snapshot(spark, [(1, "alice", 90)])
    try:
        validate_scd2_schema(bad, SPEC)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "missing SCD columns" in str(e)


def test_portable_hash_matches_duckdb_semantics(spark):
    """portable_hash=True produces md5-hex keys (oracle-reproducible)."""
    spec = Scd2Spec(
        natural_key=("host_src_id",),
        tracked_cols=("host_name",),
        surrogate_key="k",
        portable_hash=True,
        audit_col=None,
    )
    dim = scd2_initial(
        spark.createDataFrame([(7, "x")], "host_src_id long, host_name string"), spec, T0
    )
    k = dim.select("k").first()[0]
    import hashlib

    expected = hashlib.md5(f"7\x1f{T0}".encode()).hexdigest()
    assert k == expected


def test_merge_tombstones_deleted_keys(spark):
    dim0 = scd2_initial(
        _snapshot(spark, [(1, "alice", 90), (2, "bob", 80), (3, "carol", 70)]), SPEC, T0
    )
    # snapshot: alice changes, bob vanishes (deleted), carol unchanged
    snap1 = _snapshot(spark, [(1, "alice", 95), (3, "carol", 70)])
    deleted = spark.createDataFrame([(2,)], "host_src_id long")
    dim1 = scd2_merge(dim0, snap1, SPEC, T1, deleted_keys=deleted)
    rows = sorted(dim1.collect(), key=lambda r: (r.host_src_id, r.start_dt))
    by_key = {}
    for r in rows:
        by_key.setdefault(r.host_src_id, []).append(r)
    # alice: expired T0 version + new T1 version
    assert [(r.is_valid, r.end_dt is None) for r in by_key[1]] == [(False, False), (True, True)]
    # bob: tombstoned — expired at T1, NO replacement
    assert len(by_key[2]) == 1
    assert (by_key[2][0].is_valid, str(by_key[2][0].end_dt)) == (False, "2025-02-01 00:00:00")
    # carol untouched
    assert [(r.is_valid, r.end_dt) for r in by_key[3]] == [(True, None)]


def test_delete_ignored_when_key_in_snapshot(spark):
    """Ambiguous upsert+delete: the snapshot wins, the key stays alive."""
    dim0 = scd2_initial(_snapshot(spark, [(1, "alice", 90)]), SPEC, T0)
    snap1 = _snapshot(spark, [(1, "alice", 90)])
    deleted = spark.createDataFrame([(1,)], "host_src_id long")
    dim1 = scd2_merge(dim0, snap1, SPEC, T1, deleted_keys=deleted)
    rows = dim1.collect()
    assert len(rows) == 1
    assert rows[0].is_valid and rows[0].end_dt is None


def test_tombstoned_key_can_return_later(spark):
    """A deleted key reappearing in a later snapshot gets a fresh version."""
    dim0 = scd2_initial(_snapshot(spark, [(1, "alice", 90)]), SPEC, T0)
    deleted = spark.createDataFrame([(1,)], "host_src_id long")
    dim1 = scd2_merge(dim0, _snapshot(spark, []), SPEC, T1, deleted_keys=deleted)
    dim2 = scd2_merge(dim1, _snapshot(spark, [(1, "alice", 99)]), SPEC, T2)
    rows = sorted(dim2.collect(), key=lambda r: r.start_dt)
    assert [(r.is_valid, r.end_dt is None) for r in rows] == [(False, False), (True, True)]
    assert str(rows[1].start_dt) == "2025-03-01 00:00:00"


def test_asof_snapshot_boundary_semantics(spark):
    from airbnb_pyspark_jobs_spark.operators.scd2 import asof_snapshot

    dim = spark.createDataFrame(
        [
            (1, "v1", False, "2026-01-01 00:00:00", "2026-02-01 00:00:00"),
            (1, "v2", True, "2026-02-01 00:00:00", None),
        ],
        "k long, val string, is_valid boolean, start_dt string, end_dt string",
    ).selectExpr(
        "k", "val", "is_valid",
        "CAST(start_dt AS TIMESTAMP) AS start_dt",
        "CAST(end_dt AS TIMESTAMP) AS end_dt",
    )
    # strictly inside v1's interval
    assert [r.val for r in asof_snapshot(dim, "2026-01-15 00:00:00").collect()] == ["v1"]
    # exactly at the version flip: inclusive start, exclusive end -> v2
    assert [r.val for r in asof_snapshot(dim, "2026-02-01 00:00:00").collect()] == ["v2"]
    # before the dimension existed -> empty
    assert asof_snapshot(dim, "2025-12-31 00:00:00").count() == 0


def test_snapshot_diff_classifies_all_change_types(spark):
    from airbnb_pyspark_jobs_spark.operators.scd2 import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, name string, val double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 25.0), (3, "c", None), (5, "e", 50.0)],
        "k long, name string, val double",
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"], ["name", "val"]).collect()}
    # k=1 unchanged -> absent; k=3 null == null (null-safe) -> absent
    assert set(out) == {2, 4, 5}
    assert out[2].change_type == "changed"
    assert out[2].changed_cols == "name,val"
    assert out[4].change_type == "removed" and out[4].changed_cols == ""
    assert out[5].change_type == "added" and out[5].changed_cols == ""


def test_snapshot_diff_null_transitions_are_changes(spark):
    from airbnb_pyspark_jobs_spark.operators.scd2 import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    out = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert out[0].change_type == "changed" and out[0].changed_cols == "v"
