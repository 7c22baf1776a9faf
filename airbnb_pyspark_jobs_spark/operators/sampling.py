"""Deterministic sampling & dataset splitting for training pipelines.

Hash-based, not rand()-based: the split of a row is a pure function of
its key, so re-runs, retries, backfills and cross-engine replays all
agree — the property a training/eval split MUST have (a rand() split
silently leaks eval rows into training on every re-run).

The hash is the portable md5-derived 32-bit int (same primitive as
functions/text.portable_hash_int), so the DuckDB oracle reproduces
splits verbatim. Production paths that don't need oracle parity can use
xxhash64 for a wider/faster hash with the same structure.

Scale: both operators are scan-side projections/filters — no shuffle,
no driver actions; they compose with partition pruning and pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

_BUCKETS = 10_000


def split_bucket(key: Column | str, seed: str = "") -> Column:
    """Stable bucket in [0, 10000) from the md5 of the key (+ seed).
    Changing ``seed`` re-deals every row to a fresh, equally-stable
    split — the knob for drawing independent splits."""
    key = F.col(key) if isinstance(key, str) else key
    return F.pmod(portable_hash_int(key.cast("string"), seed=seed), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    ``fractions`` maps split name → fraction (must sum to 1.0); buckets
    are allotted in insertion order, so ``{"train": .8, "val": .1,
    "test": .1}`` puts buckets [0,8000) in train, [8000,9000) in val,
    the rest in test. Membership depends only on (key, seed) — adding
    or removing OTHER rows never moves a row between splits.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = split_bucket(key_col, seed)
    expr = None
    upper = 0.0
    names = list(fractions)
    for name in names[:-1]:
        upper += fractions[name]
        cond = bucket < int(round(upper * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Stable ``fraction`` sample: keep rows whose bucket falls below
    fraction·10000. Unlike ``df.sample()``, membership is reproducible
    across runs, partitionings and engines."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(split_bucket(key_col, seed) < int(round(fraction * _BUCKETS)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — ``df.sampleBy`` with
    reproducible membership (hash of key, not rand()): the corpus
    rebalancing step of a training pipeline (downsample over-represented
    sources, keep rare ones whole).

    ``fractions`` maps stratum value → keep fraction; strata not listed
    get ``default_fraction``. A row is kept iff its stable bucket falls
    below its stratum's threshold, so membership is a pure function of
    (key, seed) — unaffected by other rows, partitioning, or engine.
    Scan-side filter: no shuffle, composes with pushdown; the stratum
    threshold is a literal CASE over ``strata_col``.
    """
    for name, f in {**fractions, "<default>": default_fraction}.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0,1], got {f}")
    bucket = split_bucket(key_col, seed)
    thr = None
    for name, f in fractions.items():
        cond = F.col(strata_col) == name
        t = F.lit(int(round(f * _BUCKETS)))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default = F.lit(int(round(default_fraction * _BUCKETS)))
    thr = default if thr is None else thr.otherwise(default)
    return df.filter(bucket < thr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic importance sampling: keep each row with acceptance
    probability = its weight in [0, 1] (quality score, importance
    weight, resampling ratio), decided by the row's stable hash bucket
    rather than rand() — the DSIR-style quality-weighted corpus
    resampling step, reproducible across runs, partitionings and
    engines.

    A row is kept iff ``bucket(key, seed) < weight * 10000``; weights
    outside [0, 1] are clamped. Scan-side filter — no shuffle; weights
    computed identically in another engine (our quality scores are
    bitwise cross-engine) make the kept set identical too.
    """
    bucket = split_bucket(key_col, seed)
    w = F.least(F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0))
    return df.filter(bucket.cast("double") < w * _BUCKETS)


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int = 0,
    n_shards: int | None = None,
    seed: str = "",
    bucket_hex_digits: int = 4,
) -> DataFrame:
    """Deterministic global training-order shuffle with optional shard
    assignment — the epoch-wise data-loader ordering of a training
    pipeline, as a pure function of ``(key, epoch, seed)``: re-runs,
    resumed jobs and engines reproduce the identical permutation, and
    bumping ``epoch`` re-deals an independent one (what ``orderBy
    (rand())`` can never give you).

    Adds ``shuffle_key`` (md5 hex of ``key:epoch:seed``), ``epoch_pos``
    (0-based global position in shuffle_key order, key tie-break) and —
    when ``n_shards`` is given — ``shard`` = contiguous equal ranges of
    the shuffled order, so each shard is one sequential scan of the
    sorted output at write time.

    Scale: a single global ``row_number`` window is a one-task
    bottleneck (the partitioned-window discipline in plans/queries W1),
    so the global position is computed in TWO partitioned phases: rank
    within a coarse hash-prefix bucket (window partitioned by bucket),
    plus cumulative bucket offsets (a window over the ≤16^digits
    bucket-count rows — thousands, not corpus-sized — then broadcast
    back). At 100 TB: if only shard FILES are needed (not exact
    positions), skip the ranking entirely — ``repartitionByRange(
    n_shards, shuffle_key)`` + ``sortWithinPartitions`` writes the same
    shards with no global coordination.
    """
    key = F.col(key_col)
    skey = F.md5(
        F.concat_ws(":", key.cast("string"), F.lit(str(epoch)), F.lit(seed))
    )
    keyed = df.withColumn("shuffle_key", skey)
    out = _two_phase_rank(
        keyed,
        order_col="shuffle_key",
        tie_col=key_col,
        out_col="epoch_pos",
        bucket_hex_digits=bucket_hex_digits,
    ).withColumn("epoch_pos", (F.col("epoch_pos") - 1).cast("bigint"))
    if n_shards is not None:
        total = keyed.agg(F.count(F.lit(1)).alias("__n"))
        out = (
            out.crossJoin(F.broadcast(total))
            .withColumn(
                "shard",
                F.expr(f"(epoch_pos * {int(n_shards)}) div __n").cast("bigint"),
            )
            .drop("__n")
        )
    return out


def _two_phase_rank(
    df: DataFrame,
    order_col: str,
    tie_col: str,
    out_col: str,
    group_cols: tuple[str, ...] = (),
    bucket_hex_digits: int = 4,
) -> DataFrame:
    """1-based dense global rank of ``order_col`` (``tie_col``
    tie-break) within each ``group_cols`` group, WITHOUT a
    group-global window: rank within (group, coarse hash-prefix
    bucket) + cumulative bucket offsets per group (a window over the
    bucket-count rows — thousands, not corpus-sized — broadcast back).
    ``order_col`` must be a hex string (md5-keyed shuffles); the
    prefix buckets then sort consistently with the full key.

    The input feeds BOTH the rank window and the bucket-count branch
    (no exchange reuse — the two branches partition the same key over
    different child plans), so it is owned-persisted: the upstream
    subtree runs once instead of twice per call (guide §5; the q103
    staged-frame lesson applied to the two-phase family).
    """
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.caching import owned_persist

    gcols = list(group_cols)
    keyed = owned_persist(
        df.withColumn("__b", F.substring(order_col, 1, bucket_hex_digits))
    )
    w_in = Window.partitionBy(*gcols, "__b").orderBy(order_col, tie_col)
    ranked = keyed.withColumn("__rn", F.row_number().over(w_in))
    counts = keyed.groupBy(*gcols, "__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *gcols,
        "__b",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    out = ranked.join(F.broadcast(offsets), [*gcols, "__b"]).withColumn(
        out_col, (F.col("__off") + F.col("__rn")).cast("bigint")
    )
    return out.drop("__b", "__rn", "__off")


def _check_reserved(df: DataFrame, out_cols: list[str] | None = None) -> None:
    """Reject input columns that collide with two-phase working names.
    The multi-column variants generate SUFFIXED working columns
    (``__run_<out>`` / ``__off_<out>`` / ``__cnt_<out>``) — those exact
    names must be checked, not just the bare prefixes, or an input
    named e.g. ``__run_cn`` is silently clobbered despite the guard's
    promise (ADVICE r7)."""
    reserved = {"__b", "__rn", "__off", "__run", "__mn", "__mx", "__cnt"}
    for oc in out_cols or []:
        reserved |= {f"__run_{oc}", f"__off_{oc}", f"__cnt_{oc}"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with two-phase internals: {sorted(clash)}"
            " (rename them; the helper would silently clobber them)"
        )


def two_phase_numeric_rank(
    df: DataFrame,
    order_col: str,
    tie_col: str,
    out_col: str,
    descending: bool = False,
    n_buckets: int = 4096,
) -> DataFrame:
    """1-based global row_number by a NUMERIC/temporal ``order_col``
    (``tie_col`` ascending tie-break) WITHOUT a single-partition
    window — the numeric twin of :func:`_two_phase_rank` (hash keys)
    and the in-plan sibling of ``exact_quantiles``' range-bucketed
    rank: one (min, max) broadcast scalar frame, fixed-width value
    buckets, per-bucket ``row_number`` (partitioned window), cumulative
    bucket-count offsets over ``n_buckets`` rows broadcast back.

    Correctness does not depend on the double cast being lossless:
    bigint/timestamp→double is monotone non-decreasing, equal values
    always share a bucket, and the within-bucket window orders by the
    ORIGINAL column — bucket assignment only has to respect ordering,
    which monotone casts do. ``order_col`` must be non-null (filter
    first). Zero driver actions: stats stay a broadcast 1-row frame.

    The input feeds the stats scan, the rank window AND the
    bucket-count branch (three subtree evaluations — no exchange
    reuse), so it is owned-persisted: the upstream subtree runs once
    per call (guide §5)."""
    _check_reserved(df)
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.caching import owned_persist

    df = owned_persist(df)
    ord_d = F.col(order_col).cast("double")
    stats = df.agg(F.min(ord_d).alias("__mn"), F.max(ord_d).alias("__mx"))
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets)),
        F.lit(1e-300),  # all-equal input: everything lands in bucket 0
    )
    keyed = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "__b",
            F.least(
                F.floor((ord_d - F.col("__mn")) / width),
                F.lit(n_buckets - 1),
            ).cast("bigint"),
        )
        .drop("__mn", "__mx")
    )
    order_in = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tie_col).asc(),
    ]
    w_in = Window.partitionBy("__b").orderBy(*order_in)
    ranked = keyed.withColumn("__rn", F.row_number().over(w_in))
    counts = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy(
        F.col("__b").desc() if descending else F.col("__b").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    out = ranked.join(F.broadcast(offsets), "__b").withColumn(
        out_col, (F.col("__off") + F.col("__rn")).cast("bigint")
    )
    return out.drop("__b", "__rn", "__off")


def two_phase_numeric_cumsum_multi(
    df: DataFrame,
    order_col: str,
    tie_col: str,
    value_cols: list[str],
    out_cols: list[str],
    descending: bool = False,
    n_buckets: int = 4096,
) -> DataFrame:
    """Running sums of SEVERAL value columns in one shared global
    (``order_col``, ``tie_col``) order — one stats scan, one bucket
    assignment, one window pass computing every running sum (q213's
    two CDFs previously paid the full two-phase machinery twice).
    Semantics per column identical to :func:`two_phase_numeric_cumsum`.
    Input owned-persisted (three subtree consumers — guide §5)."""
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.caching import owned_persist

    _check_reserved(df, out_cols)
    df = owned_persist(df)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_cols and out_cols must align")
    ord_d = F.col(order_col).cast("double")
    stats = df.agg(F.min(ord_d).alias("__mn"), F.max(ord_d).alias("__mx"))
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets)),
        F.lit(1e-300),
    )
    keyed = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "__b",
            F.least(
                F.floor((ord_d - F.col("__mn")) / width),
                F.lit(n_buckets - 1),
            ).cast("bigint"),
        )
        .drop("__mn", "__mx")
    )
    order_in = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tie_col).asc(),
    ]
    w_in = (
        Window.partitionBy("__b")
        .orderBy(*order_in)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = keyed
    for vc, oc in zip(value_cols, out_cols):
        ranked = ranked.withColumn(
            f"__run_{oc}", F.sum(F.col(vc).cast("bigint")).over(w_in)
        )
    counts = keyed.groupBy("__b").agg(
        *[
            F.sum(F.col(vc).cast("bigint")).alias(f"__cnt_{oc}")
            for vc, oc in zip(value_cols, out_cols)
        ]
    )
    w_off = Window.orderBy(
        F.col("__b").desc() if descending else F.col("__b").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b",
        *[
            F.coalesce(F.sum(f"__cnt_{oc}").over(w_off), F.lit(0)).alias(
                f"__off_{oc}"
            )
            for oc in out_cols
        ],
    )
    out = ranked.join(F.broadcast(offsets), "__b")
    for oc in out_cols:
        out = out.withColumn(
            oc, (F.col(f"__off_{oc}") + F.col(f"__run_{oc}")).cast("bigint")
        )
    return out.drop(
        "__b", *[f"__run_{oc}" for oc in out_cols], *[f"__off_{oc}" for oc in out_cols]
    )


def grouped_two_phase_cumsum_multi(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tie_col: str,
    value_cols: list[str],
    out_cols: list[str],
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-GROUP running sums of several value columns in (``order_col``,
    ``tie_col``) order — the grouped sibling of
    :func:`two_phase_numeric_cumsum_multi`. A plain
    ``Window.partitionBy(group)`` cumsum puts one GROUP's entire history
    into one task (a 10⁹-doc source = the single-partition sort hazard);
    here the order column is range-bucketed WITHIN each group, running
    sums are computed per (group, bucket) partition, and the cross-
    bucket offsets come from an ``n_buckets``-row-per-group window —
    both bounded. Order stats (min/max) are per group, broadcast back.
    Input owned-persisted (three subtree consumers — guide §5)."""
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.caching import owned_persist

    _check_reserved(df, out_cols)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_cols and out_cols must align")
    df = owned_persist(df)
    ord_d = F.col(order_col).cast("double")
    stats = df.groupBy(group_col).agg(
        F.min(ord_d).alias("__mn"), F.max(ord_d).alias("__mx")
    )
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets)),
        F.lit(1e-300),
    )
    keyed = (
        df.join(F.broadcast(stats), group_col)
        .withColumn(
            "__b",
            F.least(
                F.floor((ord_d - F.col("__mn")) / width),
                F.lit(n_buckets - 1),
            ).cast("bigint"),
        )
        .drop("__mn", "__mx")
    )
    w_in = (
        Window.partitionBy(group_col, "__b")
        .orderBy(F.col(order_col).asc(), F.col(tie_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = keyed
    for vc, oc in zip(value_cols, out_cols):
        ranked = ranked.withColumn(
            f"__run_{oc}", F.sum(F.col(vc).cast("bigint")).over(w_in)
        )
    counts = keyed.groupBy(group_col, "__b").agg(
        *[
            F.sum(F.col(vc).cast("bigint")).alias(f"__cnt_{oc}")
            for vc, oc in zip(value_cols, out_cols)
        ]
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        group_col,
        "__b",
        *[
            F.coalesce(F.sum(f"__cnt_{oc}").over(w_off), F.lit(0)).alias(
                f"__off_{oc}"
            )
            for oc in out_cols
        ],
    )
    out = ranked.join(offsets, [group_col, "__b"])
    for oc in out_cols:
        out = out.withColumn(
            oc, (F.col(f"__off_{oc}") + F.col(f"__run_{oc}")).cast("bigint")
        )
    return out.drop(
        "__b", *[f"__run_{oc}" for oc in out_cols], *[f"__off_{oc}" for oc in out_cols]
    )


def two_phase_numeric_cumsum(
    df: DataFrame,
    order_col: str,
    tie_col: str,
    value_col: str,
    out_col: str,
    descending: bool = False,
    n_buckets: int = 4096,
) -> DataFrame:
    """Running SUM of ``value_col`` in global (``order_col``,
    ``tie_col``) order WITHOUT a single-partition window — the same
    range-bucket two-phase shape as :func:`two_phase_numeric_rank`
    (which is this with value ≡ 1): per-bucket value sums → cumulative
    bucket offsets over ``n_buckets`` rows (broadcast back), running
    sum within each bucket via a bucket-partitioned window. The budget
    -cutoff primitive ("take documents in quality order until N
    tokens"). ``order_col`` must be non-null; ``value_col`` is summed
    as bigint (cast first for decimals). Input owned-persisted (three
    subtree consumers — guide §5)."""
    _check_reserved(df)
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.caching import owned_persist

    df = owned_persist(df)
    ord_d = F.col(order_col).cast("double")
    stats = df.agg(F.min(ord_d).alias("__mn"), F.max(ord_d).alias("__mx"))
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets)),
        F.lit(1e-300),
    )
    keyed = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "__b",
            F.least(
                F.floor((ord_d - F.col("__mn")) / width),
                F.lit(n_buckets - 1),
            ).cast("bigint"),
        )
        .drop("__mn", "__mx")
    )
    order_in = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tie_col).asc(),
    ]
    w_in = (
        Window.partitionBy("__b")
        .orderBy(*order_in)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = keyed.withColumn(
        "__run", F.sum(F.col(value_col).cast("bigint")).over(w_in)
    )
    counts = keyed.groupBy("__b").agg(
        F.sum(F.col(value_col).cast("bigint")).alias("__cnt")
    )
    w_off = Window.orderBy(
        F.col("__b").desc() if descending else F.col("__b").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    out = ranked.join(F.broadcast(offsets), "__b").withColumn(
        out_col, (F.col("__off") + F.col("__run")).cast("bigint")
    )
    return out.drop("__b", "__run", "__off")


def two_phase_hash_cumsum(
    df: DataFrame,
    order_col: str,
    tie_col: str,
    value_col: str,
    out_col: str,
    bucket_hex_digits: int = 3,
) -> DataFrame:
    """Running SUM of ``value_col`` in global (``order_col``,
    ``tie_col``) order where ``order_col`` is a HEX-string hash key
    (md5-keyed shuffles) — the weighted-sum twin of
    :func:`_two_phase_rank`: hex-prefix buckets sort consistently with
    the full key, per-bucket value sums roll into broadcast cumulative
    offsets, the corpus-sized window only ever partitions by the
    prefix bucket. Keyed frame owned-persisted (two subtree
    consumers — guide §5)."""
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.caching import owned_persist

    keyed = owned_persist(
        df.withColumn("__b", F.substring(order_col, 1, bucket_hex_digits))
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.col(order_col).asc(), F.col(tie_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = keyed.withColumn(
        "__run", F.sum(F.col(value_col).cast("bigint")).over(w_in)
    )
    counts = keyed.groupBy("__b").agg(
        F.sum(F.col(value_col).cast("bigint")).alias("__cnt")
    )
    w_off = Window.orderBy(F.col("__b").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    out = ranked.join(F.broadcast(offsets), "__b").withColumn(
        out_col, (F.col("__off") + F.col("__run")).cast("bigint")
    )
    return out.drop("__b", "__run", "__off")


def source_interleave(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    epoch: int = 0,
    seed: str = "",
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic weighted source-interleaving order — the mixture
    sampler of a multi-source training pipeline (web/books/code at
    target rates) as stride scheduling: source s's k-th document in its
    epoch-shuffled order sorts at ``interleave_key = k / w_s``, so
    consuming rows in interleave_key order yields each source at its
    weight's rate from the very start (a weighted concat-then-shuffle
    only mixes in expectation; strides mix deterministically and
    restart-reproducibly). Sources not in ``weights`` get the minimum
    given weight (conservative: rare-source starvation over flooding).

    Adds ``shuffle_key`` (md5 of key:epoch:seed), ``source_rank``
    (1-based within-source position) and ``interleave_key`` (round to
    ``round_digits``; consumers sort by (interleave_key, source, key) —
    the tie-break makes the total order unambiguous).

    Scale: within-source rank uses the same two-phase partitioned rank
    as :func:`epoch_shuffle` (rank within (source, hash-prefix bucket)
    + broadcast offsets), so a 100 TB source is never one window task;
    one integer division per row after that. Weights are a literal
    CASE — no join.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {s!r} must be > 0, got {w}")
    key = F.col(key_col)
    skey = F.md5(
        F.concat_ws(":", key.cast("string"), F.lit(str(epoch)), F.lit(seed))
    )
    keyed = df.withColumn("shuffle_key", skey)
    ranked = _two_phase_rank(
        keyed,
        order_col="shuffle_key",
        tie_col=key_col,
        out_col="source_rank",
        group_cols=(source_col,),
    )
    w_expr = None
    default = F.lit(float(min(weights.values())))
    for s, w in weights.items():
        cond = F.col(source_col) == s
        w_expr = (
            F.when(cond, F.lit(float(w)))
            if w_expr is None
            else w_expr.when(cond, F.lit(float(w)))
        )
    w_expr = w_expr.otherwise(default)
    return ranked.withColumn(
        "interleave_key",
        F.round(F.col("source_rank").cast("double") / w_expr, round_digits),
    )


def _alpha_pow(c: Column, alpha: float) -> Column:
    """``c ** alpha`` for alpha in {0.25, 0.5, 0.75, 1.0} built from
    IEEE ``sqrt`` compositions only. General ``pow`` is NOT correctly
    rounded across libms (Java vs DuckDB can differ in the last ulp,
    which flips a rounded quota at the boundary); sqrt and multiply
    ARE, so these four temperatures are bitwise cross-engine."""
    if alpha == 1.0:
        return c
    if alpha == 0.5:
        return F.sqrt(c)
    if alpha == 0.25:
        return F.sqrt(F.sqrt(c))
    if alpha == 0.75:
        return F.sqrt(c) * F.sqrt(F.sqrt(c))
    raise ValueError("alpha must be one of 0.25, 0.5, 0.75, 1.0")


def temperature_mixture_quotas(
    docs: DataFrame,
    budget: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual/multi-source
    LM sampling rule, public — mC4 / XLM-R alpha-sampling): sampling
    share q_i = c_i^alpha / sum_j c_j^alpha over per-source token
    counts c_i; alpha < 1 flattens the distribution, upweighting small
    sources. Each source gets quota_i = floor(q_i * budget) documents,
    filled by the deterministic md5 rank within the source (same
    selection rule as the per-source caps operator, so reruns and
    engines agree row-for-row).

    Cross-engine determinism: c_i^alpha via sqrt compositions
    (:func:`_alpha_pow`), rounded to 6 and summed as DECIMAL(28,6) —
    exact, order-independent — then ONE double division per source,
    rounded to 6. Never a float sum across groups (aggregation order
    differs between engines) and never libm ``pow``.

    Returns per doc: ``doc_id, source, n_tokens, weight (the source's
    q_i), quota, src_rank, selected``. Sampling is WITHOUT
    replacement: a source smaller than its quota contributes all its
    docs and the leftover budget is not redistributed (callers that
    need exact totals re-run with the residual budget over the
    unfilled sources, or use repetition-tolerant upsampling). Scale
    shape: one token-count scan, a source-count aggregate broadcast
    back, one source-partitioned rank window.
    """
    from airbnb_pyspark_jobs_spark.functions.text import token_count
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        token_count(text_col).alias("n_tokens"),
    )
    per_src = toks.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("__c")
    )
    w_dec = per_src.select(
        "source",
        F.round(_alpha_pow(F.col("__c").cast("double"), alpha), 6)
        .cast("decimal(28,6)")
        .alias("__w"),
    )
    tot = w_dec.agg(F.sum("__w").alias("__tw"))  # exact decimal sum
    quotas = w_dec.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(F.col("__w").cast("double") / F.col("__tw").cast("double"), 6).alias(
            "weight"
        ),
    ).select(
        "source",
        "weight",
        F.floor(F.col("weight") * F.lit(float(budget))).cast("bigint").alias("quota"),
    )
    ranked = toks.withColumn(
        "src_rank",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .cast("bigint"),
    )
    return ranked.join(F.broadcast(quotas), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "weight",
        "quota",
        "src_rank",
        (F.col("src_rank") <= F.col("quota")).alias("selected"),
    )


def weighted_reservoir_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str,
    seed: str = "res:",
    key_digits: int = 9,
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement per group —
    Efraimidis-Spirakis A-ES (public algorithm): each row draws a
    deterministic uniform u from its md5 hash and keeps the k rows
    per group with the largest ``u^(1/w)``. We rank by the equivalent
    exponential key ``ln(u)/w`` DESC (same order, no fractional
    ``pow`` — libm pow is not cross-engine exact, ln rounded to 6 is).
    Complements :func:`weighted_sample` (Bernoulli, random size):
    this one hits the quota exactly.

    Determinism: u = (h + 0.5) / 2^32 from the portable md5 hash;
    ``round(ln(u), 6) / w`` is one identical IEEE op sequence on both
    engines; ties break on id. The rank window partitions by group.

    Returns ``{group}, {id}, weight, sample_key, rn`` (rn <= k).
    Weights must be strictly positive — caller filters."""
    from pyspark.sql.window import Window

    g, idc = group_col, id_col
    h = portable_hash_int(F.col(idc).cast("string"), seed=seed)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(F.log(u), 6) / F.col(weight_col).cast("double")
    ranked = df.select(
        F.col(g),
        F.col(idc),
        F.col(weight_col).cast("double").alias("weight"),
        key.alias("__ky"),
    ).withColumn(
        "rn",
        F.row_number()
        .over(
            Window.partitionBy(g).orderBy(F.col("__ky").desc(), F.col(idc).asc())
        )
        .cast("bigint"),
    )
    return ranked.filter(F.col("rn") <= k).select(
        g, idc, "weight", F.round("__ky", key_digits).alias("sample_key"), "rn"
    )


def doremi_source_weights(
    docs: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    score_col: str = "mean_logprob",
    eps: float = 0.01,
    digits: int = 6,
) -> DataFrame:
    """Excess-loss source reweighting (the DoReMi idea, Xie et al.
    2023, simplified to a one-shot public recipe): sources the corpus
    LM fits WORSE than the global mean (excess = global_mean −
    source_mean of per-doc mean log-probability) get a larger mixture
    weight — the next training mix spends more budget where the model
    underperforms. ``eps`` keeps the best-fit source at a nonzero
    floor; weights are shifted-excess normalized to sum to 1.

    Cross-engine determinism: per-doc scores arrive already rounded
    (q96's 4-digit contract) and are cast to DECIMAL before EVERY sum
    (group means, the global mean, the weight normalizer) — exact and
    order-independent — with ONE double division + round per derived
    value; the shift uses the same ``(excess − min_excess) + eps``
    association on both engines. Never a float sum across groups.

    Returns per source: ``source, n_docs, src_mean_logprob, excess,
    mix_weight``. Scale shape: one corpus-scale groupBy on source;
    everything after is sources-sized (broadcast scalar joins).
    """
    j = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    ).join(
        scores.select(
            F.col(id_col).alias("doc_id"),
            F.col(score_col).cast("decimal(20,4)").alias("__sd"),
        ),
        "doc_id",
    )
    mean_expr = F.round(
        F.sum("__sd").cast("double") / F.count(F.lit(1)).cast("double"), digits
    )
    per = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        mean_expr.alias("src_mean_logprob"),
    )
    g = j.agg(mean_expr.alias("__g"))
    e = per.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "src_mean_logprob",
        F.round(F.col("__g") - F.col("src_mean_logprob"), digits).alias("excess"),
    )
    mn = e.agg(F.min("excess").alias("__mex"))
    w = e.crossJoin(F.broadcast(mn)).select(
        "source",
        "n_docs",
        "src_mean_logprob",
        "excess",
        F.round(
            F.col("excess") - F.col("__mex") + F.lit(float(eps)), digits
        ).alias("__wraw"),
    )
    tot = w.agg(F.sum(F.col("__wraw").cast(f"decimal(28,{digits})")).alias("__tot"))
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_mean_logprob",
        "excess",
        F.round(F.col("__wraw") / F.col("__tot").cast("double"), digits).alias(
            "mix_weight"
        ),
    )
