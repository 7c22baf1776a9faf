"""Distributed BPE merge learning — tokenizer training as a Spark job.

Byte-pair encoding's training loop (count adjacent symbol pairs across
the corpus, merge the most frequent, repeat) is THE tokenizer-building
step of an LLM data pipeline, and it parallelizes naturally: pair
counting is a weighted groupBy over the word-frequency table (corpus
scale drops out after the first aggregation — iterations touch only
distinct words), and the argmax merge is a bounded driver-side action
per iteration, exactly like the k-means training loops in
operators/similarity.py.

Determinism: ties on pair count break lexicographically on (sym_a,
sym_b); words are held as single-space-joined symbol strings and a
merge is the string replace of ``' a b '`` with ``' ab '`` applied
``replace_passes`` times. One pass misses consecutive occurrences that
share a delimiter space (``' a a a a '`` → ``' aa a a '``); iterating
to the fixpoint merges until NO adjacent (x, y) pair remains —
maximal, like classic BPE (banana → ``b an an a</w>``; ``a×4`` →
``aa aa``). Caveat, stated honestly: in same-symbol runs ≥ 6 the
fixpoint's merge PLACEMENT can differ from classic pairwise-left
(``a×6`` → ``aa a aa a``, classic gives ``aa aa aa``) because pass
1's non-overlapping scan skips delimiter-sharing sites; both are
valid maximal merges and the engines agree exactly (same nested
replace in SQL — the q89 oracle unrolls the iterations), which is
the contract that matters here. A run of k merge sites resolves ≥ 1
site per pass, so passes = ⌊max word len / 2⌋ suffices.

Scale: the word-frequency table is tiny next to the corpus (Zipf), so
each iteration is one groupBy over |vocab| rows + one replace
projection. For byte-level BPE over 100 TB, the same loop runs over
the (word, freq) aggregate — corpus size only affects the first count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.functions.text import tokens

END = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) across the corpus — the only corpus-scale pass."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(wf: DataFrame) -> DataFrame:
    """Word → ' c h a r s </w> ' symbol string (leading/trailing spaces
    so every adjacent pair is ' a b '-delimited for replace-merges)."""
    return wf.select(
        "freq",
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", F.split(F.col("w"), "")),
            F.lit(f" {END} "),
        ).alias("s"),
    )


def _top_pair(sym: DataFrame) -> tuple[str, str, int] | None:
    """Most frequent adjacent pair (freq-weighted), ties broken
    lexicographically. One groupBy + a LIMIT-1 collect."""
    arr = F.split(F.trim(F.col("s")), " ")
    # Words fully merged to ONE symbol have no adjacent pairs — and must
    # be filtered BEFORE the pair transform: sequence(1, size-1) with
    # size=1 is sequence(1, 0), which Spark generates DESCENDING as
    # [1, 0], so element_at(a, j+1) indexes past the array (first hit at
    # merge 33 of the 256-merge scaling run; invisible at n_merges=3).
    staged = sym.select("freq", arr.alias("a")).filter(F.size("a") >= 2)
    pairs = staged.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("a") - 1),
                lambda j: F.struct(
                    F.element_at(F.col("a"), j).alias("x"),
                    F.element_at(F.col("a"), j + 1).alias("y"),
                ),
            )
        ).alias("p"),
    )
    top = (
        pairs.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("x").asc(), F.col("y").asc())
        .limit(1)
        .collect()
    )
    if not top:
        return None
    return top[0].x, top[0].y, int(top[0].cnt)


def apply_merge(s, x: str, y: str, replace_passes: int = 6):
    """Merge every ``' x y '`` occurrence into ``' xy '`` — nested
    replace to the documented fixpoint bound."""
    for _ in range(replace_passes):
        s = F.replace(s, F.lit(f" {x} {y} "), F.lit(f" {x}{y} "))
    return s


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    replace_passes: int = 6,
    progress=None,
    sym_partitions: int = 4,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(merge_idx, sym_a, sym_b, merged, pair_count)]``.

    Lineage/memory discipline (the dedup_components lesson): each
    iteration's symbol table is ``localCheckpoint(eager=True)``, NOT
    persisted — persist caches data but the replace-chain plan still
    nests merge over merge, so Catalyst re-analyzes a linearly growing
    tree and real vocab sizes (10k-32k merges) die in analysis;
    checkpointing truncates the plan to a scan of the materialized
    vocab-sized table each round (round 2 additionally leaked every
    superseded persist — checkpoint blocks are instead freed by the
    ContextCleaner when the old frame is dropped). The materialization
    this forces is work `_top_pair`'s aggregation does anyway. On a
    fault-tolerant cluster swap for ``checkpoint()`` with a reliable
    dir (executor-loss safe). Measured: the sf0.01 corpus merges to
    vocabulary exhaustion (106 merges — every word one symbol) in
    ~22 s at a FLAT ~0.2 s/merge, plan depth constant; round 2's
    persist-chain version grew per-merge cost with the nesting depth
    (SCALE_NOTES).
    """
    # The symbol table is VOCAB-sized (one row per word type) from here
    # on — corpus scale left the loop with the word-frequency pass.
    # Coalesce to a handful of partitions or every merge pays
    # shuffle.partitions-many near-empty tasks x 3 jobs (measured 3.3
    # -> 0.6 s/merge at 8k types, local[32]); size sym_partitions ~
    # |vocab|/250k rows on a cluster.
    sym = (
        _initial_symbols(word_frequencies(docs, text_col))
        .coalesce(sym_partitions)
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for i in range(n_merges):
        top = _top_pair(sym)
        if top is None:
            break
        x, y, cnt = top
        merges.append((i, x, y, x + y, cnt))
        sym = sym.select(
            "freq", apply_merge(F.col("s"), x, y, replace_passes).alias("s")
        ).localCheckpoint(eager=True)
        if progress is not None:
            progress(i)
    return merges


def bpe_segment_words(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    replace_passes: int = 6,
    checkpoint_every: int = 64,
) -> DataFrame:
    """Apply learned merges: word → its BPE symbol count (the corpus
    token count under the learned vocab). Segmentation is a pure
    function of the WORD, so it's computed once per distinct word and
    joined back to the corpus tokens — at 100 TB the expensive part
    runs over |vocab| rows, and the join side is a broadcast (a
    tokenizer vocab always fits).

    The merge replay is ``localCheckpoint``-truncated every
    ``checkpoint_every`` merges: one projection carrying all merges
    nests ``merges × replace_passes`` replace nodes, which for a real
    vocab (10k-32k merges) overwhelms analysis exactly like the
    learning loop's lineage — the bound keeps plan depth constant at
    vocab-sized materialization cost per window.

    Returns ``(w, n_sym)`` for every distinct word."""
    wf = word_frequencies(docs, text_col)
    # keep the word column alongside the evolving symbol string
    out = wf.select(
        "w",
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", F.split(F.col("w"), "")),
            F.lit(f" {END} "),
        ).alias("s"),
    )
    for n, (_idx, x, y, _m, _cnt) in enumerate(merges, start=1):
        out = out.select("w", apply_merge(F.col("s"), x, y, replace_passes).alias("s"))
        if n % checkpoint_every == 0 and n < len(merges):
            out = out.localCheckpoint(eager=True)
    return out.select(
        "w", F.size(F.split(F.trim("s"), " ")).cast("bigint").alias("n_sym")
    )
