"""Physical parquet layout for data skipping — the write-side half of
predicate pushdown.

Pushdown prunes row groups/files using parquet footer min/max
statistics, but the stats only help if the writer made them NARROW: a
randomly-distributed column's (min, max) spans the whole domain in
every file and nothing is ever skipped. Range-repartitioning on the
filter columns and sorting within partitions gives each output file a
tight, (near-)disjoint value range — a `WHERE col BETWEEN ...` then
touches only the files whose range intersects, turning a 100 TB scan
into a few-file read. This is the format-free version of what
Delta/Iceberg call clustering/Z-ordering (single-column case; true
multi-column Z-order interleaves bits, which parquet min/max can't
express per-file anyway — for a second independent filter column,
partition the TABLE by one and range-sort the other).

Cost: one range shuffle of the data (with a sampling pass for the
range boundaries — Spark's RangePartitioner). Skew: boundary sampling
splits hot ranges across files; the sort inside each file additionally
enables row-group-level pruning within files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted_for_skipping(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cols``: one range
    shuffle into ``num_files`` partitions + an in-partition sort, so
    every file's footer min/max on ``cols`` is tight and files are
    mutually (near-)disjoint — the layout that makes reader-side
    predicate pushdown actually skip I/O."""
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
