"""BPE vocabulary-scale measurement: >=1k merges on a synthetic corpus
with a rich word-type distribution (the sf corpora exhaust at ~106
merges — 31 word types). Validates the SCALE_NOTES claim that per-merge
cost is FLAT (vocab-sized, independent of merge index and corpus size
beyond the one-time word-frequency pass) at a real tokenizer vocab.

Run: python scripts/bpe_scale_run.py [n_merges] [n_docs] [vocab_size]
Prints one JSON line per checkpoint window and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbnb_pyspark_jobs_spark.operators.bpe import (
    bpe_learn_merges,
    bpe_segment_words,
    word_frequencies,
)
from airbnb_pyspark_jobs_spark.session import get_spark
from airbnb_pyspark_jobs_spark.sources.synthetic import register

from pyspark.sql import functions as F


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    vocab_size = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000
    window = 100

    spark = get_spark(app_name="bpe_scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("n", n_docs)
        .option("partitions", 32)
        .option("vocab_size", vocab_size)
        .load()
    )

    t0 = time.monotonic()
    n_types = word_frequencies(docs).count()
    t_wf = time.monotonic() - t0
    print(json.dumps({"stage": "word_freq", "n_docs": n_docs, "n_word_types": n_types,
                      "sec": round(t_wf, 2)}), flush=True)

    marks = {"last": time.monotonic(), "t_start": time.monotonic()}

    def progress(i: int) -> None:
        if (i + 1) % window == 0:
            now = time.monotonic()
            print(json.dumps({
                "stage": "learn", "merges_done": i + 1,
                "window_sec": round(now - marks["last"], 2),
                "sec_per_merge": round((now - marks["last"]) / window, 4),
                "cum_sec": round(now - marks["t_start"], 2),
            }), flush=True)
            marks["last"] = now

    merges = bpe_learn_merges(docs, n_merges=n_merges, progress=progress)
    t_learn = time.monotonic() - marks["t_start"]

    t1 = time.monotonic()
    seg = bpe_segment_words(docs, merges)
    wf = word_frequencies(docs)
    total_tokens = (
        wf.join(F.broadcast(seg), "w")
        .agg(F.sum(F.col("freq") * F.col("n_sym")).alias("t"))
        .first()
        .t
    )
    t_seg = time.monotonic() - t1
    print(json.dumps({
        "stage": "summary", "n_docs": n_docs, "n_word_types": n_types,
        "merges_learned": len(merges), "learn_sec": round(t_learn, 2),
        "sec_per_merge": round(t_learn / max(1, len(merges)), 4),
        "segment_replay_sec": round(t_seg, 2),
        "corpus_tokens_under_vocab": int(total_tokens),
    }), flush=True)


if __name__ == "__main__":
    main()
