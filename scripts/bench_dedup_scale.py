"""Dedup-family scale smoke at the 1.2M-doc scaling-bench size: per-stage
wall times AND cap-drop censuses, evidencing that the family's max_df /
max_bucket discipline actually bounds reducer state at 10x the suite's
sf0.1 corpus (round-3 verdict item 7 — the suite times these only at
sf0.1 and oracles them at sf0.01).

Runs over the SAME cached synthetic pages table the scaling evidence uses
(.bench_cache/pages_n1200000_w12_p64; built by scripts/bench_scaling.py),
so the two artifacts describe one corpus. Prints one JSON line; quote it
in BASELINE.md.

Usage: python scripts/bench_dedup_scale.py [pages_path] [cpus]
       python scripts/bench_dedup_scale.py --budget [pages_path] [cpus] [max_pairs]

``--budget`` (round 5) runs ONLY the two MinHash-LSH stages under a
``max_pairs`` total-pair budget plus their budget censuses — the re-run
evidencing that the round-5 budget bounds the 173.8M/383.6M-pair blowups
the round-4 smoke measured on this same corpus, and accounts for every
pair it cut.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from gbif_data_validator_spark.session import build_session

    args = [a for a in sys.argv[1:] if a != "--budget"]
    budget_mode = "--budget" in sys.argv[1:]
    path = args[0] if args else os.path.join(
        REPO, ".bench_cache", "pages_n1200000_w12_p64"
    )
    cpus = int(args[1]) if len(args) > 1 else 32
    max_pairs = int(args[2]) if len(args) > 2 else 10_000_000
    spark = build_session(
        app_name="dedup-scale", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators import dedup

    pages = spark.read.parquet(path).select(
        F.xxhash64("url").alias("doc_id"), F.col("text")
    ).where(F.col("text").isNotNull())
    n_docs = pages.count()  # also warms the scan / page cache

    out: dict = {"pages_path": path, "n_docs": n_docs, "cpus": cpus,
                 "stages": {}, "caps": {}}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        res = fn()
        out["stages"][name] = {
            "secs": round(time.time() - t0, 2), **res,
        }

    MAX_BUCKET = 1000
    MAX_DF = 1000

    if budget_mode:
        out["max_pairs"] = max_pairs
        for name, pairs_fn, census_fn in (
            ("minhash_lsh_pairs", dedup.minhash_lsh_pairs,
             dedup.minhash_lsh_budget_dropped),
            ("weighted_minhash_lsh_pairs", dedup.weighted_minhash_lsh_pairs,
             dedup.weighted_minhash_budget_dropped),
        ):
            timed(f"{name}_budgeted", lambda pf=pairs_fn: {
                "pairs": pf(pages, "doc_id", "text",
                            max_bucket=MAX_BUCKET, max_pairs=max_pairs
                            ).count()
            })
            agg = census_fn(
                pages, "doc_id", "text",
                max_bucket=MAX_BUCKET, max_pairs=max_pairs,
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_pairs").alias("pairs_cut"),
                F.sum("n_docs").alias("docs"),
            ).collect()[0]
            out["caps"][f"{name}_budget_dropped"] = {
                "buckets": int(agg["n"] or 0),
                "pairs_cut": int(agg["pairs_cut"] or 0),
                "docs_in_dropped": int(agg["docs"] or 0),
            }
        _host_canary(out)
        print(json.dumps(out))
        return

    # exact dedup (engine hot path shape: one window exchange)
    timed("dedup_exact", lambda: {
        "survivors": dedup.dedup_exact(pages, "doc_id", "text").count()
    })
    # capped listing face at scale: bounded id arrays by construction
    timed("exact_duplicate_groups", lambda: (lambda df: {
        "groups": df.count(),
        "truncated_groups": df.where("ids_truncated").count(),
    })(dedup.exact_duplicate_groups(pages, "doc_id", "text", max_ids=100)))
    # MinHash+LSH banding
    timed("minhash_lsh_pairs", lambda: {
        "pairs": dedup.minhash_lsh_pairs(
            pages, "doc_id", "text", max_bucket=MAX_BUCKET
        ).count()
    })
    dropped = dedup.minhash_lsh_dropped_buckets(
        pages, "doc_id", "text", max_bucket=MAX_BUCKET
    )
    agg = dropped.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_docs").alias("docs")
    ).collect()[0]
    out["caps"]["minhash_dropped_buckets"] = {
        "buckets": int(agg["n"] or 0), "docs_in_dropped": int(agg["docs"] or 0),
        "max_bucket": MAX_BUCKET,
    }
    # SimHash + Hamming pigeonhole
    timed("simhash_pairs", lambda: {
        "pairs": dedup.simhash_pairs(
            pages, "doc_id", "text", max_bucket=MAX_BUCKET
        ).count()
    })
    # n-gram Jaccard posting lists (the bench default candidate path)
    timed("ngram_jaccard_pairs", lambda: {
        "pairs": dedup.ngram_jaccard_pairs(
            pages, "doc_id", "text", k=3, threshold=0.5, max_df=MAX_DF
        ).count()
    })
    # weighted MinHash (tf-expanded multiset signatures)
    timed("weighted_minhash_lsh_pairs", lambda: {
        "pairs": dedup.weighted_minhash_lsh_pairs(
            pages, "doc_id", "text", k=3, threshold=0.5, max_bucket=MAX_BUCKET
        ).count()
    })

    _host_canary(out)
    print(json.dumps(out))


def _host_canary(out: dict) -> None:
    import hashlib

    t0 = time.time()
    x = b"x" * 64
    for _ in range(2_000_000):
        x = hashlib.md5(x).digest() * 4
    out["host"] = {"canary_sec": round(time.time() - t0, 2),
                   "load_avg_1m": round(os.getloadavg()[0], 2)}


if __name__ == "__main__":
    main()
