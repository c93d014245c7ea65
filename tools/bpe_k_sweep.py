#!/usr/bin/env python3
"""Measured BPE merge-count sweep (r7 verdict "Next round #4").

The question: does per-merge cost stay flat-or-falling as k grows
toward production round-counts, i.e. is the incremental pair-count
maintenance (operators/bpe.py::_train, incremental=True) actually
footprint-sized per round rather than corpus-sized?  A full recount
per round costs O(corpus) enumeration * k; the maintained-delta path
pays the full enumeration once and then only the merged pair's
document footprint per round.

Measures bpe_merge_table at k in --ks (default 4 16 64) over the
documents table at --sf-dir (default .scaledata/sf1.0, 50k docs) in
BOTH modes (naive full recount -- the default path -- and the
incremental maintained-delta path), and merges a "bpe_k_sweep" section
into SCALE_DECADE.json:

  {"k": ..., "best_sec": ..., "sec_per_merge": ..., "mode": ...}

Usage: python tools/bpe_k_sweep.py [--repeats N] [--ks 4 16 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--ks", nargs="*", type=int, default=[4, 16, 64])
    p.add_argument("--sf-dir", default=os.path.join(REPO, ".scaledata", "sf1.0"))
    p.add_argument("--out", default=os.path.join(REPO, "SCALE_DECADE.json"))
    p.add_argument(
        "--batch",
        type=int,
        default=8,
        help="also measure the block-greedy trainer at this batch size "
        "per --ks value (0 disables)",
    )
    p.add_argument(
        "--naive-k",
        type=int,
        default=None,
        help="extra incremental=False point at this k (both modes already run at every --ks value)",
    )
    p.add_argument(
        "--family",
        choices=("bpe", "wordpiece"),
        default="bpe",
        help="trainer family to sweep: wordpiece measures the sequential "
        "likelihood trainer vs its block-greedy batched path (r8 verdict "
        "item #3) and merges into 'wordpiece_k_sweep'; the incremental "
        "mode is BPE-only (likelihood needs the naive counting path)",
    )
    args = p.parse_args()

    from bench import _end_repeat
    from dataworks_aws_corporate_data_ingestion_spark.operators.bpe import (
        bpe_merge_table,
        bpe_merge_table_batched,
        wordpiece_merge_table,
        wordpiece_merge_table_batched,
    )
    from dataworks_aws_corporate_data_ingestion_spark.session import get_session

    wp = args.family == "wordpiece"
    seq_fn = wordpiece_merge_table if wp else bpe_merge_table
    batched_fn = wordpiece_merge_table_batched if wp else bpe_merge_table_batched

    spark = get_session(app_name=f"cdi-{args.family}-k-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    # warm: codegen + shuffle infra, smallest k
    seq_fn(docs, k=2).write.format("noop").mode("overwrite").save()
    _end_repeat(spark)

    def measure(k: int, incremental: bool, batch: int = 0) -> dict:
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            if batch:
                batched_fn(docs, k=k, batch=batch).write.format(
                    "noop"
                ).mode("overwrite").save()
            elif wp:
                seq_fn(docs, k=k).write.format("noop").mode(
                    "overwrite"
                ).save()
            else:
                bpe_merge_table(
                    docs, k=k, incremental=incremental
                ).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            _end_repeat(spark)
        best = min(times)
        rec = {
            "k": k,
            "mode": f"block_greedy_b{batch}" if batch
            else ("incremental" if incremental else "full_recount"),
            "best_sec": round(best, 3),
            "sec_per_merge": round(best / k, 4),
        }
        print(
            f"  k={k:3d} {rec['mode']:12s}: best {best:.3f}s "
            f"({rec['sec_per_merge']:.4f}s/merge)",
            flush=True,
        )
        return rec

    if wp:
        # sequential likelihood trainer vs block-greedy (incremental
        # counting does not apply -- the delta table lacks the unigram
        # denominators, operators/bpe.py::_train)
        points = [measure(k, False) for k in args.ks]
    else:
        # both modes at every k: the adjudication that set the naive
        # default (see operators/bpe.py docstring) lives in this artifact
        points = [measure(k, inc) for k in args.ks for inc in (False, True)]
    if args.batch:
        points += [measure(k, False, batch=args.batch) for k in args.ks]
    if args.naive_k is not None:
        points.append(measure(args.naive_k, False))
    spark.stop()

    sweep = {
        "sf_dir": args.sf_dir,
        "repeats": args.repeats,
        "points": points,
    }
    prior = {}
    if os.path.exists(args.out):
        with open(args.out) as fd:
            prior = json.load(fd)
    prior[f"{args.family}_k_sweep"] = sweep
    with open(args.out, "w") as fd:
        json.dump(prior, fd, indent=2)
    print(f"merged {args.family}_k_sweep into {args.out}")

    ok = True
    for mode in sorted({r["mode"] for r in points}):
        pts = sorted(
            (r for r in points if r["mode"] == mode), key=lambda r: r["k"]
        )
        mode_ok = all(
            b["sec_per_merge"] <= a["sec_per_merge"] * 1.10
            for a, b in zip(pts, pts[1:])
        )
        ok = ok and mode_ok
        print(f"per-merge cost flat-or-falling across ks [{mode}]: {mode_ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
