#!/usr/bin/env python3
"""ANN recall/cost curves (VERDICT r02 ask #5): LSH (n_tables × n_planes)
and IVF (k_cells × n_probe) top-k recall vs brute force, with wall time,
at a given sf dir.  Output: markdown tables for BENCH_SCALING.md.

Recall is macro top-k pair recall: |approx ∩ exact| / |exact| over all
(query, neighbor) pairs, every table row used as a query (self excluded).

Usage: python scripts/ann_recall_curve.py [sf_dir] [cpus] [k]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LSH_GRID = [(2, 4), (4, 4), (8, 4), (8, 6), (16, 6), (16, 8)]  # (tables, planes)
IVF_GRID = [(16, 2), (16, 4), (16, 8), (32, 4), (32, 8), (64, 8)]  # (cells, probes)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from scrapontologies_spark.operators import similarity
    from scrapontologies_spark.session import build_session

    spark = build_session(
        app_name="ann-recall",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = emb.count()

    t0 = time.time()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(emb, emb, k=k).collect()
    }
    bf_wall = time.time() - t0
    print(f"n={n} k={k} brute-force pairs={len(exact)} wall={bf_wall:.2f}s\n")

    print(f"| n_tables | n_planes | recall@{k} | wall (s) | vs BF |")
    print("|---|---|---|---|---|")
    for tables, planes in LSH_GRID:
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.cosine_topk_lsh(
                emb, k=k, n_planes=planes, n_tables=tables
            ).collect()
        }
        w = time.time() - t0
        rec = len(got & exact) / len(exact)
        print(f"| {tables} | {planes} | {rec:.3f} | {w:.2f} | {w / bf_wall:.2f}x |")

    print(f"\n| k_cells | n_probe | recall@{k} | wall (s) | vs BF |")
    print("|---|---|---|---|---|")
    for cells, probes in IVF_GRID:
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.cosine_topk_ivf(
                emb, emb, k=k, k_cells=cells, n_probe=probes
            ).collect()
        }
        w = time.time() - t0
        rec = len(got & exact) / len(exact)
        print(f"| {cells} | {probes} | {rec:.3f} | {w:.2f} | {w / bf_wall:.2f}x |")

    spark.stop()


if __name__ == "__main__":
    main()
