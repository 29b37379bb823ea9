#!/usr/bin/env python3
"""Diagnose where 2->8 core scaling loses efficiency (dev tool).

Phases, timed separately in one JVM per level:
  A. fused extract pass, triples count only, NO persist (pure narrow stage)
  B. full run_pipeline as scaling_run.py measures it
Usage: python scripts/profile_scaling.py <corpus_parquet> <n_docs_if_missing>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_level(cores: int, corpus_path: str) -> None:
    sys.path.insert(0, REPO)
    from scrapontologies_spark.operators.extract import (
        extract_document_rows,
        triples_view,
    )
    from scrapontologies_spark.plans.pipeline import run_pipeline
    from scrapontologies_spark.session import build_session
    from scrapontologies_spark.sources.corpus import corpus_df

    spark = build_session(
        app_name=f"prof-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus_df(spark, 64).count()  # warm python workers

    corpus = spark.read.parquet(corpus_path)

    a_walls, b_walls = [], []
    nt = ne = 0
    for _ in range(3):
        t0 = time.time()
        doc_rows = extract_document_rows(corpus, 1024, with_schemas=True)
        nt = triples_view(doc_rows).count()
        a_walls.append(round(time.time() - t0, 2))

        t0 = time.time()
        res = run_pipeline(corpus, chunk_bytes=1024, with_schemas=True)
        nt2 = res.triples.count()
        ne = res.entities.count()
        res.doc_rows.unpersist()
        b_walls.append(round(time.time() - t0, 2))
        # the two phases run the SAME extraction — a count divergence is
        # exactly the regression this profiler exists to surface
        assert nt2 == nt, f"phase A/B triple counts diverge: {nt} vs {nt2}"

    print(json.dumps({
        "cores": cores,
        "phaseA_nopersist_sec": a_walls,
        "phaseB_full_sec": b_walls,
        "n_triples": nt,
        "n_entities": ne,
    }))
    spark.stop()


def main() -> None:
    corpus_path = sys.argv[1]
    if not os.path.exists(corpus_path):
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        sys.path.insert(0, REPO)
        from scrapontologies_spark.session import build_session
        from scrapontologies_spark.sources.corpus import corpus_df
        spark = build_session(app_name="gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        corpus_df(spark, n).write.mode("overwrite").parquet(corpus_path)
        spark.stop()
    for cores in (2, 8):
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            sys.executable, __file__, "--level", str(cores), corpus_path,
        ]
        out = subprocess.run(cmd, capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                break
        else:
            print("FAILED", out.stdout[-1500:], out.stderr[-1500:])


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--level":
        one_level(int(sys.argv[2]), sys.argv[3])
    else:
        main()
