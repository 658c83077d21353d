#!/usr/bin/env python3
"""Amplified-scale core-scaling probe (VERDICT r12 item 8).

At sf0.1 every bench query is fixed-overhead bound, so the driver's
8-vs-32-core ratios sit at ~1 for the whole set and parallel scaling is
unmeasurable. This probe times the DATA-BOUND families (dedup ladder,
chisq, neardup) over the 50x amplified corpus (~250K docs / vectors —
the tools/scale_bench.py corpus) at local[8] and local[32], writing
CORESCALE.json with per-query ratios. "Scales with cores" becomes a
measured claim where the data is big enough to show it.

    python tools/core_scaling_probe.py [--work-dir /tmp/dic_a1_scale]

Reuses scale_bench's amplified parquet if already present (writes it
otherwise); each core count runs in its own subprocess so the JVM is
fresh and `local[N]` is honest.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PROBE_QUERIES = [
    "chisq_top75",
    "dedup_minhash_pairs",
    "dedup_minhash_groups",
    "dedup_simhash_pairs",
    "dedup_minhash_md5_groups",
    "embedding_neardup_blocked_fast",
    "embedding_neardup_groups",
]


def _ensure_amplified(work_dir: str, sf_dir: str, factor: int) -> None:
    docs = Path(work_dir) / "documents.parquet"
    emb = Path(work_dir) / "embeddings.parquet"
    if docs.exists() and emb.exists():
        return
    from dic_a1_spark.session import get_spark
    from tools.scale_bench import amplified_table

    spark = get_spark(app_name="corescale-amplify")
    _, docs_amp = amplified_table(spark, sf_dir, "documents", "doc_id", factor)
    docs_amp.repartitionByRange(64, "doc_id").write.mode("overwrite").parquet(
        str(docs)
    )
    _, emb_amp = amplified_table(spark, sf_dir, "embeddings", "vec_id", factor)
    emb_amp.repartitionByRange(64, "vec_id").write.mode("overwrite").parquet(
        str(emb)
    )
    # TPC-H / events tables copied intact so loaders resolve.
    import shutil

    for f in Path(sf_dir).glob("*.parquet"):
        tgt = Path(work_dir) / f.name
        if not tgt.exists():
            shutil.copy(f, tgt)
    spark.stop()


def _child(work_dir: str) -> None:
    from pyspark.sql import functions as F

    from dic_a1_spark.registry import all_queries
    from dic_a1_spark.session import get_spark

    spark = get_spark(app_name="corescale-child")
    qs = all_queries()
    # Warmup: JVM + Python fleet (the bench.py posture).
    qs["chisq_top75"](spark, work_dir).count()
    spark.range(64).select(F.pandas_udf(lambda s: s, "long")(F.col("id"))).count()
    out = {}
    for name in PROBE_QUERIES:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, work_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    print("CORESCALE_CHILD " + json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/dic_a1_scale")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=50)
    ap.add_argument("--out", default=str(Path(_REPO) / "CORESCALE.json"))
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()

    if args.child:
        _child(args.work_dir)
        return

    os.makedirs(args.work_dir, exist_ok=True)
    _ensure_amplified(args.work_dir, args.sf_dir, args.factor)

    results: dict[str, dict] = {}
    for cpus in (32, 8):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, "--child", "--work-dir", args.work_dir],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [
            ln for ln in p.stdout.splitlines() if ln.startswith("CORESCALE_CHILD ")
        ][-1]
        results[str(cpus)] = json.loads(line.removeprefix("CORESCALE_CHILD "))
        print(f"local[{cpus}]:", results[str(cpus)])

    ratios = {
        q: round(results["8"][q] / results["32"][q], 2)
        for q in PROBE_QUERIES
        if results["32"].get(q)
    }
    payload = {
        "corpus": f"{args.factor}x amplified {args.sf_dir} (scale_bench layout)",
        "cpus_hi": 32,
        "cpus_lo": 8,
        "sec_32": results["32"],
        "sec_8": results["8"],
        "ratio_8_over_32": ratios,
        "note": (
            "ratio ~= cores ratio (4.0) = data-bound parallel scaling; "
            "~1 = fixed-overhead bound at this size (the sf0.1 bench's "
            "regime for every query)."
        ),
    }
    Path(args.out).write_text(json.dumps(payload, indent=2) + "\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
