#!/usr/bin/env python3
"""Scale smoke: run the heavy operators on a corpus amplified N-fold
beyond the bench scale factor, and report wall-clock scaling.

The oracle gate proves correctness at sf0.01 and the bench measures
sf0.1; this script stresses the same plans at 10-50x that size (by
replicating `documents` with perturbed ids — a plan-shape stressor, not a
statistical one) to catch anything that degrades super-linearly: a join
whose candidate space explodes, an aggregate whose state stops fitting,
a window over a low-cardinality key. Usage:

    python tools/scale_smoke.py [--factor 20] [--sf-dir /root/testdata/sf0.1]

Prints one JSON line per operator with rows_in/rows_out/seconds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def amplified_documents(spark, sf_dir: str, factor: int):
    from pyspark.sql import functions as F

    from dic_a1_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    # replicate with distinct doc_ids; texts repeat, which *stresses* dedup
    # (every text has `factor` exact copies + its original near-dups)
    return (
        d.crossJoin(F.broadcast(spark.range(factor).withColumnRenamed("id", "rep")))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(n * 10))
        .drop("rep")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dic_a1_spark.operators.chisq import chi2_topk
    from dic_a1_spark.operators.dedup import (
        dedup_exact_groups,
        minhash_candidate_pairs,
    )
    from dic_a1_spark.session import get_spark

    spark = get_spark(app_name="dic_a1_spark-scale-smoke")
    docs = amplified_documents(spark, args.sf_dir, args.factor).persist()
    rows_in = docs.count()

    def run(name, df):
        t0 = time.perf_counter()
        rows_out = df.count()
        print(
            json.dumps(
                {
                    "op": name,
                    "factor": args.factor,
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "sec": round(time.perf_counter() - t0, 2),
                }
            ),
            flush=True,
        )

    run(
        "chisq_top75",
        chi2_topk(docs.withColumnRenamed("lang", "category")),
    )
    run(
        "dedup_exact_groups_amplified",
        docs.groupBy(F.md5(F.encode("text", "UTF-8")).alias("h")).agg(
            F.count("*").alias("n")
        ),
    )
    run("minhash_candidates_pairwise", minhash_candidate_pairs(docs))

    # The scale path: group labels via label propagation — linear in the
    # doc-bucket edge count with convergence early-exit, immune to the
    # quadratic pair blowup above (note rows_out: groups vs pairs).
    from dic_a1_spark.operators.dedup import minhash_label_groups

    t0 = time.perf_counter()
    labels = minhash_label_groups(docs)
    n_groups = labels.select("group_id").distinct().count()
    print(
        json.dumps(
            {
                "op": "minhash_groups_labelprop",
                "factor": args.factor,
                "rows_in": rows_in,
                "rows_out": n_groups,
                "sec": round(time.perf_counter() - t0, 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
