#!/usr/bin/env python3
"""Capture `.explain("formatted")` for named registered queries.

    python tools/capture_plans.py --out plans/r13 --suffix before q1 q2 ...

Writes plans/<out>/<query>_<suffix>.txt. Iterative queries that
localCheckpoint mid-build EXECUTE their construction-time actions during
plan build; the captured plan is the final fragment (same caveat as r12).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from dic_a1_spark.registry import all_queries
    from dic_a1_spark.session import get_spark

    spark = get_spark(app_name="dic_a1_spark-capture-plans")
    qs = all_queries()
    outdir = Path(_REPO) / args.out
    outdir.mkdir(parents=True, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{args.suffix}.txt").write_text(txt)
        print(f"wrote {name}_{args.suffix}.txt ({txt.count('Exchange')} Exchange lines)")
    spark.stop()


if __name__ == "__main__":
    main()
