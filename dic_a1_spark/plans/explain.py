"""Plan inspection: the tooling behind the engine's shuffle/pushdown audits.

The reference's optimizations were hand-coded and verified by wall-clock
(report p.5: 40 min -> 24 min); here the equivalents are Catalyst built-ins
and the audit is mechanical: read the physical plan, count exchanges,
assert filters reached the scan and small sides got broadcast. Tests in
tests/test_plans.py pin these properties so a regression that silently
de-broadcasts a join or drops a pushdown fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The physical plan as `explain('formatted')` text."""
    jdf = df._jdf  # noqa: SLF001 - no public accessor for the plan string
    return jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
            "formatted"
        )
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — those move dimension-sized data only)."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\s*\(\d+\)\s+Exchange\b", plan, flags=re.M)) + len(
        re.findall(r"\bShuffleExchange", plan)
    )


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — what each scan actually reads (column pruning
    evidence)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema:\s*(\S+)", plan)]


def wholestage_codegen(df: DataFrame) -> bool:
    """Whether the executed plan ran under whole-stage codegen.

    Under AQE the pre-execution formatted plan carries no ``codegen id``
    annotations — they appear only in the final adaptive plan, so this
    triggers execution (cheap at test SF) and inspects the result.
    """
    df.collect()
    return "codegen id" in formatted_plan(df)


def plan_audit(df: DataFrame) -> dict:
    """One-call summary used by tests and the SCALING notes.

    Static-plan properties only; use :func:`wholestage_codegen` for the
    codegen check (requires execution under AQE).
    """
    return {
        "exchanges": count_exchanges(df),
        "broadcast_join": has_broadcast_join(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
    }
