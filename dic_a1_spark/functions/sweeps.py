"""Shared scaffolding for operating-point sweep queries (the
"aggregate once, conditional-count every threshold" pattern used by
semdedup_threshold_sweep and decontam_threshold_sweep): one place for
the column-label format and the per-tau count builders, so the Spark
aggregation list, the DuckDB CASE columns, and the tests can never
drift apart."""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def tau_label(prefix: str, t: float) -> str:
    """Column name for an operating point, e.g. ('dropped', 0.35) ->
    'dropped_at_35'. Float-safe: 0.30 -> 30, 0.35 -> 35."""
    return f"{prefix}_at_{int(round(t * 100)):02d}"


def sweep_agg_columns(
    taus: Sequence[float],
    predicate: Callable[[float], Column],
    prefix: str,
) -> list[Column]:
    """Spark aggregation columns: one conditional bigint count per tau."""
    return [
        F.sum(predicate(t).cast("long")).alias(tau_label(prefix, t))
        for t in taus
    ]


def sweep_sql_columns(
    taus: Sequence[float],
    predicate_sql: Callable[[float], str],
    prefix: str,
) -> str:
    """The matching DuckDB SELECT fragment (comma-joined CASE counts)."""
    return ",\n           ".join(
        f"CAST(sum(CASE WHEN {predicate_sql(t)} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS {tau_label(prefix, t)}"
        for t in taus
    )
