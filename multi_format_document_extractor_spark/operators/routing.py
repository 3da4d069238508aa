"""Hybrid routing as a two-pass job strategy (SURVEY.md §3.2).

The reference routes per document: rule-based first, escalate to the AI
path when confidence < 0.7 (src/hybrid_pipeline.py:308-360). Row-level
branching would put the expensive code inside the hot UDF for every row;
instead the engine runs the cheap pass over everything, then re-processes
only the low-confidence slice with the expensive pass and unions — the
expensive stage's input is already filtered at the scan (job-level
cost-based routing, which Catalyst cannot infer on its own).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ESCALATION_THRESHOLD = 0.7  # src/hybrid_pipeline.py:350-353


def two_pass_escalation(
    df: DataFrame,
    cheap: Callable[[DataFrame], DataFrame],
    expensive: Callable[[DataFrame], DataFrame],
    conf_col: str = "confidence",
    threshold: float = ESCALATION_THRESHOLD,
) -> DataFrame:
    """Pass 1: ``cheap`` over everything → confidence. Pass 2: ``expensive``
    re-processes only rows with confidence < threshold. Adds a ``mode``
    column ('rule_based' | 'escalated') mirroring the reference's
    ExtractionMetrics.mode (src/hybrid_pipeline.py:40-51)."""
    pass1 = cheap(df)
    kept = pass1.where(F.col(conf_col) >= threshold).withColumn(
        "mode", F.lit("rule_based")
    )
    escalated = expensive(pass1.where(F.col(conf_col) < threshold)).withColumn(
        "mode", F.lit("escalated")
    )
    return kept.unionByName(escalated, allowMissingColumns=True)
