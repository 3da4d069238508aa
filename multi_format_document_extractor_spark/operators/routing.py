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
    materialize: bool = True,
) -> DataFrame:
    """Pass 1: ``cheap`` over everything → confidence. Pass 2: ``expensive``
    re-processes only rows with confidence < threshold. Adds a ``mode``
    column ('rule_based' | 'escalated') mirroring the reference's
    ExtractionMetrics.mode (src/hybrid_pipeline.py:40-51).

    ``materialize`` localCheckpoints pass 1 before the two branches read
    it: both the kept and the escalated branch reference pass1, and
    without a materialization boundary Spark re-executes the full cheap
    lineage — at corpus scale, the whole scan + Arrow + Python extraction
    — once per branch (round-1 VERDICT #4). localCheckpoint (rather than
    persist) both truncates the plan AND leaves cleanup to the
    ContextCleaner when the result is dropped — no caller-visible cache
    handle to leak. The in-session boundary stands in for SURVEY §3.2's
    job-level strategy; a multi-job deployment would write pass 1 to the
    warehouse and read it back (sinks.Warehouse), which also survives
    executor loss. Set ``materialize=False`` only when ``cheap`` is known
    to be a trivial native projection."""
    pass1 = cheap(df)
    if materialize:
        pass1 = pass1.localCheckpoint()
    kept = pass1.where(F.col(conf_col) >= threshold).withColumn(
        "mode", F.lit("rule_based")
    )
    escalated = expensive(pass1.where(F.col(conf_col) < threshold)).withColumn(
        "mode", F.lit("escalated")
    )
    return kept.unionByName(escalated, allowMissingColumns=True)
