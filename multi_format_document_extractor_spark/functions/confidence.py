"""Confidence scoring as pure column arithmetic (SURVEY.md §2.4 A4-A6, F30).

The reference computes a weighted composite of completeness, source
confidence, and validation penalty per document
(src/processors/confidence_scorer.py:41-150). All of it is rational
arithmetic → exactly reproducible in any engine, hence fully
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import rnd

W_COMPLETENESS = 0.4
W_SOURCE = 0.4
W_VALIDATION = 0.2


def completeness_score(required: Sequence[Column], multi_item_bonus: Column) -> Column:
    """A4: populated-required-field count (+0.5 bonus), /6, capped at 1.0
    (confidence_scorer.py:72-99)."""
    populated = sum(
        (c.cast("int").cast("double") for c in required), F.lit(0.0)
    )
    return F.least(
        (populated + F.when(multi_item_bonus, 0.5).otherwise(0.0)) / 6.0, F.lit(1.0)
    )


def validation_penalty(n_errors: Column) -> Column:
    """A6: ``max(0.2, 1 - min(0.8, n*0.15))`` (confidence_scorer.py:101-115)."""
    return F.greatest(
        F.lit(0.2), 1.0 - F.least(F.lit(0.8), n_errors.cast("double") * 0.15)
    )


def composite_confidence(
    completeness: Column, source_conf: Column, validation: Column
) -> Column:
    """A5: weighted sum, clamped to [0,1], rounded to 2 decimals
    (confidence_scorer.py:41-70)."""
    raw = W_COMPLETENESS * completeness + W_SOURCE * source_conf + W_VALIDATION * validation
    return rnd(F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0)), 2)


def confidence_bucket(conf: Column) -> Column:
    """P8/F32: ≥0.9 HIGH / ≥0.7 MEDIUM / else LOW
    (confidence_scorer.py:117-150, src/schemas.py:68-75)."""
    return (
        F.when(conf >= 0.9, "HIGH").when(conf >= 0.7, "MEDIUM").otherwise("LOW")
    )


def temperature_scaled(raw: Column, temperature: float, is_valid: Column) -> Column:
    """F30: ``min(raw^(1/T), 0.99)``, ×0.8 on validation failure
    (src/ai_models/confidence.py:383-405)."""
    scaled = F.least(F.pow(raw, 1.0 / temperature), F.lit(0.99))
    return scaled * F.when(is_valid, 1.0).otherwise(0.8)
