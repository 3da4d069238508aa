"""Fusion operator unit tests beyond the registry oracles: MERGE-semantics
conflict resolution in apply_corrections (round-2 code-review finding)."""

from __future__ import annotations

from multi_format_document_extractor_spark.operators import fusion


def test_apply_corrections_conflicting_annotators_resolve_deterministically(spark):
    review = spark.createDataFrame(
        [(1, "total", "99", 0.2), (2, "total", "50", 0.9)],
        "key int, field string, value string, conf double",
    )
    corrections = spark.createDataFrame(
        [
            (1, "total", "100", "ann_b"),
            (1, "total", "100", "ann_a"),  # duplicate value, different annotator
            (1, "total", "101", "ann_c"),  # conflicting value
        ],
        "key int, field string, corrected_value string, annotator_id string",
    )
    out = fusion.apply_corrections(review, corrections, key="key")
    rows = {r["key"]: r for r in out.collect()}
    # cardinality preserved — no fan-out from the three correction rows
    assert out.count() == 2
    # deterministic winner: lowest corrected_value, then annotator_id
    assert rows[1]["value"] == "100" and rows[1]["annotator_id"] == "ann_a"
    assert rows[1]["conf"] == 1.0 and rows[1]["corrected"] == 1
    # unmatched row untouched
    assert rows[2]["value"] == "50" and rows[2]["corrected"] == 0
