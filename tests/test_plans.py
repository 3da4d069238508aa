"""Physical-plan regression tests: the plan properties that make the engine
scale are asserted, not assumed (SURVEY.md §4). If a refactor reintroduces a
shuffle into the extraction path or degrades a broadcast join to sort-merge,
these fail before any benchmark notices."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from multi_format_document_extractor_spark.operators.extract import (
    extract_pages,
)
from multi_format_document_extractor_spark.sources.pages import read_pages

SF_DIR = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture()
def pages(spark, corpus_dir):
    return read_pages(spark, corpus_dir + "/pages.parquet")


def test_extract_split_plan_has_no_shuffle(pages):
    """Default extraction = scan → UDF. Any Exchange here would shuffle the
    full html payload (100 TB at scale)."""
    p = plan(extract_pages(pages))
    assert "MapInPandas" in p
    assert "Exchange" not in p


def test_extract_prunes_columns(pages):
    """Only (url, warc_ts, html, lang) may reach the UDF — the noisy `text`
    column must be pruned out of the parquet scan."""
    p = plan(extract_pages(pages))
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "html:binary" in read
    assert "text" not in read.replace("text_out", "")


def test_extract_salted_plan_has_one_shuffle(pages):
    p = plan(extract_pages(pages, salt_partitions=8))
    assert p.count("Exchange") == 1


def test_format_filter_runs_before_udf(pages):
    """only_formats must evaluate natively ahead of the UDF (predicate ahead
    of the expensive stage), not inside Python."""
    p = plan(extract_pages(pages, only_formats=["html"]))
    assert p.index("Filter") > p.index("MapInPandas")  # tree prints top-down


def test_multisheet_join_broadcasts_dimensions(spark):
    df = entry_mod.queries()["multisheet_join"](spark, SF_DIR)
    p = plan(df)
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_order_rollup_partial_aggregation(spark):
    """Map-side combine: partial aggregates before the exchange."""
    df = entry_mod.queries()["order_rollup"](spark, SF_DIR)
    p = plan(df)
    assert "partial_sum" in p and "partial_count" in p
    assert p.count("Exchange") == 1


def test_ann_topk_partial_limit_before_exchange(spark):
    """Top-k per query must apply a partial WindowGroupLimit on the map side
    so only ≤k rows per group reach the shuffle."""
    df = entry_mod.queries()["ann_topk"](spark, SF_DIR)
    p = plan(df)
    assert "WindowGroupLimit" in p
    assert p.index("Exchange") > p.index("WindowGroupLimit")


def test_resume_day_prune_reaches_scan(spark, pages, tmp_path):
    """Sealed-day pruning must appear as a pushable predicate in the
    optimized plan of pending(), ahead of the anti-join."""
    from multi_format_document_extractor_spark.sinks import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    wh.run(spark, pages.limit(50), run_id="r1")
    o = optimized(wh.pending(pages))
    assert "Join LeftAnti" in o
    assert "date_format" in o  # the day filter survived into the plan
