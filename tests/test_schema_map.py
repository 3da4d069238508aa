"""F33 fuzzy column resolution — plan-time semantics (exact beats
substring, first-synonym-wins, case-insensitive), mirroring
src/parsers/csv_parser.py:86-168."""

from __future__ import annotations

from multi_format_document_extractor_spark.functions.schema_map import (
    normalize_schema,
    resolve_columns,
)


def test_exact_match_case_insensitive():
    m = resolve_columns(["PO Number", "QTY", "Unit Price"])
    assert m["order_id"] == "PO Number"
    assert m["quantity"] == "QTY"
    assert m["unit_price"] == "Unit Price"


def test_exact_beats_substring():
    # "price" is a synonym for unit_price; "Total Price" contains it as a
    # substring, but the exact synonym "total" must claim total_price and
    # exact "price" wins unit_price.
    m = resolve_columns(["Price", "Total"])
    assert m["unit_price"] == "Price"
    assert m["total_price"] == "Total"


def test_substring_fallback():
    m = resolve_columns(["the order id column", "item qty count"])
    assert m["order_id"] == "the order id column"
    assert m["quantity"] == "item qty count"


def test_unresolved_absent():
    m = resolve_columns(["completely", "unrelated"])
    assert "order_id" not in m


def test_normalize_schema_stable_columns(spark):
    df = spark.createDataFrame(
        [("PO-1", "5")], ["PO Number", "Qty"]
    )
    out = normalize_schema(df)
    # every canonical field present, resolved or null
    assert set(out.columns) == {
        "order_id",
        "client_name",
        "order_date",
        "product_code",
        "description",
        "quantity",
        "unit_price",
        "total_price",
    }
    row = out.collect()[0]
    assert row["order_id"] == "PO-1"
    assert row["quantity"] == "5"
    assert row["client_name"] is None
