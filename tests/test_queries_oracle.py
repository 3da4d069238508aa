"""T2: every oracle-backed query matches DuckDB on the same parquet —
a local replica of the driver's CORRECTNESS check (row count + schema
column names + order-insensitive value multiset)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("MFDE_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sql: str):
    """Returns (columns, rows) with native Python types (no numpy)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _canon_cell(v):
    from decimal import Decimal

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (float, Decimal)):
        return f"{float(v):.6f}"
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon_cell(r[i]) for i in order) for r in rows
    )


QUERY_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    duck_cols, duck_rows = _duck(entry_mod.oracle_sql()[name])

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon_rows(spark_cols, spark_rows)
    b = _canon_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries_run(spark):
    for name, fn in entry_mod.queries().items():
        if name in entry_mod.oracle_sql():
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns


def test_surrogate_ids_shape(spark):
    """F13 invariant, moved out of the registry query path (round-2
    VERDICT #4): every surrogate id is ORD-{run_date}-{3-digit}, unique
    per url within the run."""
    out = entry_mod.queries()["surrogate_ids"](spark, SF_DIR)
    rows = out.collect()
    assert rows
    import re

    pat = re.compile(r"^ORD-20260701-[1-9][0-9]{2}$")
    assert all(pat.match(r["order_id"]) for r in rows)
    # deterministic per url: same plan built twice yields identical ids
    again = {
        r["url"]: r["order_id"]
        for r in entry_mod.queries()["surrogate_ids"](spark, SF_DIR).collect()
    }
    assert all(again[r["url"]] == r["order_id"] for r in rows)
