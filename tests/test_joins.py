"""As-of join semantics (operators/joins.py): tie-inclusiveness, NULL
before first state, latest-state selection, and the no-join-node plan
shape. The cross-engine value check (vs DuckDB's native ASOF JOIN) lives
in tests/test_queries_oracle.py[asof_state]."""

from __future__ import annotations

from datetime import datetime

import __spark_entry__ as entry_mod
from multi_format_document_extractor_spark.operators.joins import asof_join

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_crafted_semantics(spark):
    events = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T09:00:00"), 10.0),  # before any state
            (2, 7, _ts("2024-01-01T10:00:00"), 20.0),  # tie with state A
            (3, 7, _ts("2024-01-01T11:30:00"), 30.0),  # between A and B
            (4, 7, _ts("2024-01-01T12:00:05"), 40.0),  # after B
            (5, 8, _ts("2024-01-01T10:30:00"), 50.0),  # other key
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    states = spark.createDataFrame(
        [
            (7, _ts("2024-01-01T10:00:00"), 100.0),  # A
            (7, _ts("2024-01-01T12:00:00"), 200.0),  # B
            (8, _ts("2024-01-01T10:00:00"), 300.0),
        ],
        "user_id bigint, ts timestamp, state_value double",
    )
    out = asof_join(events, states).collect()
    got = {r["event_id"]: (r["state_value"], r["state_ts"]) for r in out}
    assert got[1] == (None, None)  # no state yet
    # inclusive tie: a state stamped exactly at the event time applies
    assert got[2] == (100.0, _ts("2024-01-01T10:00:00"))
    assert got[3] == (100.0, _ts("2024-01-01T10:00:00"))
    assert got[4] == (200.0, _ts("2024-01-01T12:00:00"))  # latest wins
    assert got[5] == (300.0, _ts("2024-01-01T10:00:00"))  # per-key carry
    # all left rows and columns survive
    assert len(out) == 5 and out[0]["value"] is not None


def test_asof_join_reserved_name_collision_raises(spark):
    """A caller column colliding with the internal scaffolding names must
    fail loudly at entry (ADVICE r3: previously it silently produced
    ambiguous/duplicate columns and wrong output)."""
    import pytest

    events = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T09:00:00"), 1.0)],
        "event_id bigint, user_id bigint, ts timestamp, _carried double",
    )
    states = spark.createDataFrame(
        [(7, _ts("2024-01-01T08:00:00"), 9.0)],
        "user_id bigint, ts timestamp, state_value double",
    )
    with pytest.raises(ValueError, match="_carried"):
        asof_join(events, states, value_cols=("state_value",))
    states_bad = states.withColumnRenamed("state_value", "_is_state")
    with pytest.raises(ValueError, match="_is_state"):
        asof_join(
            events.withColumnRenamed("_carried", "value"),
            states_bad,
            value_cols=("_is_state",),
        )


def test_asof_join_plan_has_no_join_node(spark):
    """The union-window encoding must produce NO join operator and
    exactly ONE hash Exchange on the key — a range-join fallback
    (BroadcastNestedLoop) here would be the 100TB scale-killer."""
    df = entry_mod.queries()["asof_state"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p, p
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p, p
    # one Exchange for the states pre-agg, one for the union window
    assert p.count("Exchange hashpartitioning") <= 2, p
    assert "Window" in p, p


def test_asof_join_null_value_state_wins_whole(spark):
    """A state row whose VALUE is NULL is still the latest state: the
    event must get (NULL value, that state's ts) — per-column carry
    would resurrect the OLDER state's value under the NEWER timestamp,
    a chimera no single state row contains (DuckDB ASOF returns the
    newer row whole; pinned here after the review fix)."""
    events = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T12:00:00"), 1.0)],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    states = spark.createDataFrame(
        [
            (7, _ts("2024-01-01T10:00:00"), 5.0),
            (7, _ts("2024-01-01T11:00:00"), None),
        ],
        "user_id bigint, ts timestamp, state_value double",
    )
    r = asof_join(events, states).collect()[0]
    assert r["state_ts"] == _ts("2024-01-01T11:00:00")
    assert r["state_value"] is None, r


def test_asof_join_null_ts_state_never_matches(spark):
    """``l.ts >= NULL`` never matches: a NULL-timestamp state must not
    poison the key's carry chain (it used to sort NULLS FIRST and leak
    its value into every event before the first real state)."""
    events = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T09:00:00"), 1.0),
            (2, 7, _ts("2024-01-01T11:00:00"), 2.0),
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    states = spark.createDataFrame(
        [(7, None, 99.0), (7, _ts("2024-01-01T10:00:00"), 5.0)],
        "user_id bigint, ts timestamp, state_value double",
    )
    got = {
        r["event_id"]: (r["state_value"], r["state_ts"])
        for r in asof_join(events, states).collect()
    }
    assert got[1] == (None, None), got  # nothing real precedes it
    assert got[2] == (5.0, _ts("2024-01-01T10:00:00")), got
