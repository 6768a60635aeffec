"""Property-based correctness: the engine equals the oracle on arbitrary
event logs, under arbitrary batching, with duplicates/out-of-order/deletes
— hypothesis searches the space the deterministic fixtures don't."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rockefeller_spark import gen
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch, read_state
from rockefeller_spark.oracle import replay
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA

ET = datetime(2024, 1, 1, tzinfo=timezone.utc)

# a compact event: (lsn, op, conv 0-3, turn 0-3, text letter)
events_strategy = st.lists(
    st.tuples(st.integers(0, 30),
              st.sampled_from(["I", "U", "D"]),
              st.integers(0, 3),
              st.integers(0, 3),
              st.sampled_from("abcdef")),
    min_size=1, max_size=25)


def _to_rows(raw):
    rows = []
    for lsn, op, conv, turn, letter in raw:
        is_del = op == "D"
        # payload must be a pure function of lsn for duplicate-LSN replays
        # to be identical (the generator's invariant): derive letter from lsn
        text = None if is_del else f"t{lsn}"
        rows.append((lsn, op, f"c{conv}", turn,
                     None if is_del else "user", text, None,
                     None if is_del else ET, ET))
    return rows


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(raw=events_strategy, n_splits=st.integers(1, 4))
def test_engine_equals_oracle_any_log_any_batching(spark, tmp_path_factory,
                                                   raw, n_splits):
    # make duplicate-LSN rows identical (at-least-once replay semantics):
    # keep the FIRST occurrence's op for each lsn
    seen = {}
    for r in raw:
        seen.setdefault(r[0], r)
    raw = [seen[r[0]] for r in raw]
    rows = _to_rows(raw)
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string,"
              " text string, tool string, ts timestamp, event_ts timestamp")
    tdir = tmp_path_factory.mktemp("prop")
    table = LakeTable.create(spark, str(tdir / "t"), STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=4)
    pdf = pd.DataFrame(rows, columns=["lsn", "op", "conv_id", "turn_idx",
                                      "role", "text", "tool", "ts", "event_ts"])
    for k in range(n_splits):
        part = pdf[pdf.index % n_splits == k]
        if len(part):
            apply_batch(table, spark.createDataFrame(part, schema))
    got = (read_state(table).toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    want = replay(pdf)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)


@given(keys=st.sets(st.text(min_size=0, max_size=64), min_size=0,
                    max_size=400),
       probes=st.lists(st.text(min_size=0, max_size=64), max_size=50))
@settings(max_examples=200, deadline=None)
def test_bloom_never_false_negative(keys, probes):
    """The planner may only SKIP a delta when the bloom says definitely
    absent — a false negative would silently drop rows from a lookup, so
    membership must hold for every stamped key; probes measure (but don't
    assert) the false-positive side."""
    from rockefeller_spark.lake import bloom_from_keys, bloom_might_contain
    if not keys:
        return
    b = bloom_from_keys(keys)
    for k in keys:
        assert bloom_might_contain(b, k)
    # sanity: the sketch is not degenerate (all-ones) at design load
    misses = [p for p in probes if p not in keys
              and not bloom_might_contain(b, p)]
    # with ~10 bits/key some probe should miss almost always when many
    # probes exist; do not assert (legitimately flaky), just exercise
    _ = misses
