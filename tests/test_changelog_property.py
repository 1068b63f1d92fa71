"""Property test for the replication path: ANY interleaving of put
batches, delete batches, emitter re-attachments, and log compactions
must replay on a peer to exactly the source table's final state (the
WAL contract: FSHLog persistent sequence ids + WALPlayer ordered
replay; TestForComplexIssues.testWalReplayShouldNotSkipAnyRecords).

The fixed-sequence roundtrip gates cover the happy path; hypothesis
explores the orderings that historically break replication — delete
then re-put of the same key across batches, a restart (re-attach)
between mutations, compaction in the middle of the history."""

import os
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from hindex_spark.streaming.ingest import compact_changelog, replay_changelog
from hindex_spark.table import Table

import pytest

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)

KEYS = ["r1", "r2", "r3", "r4"]

put_st = st.tuples(
    st.just("put"),
    st.lists(
        st.tuples(
            st.sampled_from(KEYS),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
            st.one_of(st.none(), st.integers(min_value=-5, max_value=9)),
        ),
        min_size=1,
        max_size=4,
    ),
)
del_st = st.tuples(
    st.just("delete"), st.lists(st.sampled_from(KEYS), min_size=1, max_size=3)
)
reattach_st = st.tuples(st.just("reattach"), st.none())
compact_st = st.tuples(st.just("compact"), st.none())

history_st = st.lists(
    st.one_of(put_st, del_st, reattach_st, compact_st), min_size=1, max_size=6
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history_st)
def test_any_history_replays_to_source_state(spark, history):
    base = spark.createDataFrame(
        [("r1", "a0", 1), ("r2", None, 4)], "rowkey string, s string, n long"
    )
    log = os.path.join(tempfile.mkdtemp(prefix="hx_cl_prop_"), "log")
    t = Table(base, "rowkey", "src").enable_changelog(log)
    for kind, payload in history:
        if kind == "put":
            rows = [(rk, s, n, i) for i, (rk, s, n) in enumerate(payload)]
            df = spark.createDataFrame(rows, "rowkey string, s string, n long, seq long")
            t = t.put(df, order_col="seq")
        elif kind == "delete":
            t = t.delete(spark.createDataFrame([(k,) for k in payload], ["rowkey"]))
        elif kind == "reattach":
            t = Table(t.df, "rowkey", "src").enable_changelog(log)
        elif kind == "compact":
            if os.path.isdir(log):  # emitter writes lazily; empty = no-op
                compact_changelog(spark, log, num_files=1)
    expect = sorted(map(tuple, t.df.collect()))
    if not os.path.isdir(log):
        return  # history mutated nothing — nothing to replay
    peer = Table(base, "rowkey", "peer")
    replayed = replay_changelog(spark, peer, log, t.changelog_schema).table.df
    got = sorted(map(tuple, replayed.collect()))
    assert got == expect, history
