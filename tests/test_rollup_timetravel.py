"""Time-travel reads on the RollupStore (operators/rollup.py:read_asof):
every mutating verb appends to a meta version history, and an as-of read
replays the history prefix into a generation-set scan filter — no
tombstone join, no extra jobs. Versions below the last physical rewrite
(compact/expire) are sealed and refused, the Delta-Lake VACUUM rule.

Reference parity note: the reference's cell layer serves historical
versions the same way (KeyValue timestamps + Scan.setTimeRange,
Scan.java:86); read_asof is that capability at batch granularity on the
persisted rollup artifact.
"""

import pytest
from pyspark.sql import functions as F

from hindex_spark.catalog import Catalog
from hindex_spark.operators.rollup import HOUR_US, RollupStore


def _frame(spark, rows):
    return spark.createDataFrame(
        [(b * HOUR_US + 17, k, float(v)) for b, k, v in rows],
        "us long, event_type string, value double",
    ).select(
        F.timestamp_micros(F.col("us")).alias("ts"), "event_type", "value"
    )


def _rows(df):
    return sorted(
        (r["bucket_us"] // HOUR_US, r["event_type"], r["cnt"],
         float(r["vsum"]), float(r["vmin"]), float(r["vmax"]))
        for r in df.collect()
    )


@pytest.fixture()
def store(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    r = RollupStore.build(
        cat, _frame(spark, [(0, "a", 10), (1, "b", 20)]),
        "ts", ["event_type"], "value", HOUR_US, "tt",
    )
    return cat, r


def test_asof_replays_every_version(spark, store):
    cat, r = store
    g1 = r.update(_frame(spark, [(0, "a", 5)]))            # v1
    g2 = r.update(_frame(spark, [(1, "b", 100)]))          # v2 misreported
    r.replace_batch(g2, _frame(spark, [(1, "b", 1)]))      # v3
    assert _rows(r.read_asof(0)) == [(0, "a", 1, 10.0, 10.0, 10.0),
                                     (1, "b", 1, 20.0, 20.0, 20.0)]
    assert _rows(r.read_asof(1)) == [(0, "a", 2, 15.0, 5.0, 10.0),
                                     (1, "b", 1, 20.0, 20.0, 20.0)]
    # v2 still shows the misreported batch — corrections don't rewrite
    assert _rows(r.read_asof(2)) == [(0, "a", 2, 15.0, 5.0, 10.0),
                                     (1, "b", 2, 120.0, 20.0, 100.0)]
    assert _rows(r.read_asof(3)) == _rows(r.read())
    r.delete_batch(g1)                                     # v4
    assert _rows(r.read_asof(4)) == _rows(r.read())
    assert _rows(r.read_asof(2)) == [(0, "a", 2, 15.0, 5.0, 10.0),
                                     (1, "b", 2, 120.0, 20.0, 100.0)]
    assert [e["op"] for e in r.versions()] == [
        "build", "update", "update", "replace", "delete"]


def test_compact_seals_earlier_versions(spark, store):
    cat, r = store
    r.update(_frame(spark, [(0, "a", 5)]))                 # v1
    r.compact()                                            # v2 seals
    with pytest.raises(ValueError, match="sealed by compact"):
        r.read_asof(1)
    assert _rows(r.read_asof(2)) == _rows(r.read())
    r.update(_frame(spark, [(2, "a", 7)]))                 # v3
    assert _rows(r.read_asof(3)) == _rows(r.read())
    # v2 (the seal point itself) stays readable after later verbs
    assert _rows(r.read_asof(2)) == [(0, "a", 2, 15.0, 5.0, 10.0),
                                     (1, "b", 1, 20.0, 20.0, 20.0)]


def test_expire_seals_earlier_versions(spark, store):
    cat, r = store
    r.update(_frame(spark, [(2, "a", 5)]))                 # v1
    r.expire(HOUR_US)                                      # v2 seals
    with pytest.raises(ValueError, match="sealed by expire"):
        r.read_asof(1)
    assert _rows(r.read_asof(2)) == _rows(r.read())


def test_out_of_range_and_reopen(spark, store):
    cat, r = store
    r.update(_frame(spark, [(0, "a", 5)]))                 # v1
    with pytest.raises(ValueError, match="does not exist"):
        r.read_asof(2)
    r2 = RollupStore.open(cat, "tt")
    assert _rows(r2.read_asof(0)) == [(0, "a", 1, 10.0, 10.0, 10.0),
                                      (1, "b", 1, 20.0, 20.0, 20.0)]
    assert (r2.cur_version, r2.sealed_version) == (1, 0)


def test_pre_history_store_refuses(spark, store):
    cat, r = store
    # simulate a store written before version history existed
    import json
    with open(r._meta_path()) as f:
        m = json.load(f)
    for k in ("history", "cur_version", "sealed_version"):
        m.pop(k, None)
    with open(r._meta_path(), "w") as f:
        json.dump(m, f)
    r3 = RollupStore.open(cat, "tt")
    with pytest.raises(ValueError, match="predates version history"):
        r3.read_asof(0)
    # and mutating a pre-history store keeps it history-less (a partial
    # history would reconstruct wrong states)
    r3.update(_frame(spark, [(0, "a", 1)]))
    assert r3.history is None
    with pytest.raises(ValueError, match="predates version history"):
        r3.read_asof(0)


def test_asof_with_time_filter_and_sketches(spark, tmp_path):
    """Sketch columns ride along: an as-of read estimates NDV from the
    replayed partials exactly as read() does from the live ones."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    rows = spark.createDataFrame(
        [(b * HOUR_US + 7, "a", float(v), f"u{v}")
         for b, v in [(0, 1), (0, 2), (1, 3)]],
        "us long, event_type string, value double, user string",
    ).select(F.timestamp_micros(F.col("us")).alias("ts"),
             "event_type", "value", "user")
    r = RollupStore.build(cat, rows, "ts", ["event_type"], "value",
                          HOUR_US, "ttn", ndv_col="user")
    g1 = r.update(rows)                                    # v1: doubles cnt
    r.delete_batch(g1)                                     # v2
    v1 = r.read_asof(1, start_us=0, end_us=HOUR_US).collect()
    assert len(v1) == 1 and v1[0]["cnt"] == 4 and v1[0]["ndv"] == 2
    v2 = r.read_asof(2).collect()
    assert {row["cnt"] for row in v2} == {2, 1}
