"""Round-11 hardening: key-not-first JoinView builds, null handling in
flag_anomalies, the DOUBLE (never DECIMAL) correlations surface, and
crash-window seal ordering in ProfileStore.compact / RollupStore.expire."""

import json

import pytest
from pyspark.sql import functions as F


def test_joinview_build_key_not_first(spark, tmp_path):
    """build() must normalize to key-first storage: appends are
    positional INSERT INTOs that select (key, *cols, gen) — a build
    frame carrying the key in a later position previously stored a
    swapped layout that updates silently corrupted."""
    from hindex_spark.catalog import Catalog
    from hindex_spark.operators.joinview import JoinView

    cat = Catalog(spark, str(tmp_path / "wh"))
    # key 'k' deliberately NOT first on either side
    L = spark.createDataFrame([(10, 1), (20, 2)], "lv long, k long")
    R = spark.createDataFrame([("x", 1)], "rv string, k long")
    jv = JoinView.build(cat, L, R, "k", "knf")
    assert sorted(tuple(r) for r in jv.read().collect()) == [(1, 10, "x")]
    # append via the positional path — the bug made (k=3,lv=30) land
    # as (lv=3,k=30)
    jv.update_left(spark.createDataFrame([(30, 3), (40, 1)],
                                         "lv long, k long")
                   .select("k", "lv"))
    jv.update_right(spark.createDataFrame([("y", 3)], "rv string, k long"))
    got = sorted(tuple(r) for r in jv.read().collect())
    assert got == [(1, 10, "x"), (1, 40, "x"), (3, 30, "y")]
    # the side stores read back with correct (named) values
    lvals = {(r["k"], r["lv"]) for r in jv.left_rows().collect()}
    assert (3, 30) in lvals and (30, 3) not in lvals


def test_flag_anomalies_null_values(spark):
    """NULLs in value_col are excluded from both medians: the non-null
    rows of a key keep their exact med/mad/flags, null rows flag NULL,
    and an all-null key is all-NULL instead of poisoning the rank."""
    from hindex_spark.operators.profile import flag_anomalies

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0), ("a", 100.0),
         ("c", None), ("c", None)],
        "k string, v double",
    )
    rows = flag_anomalies(df, ["k"], "v", k=3.0).collect()
    a = {r["v"]: (r["med"], r["mad"], r["is_anomaly"])
         for r in rows if r["k"] == "a" and r["v"] is not None}
    # same medians as the null-free case: med=2 (rank ceil(4/2)=2 of
    # {1,2,3,100}), mad=1 (rank-2 of {0,1,1,98})
    assert a[100.0] == (2.0, 1.0, True)
    assert a[3.0] == (2.0, 1.0, False)
    a_null = [r for r in rows if r["k"] == "a" and r["v"] is None][0]
    assert a_null["med"] == 2.0 and a_null["is_anomaly"] is None
    for r in rows:
        if r["k"] == "c":
            assert r["med"] is None and r["mad"] is None \
                and r["is_anomaly"] is None


def test_correlations_double_surface(spark):
    """The corr column is DOUBLE — a DECIMAL final column is the
    cross-engine hash class the checker now hard-fails."""
    from hindex_spark.operators.profile import correlations

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 1.0), (3.0, 6.0, 3.0)],
        "x double, y double, z double",
    )
    out = correlations(df, ["x", "y", "z"])
    assert dict(out.dtypes)["corr"] == "double"
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in out.collect()}
    assert got[("x", "y")] == pytest.approx(1.0)
    assert len(got) == 3


def _crash_once_on_save(catalog, monkeypatch):
    """Make the NEXT save_bucketed raise — the crash window between a
    store's meta commit and its physical rewrite."""
    real = catalog.save_bucketed
    state = {"armed": True}

    def boom(*a, **kw):
        if state["armed"]:
            state["armed"] = False
            raise RuntimeError("injected crash before rewrite")
        return real(*a, **kw)

    monkeypatch.setattr(catalog, "save_bucketed", boom)
    return state


def test_profile_compact_crash_before_rewrite(spark, tmp_path, monkeypatch):
    """A crash between compact()'s meta commit and the rewrite must
    leave reads correct (tombstones intact) and historical versions
    REFUSED — never reconstructed from rows the restarted compact
    rewrites."""
    from hindex_spark.catalog import Catalog
    from hindex_spark.operators.profile import ProfileStore, profile

    cat = Catalog(spark, str(tmp_path / "wh"))
    cols = ["id", "v"]
    b1 = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    b2 = spark.createDataFrame([(3, 30.0)], "id long, v double")
    bad = spark.createDataFrame([(9, 9e9)], "id long, v double")
    ps = ProfileStore.build(cat, b1, cols, "crashps")
    g = ps.update(bad)                       # v1
    ps.replace_batch(g, b2)                  # v2 — leaves a tombstone
    want = sorted(map(tuple, profile(
        b1.unionByName(b2), cols).collect()))
    state = _crash_once_on_save(cat, monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        ps.compact()
    assert not state["armed"]
    # reads still correct: the dead generation stays tombstone-filtered
    ps2 = ProfileStore.open(cat, "crashps")
    assert sorted(map(tuple, ps2.read().collect())) == want
    # pre-compact versions are sealed (refused), not silently wrong
    with pytest.raises(ValueError, match="sealed by compact"):
        ps2.read_asof(1)
    # a restarted compact completes and converges
    ps2.compact()
    assert sorted(map(tuple, ps2.read().collect())) == want


def test_rollup_expire_crash_before_rewrite(spark, tmp_path, monkeypatch):
    """Same crash window for RollupStore.expire: the seal must commit
    BEFORE the rewrite, so read_asof of pre-expire versions refuses
    instead of reconstructing from the purged table."""
    from datetime import datetime

    from hindex_spark.catalog import Catalog
    from hindex_spark.operators.rollup import HOUR_US, RollupStore

    cat = Catalog(spark, str(tmp_path / "wh"))
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), "click", 1.0),
        (2, datetime(2024, 1, 2, 11, 0), "click", 2.0),
    ]
    cols = ["event_id", "ts", "event_type", "value"]
    ev = spark.createDataFrame(rows, cols)
    r = RollupStore.build(
        cat, ev, "ts", ["event_type"], "value", HOUR_US, "expcrash",
    )
    r.update(spark.createDataFrame(
        [(3, datetime(2024, 1, 2, 12, 0), "view", 5.0)], cols))  # v1
    want = sorted(map(tuple, r.read().collect()))
    cutoff = int(datetime(2024, 1, 1, 0, 0).timestamp()) * 1_000_000
    state = _crash_once_on_save(cat, monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        r.expire(before_us=cutoff)   # cutoff keeps everything: rewrite
    assert not state["armed"]        # ...was attempted (and crashed)
    r2 = RollupStore.open(cat, "expcrash")
    assert sorted(map(tuple, r2.read().collect())) == want
    with pytest.raises(ValueError, match="sealed by expire"):
        r2.read_asof(1)
    # restarted expire completes; reads converge
    r2.expire(before_us=cutoff)
    assert sorted(map(tuple, r2.read().collect())) == want


def test_rebucket_crash_attach_uses_file_sidecar(spark, tmp_path, monkeypatch):
    """A rebucketing expire() that crashes between its pre-rewrite meta
    commit and save_bucketed leaves meta claiming a bucket count the
    files don't have. The _buckets sidecar (written into staging, so it
    swaps atomically WITH the files) must win at attach time — a stale
    meta count silently corrupts shuffle-free joins otherwise."""
    from datetime import datetime

    from hindex_spark.catalog import Catalog
    from hindex_spark.operators.rollup import HOUR_US, RollupStore

    cat = Catalog(spark, str(tmp_path / "wh"))
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), "click", 1.0),
        (2, datetime(2024, 1, 2, 11, 0), "click", 2.0),
        (3, datetime(2024, 1, 2, 12, 0), "view", 5.0),
    ]
    cols = ["event_id", "ts", "event_type", "value"]
    ev = spark.createDataFrame(rows, cols)
    r = RollupStore.build(
        cat, ev, "ts", ["event_type"], "value", HOUR_US, "rebucket",
        num_buckets=8,
    )
    want = sorted(map(tuple, r.read().collect()))
    cutoff = int(datetime(2023, 1, 1, 0, 0).timestamp()) * 1_000_000
    state = _crash_once_on_save(cat, monkeypatch)
    with pytest.raises(RuntimeError, match="injected crash"):
        r.expire(before_us=cutoff, num_buckets=16)  # rebucket 8 -> 16
    assert not state["armed"]
    # the crashed store's meta now claims 16; the files are still 8
    r2 = RollupStore.open(cat, "rebucket")
    assert r2.num_buckets == 16  # stale meta cache, by construction
    # a fresh process would attach from that stale meta: force the
    # re-attach by dropping the session registration the build left
    spark.sql(f"DROP TABLE IF EXISTS `{r2.sql_name}`")
    # attach must trust the files' sidecar: reads stay correct
    assert sorted(map(tuple, r2.read().collect())) == want
    # and the claimed bucketing must describe the REAL layout: 8, not 16
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED `{r2.sql_name}`").collect()
    n_txt = [row.data_type for row in desc if row.col_name == "Num Buckets"]
    assert n_txt and int(n_txt[0]) == 8
    # restarted expire completes the rebucket; sidecar follows the files
    r2.expire(before_us=cutoff, num_buckets=16)
    assert sorted(map(tuple, r2.read().collect())) == want
    r3 = RollupStore.open(cat, "rebucket")
    assert sorted(map(tuple, r3.read().collect())) == want
