"""Property test for the RollupStore verb algebra (operators/rollup.py):
arbitrary interleavings of update / replace_batch / delete_batch /
compact / expire must leave the merged read exactly equal to a trivial
Python model of the surviving batches, the refusal rules (sealed /
nonexistent / already-corrected generations) must fire exactly when the
model says so, and the write-maintained meta bucket histogram must
always equal the live per-bucket partial counts. Catches
generation-arithmetic, correction-chain, and histogram-maintenance
mistakes that single-scenario tests overlook."""

import os

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hindex_spark.catalog import Catalog
from hindex_spark.operators.rollup import HOUR_US, RollupStore

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)

#: tiny universes so ops collide a lot
BUCKETS = [0, HOUR_US, 2 * HOUR_US]
KEYS = ["a", "b"]

row_st = st.tuples(
    st.integers(min_value=0, max_value=2),          # bucket index
    st.sampled_from(KEYS),                          # key
    st.integers(min_value=0, max_value=50),         # value
)
batch_st = st.lists(row_st, min_size=1, max_size=4)

#: an op is (verb, gen-choice salt, batch) — unused parts ignored
op_st = st.tuples(
    st.sampled_from(["update", "replace", "delete", "compact", "expire"]),
    st.integers(min_value=0, max_value=11),
    batch_st,
)


def _frame(spark, rows):
    data = [
        (BUCKETS[b] + 17, k, float(v))  # +17us: inside the bucket
        for b, k, v in rows
    ]
    return spark.createDataFrame(
        data, "us long, event_type string, value double"
    ).select(
        F.timestamp_micros(F.col("us")).alias("ts"), "event_type", "value"
    )


def _model_read(live):
    """(bucket_us, key) -> (cnt, sum, min, max) over all live batches'
    rows — the trivial model of merge_partials(rollup_partials(...))."""
    agg = {}
    for rows in live.values():
        for b, k, v in rows:
            key = (BUCKETS[b], k)
            c, s, lo, hi = agg.get(key, (0, 0, None, None))
            agg[key] = (
                c + 1, s + v,
                v if lo is None else min(lo, v),
                v if hi is None else max(hi, v),
            )
    return agg


@settings(
    max_examples=int(os.environ.get("HX_PROP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# the round-10 ADVICE bug, pinned: correct a batch, then correct the
# ORIGINAL again — the second call used to tombstone the already-dead
# gen and leave both corrections live (double-count)
@example(ops=[
    ("update", 0, [(0, "a", 1)]),
    ("replace", 1, [(0, "a", 2)]),
    ("replace", 1, [(0, "a", 3)]),
])
# expire-then-correct: the corrected map must survive the rewrite
@example(ops=[
    ("update", 0, [(0, "a", 1), (2, "b", 5)]),
    ("replace", 1, [(2, "a", 2)]),
    ("expire", 1, [(0, "a", 1)]),
    ("replace", 1, [(0, "a", 9)]),
])
@given(st.lists(op_st, min_size=1, max_size=5))
def test_rollup_verb_interleavings_match_dict_model(
    spark, tmp_path_factory, ops
):
    tmp = tmp_path_factory.mktemp("rollprop")
    cat = Catalog(spark, str(tmp / "wh"))
    seed = [(0, "a", 10), (1, "b", 20)]
    r = RollupStore.build(
        cat, _frame(spark, seed), "ts", ["event_type"], "value",
        HOUR_US, "prop",
    )
    live = {0: list(seed)}          # gen -> rows
    corrected = {}                  # gen -> superseding (None = deleted)
    sealed_below, cur_gen = 0, 0
    # version-history model for read_asof: version -> snapshot of live;
    # physical rewrites seal everything before them
    snapshots = {0: {g: list(rs) for g, rs in live.items()}}
    cur_version, sealed_version = 0, 0

    def _snap():
        nonlocal cur_version
        cur_version += 1
        snapshots[cur_version] = {g: list(rs) for g, rs in live.items()}

    for verb, salt, rows in ops:
        if verb == "update":
            g = r.update(_frame(spark, rows))
            cur_gen += 1
            assert g == cur_gen
            live[g] = list(rows)
            _snap()
        elif verb in ("replace", "delete"):
            target = salt % (cur_gen + 2)  # covers nonexistent too
            if target < sealed_below:
                err = "folded"
            elif target > cur_gen:
                err = "does not exist"
            elif target in corrected:
                err = ("retracted" if corrected[target] is None
                       else "superseded")
            else:
                err = None
            if err is not None:
                with pytest.raises(ValueError, match=err):
                    if verb == "replace":
                        r.replace_batch(target, _frame(spark, rows))
                    else:
                        r.delete_batch(target)
                continue
            if verb == "replace":
                g = r.replace_batch(target, _frame(spark, rows))
                cur_gen += 1
                assert g == cur_gen
                live.pop(target, None)
                live[g] = list(rows)
                corrected[target] = g
            else:
                r.delete_batch(target)
                live.pop(target, None)
                corrected[target] = None
            _snap()
        elif verb == "compact":
            r.compact()
            cur_gen += 1
            sealed_below = cur_gen
            folded = [row for rows_ in live.values() for row in rows_]
            live = {cur_gen: folded}
            corrected = {}
            _snap()
            sealed_version = cur_version
        elif verb == "expire":
            cutoff = BUCKETS[salt % 3]
            r.expire(cutoff)
            live = {
                g: [row for row in rows_ if BUCKETS[row[0]] >= cutoff]
                for g, rows_ in live.items()
            }
            _snap()
            sealed_version = cur_version

    # 1) merged read equals the model aggregation exactly (values are
    # small integers, so the DECIMAL(18,6) sums convert exactly)
    got = {
        (row["bucket_us"], row["event_type"]): (
            row["cnt"], float(row["vsum"]), float(row["vmin"]),
            float(row["vmax"]),
        )
        for row in r.read().collect()
    }
    want = {k: (c, float(s), float(lo), float(hi))
            for k, (c, s, lo, hi) in _model_read(live).items()}
    assert got == want

    # 2) meta histogram == live per-bucket partial counts, always
    live_counts = {
        str(row["bucket_us"]): row["n"]
        for row in r.live_partials.groupBy("bucket_us")
        .agg(F.count("*").alias("n")).collect()
    }
    combined = {}
    for h in (r.gen_hist or {}).values():
        for b, n in h.items():
            combined[b] = combined.get(b, 0) + n
    assert combined == live_counts

    # 3) a reopened handle sees the same state (meta is the truth)
    r2 = RollupStore.open(cat, "prop")
    assert (r2.cur_gen, r2.sealed_below) == (cur_gen, sealed_below)
    assert {int(k): v for k, v in r2.corrected.items()} == corrected

    # 4) read_asof replays EVERY surviving version to its snapshot's
    # model aggregation, and sealed versions are refused
    assert (r2.cur_version, r2.sealed_version) == (
        cur_version, sealed_version)
    for v in range(sealed_version, cur_version + 1):
        got_v = {
            (row["bucket_us"], row["event_type"]): (
                row["cnt"], float(row["vsum"]), float(row["vmin"]),
                float(row["vmax"]),
            )
            for row in r2.read_asof(v).collect()
        }
        want_v = {k: (c, float(s), float(lo), float(hi))
                  for k, (c, s, lo, hi) in _model_read(snapshots[v]).items()}
        assert got_v == want_v, f"read_asof({v}) diverged"
    if sealed_version > 0:
        with pytest.raises(ValueError, match="sealed by"):
            r2.read_asof(sealed_version - 1)
