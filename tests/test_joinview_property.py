"""Property test for the incrementally-maintained join view
(operators/joinview.py): arbitrary interleavings of
update/replace/delete on both sides plus compact must leave ``read()``
multiset-equal to the plain join of the surviving batches, with the
refusal rules firing exactly when the model says so. Catches delta
algebra mistakes (a delta joined against a stale side, a retraction
that misses later-produced rows) that scenario tests overlook."""

import os
from collections import Counter

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from hindex_spark.catalog import Catalog
from hindex_spark.operators.joinview import JoinView

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)

KEYS = [1, 2, 3]

row_st = st.tuples(
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=9),
)
batch_st = st.lists(row_st, min_size=1, max_size=3)

op_st = st.tuples(
    st.sampled_from(
        ["up_l", "up_r", "rep_l", "rep_r", "del_l", "del_r", "compact"]
    ),
    st.integers(min_value=0, max_value=11),
    batch_st,
)


def _lf(spark, rows):
    return spark.createDataFrame(rows, "k long, lv long")


def _rf(spark, rows):
    return spark.createDataFrame(rows, "k long, rv long")


def _model(live_l, live_r):
    out = Counter()
    for lrows in live_l.values():
        for k, lv in lrows:
            for rrows in live_r.values():
                for k2, rv in rrows:
                    if k == k2:
                        out[(k, lv, rv)] += 1
    return out


@settings(
    max_examples=int(os.environ.get("HX_PROP_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# a retraction must also kill MV rows produced LATER by the other
# side's updates joining against the retracted batch
@example(ops=[
    ("up_l", 0, [(1, 5)]),
    ("up_r", 0, [(1, 7)]),
    ("del_l", 1, [(1, 0)]),
])
# correct-the-correction refusal chain across a compact
@example(ops=[
    ("up_r", 0, [(2, 1)]),
    ("rep_r", 1, [(2, 2)]),
    ("compact", 0, [(1, 0)]),
    ("rep_r", 2, [(2, 3)]),
])
@given(st.lists(op_st, min_size=1, max_size=5))
def test_joinview_interleavings_match_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("jvprop")
    cat = Catalog(spark, str(tmp / "wh"))
    seed_l, seed_r = [(1, 0), (2, 0)], [(1, 1), (3, 1)]
    jv = JoinView.build(
        cat, _lf(spark, seed_l), _rf(spark, seed_r), "k", "prop"
    )
    live = {"l": {0: list(seed_l)}, "r": {0: list(seed_r)}}
    corrected = {"l": {}, "r": {}}
    cur = {"l": 0, "r": 0}
    sealed = {"l": 0, "r": 0}
    # version-history model for read_asof
    snapshots = {0: {s: {g: list(rs) for g, rs in live[s].items()}
                     for s in ("l", "r")}}
    cur_version, sealed_version = 0, 0

    def _snap():
        nonlocal cur_version
        cur_version += 1
        snapshots[cur_version] = {
            s: {g: list(rs) for g, rs in live[s].items()}
            for s in ("l", "r")
        }

    def check_refusal(side, target):
        if target < sealed[side]:
            return "folded"
        if target > cur[side]:
            return "does not exist"
        if target in corrected[side]:
            return ("retracted" if corrected[side][target] is None
                    else "superseded")
        return None

    for verb, salt, rows in ops:
        side = verb[-1]
        frame = (_lf if side == "l" else _rf)(spark, rows)
        if verb.startswith("up"):
            g = (jv.update_left if side == "l" else jv.update_right)(frame)
            cur[side] += 1
            assert g == cur[side]
            live[side][g] = list(rows)
            _snap()
        elif verb.startswith(("rep", "del")):
            target = salt % (cur[side] + 2)
            err = check_refusal(side, target)
            fns = {
                ("rep", "l"): lambda: jv.replace_left_batch(target, frame),
                ("rep", "r"): lambda: jv.replace_right_batch(target, frame),
                ("del", "l"): lambda: jv.delete_left_batch(target),
                ("del", "r"): lambda: jv.delete_right_batch(target),
            }
            fn = fns[(verb[:3], side)]
            if err is not None:
                with pytest.raises(ValueError, match=err):
                    fn()
                continue
            if verb.startswith("rep"):
                g = fn()
                cur[side] += 1
                assert g == cur[side]
                live[side].pop(target, None)
                live[side][g] = list(rows)
                corrected[side][target] = g
            else:
                fn()
                live[side].pop(target, None)
                corrected[side][target] = None
            _snap()
        else:  # compact
            jv.compact()
            for s in ("l", "r"):
                cur[s] += 1
                sealed[s] = cur[s]
                folded = [row for rs in live[s].values() for row in rs]
                live[s] = {cur[s]: folded}
                corrected[s] = {}
            _snap()
            sealed_version = cur_version

    got = Counter(tuple(r) for r in jv.read().collect())
    assert got == _model(live["l"], live["r"])

    # a reopened handle serves the same state (meta is the truth)
    jv2 = JoinView.open(cat, "prop")
    assert (jv2.cur_lgen, jv2.cur_rgen) == (cur["l"], cur["r"])
    got2 = Counter(tuple(r) for r in jv2.read().collect())
    assert got2 == _model(live["l"], live["r"])

    # read_asof replays every surviving version to its snapshot's join
    assert (jv2.cur_version, jv2.sealed_version) == (
        cur_version, sealed_version)
    for v in range(sealed_version, cur_version + 1):
        got_v = Counter(tuple(r) for r in jv2.read_asof(v).collect())
        assert got_v == _model(
            snapshots[v]["l"], snapshots[v]["r"]), f"read_asof({v})"
    if sealed_version > 0:
        with pytest.raises(ValueError, match="sealed by"):
            jv2.read_asof(sealed_version - 1)
