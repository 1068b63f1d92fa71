"""Model-based property test for the wide-table mutation layer: random
sequences of put / delete / increment / append / checkAndPut batches
checked against an independent plain-Python model of the reference
semantics (HRegion.batchMutate / increment:5289 / append:5096 /
checkAndMutate:2716). Complements test_cells_property.py, which does
the same for the versioned cell layer."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hindex_spark import filters as fl
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
        max_size=5,
    ),
)
del_st = st.tuples(
    st.just("delete"),
    st.lists(st.sampled_from(KEYS), min_size=1, max_size=3),
)
inc_st = st.tuples(
    st.just("increment"),
    st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(min_value=-3, max_value=7)),
        min_size=1,
        max_size=4,
    ),
)
app_st = st.tuples(
    st.just("append"),
    # unique keys per batch: multi-append concat order within one batch
    # is undefined in the engine AND in the reference
    st.lists(
        st.tuples(st.sampled_from(KEYS), st.sampled_from(["x", "yy"])),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    ),
)
cap_st = st.tuples(
    st.just("check_and_put"),
    st.tuples(
        st.sampled_from([fl.GREATER, fl.LESS_OR_EQUAL, fl.EQUAL]),
        st.integers(min_value=-2, max_value=8),
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.sampled_from(["G", "H"])),
            min_size=1,
            max_size=3,
            unique_by=lambda t: t[0],
        ),
    ),
)

history_st = st.lists(
    st.one_of(put_st, del_st, inc_st, app_st, cap_st), min_size=1, max_size=6
)


def _model_apply(model, kind, payload):
    if kind == "put":
        for rk, s, n in payload:  # batch order; latest non-null wins
            row = model.setdefault(rk, {"s": None, "n": None})
            if s is not None:
                row["s"] = s
            if n is not None:
                row["n"] = n
    elif kind == "delete":
        for rk in payload:
            model.pop(rk, None)
    elif kind == "increment":
        sums = {}
        for rk, d in payload:
            sums[rk] = sums.get(rk, 0) + d
        for rk, d in sums.items():
            row = model.setdefault(rk, {"s": None, "n": None})
            row["n"] = (row["n"] or 0) + d
    elif kind == "append":
        for rk, suf in payload:
            row = model.setdefault(rk, {"s": None, "n": None})
            row["s"] = (row["s"] or "") + suf
    elif kind == "check_and_put":
        op, val, puts = payload
        ok = {
            fl.GREATER: lambda x: x is not None and x > val,
            fl.LESS_OR_EQUAL: lambda x: x is not None and x <= val,
            fl.EQUAL: lambda x: x is not None and x == val,
        }[op]
        for rk, s in puts:
            if rk in model and ok(model[rk]["n"]):
                model[rk]["s"] = s
    return model


def _engine_apply(spark, t, kind, payload):
    if kind == "put":
        rows = [(rk, s, n, i) for i, (rk, s, n) in enumerate(payload)]
        df = spark.createDataFrame(rows, "rowkey string, s string, n long, seq long")
        return t.put(df, order_col="seq")
    if kind == "delete":
        return t.delete(spark.createDataFrame([(k,) for k in payload], ["rowkey"]))
    if kind == "increment":
        df = spark.createDataFrame(list(payload), "rowkey string, n long")
        return t.increment(df)
    if kind == "append":
        df = spark.createDataFrame(list(payload), "rowkey string, s string")
        return t.append(df)
    if kind == "check_and_put":
        op, val, puts = payload
        df = spark.createDataFrame(list(puts), "rowkey string, s string")
        return t.check_and_put("n", op, val, df)
    raise AssertionError(kind)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history_st)
def test_mutation_sequences_match_python_model(spark, history):
    t = Table(
        spark.createDataFrame(
            [("r1", "a0", 1), ("r2", None, 4)], "rowkey string, s string, n long"
        ),
        "rowkey",
        "modeltab",
    )
    model = {"r1": {"s": "a0", "n": 1}, "r2": {"s": None, "n": 4}}
    for kind, payload in history:
        t = _engine_apply(spark, t, kind, payload)
        model = _model_apply(model, kind, payload)
    got = {
        r["rowkey"]: {"s": r["s"], "n": r["n"]} for r in t.df.collect()
    }
    assert got == model, history
