"""Property test for Scan composition: random combinations of rowkey
range, filter, projection, reversed, and limit against a plain-Python
model of the read path (SURVEY §3.1: range prune -> index -> residual
filter -> projection -> order/limit). The table carries an index on the
filtered column, so the index planner participates in every example —
whatever plan it picks, results must equal the model's."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hindex_spark import filters as fl
from hindex_spark.index.spec import IndexSpecification
from hindex_spark.table import Scan, Table


@pytest.fixture(scope="module")
def indexed_scan_table(spark):
    df = spark.createDataFrame(ROWS, "rowkey string, a string, b long")
    t = Table(df, "rowkey", "scanprop")
    t.create_index(IndexSpecification("idx_a").add_column("a", "String"))
    t.create_index(IndexSpecification("idx_b").add_column("b", "Long"))
    t.cache()
    return t

ROWS = [
    (f"r{i:02d}", None if i % 7 == 3 else "abcde"[i % 5], i * 3 % 11)
    for i in range(20)
]

keys = [r[0] for r in ROWS]

range_st = st.one_of(
    st.none(),
    st.tuples(
        st.sampled_from(keys),
        st.sampled_from(keys),
        st.booleans(),  # stop inclusive
    ),
)
scvf_st = st.tuples(
    st.just("scvf"),
    st.sampled_from([fl.EQUAL, fl.GREATER, fl.LESS_OR_EQUAL, fl.NOT_EQUAL]),
    st.sampled_from(["a", "b", "c", "z"]),
    st.booleans(),  # filter_if_missing
)
rowf_st = st.tuples(st.just("row"), st.sampled_from([fl.GREATER_OR_EQUAL, fl.LESS]),
                    st.sampled_from(keys))
intf_st = st.tuples(st.just("int"), st.sampled_from([fl.EQUAL, fl.GREATER]),
                    st.integers(min_value=0, max_value=10))
filter_st = st.one_of(st.none(), scvf_st, rowf_st, intf_st,
                      st.tuples(st.just("and"), scvf_st, intf_st))
scan_st = st.tuples(
    range_st,
    filter_st,
    st.sampled_from([None, ["a"], ["b"], ["a", "b"]]),
    st.booleans(),                      # reversed
    st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
)

_OPS = {
    fl.EQUAL: lambda x, v: x == v,
    fl.NOT_EQUAL: lambda x, v: x != v,
    fl.GREATER: lambda x, v: x > v,
    fl.GREATER_OR_EQUAL: lambda x, v: x >= v,
    fl.LESS: lambda x, v: x < v,
    fl.LESS_OR_EQUAL: lambda x, v: x <= v,
}


def _build_filter(spec):
    if spec is None:
        return None
    kind = spec[0]
    if kind == "scvf":
        _, op, val, fim = spec
        return fl.SingleColumnValueFilter("a", op, val, filter_if_missing=fim)
    if kind == "row":
        _, op, val = spec
        return fl.RowFilter(op, val)
    if kind == "int":
        _, op, val = spec
        return fl.SingleColumnValueFilter("b", op, val, filter_if_missing=True)
    _, s1, s2 = spec
    return fl.FilterList("AND", [_build_filter(s1), _build_filter(s2)])


def _model_pred(spec, row):
    rk, a, b = row
    if spec is None:
        return True
    kind = spec[0]
    if kind == "scvf":
        _, op, val, fim = spec
        if a is None:
            # filterIfMissing=True drops rows missing the column;
            # False includes them (SingleColumnValueFilter.java:74)
            return not fim
        return _OPS[op](a, val)
    if kind == "row":
        _, op, val = spec
        return _OPS[op](rk, val)
    if kind == "int":
        _, op, val = spec
        return _OPS[op](b, val)
    _, s1, s2 = spec
    return _model_pred(s1, row) and _model_pred(s2, row)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scan_st)
def test_scan_composition_matches_model(spark, indexed_scan_table, scan_spec):
    rng, fspec, columns, reversed_, limit = scan_spec
    t = indexed_scan_table

    model = list(ROWS)
    start = stop = None
    stop_inc = True
    if rng is not None:
        start, stop, stop_inc = rng
        if reversed_ and start is not None and stop is not None and start > stop:
            # reference reversed-range convention (Scan.java:578-595):
            # startRow is the HIGH end inclusive, stopRow the LOW end
            model = [r for r in model if r[0] <= start]
            model = [r for r in model if (r[0] >= stop if stop_inc else r[0] > stop)]
        else:
            model = [r for r in model if r[0] >= start]
            model = [r for r in model if (r[0] <= stop if stop_inc else r[0] < stop)]
    model = [r for r in model if _model_pred(fspec, r)]
    model.sort(key=lambda r: r[0], reverse=reversed_)
    if limit is not None:
        model = model[:limit]

    scan = Scan(
        start_row=start,
        stop_row=stop,
        stop_inclusive=stop_inc,
        filter=_build_filter(fspec),
        columns=columns,
        reversed=reversed_,
        limit=limit,
    )
    out = t.scan(scan)

    want_cols = ["rowkey"] + (columns if columns is not None else ["a", "b"])
    assert out.columns == want_cols, (out.columns, want_cols)
    got = [tuple(r) for r in out.collect()]
    idx = {"rowkey": 0, "a": 1, "b": 2}
    want = [tuple(r[idx[c]] for c in want_cols) for r in model]
    if limit is None and not reversed_:
        got = sorted(got)
        want = sorted(want)
    assert got == want, (scan_spec, t.last_index_plan.used_indexes)
