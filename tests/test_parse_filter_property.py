"""Property-based ParseFilter DSL fuzzing (TestParseFilter model,
hbase-server/src/test/.../filter/TestParseFilter.java): random filter
trees rendered to DSL strings must parse back to filters with IDENTICAL
row semantics as the directly-constructed tree, for any nesting of
AND/OR and any comparator/arg shapes."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.parse_filter import parse_filter
from hindex_spark.table import Scan, Table

import pytest

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)

_OPS = {
    fl.EQUAL: "=",
    fl.NOT_EQUAL: "!=",
    fl.GREATER: ">",
    fl.GREATER_OR_EQUAL: ">=",
    fl.LESS: "<",
    fl.LESS_OR_EQUAL: "<=",
}


def _leaves():
    op = st.sampled_from(list(_OPS))
    rk_val = st.sampled_from(["c10", "c25", "c5", "d1", ""])
    num = st.integers(min_value=-5, max_value=40)

    row = st.tuples(st.just("row"), op, rk_val).map(
        lambda t: (
            fl.RowFilter(t[1], fl.BinaryComparator(t[2])),
            f"RowFilter({_OPS[t[1]]}, 'binary:{t[2]}')",
        )
    )
    prefix = st.sampled_from(["c1", "c2", "d", "zz", ""]).map(
        lambda p: (fl.PrefixFilter(p), f"PrefixFilter('{p}')")
    )
    scvf = st.tuples(op, num, st.booleans()).map(
        lambda t: (
            fl.SingleColumnValueFilter("v", t[0], t[1], filter_if_missing=t[2]),
            f"SingleColumnValueFilter('v', {_OPS[t[0]]}, 'binary:{t[1]}', {int(t[2])})",
        )
    )
    return st.one_of(row, prefix, scvf)


def _trees():
    def combine(children):
        def mk(lst):
            kind = lst[0]
            subs = lst[1]
            filt = fl.FilterList(kind, [s[0] for s in subs])
            dsl = f" {kind} ".join(f"({s[1]})" for s in subs)
            return (filt, f"({dsl})")

        return st.tuples(
            st.sampled_from(["AND", "OR"]),
            st.lists(children, min_size=2, max_size=3),
        ).map(lambda t: mk(list(t)))

    return st.recursive(_leaves(), combine, max_leaves=6)


@settings(max_examples=40, deadline=None)
@given(_trees())
def test_parsed_dsl_matches_direct_construction(spark, tree):
    direct, dsl = tree
    parsed = parse_filter(dsl)
    df = spark.createDataFrame(
        [(f"c{i}", i) for i in range(30)] + [("d1", -3), ("e9", 100)],
        ["rowkey", "v"],
    )
    t = Table(df, "rowkey", "fuzz")
    a = sorted(r["rowkey"] for r in t.scan(Scan(filter=direct)).collect())
    b = sorted(r["rowkey"] for r in t.scan(Scan(filter=parsed)).collect())
    assert a == b, dsl
