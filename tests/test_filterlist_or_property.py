"""Property test for FilterList MUST_PASS_ONE branch evaluation: over
random multi-family multi-version cell fixtures, the OR of any member
set must select exactly the UNION of each member applied alone over the
full stream (FilterList.java:178-200: every OR member observes every
cell with its own state), and MUST_PASS_ALL with a trailing positional
member must equal sequential application (FilterListWithAND
short-circuit)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from hindex_spark import filters as fl
from hindex_spark.table import CellTable

import pytest

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)

ROWS = ["r1", "r2", "r3"]
CFS = ["cf1", "cf2"]
QUALS = ["qa", "qb", "qc"]

cell_st = st.tuples(
    st.sampled_from(ROWS),
    st.sampled_from(CFS),
    st.sampled_from(QUALS),
    st.sampled_from([1, 2, 3]),
    st.sampled_from(["1", "5", "9"]),
)
cells_st = st.lists(cell_st, min_size=1, max_size=10, unique_by=lambda c: c[:4])

member_st = st.sampled_from(
    [
        ("pagination", lambda: fl.ColumnPaginationFilter(limit=2, offset=1)),
        ("count", lambda: fl.ColumnCountGetFilter(1)),
        ("dependent", lambda: fl.DependentColumnFilter("cf1", "qa")),
        ("value", lambda: fl.ValueFilter(fl.GREATER_OR_EQUAL, "5")),
        ("qualifier", lambda: fl.QualifierFilter(fl.EQUAL, "qb")),
    ]
)


def _key_set(df):
    return {(r["rowkey"], r["cf"], r["qualifier"], r["ts"]) for r in df.collect()}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cells=cells_st, m1=member_st, m2=member_st)
def test_or_equals_union_of_branches(spark, cells, m1, m2):
    frame = CellTable(spark).put_cells(cells).read(max_versions=10)
    f1, f2 = m1[1](), m2[1]()
    union = _key_set(f1.apply(frame, None)) | _key_set(f2.apply(frame, None))
    combined = fl.FilterList("OR", [f1, f2]).apply(frame, None)
    assert _key_set(combined) == union
    assert combined.columns == frame.columns  # helper columns dropped


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cells=cells_st, m1=member_st)
def test_or_with_nested_and_matches_sequential(spark, cells, m1):
    """OR( AND(pred, positional), value ) — the nested AND branch's
    kept-set must equal applying the predicate then the positional
    filter sequentially."""
    frame = CellTable(spark).put_cells(cells).read(max_versions=10)
    pred = fl.ValueFilter(fl.NOT_EQUAL, "9")
    pos = fl.ColumnCountGetFilter(1)
    sibling = fl.ValueFilter(fl.EQUAL, "9")
    nested = fl.FilterList("AND", [pred, pos])
    combined = fl.FilterList("OR", [nested, sibling]).apply(frame, None)
    seq = pos.apply(pred.apply(frame, None), None)
    expect = _key_set(seq) | _key_set(sibling.apply(frame, None))
    assert _key_set(combined) == expect
