"""Property-based planner soundness (hypothesis): for ANY random AND/OR
filter tree over the F1 fixture's columns, applying the chosen index
plan then the full predicate must yield exactly the rows the predicate
alone selects — i.e. the index rowkey set is always a superset of the
true result and never drops a matching row.

Evaluated with a pure-Python interpreter of the plan nodes (no Spark per
example, so hundreds of cases run in seconds). The Spark execution of
the same nodes is covered by test_index_e2e.py.
"""

import string

from hypothesis import given, settings, strategies as st

from hindex_spark import filters as fl
from hindex_spark.index.planner import EmptyScan, IndexScan, ScanFilterEvaluator, SetOp
from hindex_spark.index.spec import IndexSpecification


def _f1_indices():
    from hindex_spark.index.spec import SeparatorPartition

    idx1 = IndexSpecification("idx1")
    for c in ["c3", "c4", "c5", "c6"]:
        idx1.add_column(c)
    return [
        idx1,
        IndexSpecification("idx2").add_column("c1"),
        IndexSpecification("idx3").add_column("c2"),
        IndexSpecification("idx4").add_column("c2").add_column("c1"),
        # a partition expression index on c6 — raw-column predicates on
        # c6 must never be served by it (review-fix guard)
        IndexSpecification("idx5").add_column(
            "c6", "String", value_partition=SeparatorPartition("-", 1)
        ),
    ]


EV = ScanFilterEvaluator(_f1_indices())
COLS = ["c1", "c2", "c3", "c4", "c5", "c6"]
VALUES = list(string.ascii_lowercase[:6])  # 'a'..'f'

# deterministic dataset: every row a dict col->value (some NULLs)
ROWS = []
_seed = 0
for i in range(200):
    _seed = (_seed * 1103515245 + 12345) % (2 ** 31)
    row = {"rowkey": f"r{i:03d}"}
    for j, c in enumerate(COLS):
        v = (_seed >> (j * 4)) % (len(VALUES) + 2)
        row[c] = VALUES[v] if v < len(VALUES) else None
    ROWS.append(row)


# --- pure-Python evaluation ---------------------------------------------------


def _leaf_holds(row, leaf):
    v = row.get(leaf.column)
    if v is None:
        return False
    if leaf.op == fl.EQUAL:
        return v == leaf.value
    if leaf.op == fl.GREATER:
        return v > leaf.value
    if leaf.op == fl.GREATER_OR_EQUAL:
        return v >= leaf.value
    if leaf.op == fl.LESS:
        return v < leaf.value
    if leaf.op == fl.LESS_OR_EQUAL:
        return v <= leaf.value
    raise AssertionError(leaf.op)


def _filter_holds(row, f):
    if isinstance(f, fl.SingleColumnValueFilter):
        v = row.get(f.column)
        if v is None:
            return not f.filter_if_missing
        if f.op == fl.EQUAL:
            return v == f.comparator
        if f.op == fl.GREATER:
            return v > f.comparator
        if f.op == fl.GREATER_OR_EQUAL:
            return v >= f.comparator
        if f.op == fl.LESS:
            return v < f.comparator
        if f.op == fl.LESS_OR_EQUAL:
            return v <= f.comparator
        raise AssertionError(f.op)
    if isinstance(f, fl.RowFilter):
        v, t = row["rowkey"], f.comparator.value
        return {
            fl.EQUAL: v == t, fl.GREATER: v > t, fl.GREATER_OR_EQUAL: v >= t,
            fl.LESS: v < t, fl.LESS_OR_EQUAL: v <= t,
        }[f.op]
    if isinstance(f, fl.FilterList):
        results = [_filter_holds(row, g) for g in f.filters]
        return all(results) if f.operator == "AND" else any(results)
    raise AssertionError(type(f))


def _range_holds(row, cr, colname):
    v = row.get(colname)
    if v is None:
        return False
    if cr.has_eq:
        return v == cr.eq
    ok = True
    if cr.lower is not None:
        ok = ok and (v >= cr.lower if cr.lower_inc else v > cr.lower)
    if cr.upper is not None:
        ok = ok and (v <= cr.upper if cr.upper_inc else v < cr.upper)
    return ok


def _plan_rowkeys(node):
    if isinstance(node, IndexScan):
        # index table = projection of rows with non-null first indexed col
        name_by_source = {c.column: c.indexed_name for c in node.index.columns}
        first = node.index.columns[0].column
        keys = set()
        for row in ROWS:
            if row.get(first) is None:
                continue
            if all(_range_holds(row, cr, cr.column) for cr in node.conditions):
                keys.add(row["rowkey"])
        return keys
    if isinstance(node, SetOp):
        child_sets = [_plan_rowkeys(ch) for ch in node.children]
        out = child_sets[0]
        for s in child_sets[1:]:
            out = (out & s) if node.op == "AND" else (out | s)
        return out
    raise AssertionError(type(node))


# --- random filter trees ------------------------------------------------------

_OPS = [fl.EQUAL, fl.GREATER, fl.GREATER_OR_EQUAL, fl.LESS, fl.LESS_OR_EQUAL]

scvf_st = st.builds(
    lambda c, op, v, fim: fl.SingleColumnValueFilter(c, op, v, filter_if_missing=fim),
    st.sampled_from(COLS),
    st.sampled_from(_OPS),
    st.sampled_from(VALUES),
    st.booleans(),
)

# non-SCVF leaves (NON_INDEXABLE): under OR they must poison the whole
# branch to a full scan; under AND they must degrade to residual
# predicates — either way the plan stays sound
rowfilter_st = st.builds(
    lambda op, i: fl.RowFilter(op, fl.BinaryComparator(f"r{i:03d}")),
    st.sampled_from(_OPS),
    st.integers(min_value=0, max_value=199),
)

leaf_st = st.one_of(scvf_st, scvf_st, scvf_st, rowfilter_st)  # ~25% poison

tree_st = st.recursive(
    leaf_st,
    lambda children: st.builds(
        lambda op, fs: fl.FilterList(op, fs),
        st.sampled_from(["AND", "OR"]),
        st.lists(children, min_size=2, max_size=4),
    ),
    max_leaves=8,
)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(tree_st)
def test_index_plan_never_changes_results(f):
    truth = {r["rowkey"] for r in ROWS if _filter_holds(r, f)}
    plan = EV.evaluate(f.index_tree(None))
    if not plan.uses_index:
        return  # plain scan — trivially sound
    if plan.is_empty:
        assert truth == set(), f"contradiction plan dropped rows: {sorted(truth)[:5]}"
        return
    candidate = _plan_rowkeys(plan.root)
    # soundness: the semi-join keyset must contain every true row
    assert truth <= candidate, (
        f"index plan dropped rows {sorted(truth - candidate)[:5]} "
        f"(indexes {plan.used_indexes})"
    )
    # and applying the residual predicate recovers exactly the truth
    final = {k for k in candidate if _filter_holds(next(r for r in ROWS if r["rowkey"] == k), f)}
    assert final == truth
