"""Planner unit tests — pure logic, no Spark actions needed for
selection assertions (mirrors TestScanFilterEvaluator /
TestMultipleIndicesInScan's F1 fixture: idx1(c3,c4,c5,c6), idx2(c1),
idx3(c2), idx4(c2,c1))."""

import pytest

from hindex_spark import filters as fl
from hindex_spark.index.planner import (
    EmptyScan,
    IndexScan,
    MultiIndexExpression,
    NoIndexExpression,
    ScanFilterEvaluator,
    SetOp,
    SingleIndexExpression,
)
from hindex_spark.index.spec import IndexSpecification


def _f1_indices():
    idx1 = IndexSpecification("idx1")
    for c in ["c3", "c4", "c5", "c6"]:
        idx1.add_column(c)
    idx2 = IndexSpecification("idx2").add_column("c1")
    idx3 = IndexSpecification("idx3").add_column("c2")
    idx4 = IndexSpecification("idx4").add_column("c2").add_column("c1")
    return [idx1, idx2, idx3, idx4]


EV = ScanFilterEvaluator(_f1_indices())


def scvf(col, op, val):
    return fl.SingleColumnValueFilter(col, op, val, filter_if_missing=True)


def test_single_column_picks_fewest_columns_index():
    # c1 is served by idx2 (1 col), not idx4 (2 cols)
    plan = EV.evaluate(scvf("c1", fl.EQUAL, "a").index_tree(None))
    assert plan.used_indexes == ["idx2"]


def test_and_two_columns_uses_two_single_indexes():
    f = fl.FilterList("AND", [scvf("c1", fl.EQUAL, "a"), scvf("c2", fl.EQUAL, "b")])
    plan = EV.evaluate(f.index_tree(None))
    # idx4(c2,c1) covers both with ONE index — set-cover prefers it
    assert plan.used_indexes == ["idx4"]


def test_and_preferring_single_multicol_index():
    f = fl.FilterList(
        "AND", [scvf("c3", fl.EQUAL, "x"), scvf("c4", fl.EQUAL, "y"), scvf("c5", fl.GREATER, "m")]
    )
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx1"]
    scan = plan.root
    assert isinstance(scan, IndexScan)
    # equality prefix c3,c4 then range on c5
    assert scan.covered_columns == ["c3", "c4", "c5"]


def test_range_must_be_last_column():
    # range on c3 stops prefix matching: idx1 only covers c3
    f = fl.FilterList("AND", [scvf("c3", fl.GREATER, "x"), scvf("c4", fl.EQUAL, "y")])
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx1"]
    assert plan.root.covered_columns == ["c3"]


def test_or_all_or_nothing():
    # c6 alone has no index whose FIRST column is c6 -> whole OR unusable
    f = fl.FilterList("OR", [scvf("c1", fl.EQUAL, "a"), scvf("c6", fl.EQUAL, "z")])
    plan = EV.evaluate(f.index_tree(None))
    assert not plan.uses_index


def test_or_both_indexable():
    f = fl.FilterList("OR", [scvf("c1", fl.EQUAL, "a"), scvf("c2", fl.EQUAL, "b")])
    plan = EV.evaluate(f.index_tree(None))
    assert set(plan.used_indexes) == {"idx2", "idx3"}
    assert isinstance(plan.root, SetOp) and plan.root.op == "OR"


def test_contradiction_yields_empty_plan():
    f = fl.FilterList("AND", [scvf("c1", fl.GREATER, "m"), scvf("c1", fl.LESS, "b")])
    plan = EV.evaluate(f.index_tree(None))
    assert plan.is_empty and isinstance(plan.root, EmptyScan)


def test_range_merge_single_scan():
    f = fl.FilterList(
        "AND", [scvf("c1", fl.GREATER_OR_EQUAL, "b"), scvf("c1", fl.LESS, "m")]
    )
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx2"]
    cr = plan.root.conditions[0]
    assert cr.lower == "b" and cr.lower_inc and cr.upper == "m" and not cr.upper_inc


def test_and_partial_coverage_still_uses_index():
    # c6 not coverable standalone, c1 is -> index on c1 only
    f = fl.FilterList("AND", [scvf("c1", fl.EQUAL, "a"), scvf("c6", fl.EQUAL, "z")])
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx2"]


def test_non_indexable_comparator_kills_leaf():
    f = fl.SingleColumnValueFilter(
        "c1", fl.EQUAL, fl.RegexStringComparator("^a.*"), filter_if_missing=True
    )
    plan = EV.evaluate(f.index_tree(None))
    assert not plan.uses_index


def test_filter_if_missing_false_not_indexable():
    # NULL rows must survive; index range scan would drop them
    f = fl.SingleColumnValueFilter("c1", fl.EQUAL, "a", filter_if_missing=False)
    plan = EV.evaluate(f.index_tree(None))
    assert not plan.uses_index


def test_no_index_hint():
    plan = EV.evaluate(scvf("c1", fl.EQUAL, "a").index_tree(None), hint=NoIndexExpression())
    assert not plan.uses_index


def test_single_index_hint_forces_choice():
    plan = EV.evaluate(None, hint=SingleIndexExpression("idx4", equals={"c2": "b", "c1": "a"}))
    assert plan.used_indexes == ["idx4"]


def test_multi_index_hint():
    h = MultiIndexExpression(
        "OR",
        [
            SingleIndexExpression("idx2", equals={"c1": "a"}),
            SingleIndexExpression("idx3", equals={"c2": "b"}),
        ],
    )
    plan = EV.evaluate(None, hint=h)
    assert set(plan.used_indexes) == {"idx2", "idx3"}


def test_nested_and_flattening_detects_contradiction():
    # c1>m AND (c1<b AND c2=x): bounds split across nested ANDs
    f = fl.FilterList(
        "AND",
        [
            scvf("c1", fl.GREATER, "m"),
            fl.FilterList("AND", [scvf("c1", fl.LESS, "b"), scvf("c2", fl.EQUAL, "x")]),
        ],
    )
    plan = EV.evaluate(f.index_tree(None))
    assert plan.is_empty


def test_nested_and_flattening_merges_ranges():
    f = fl.FilterList(
        "AND",
        [
            scvf("c1", fl.GREATER_OR_EQUAL, "b"),
            fl.FilterList("AND", [scvf("c1", fl.LESS, "m")]),
        ],
    )
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx2"]
    cr = plan.root.conditions[0]
    assert cr.lower == "b" and cr.upper == "m"


def test_or_in_or_flattening():
    f = fl.FilterList(
        "OR",
        [
            scvf("c1", fl.EQUAL, "a"),
            fl.FilterList("OR", [scvf("c2", fl.EQUAL, "b"), scvf("c1", fl.EQUAL, "c")]),
        ],
    )
    plan = EV.evaluate(f.index_tree(None))
    assert set(plan.used_indexes) == {"idx2", "idx3"}
    # flattened: one OR with three scans, not nested OR-of-OR
    assert len(plan.root.children) == 3


def test_c2_prefers_single_column_idx3_over_idx4():
    plan = EV.evaluate(scvf("c2", fl.EQUAL, "b").index_tree(None))
    assert plan.used_indexes == ["idx3"]  # fewest columns wins


def test_all_four_columns_one_index():
    f = fl.FilterList(
        "AND",
        [
            scvf("c3", fl.EQUAL, "1"),
            scvf("c4", fl.EQUAL, "2"),
            scvf("c5", fl.EQUAL, "3"),
            scvf("c6", fl.EQUAL, "4"),
        ],
    )
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx1"]
    assert plan.root.covered_columns == ["c3", "c4", "c5", "c6"]


def test_nested_and_or_tree():
    f = fl.FilterList(
        "AND",
        [
            scvf("c3", fl.EQUAL, "x"),
            fl.FilterList("OR", [scvf("c1", fl.EQUAL, "a"), scvf("c2", fl.EQUAL, "b")]),
        ],
    )
    plan = EV.evaluate(f.index_tree(None))
    assert "idx1" in plan.used_indexes
    assert {"idx2", "idx3"} <= set(plan.used_indexes)
    assert isinstance(plan.root, SetOp) and plan.root.op == "AND"


def test_index_spec_derives_physical_from_families():
    # IndexSpecification.java:57-59,111-112: ttl = MIN over member
    # families, max_versions = MAX.
    from hindex_spark.catalog import FamilyDescriptor
    from hindex_spark.index.spec import IndexSpecification

    spec = IndexSpecification("idx_phys").add_column("cf1_a").add_column("cf2_b")
    spec.derive_physical(
        [FamilyDescriptor("cf1", max_versions=3, ttl=3600),
         FamilyDescriptor("cf2", max_versions=1, ttl=600)]
    )
    assert spec.ttl == 600 and spec.max_versions == 3
    spec.derive_physical([FamilyDescriptor("cf1", max_versions=2, ttl=None)])
    assert spec.ttl is None and spec.max_versions == 2


def test_or_same_column_range_grouping():
    """testORFiltersGrouping (TestScanFilterEvaluator.java:538): OR
    bounds on one column whose intervals union into a single range merge
    into ONE index probe with the widened bound."""
    # c1='10' OR c1<'10'  ->  one scan, upper bound <= '10'
    f = fl.FilterList("OR", [
        fl.SingleColumnValueFilter("c1", fl.EQUAL, "10", filter_if_missing=True),
        fl.SingleColumnValueFilter("c1", fl.LESS, "10", filter_if_missing=True),
    ])
    plan = EV.evaluate(f.index_tree(None))
    assert isinstance(plan.root, IndexScan), plan.root
    cr = plan.root.conditions[0]
    assert cr.upper == "10" and cr.upper_inc and cr.lower is None

    # overlapping opens merge too: c1>'3' OR c1>'5' -> one scan > '3'
    f = fl.FilterList("OR", [
        fl.SingleColumnValueFilter("c1", fl.GREATER, "5", filter_if_missing=True),
        fl.SingleColumnValueFilter("c1", fl.GREATER, "3", filter_if_missing=True),
    ])
    plan = EV.evaluate(f.index_tree(None))
    assert isinstance(plan.root, IndexScan)
    cr = plan.root.conditions[0]
    assert cr.lower == "3" and not cr.lower_inc and cr.upper is None

    # disjoint intervals stay separate scans
    f = fl.FilterList("OR", [
        fl.SingleColumnValueFilter("c1", fl.LESS, "3", filter_if_missing=True),
        fl.SingleColumnValueFilter("c1", fl.GREATER, "5", filter_if_missing=True),
    ])
    plan = EV.evaluate(f.index_tree(None))
    assert isinstance(plan.root, SetOp) and plan.root.op == "OR"
    assert len(plan.root.children) == 2

    # a union that covers the whole line has no leaf form: falls back to
    # the original (still sound) separate scans
    f = fl.FilterList("OR", [
        fl.SingleColumnValueFilter("c1", fl.LESS, "5", filter_if_missing=True),
        fl.SingleColumnValueFilter("c1", fl.GREATER_OR_EQUAL, "5", filter_if_missing=True),
    ])
    plan = EV.evaluate(f.index_tree(None))
    assert plan.uses_index  # and the property suite proves soundness


def test_or_mixed_type_comparands_fall_back_to_separate_scans():
    """c1='a' OR c1=5: the comparands don't order, so the same-column
    OR-merge (interval union) is impossible — the planner must fall back
    to separate per-branch scans on idx2 instead of raising TypeError
    mid-planning (a pathological filter must never crash a query)."""
    f = fl.FilterList("OR", [scvf("c1", fl.EQUAL, "a"), scvf("c1", fl.EQUAL, 5)])
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx2"]
    # both branches planned (a union of two probes)
    assert isinstance(plan.root, SetOp) and plan.root.op == "OR"
    assert len(plan.root.children) == 2


def test_or_mixed_type_with_range_branch_falls_back():
    f = fl.FilterList(
        "OR",
        [
            scvf("c1", fl.GREATER, "m"),
            scvf("c1", fl.LESS_OR_EQUAL, 10),
            scvf("c1", fl.EQUAL, "a"),
        ],
    )
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx2"]


def test_or_same_type_still_merges():
    # sanity: the fallback did not disable the merge for orderable values
    f = fl.FilterList(
        "OR", [scvf("c1", fl.EQUAL, "m"), scvf("c1", fl.LESS, "m")]
    )
    plan = EV.evaluate(f.index_tree(None))
    assert plan.used_indexes == ["idx2"]
    cr = plan.root.conditions[0]
    assert cr.upper == "m" and cr.upper_inc and cr.lower is None


def test_equal_beats_range_on_same_column():
    # TestScanFilterEvaluator.testShouldTakeOnlyTheEqualConditionWhenGreaterAlsoComes
    # (+ ...WhenLesserAlsoComes): an AND carrying both an equals and a
    # range on one column plans a POINT probe at the equal value.
    for rng_op, rng_val in ((fl.GREATER, "a"), (fl.LESS, "z")):
        f = fl.FilterList("AND", [scvf("c1", fl.EQUAL, "k"), scvf("c1", rng_op, rng_val)])
        plan = EV.evaluate(f.index_tree(None))
        assert plan.used_indexes == ["idx2"]
        cr = plan.root.conditions[0]
        assert cr.has_eq and cr.eq == "k"


def test_two_greaters_take_highest_two_lessers_take_lowest():
    # testShouldTakeOnlyTheHighestFilterWhenTwoGreaterConditonsAreFound /
    # ...LowestFilterWhenTwoLesserConditonsAreFound
    f = fl.FilterList("AND", [scvf("c1", fl.GREATER, "b"), scvf("c1", fl.GREATER, "f")])
    cr = EV.evaluate(f.index_tree(None)).root.conditions[0]
    assert cr.lower == "f" and not cr.lower_inc
    f2 = fl.FilterList(
        "AND", [scvf("c1", fl.LESS_OR_EQUAL, "p"), scvf("c1", fl.LESS, "g")]
    )
    cr2 = EV.evaluate(f2.index_tree(None)).root.conditions[0]
    assert cr2.upper == "g" and not cr2.upper_inc


def test_wrong_range_direction_yields_empty():
    # testShouldNotIncludeFilterIfTheRangeConditionIsWrong: lower > upper
    # is a contradiction -> empty scan, no table touch needed.
    f = fl.FilterList("AND", [scvf("c1", fl.GREATER, "x"), scvf("c1", fl.LESS, "b")])
    plan = EV.evaluate(f.index_tree(None))
    assert plan.is_empty
