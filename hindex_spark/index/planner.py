"""Index-selection planner: filter tree -> index scans -> semi-join plan.

This is the Spark re-expression of the reference's ScanFilterEvaluator
(hbase-secondaryindex/.../coprocessor/regionserver/ScanFilterEvaluator.java,
1187 LoC) and FilterGroupingWorker (FilterGroupingWorker.java:48-104).
Semantics preserved:

  * range merging + contradiction detection per column
    (FilterGroupingWorker.group:56-104): ``c>10 AND c<5`` -> empty plan;
  * multi-column index usable with EQUALS on a leading prefix and at most
    one range on the next column (ScanFilterEvaluator.java:452-462);
  * per-column best-fit = index whose first column matches with fewest
    total columns (selectBestFitIndexForColumn:1064-1151);
  * AND: cover the predicate columns with the fewest indexes
    (handleANDCondition:527-562, combination search :634-1020) —
    partially-covered ANDs still use whatever indexes apply (the residual
    filter is re-applied to fetched rows, so coverage only needs to be a
    superset);
  * OR: all-or-nothing — any non-indexable branch kills index use for the
    whole OR (handleORCondition:506-526);
  * explicit hints: SingleIndexExpression / MultiIndexExpression /
    NoIndexExpression (index/client/*.java, consumed at
    convertIdxExpToFilterNode:149-218).

Execution shape: each chosen index contributes a range scan on its sorted
projection table -> a DataFrame of user rowkeys; AND intersects, OR
unions (the IndexRegionScannerForAND/OR analogs, set ops over rowkey
streams); the result left-semi-joins the data table on rowkey. At scale
the rowkey set is usually small and AQE converts the semi-join to a
broadcast; both tables bucketed by rowkey avoid the shuffle entirely.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hindex_spark.filters import (
    EQUAL,
    GREATER,
    GREATER_OR_EQUAL,
    LESS,
    LESS_OR_EQUAL,
    NON_INDEXABLE,
    AndNode,
    Leaf,
    OrNode,
)
from hindex_spark.index.spec import IndexSpecification

# ---------------------------------------------------------------------------
# Hints (index/client/SingleIndexExpression.java, MultiIndexExpression.java,
# NoIndexExpression.java)
# ---------------------------------------------------------------------------


@dataclass
class NoIndexExpression:
    """Force a plain scan (Constants.java:60 attribute)."""


@dataclass
class SingleIndexExpression:
    """Force one index: equality values on the leading prefix plus an
    optional range on the following column."""

    index_name: str
    equals: Dict[str, Any] = field(default_factory=dict)
    range_column: Optional[str] = None
    range_lower: Any = None
    range_lower_inclusive: bool = True
    range_upper: Any = None
    range_upper_inclusive: bool = True


@dataclass
class MultiIndexExpression:
    """AND/OR combination of index expressions."""

    operator: str  # "AND" | "OR"
    children: List[Any] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Normalized per-column ranges (FilterGroupingWorker analog)
# ---------------------------------------------------------------------------


@dataclass
class ColumnRange:
    column: str
    eq: Any = None
    has_eq: bool = False
    lower: Any = None
    lower_inc: bool = True
    upper: Any = None
    upper_inc: bool = True
    contradiction: bool = False

    def absorb(self, op: str, value: Any) -> None:
        """Merge one more bound on this column; detect contradictions
        (FilterGroupingWorker.group:56-104)."""
        if op == EQUAL:
            if self.has_eq and self.eq != value:
                self.contradiction = True
            self.has_eq = True
            self.eq = value
        elif op in (GREATER, GREATER_OR_EQUAL):
            inc = op == GREATER_OR_EQUAL
            if self.lower is None or value > self.lower or (value == self.lower and not inc):
                self.lower, self.lower_inc = value, inc
        elif op in (LESS, LESS_OR_EQUAL):
            inc = op == LESS_OR_EQUAL
            if self.upper is None or value < self.upper or (value == self.upper and not inc):
                self.upper, self.upper_inc = value, inc
        self._check()

    def _check(self) -> None:
        if self.has_eq:
            if self.lower is not None and (
                self.eq < self.lower or (self.eq == self.lower and not self.lower_inc)
            ):
                self.contradiction = True
            if self.upper is not None and (
                self.eq > self.upper or (self.eq == self.upper and not self.upper_inc)
            ):
                self.contradiction = True
        elif self.lower is not None and self.upper is not None:
            if self.lower > self.upper or (
                self.lower == self.upper and not (self.lower_inc and self.upper_inc)
            ):
                self.contradiction = True

    @property
    def is_equality(self) -> bool:
        return self.has_eq

    def to_condition(self, col_name: str):
        c = F.col(col_name)
        if self.has_eq:
            return c == F.lit(self.eq)
        pred = None
        if self.lower is not None:
            p = c >= self.lower if self.lower_inc else c > self.lower
            pred = p
        if self.upper is not None:
            p = c <= self.upper if self.upper_inc else c < self.upper
            pred = p if pred is None else (pred & p)
        return pred if pred is not None else F.lit(True)


def group_leaves(leaves: Sequence[Leaf]) -> Dict[str, ColumnRange]:
    out: Dict[str, ColumnRange] = {}
    for leaf in leaves:
        cr = out.setdefault(leaf.column, ColumnRange(leaf.column))
        cr.absorb(leaf.op, leaf.value)
    return out


# ---------------------------------------------------------------------------
# Plan nodes
# ---------------------------------------------------------------------------


@dataclass
class IndexScan:
    """Range scan on one index table covering some predicate columns."""

    index: IndexSpecification
    # indexed_name -> ColumnRange, in index column order (prefix equalities
    # then at most one range)
    conditions: List[ColumnRange] = field(default_factory=list)

    @property
    def covered_columns(self) -> List[str]:
        return [c.column for c in self.conditions]

    def rowkeys(self, index_tables: Dict[str, DataFrame], rowkey_col: str) -> DataFrame:
        df = index_tables[self.index.name]
        pred = None
        # conditions align with the index's leading columns by construction;
        # predicates may reference either the source column or (for
        # value-partition expression indexes) the indexed name directly
        name_by_source = {c.column: c.indexed_name for c in self.index.columns}
        name_by_source.update({c.indexed_name: c.indexed_name for c in self.index.columns})
        for cr in self.conditions:
            p = cr.to_condition(name_by_source[cr.column])
            pred = p if pred is None else (pred & p)
        if pred is not None:
            df = df.filter(pred)
        return df.select(rowkey_col)


@dataclass
class EmptyScan:
    """Contradictory predicate -> provably empty result."""


@dataclass
class SetOp:
    op: str  # "AND" | "OR" — IndexRegionScannerForAND / ForOR analogs
    children: List[Any] = field(default_factory=list)


@dataclass
class IndexPlan:
    """The chosen plan. ``used_indexes`` is the test spy mirroring
    IndexRegionObserver.java:93-104's seek-point hooks."""

    root: Any  # IndexScan | SetOp | EmptyScan | None
    rowkey_col: str = "rowkey"

    @property
    def uses_index(self) -> bool:
        return self.root is not None

    @property
    def is_empty(self) -> bool:
        return isinstance(self.root, EmptyScan)

    @property
    def used_indexes(self) -> List[str]:
        names: List[str] = []

        def walk(node):
            if isinstance(node, IndexScan):
                if node.index.name not in names:
                    names.append(node.index.name)
            elif isinstance(node, SetOp):
                for ch in node.children:
                    walk(ch)

        walk(self.root)
        return names

    def rowkeys(self, index_tables: Dict[str, DataFrame]) -> Optional[DataFrame]:
        def walk(node) -> Optional[DataFrame]:
            if isinstance(node, IndexScan):
                return node.rowkeys(index_tables, self.rowkey_col)
            if isinstance(node, SetOp):
                kids = [walk(ch) for ch in node.children]
                kids = [k for k in kids if k is not None]
                if not kids:
                    return None
                out = kids[0]
                for k in kids[1:]:
                    if node.op == "AND":
                        # sorted-stream intersection -> join on rowkey
                        out = out.join(k, self.rowkey_col, "left_semi")
                    else:
                        out = out.unionByName(k)
                if node.op == "OR":
                    out = out.distinct()
                return out
            return None

        if isinstance(self.root, EmptyScan):
            return None
        return walk(self.root)

    def apply(self, df: DataFrame, index_tables: Dict[str, DataFrame]) -> DataFrame:
        """Semi-join the data table with the index rowkey set (the
        SeekPointFetcher analog: seek the main scan to index hits)."""
        if isinstance(self.root, EmptyScan):
            return df.filter(F.lit(False))
        keys = self.rowkeys(index_tables)
        if keys is None:
            return df
        return df.join(keys, self.rowkey_col, "left_semi")


# ---------------------------------------------------------------------------
# The evaluator
# ---------------------------------------------------------------------------


class ScanFilterEvaluator:
    """filter condition tree + available indexes -> IndexPlan."""

    def __init__(self, indices: Sequence[IndexSpecification], rowkey_col: str = "rowkey"):
        self.indices = list(indices)
        self.rowkey_col = rowkey_col

    # -- public ---------------------------------------------------------

    def evaluate(self, tree, hint=None) -> IndexPlan:
        """tree: Leaf | AndNode | OrNode | NON_INDEXABLE (from
        Filter.index_tree). hint: None | NoIndexExpression |
        SingleIndexExpression | MultiIndexExpression."""
        if isinstance(hint, NoIndexExpression):
            return IndexPlan(None, self.rowkey_col)
        if hint is not None:
            return IndexPlan(self._from_hint(hint), self.rowkey_col)
        if tree is NON_INDEXABLE or tree is None:
            return IndexPlan(None, self.rowkey_col)
        return IndexPlan(self._plan(tree), self.rowkey_col)

    # -- hint path (convertIdxExpToFilterNode:149-218) --------------------

    def _from_hint(self, hint):
        if isinstance(hint, SingleIndexExpression):
            spec = next((i for i in self.indices if i.name == hint.index_name), None)
            if spec is None:
                raise ValueError(f"unknown index {hint.index_name}")
            conds: List[ColumnRange] = []
            names = [c.indexed_name for c in spec.columns]
            for i, n in enumerate(names):
                if n in hint.equals:
                    cr = ColumnRange(n)
                    cr.absorb(EQUAL, hint.equals[n])
                    conds.append(cr)
                elif hint.range_column == n:
                    cr = ColumnRange(n)
                    if hint.range_lower is not None:
                        cr.absorb(
                            GREATER_OR_EQUAL if hint.range_lower_inclusive else GREATER,
                            hint.range_lower,
                        )
                    if hint.range_upper is not None:
                        cr.absorb(
                            LESS_OR_EQUAL if hint.range_upper_inclusive else LESS,
                            hint.range_upper,
                        )
                    conds.append(cr)
                    break
                else:
                    break
            if not conds:
                raise ValueError("hint covers no leading index column")
            # conditions carry index-local names: map through identity
            scan = IndexScan(spec, conds)
            return scan
        if isinstance(hint, MultiIndexExpression):
            kids = [self._from_hint(ch) for ch in hint.children]
            return SetOp(hint.operator, kids)
        raise ValueError(f"unknown hint {hint!r}")

    # -- planning --------------------------------------------------------

    @staticmethod
    def _flatten(node):
        """Merge same-operator nested lists (ScanFilterEvaluator.
        doFiltersRestruct:432-449 / FilterGroupingWorker.java:84-104):
        AND-in-AND and OR-in-OR collapse so bounds on one column meet in
        one group — without this, ``c1>5 AND (c1<3 AND ...)`` would miss
        the contradiction."""
        if isinstance(node, AndNode):
            kids = []
            for ch in node.children:
                ch = ScanFilterEvaluator._flatten(ch)
                if isinstance(ch, AndNode):
                    kids.extend(ch.children)
                else:
                    kids.append(ch)
            return AndNode(kids)
        if isinstance(node, OrNode):
            kids = []
            for ch in node.children:
                ch = ScanFilterEvaluator._flatten(ch)
                if isinstance(ch, OrNode):
                    kids.extend(ch.children)
                else:
                    kids.append(ch)
            return OrNode(kids)
        return node

    @staticmethod
    def _merge_or_leaves(leaves: List[Leaf]) -> List[Any]:
        """Merge same-column OR leaves whose intervals union into one
        range (FilterGroupingWorker via doFiltersRestruct — the
        reference's testORFiltersGrouping: ``c='10' OR c<'10'`` becomes
        ONE SingleColumnRangeFilter with <= bound). Fewer index probes,
        identical row set. Disjoint intervals (``c<'5' OR c>'9'``) stay
        separate scans; a merge that would become unbounded on both
        sides (always-true over non-nulls) is left unmerged — there is
        no leaf form for it, and correctness is unaffected.

        Mixed-type comparands on one column (``c1='a' OR c1=5``) have no
        ordering, hence no interval union: that column's branches fall
        back to separate unmerged scans instead of raising — same shape
        as the unbounded-union fallback.

        Returns planner nodes: Leaf (single bound / equality) or AndNode
        of the two bound leaves."""
        by_col: Dict[str, List[Leaf]] = {}
        for lf in leaves:
            by_col.setdefault(lf.column, []).append(lf)
        out: List[Any] = []
        for col, lfs in by_col.items():
            try:
                out.extend(ScanFilterEvaluator._merge_col_leaves(col, lfs))
            except TypeError:
                out.extend(lfs)
        return out

    @staticmethod
    def _merge_col_leaves(col: str, lfs: List[Leaf]) -> List[Any]:
        """Interval-union the leaves of ONE column. Raises TypeError when
        the comparands don't mutually order (mixed types) — the caller
        plans those branches unmerged."""

        def interval(lf):
            # (lo, lo_inc, hi, hi_inc); None = unbounded
            if lf.op == EQUAL:
                return [lf.value, True, lf.value, True]
            if lf.op == GREATER:
                return [lf.value, False, None, False]
            if lf.op == GREATER_OR_EQUAL:
                return [lf.value, True, None, False]
            if lf.op == LESS:
                return [None, False, lf.value, False]
            return [None, False, lf.value, True]  # LESS_OR_EQUAL

        out: List[Any] = []
        # unbounded-below first, then by lower bound (inclusive first)
        ivs = sorted(
            (interval(lf) for lf in lfs),
            key=lambda iv: (0, 0, 0) if iv[0] is None else (1, iv[0], not iv[1]),
        )
        merged = [ivs[0]]
        for lo, lo_inc, hi, hi_inc in ivs[1:]:
            c = merged[-1]
            chi, chi_inc = c[2], c[3]
            # current reaches +inf, or next starts before/at its end
            joins = chi is None or lo is None or lo < chi or (
                lo == chi and (lo_inc or chi_inc)
            )
            if joins:
                if chi is not None and (
                    hi is None or hi > chi or (hi == chi and hi_inc and not chi_inc)
                ):
                    c[2], c[3] = hi, hi_inc
                if lo is None:
                    c[0], c[1] = None, False
            else:
                merged.append([lo, lo_inc, hi, hi_inc])
        for lo, lo_inc, hi, hi_inc in merged:
            if lo is None and hi is None:
                # unbounded union: fall back to the original leaves
                return list(lfs)
            if lo is not None and lo == hi and lo_inc and hi_inc:
                out.append(Leaf(col, EQUAL, lo))
                continue
            parts = []
            if lo is not None:
                parts.append(Leaf(col, GREATER_OR_EQUAL if lo_inc else GREATER, lo))
            if hi is not None:
                parts.append(Leaf(col, LESS_OR_EQUAL if hi_inc else LESS, hi))
            out.append(parts[0] if len(parts) == 1 else AndNode(parts))
        return out

    def _plan(self, node):
        node = self._flatten(node)
        if isinstance(node, Leaf):
            return self._plan_and([node], [])
        if isinstance(node, AndNode):
            leaves = [c for c in node.children if isinstance(c, Leaf)]
            subs = [c for c in node.children if isinstance(c, (AndNode, OrNode))]
            return self._plan_and(leaves, subs)
        if isinstance(node, OrNode):
            leaves = [c for c in node.children if isinstance(c, Leaf)]
            others = [c for c in node.children if not isinstance(c, Leaf)]
            children = self._merge_or_leaves(leaves) + others if leaves else others
            kids = []
            for ch in children:
                p = self._plan(ch)
                if p is None:
                    return None  # OR all-or-nothing
                kids.append(p)
            if any(isinstance(k, EmptyScan) for k in kids):
                kids = [k for k in kids if not isinstance(k, EmptyScan)]
                if not kids:
                    return EmptyScan()
            return kids[0] if len(kids) == 1 else SetOp("OR", kids)
        return None

    def _plan_and(self, leaves: List[Leaf], subtrees: List[Any]):
        ranges = group_leaves(leaves)
        if any(cr.contradiction for cr in ranges.values()):
            return EmptyScan()

        scans = self._cover(ranges)
        children: List[Any] = list(scans)
        for sub in subtrees:
            p = self._plan(sub)
            if p is None:
                continue  # residual predicate still applied post-join
            if isinstance(p, EmptyScan):
                return EmptyScan()
            children.append(p)
        if not children:
            return None
        return children[0] if len(children) == 1 else SetOp("AND", children)

    def _usable_prefix(self, spec: IndexSpecification, ranges: Dict[str, ColumnRange]):
        """Columns of ``spec`` (in order) satisfiable as equality-prefix +
        at most one trailing range (ScanFilterEvaluator.java:452-462).
        Returns the list of ColumnRanges used, or []."""
        used: List[ColumnRange] = []
        for cq in spec.columns:
            cr = ranges.get(cq.indexed_name)
            if cr is None and cq.value_partition is None:
                # raw-column predicates may only match non-partition index
                # columns: a predicate on c_sep must NOT be served by an
                # index on split(c_sep)[n] — the index holds the part, not
                # the value, and the scan would be silently wrong
                cr = ranges.get(cq.column)
            if cr is None:
                break
            used.append(cr)
            if not cr.is_equality:
                break  # range must be last
        return used

    def _cover(self, ranges: Dict[str, ColumnRange]) -> List[IndexScan]:
        """Cover predicate columns with the fewest indexes
        (handleANDCondition:527-562 + combination search :634-1020).
        Exhaustive over small index sets, greedy fallback."""
        if not ranges:
            return []
        candidates: List[IndexScan] = []
        for spec in self.indices:
            used = self._usable_prefix(spec, ranges)
            if used:
                candidates.append(IndexScan(spec, used))
        if not candidates:
            return []
        # fewest-columns-wins tie-break (selectBestFitIndexForColumn:
        # 1064-1151): order candidates so equal-coverage choices resolve
        # to the narrowest index deterministically
        candidates.sort(key=lambda s: (len(s.index.columns), s.index.name))
        target = set(ranges.keys())

        def coverage(sel: Sequence[IndexScan]) -> set:
            out = set()
            for s in sel:
                out.update(s.covered_columns)
            return out

        best: Optional[List[IndexScan]] = None
        if len(candidates) <= 10:
            # exact: smallest subset with maximal coverage, tie-break by
            # fewer total index columns (fewest-columns-wins,
            # selectBestFitIndexForColumn:1064-1151)
            best_cov = -1
            for r in range(1, len(candidates) + 1):
                for combo in itertools.combinations(candidates, r):
                    cov = coverage(combo)
                    # drop combos with a redundant member
                    if any(
                        coverage([c for c in combo if c is not m]) == cov for m in combo
                    ):
                        continue
                    key = len(cov)
                    if key > best_cov or (
                        key == best_cov
                        and best is not None
                        and r < len(best)
                    ):
                        best_cov, best = key, list(combo)
                if best is not None and best_cov == len(target) and len(best) <= r:
                    break
        if best is None:
            # greedy
            chosen: List[IndexScan] = []
            covered: set = set()
            pool = list(candidates)
            while pool:
                pool.sort(
                    key=lambda s: (
                        -len(set(s.covered_columns) - covered),
                        len(s.index.columns),
                    )
                )
                top = pool.pop(0)
                gain = set(top.covered_columns) - covered
                if not gain:
                    break
                chosen.append(top)
                covered |= gain
            best = chosen
        return best
