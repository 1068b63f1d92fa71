"""ParseFilter — the reference's string filter DSL, producing Filter
trees (which then compile to Column expressions).

Reference: hbase-client/.../filter/ParseFilter.java (865 LoC; grammar at
:126-165, filter registry :61-96). Example accepted here, mirroring the
reference's syntax with typed wide-table column names:

    "SingleColumnValueFilter('o_custkey', =, 'binary:85') AND PageFilter(10)"
    "PrefixFilter('row1') OR SKIP ValueFilter(>, 'binary:5')"
    "WHILE RowFilter(<, 'binary:row5')"

Operator precedence (highest first): SKIP/WHILE, AND, OR — as in the
reference. Comparators: 'binary:v' (typed: int/float auto-detected,
else string), 'binaryprefix:p', 'regexstring:re', 'substring:s', 'null'.

The idiomatic Spark alternative is simply a SQL WHERE string; this
parser exists for API parity with the reference's DSL.
"""

from __future__ import annotations

import re
from typing import Any, List

from hindex_spark import filters as fl

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<comma>,) |
        (?P<op><=|>=|!=|=|<|>) |
        (?P<string>'(?:[^'\\]|\\.)*') |
        (?P<number>-?\d+(?:\.\d+)?) |
        (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "SKIP", "WHILE"}


def _tokenize(s: str) -> List[tuple]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {pos}: {s[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(m.lastgroup)
        if kind == "string":
            text = text[1:-1].replace("\\'", "'")
        out.append((kind, text))
    return out


def _typed(v: str) -> Any:
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def _comparator(spec: Any):
    if not isinstance(spec, str):
        return fl.BinaryComparator(spec)
    low = spec.lower()
    if low == "null":
        return fl.NullComparator()
    if ":" in spec:
        kind, _, val = spec.partition(":")
        kind = kind.lower()
        if kind == "binary":
            return fl.BinaryComparator(_typed(val))
        if kind == "binaryprefix":
            return fl.BinaryPrefixComparator(val)
        if kind == "regexstring":
            return fl.RegexStringComparator(val)
        if kind == "substring":
            return fl.SubstringComparator(val)
    return fl.BinaryComparator(_typed(spec))


class _Parser:
    def __init__(self, tokens: List[tuple]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind):
        k, v = self.next()
        if k != kind:
            raise ValueError(f"expected {kind}, got {k}:{v}")
        return v

    # expr := term (OR term)*
    def expr(self) -> fl.Filter:
        left = self.term()
        parts = [left]
        while self.peek() == ("word", "OR"):
            self.next()
            parts.append(self.term())
        return parts[0] if len(parts) == 1 else fl.FilterList("OR", parts)

    # term := unary (AND unary)*
    def term(self) -> fl.Filter:
        parts = [self.unary()]
        while self.peek() == ("word", "AND"):
            self.next()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else fl.FilterList("AND", parts)

    # unary := SKIP unary | WHILE unary | '(' expr ')' | filter
    def unary(self) -> fl.Filter:
        k, v = self.peek()
        if (k, v) == ("word", "SKIP"):
            self.next()
            return fl.SkipFilter(self.unary())
        if (k, v) == ("word", "WHILE"):
            self.next()
            return fl.WhileMatchFilter(self.unary())
        if k == "lparen":
            self.next()
            e = self.expr()
            self.expect("rparen")
            return e
        return self.filter_call()

    def args(self) -> List[Any]:
        self.expect("lparen")
        out: List[Any] = []
        while True:
            k, v = self.peek()
            if k == "rparen":
                self.next()
                return out
            if k == "comma":
                self.next()
                continue
            if k == "string":
                out.append(("str", self.next()[1]))
            elif k == "number":
                out.append(("num", _typed(self.next()[1])))
            elif k == "op":
                out.append(("op", self.next()[1]))
            elif k == "word":
                out.append(("word", self.next()[1]))
            else:
                raise ValueError(f"bad arg token {k}:{v}")

    def filter_call(self) -> fl.Filter:
        name = self.expect("word")
        if name in _KEYWORDS:
            raise ValueError(f"unexpected keyword {name}")
        args = self.args()
        return _build(name, args)


def _val(a):
    return a[1]


def _to_bool(v) -> bool:
    """DSL booleans: accept true/false words (bool('false') is True in
    Python — the naive cast silently inverted HBase's defaults)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return bool(v)
    if isinstance(v, str):
        low = v.strip().lower()
        if low in ("true", "1", "yes"):
            return True
        if low in ("false", "0", "no", ""):
            return False
        raise ValueError(f"bad boolean in filter DSL: {v!r}")
    raise ValueError(f"bad boolean in filter DSL: {v!r}")


def _build(name: str, args: List[tuple]) -> fl.Filter:
    vals = [_val(a) for a in args]
    if name == "SingleColumnValueFilter":
        col, op, cmp_ = vals[0], vals[1], _comparator(vals[2])
        fim = _to_bool(vals[3]) if len(vals) > 3 else False
        lvo = _to_bool(vals[4]) if len(vals) > 4 else True
        return fl.SingleColumnValueFilter(col, op, cmp_, fim, lvo)
    if name == "SingleColumnValueExcludeFilter":
        col, op, cmp_ = vals[0], vals[1], _comparator(vals[2])
        fim = _to_bool(vals[3]) if len(vals) > 3 else False
        return fl.SingleColumnValueExcludeFilter(col, op, cmp_, fim)
    if name == "RowFilter":
        return fl.RowFilter(vals[0], _comparator(vals[1]))
    if name == "ValueFilter":
        return fl.ValueFilter(vals[0], _comparator(vals[1]))
    if name == "FamilyFilter":
        return fl.FamilyFilter(vals[0], _comparator(vals[1]))
    if name == "QualifierFilter":
        return fl.QualifierFilter(vals[0], _comparator(vals[1]))
    if name == "PrefixFilter":
        return fl.PrefixFilter(vals[0])
    if name == "ColumnPrefixFilter":
        return fl.ColumnPrefixFilter(vals[0])
    if name == "MultipleColumnPrefixFilter":
        return fl.MultipleColumnPrefixFilter(list(vals))
    if name == "ColumnRangeFilter":
        return fl.ColumnRangeFilter(vals[0], _to_bool(vals[1]), vals[2], _to_bool(vals[3]))
    if name == "ColumnPaginationFilter":
        return fl.ColumnPaginationFilter(int(vals[0]), int(vals[1]) if len(vals) > 1 else 0)
    if name == "ColumnCountGetFilter":
        return fl.ColumnCountGetFilter(int(vals[0]))
    if name == "PageFilter":
        return fl.PageFilter(int(vals[0]))
    if name == "InclusiveStopFilter":
        return fl.InclusiveStopFilter(_typed(str(vals[0])))
    if name == "TimestampsFilter":
        return fl.TimestampsFilter([int(v) for v in vals])
    if name == "KeyOnlyFilter":
        return fl.KeyOnlyFilter()
    if name == "FirstKeyOnlyFilter":
        return fl.FirstKeyOnlyFilter()
    if name == "RandomRowFilter":
        return fl.RandomRowFilter(float(vals[0]), int(vals[1]) if len(vals) > 1 else 42)
    if name == "FuzzyRowFilter":
        return fl.FuzzyRowFilter(vals[0])
    if name == "DependentColumnFilter":
        drop = _to_bool(vals[2]) if len(vals) > 2 else False
        return fl.DependentColumnFilter(vals[0], vals[1], drop)
    raise ValueError(f"unknown filter {name}")


def parse_filter(s: str) -> fl.Filter:
    """Parse a filter DSL string into a Filter tree."""
    p = _Parser(_tokenize(s))
    out = p.expr()
    if p.peek() != (None, None):
        raise ValueError(f"trailing tokens at {p.i}")
    return out
