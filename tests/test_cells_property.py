"""Model-based property test for cell resolution: random mutation
histories checked against an independent Python reference
implementation of the ScanQueryMatcher contract."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hindex_spark import cells as cm

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)

ROWS = ["r1", "r2"]
CFS = ["cf1"]
QUALS = ["qa", "qb"]
TSS = [1, 2, 3, 4, 5]

put_st = st.tuples(
    st.just("put"),
    st.sampled_from(ROWS),
    st.sampled_from(CFS),
    st.sampled_from(QUALS),
    st.sampled_from(TSS),
    st.sampled_from(["v1", "v2", "v3"]),
)
del_st = st.tuples(
    st.sampled_from([cm.DELETE_VERSION, cm.DELETE_COLUMN, cm.DELETE_FAMILY, cm.DELETE_ROW]),
    st.sampled_from(ROWS),
    st.sampled_from(CFS),
    st.sampled_from(QUALS),
    st.sampled_from(TSS),
    st.just(None),
)

history_st = st.lists(st.one_of(put_st, del_st), min_size=1, max_size=12)


def _model_resolve(ops, max_versions):
    """Reference implementation in plain Python."""
    puts = [(r, c, q, t, v) for (op, r, c, q, t, v) in ops if op == "put"]
    # dedupe identical coordinates (same (r,c,q,t) → value per engine
    # tie-break: max value string)
    best = {}
    for r, c, q, t, v in puts:
        k = (r, c, q, t)
        if k not in best or v > best[k]:
            best[k] = v
    visible = []
    for (r, c, q, t), v in best.items():
        masked = False
        for (op, dr, dc, dq, dt, _) in ops:
            if op == "put":
                continue
            if op == cm.DELETE_VERSION and (dr, dc, dq, dt) == (r, c, q, t):
                masked = True
            elif op == cm.DELETE_COLUMN and (dr, dc, dq) == (r, c, q) and t <= dt:
                masked = True
            elif op == cm.DELETE_FAMILY and (dr, dc) == (r, c) and t <= dt:
                masked = True
            elif op == cm.DELETE_ROW and dr == r and t <= dt:
                masked = True
        if not masked:
            visible.append((r, c, q, t, v))
    # version counting: newest max_versions per (r, c, q); ties broken by
    # value desc (matches the engine's deterministic tie-break)
    out = set()
    bycol = {}
    for item in visible:
        bycol.setdefault(item[:3], []).append(item)
    for _, items in bycol.items():
        items.sort(key=lambda x: (-x[3], "" if x[4] is None else x[4]), reverse=False)
        items.sort(key=lambda x: (x[3], x[4] or ""), reverse=True)
        out.update(items[:max_versions])
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(history_st, st.sampled_from([1, 2]))
def test_resolve_matches_model(spark, ops, max_versions):
    rows = []
    for (op, r, c, q, t, v) in ops:
        if op == cm.DELETE_FAMILY:
            rows.append((r, c, None, t, op, None))
        elif op == cm.DELETE_ROW:
            rows.append((r, None, None, t, op, None))
        else:
            rows.append((r, c, q, t, op, v))
    cells = cm.cells_from_rows(spark, rows)
    got = {
        (x["rowkey"], x["cf"], x["qualifier"], x["ts"], x["value"])
        for x in cm.resolve(cells, max_versions=max_versions).collect()
    }
    want = _model_resolve(ops, max_versions)
    assert got == want, f"ops={ops} mv={max_versions}"
