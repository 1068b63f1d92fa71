"""Property-based funnel invariants vs a Python model: for random
per-key event sequences (with ties and repeated step labels), funnel()
must equal the greedy earliest-completion chain under every combination
of within-window and strict ordering."""

import os

from hypothesis import HealthCheck, given, settings, strategies as st

from hindex_spark.operators.temporal import funnel

STEPS = ["a", "b", "c"]

events_st = st.lists(
    st.tuples(
        st.sampled_from(["u", "v"]),
        st.integers(min_value=0, max_value=20),
        st.sampled_from(["a", "b", "c", "x"]),
    ),
    min_size=0, max_size=14,
)
steps_st = st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3)


def _model(rows, key, steps, within, strict):
    mine = [(t, s) for k, t, s in rows if k == key]
    ts = []
    for i, step in enumerate(steps):
        if i > 0 and ts[-1] is None:  # chain broken: stays broken
            ts.append(None)
            continue
        prev = ts[-1] if i > 0 else None
        cand = [
            t for t, s in mine
            if s == step
            and (i == 0 or (t > prev if strict else t >= prev))
            and (within is None or i == 0 or t - ts[0] <= within)
        ]
        ts.append(min(cand) if cand else None)
    return tuple(ts) + (sum(1 for t in ts if t is not None),)


@settings(
    max_examples=int(os.environ.get("HX_PROP_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events_st, steps_st,
       st.sampled_from([None, 0, 5, 100]),
       st.booleans())
def test_funnel_matches_model(spark, rows, steps, within, strict):
    df = spark.createDataFrame(
        rows or [("z", 0, "x")], "k string, t long, step string")
    got = {
        r["k"]: tuple(r[f"s{i + 1}_ts"] for i in range(len(steps)))
        + (r["steps_completed"],)
        for r in funnel(df, "k", "t", "step", steps,
                        within=within, strict=strict).collect()
    }
    keys = {k for k, _, _ in rows} or {"z"}
    assert set(got) == keys
    for k in keys:
        assert got[k] == _model(rows, k, steps, within, strict), (
            k, steps, within, strict)
