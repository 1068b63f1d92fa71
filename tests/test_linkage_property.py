"""Property test for the deletion-neighborhood edit-distance join
(operators/linkage.py): on random short strings the blocked operator
must emit EXACTLY the brute-force Levenshtein pairs — the SymSpell
cover is a guarantee, not a heuristic, so any missing or extra pair is
a bug in the variant expressions or the verify stage."""

import itertools
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hindex_spark.operators.linkage import (
    edit_distance_join,
    edit_distance_pairs,
)

import pytest

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


strings_st = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=6),
    min_size=2, max_size=8,
)


@settings(
    max_examples=int(os.environ.get("HX_PROP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strings_st, st.integers(min_value=1, max_value=2))
def test_edit_pairs_match_brute_force(spark, texts, d):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted(tuple(r) for r in
                 edit_distance_pairs(df, "id", "name", d).collect())
    want = sorted(
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= d
    )
    assert got == want


@settings(
    max_examples=int(os.environ.get("HX_PROP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strings_st, strings_st, st.integers(min_value=1, max_value=2))
def test_edit_join_matches_brute_force(spark, lt, rt, d):
    lrows = list(enumerate(lt))
    rrows = [(100 + i, t) for i, t in enumerate(rt)]
    left = spark.createDataFrame(lrows, "lid long, lname string")
    right = spark.createDataFrame(rrows, "rid long, rname string")
    got = sorted(tuple(r) for r in edit_distance_join(
        left, "lid", "lname", right, "rid", "rname", d).collect())
    want = sorted(
        (a, b, _lev(sa, sb))
        for a, sa in lrows for b, sb in rrows if _lev(sa, sb) <= d
    )
    assert got == want
