"""Property-based chunk_documents invariants vs a Python model:

* LAYOUT: chunk k is exactly tokens[k*stride : k*stride + max_tokens]
  (0-indexed), for every (n_tokens, max_tokens, overlap) combination.
* COVERAGE: the union of chunk token positions is all of [0, n) —
  nothing silently truncated.
* COUNT: exactly 1 + ceil(max(n - max_tokens, 0) / stride) chunks.

One Spark round-trip per example (docs are tiny), so the default
example budget stays small; HX_PROP_EXAMPLES raises it for deep runs.
"""

import os

from hypothesis import HealthCheck, given, settings, strategies as st

from hindex_spark.operators.packing import chunk_documents

params_st = st.tuples(
    st.integers(min_value=1, max_value=40),   # n tokens
    st.integers(min_value=1, max_value=12),   # max_tokens
    st.integers(min_value=0, max_value=11),   # overlap (clamped below)
)


def _model(n, max_tokens, stride):
    toks = [f"w{i}" for i in range(n)]
    chunks = []
    k = 0
    while True:
        piece = toks[k * stride: k * stride + max_tokens]
        chunks.append((k, len(piece), " ".join(piece)))
        if k * stride + max_tokens >= n:
            break
        k += 1
    return chunks


@settings(
    max_examples=int(os.environ.get("HX_PROP_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(params_st)
def test_chunk_layout_matches_model(spark, params):
    n, max_tokens, overlap = params
    overlap = min(overlap, max_tokens - 1)
    stride = max_tokens - overlap
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(n)))], ["doc_id", "text"])
    got = sorted(
        (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            docs, max_tokens=max_tokens, overlap=overlap).collect()
    )
    want = _model(n, max_tokens, stride)
    assert got == want
    # count formula the oracle SQL mirrors
    expect_nc = 1 + (max(n - max_tokens, 0) + stride - 1) // stride
    assert len(got) == expect_nc
    # coverage: every token appears in some chunk
    seen = {t for _, _, txt in got for t in txt.split()}
    assert seen == {f"w{i}" for i in range(n)}
