"""Property-based MinHash-LSH dedup invariants:

* SOUNDNESS (deterministic): every reported pair's TRUE n-gram Jaccard
  — recomputed independently in Python — is >= the threshold, for any
  corpus. Banding only proposes candidates; the exact-verify stage must
  make the output exact.
* EXACT-DUP COMPLETENESS (deterministic): byte-identical docs have
  identical signatures, so every band matches and the pair is always
  reported with jaccard 1.0.
"""

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from hindex_spark.operators import dedup as dd

import pytest

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

doc_st = st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join)
corpus_st = st.lists(doc_st, min_size=2, max_size=8)


def _true_jaccard(a: str, b: str, n: int = 3) -> float:
    def shingles(t):
        toks = re.split(r"\s+", t.strip())
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = shingles(a), shingles(b)
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_st)
def test_lsh_pairs_sound_and_exact_dups_complete(spark, corpus):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    pairs = dd.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    for r in pairs:
        true_j = _true_jaccard(corpus[r["id_a"]], corpus[r["id_b"]])
        assert true_j >= 0.8 - 1e-9, (corpus[r["id_a"]], corpus[r["id_b"]], true_j)
        assert abs(r["jaccard"] - true_j) < 1e-6
    got = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])) for r in pairs}
    for i in range(len(corpus)):
        for j in range(i + 1, len(corpus)):
            if corpus[i] == corpus[j]:
                assert (i, j) in got, f"identical docs {i},{j} not paired"


# ---------------------------------------------------------------------------
# remove_duplicate_spans vs a brute-force Python model
# ---------------------------------------------------------------------------

K_SPAN = 3

span_doc_st = st.lists(
    st.sampled_from(WORDS[:4]), min_size=0, max_size=10
).map(" ".join)
span_corpus_st = st.lists(span_doc_st, min_size=1, max_size=6)


def _model_remove_spans(corpus, k):
    """Reference semantics, computed naively: a k-gram occurrence is a
    duplicate iff an identical k-gram occurs earlier in global (doc
    order, position) order; every token covered by a duplicate k-gram
    is dropped; docs reassemble from the surviving tokens."""
    seen = set()
    out = []
    for doc_id, text in enumerate(corpus):
        toks = re.split(r"\s+", text.strip()) if text.strip() else [""]
        covered = set()
        for p in range(len(toks) - k + 1):
            gram = " ".join(toks[p : p + k])
            if gram in seen:
                covered.update(range(p, p + k))
            else:
                seen.add(gram)
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out.append((doc_id, " ".join(kept), len(kept), len(toks) - len(kept)))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(span_corpus_st)
def test_remove_duplicate_spans_matches_model(spark, corpus):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_removed"])
        for r in dd.remove_duplicate_spans(
            docs, "doc_id", "text", k=K_SPAN
        ).collect()
    }
    for doc_id, text, kept, removed in _model_remove_spans(corpus, K_SPAN):
        assert got[doc_id] == (text, kept, removed), (
            doc_id, corpus, got[doc_id], (text, kept, removed),
        )
