"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and
vector (ANN) rankings — the standard two-tower corpus-search combo
(Cormack/Clarke/Buettcher, "Reciprocal Rank Fusion outperforms Condorcet
and individual rank learning methods", SIGIR 2009):

    rrf(d) = sum over systems s of 1 / (rrf_k + rank_s(d))

Scale shape: fusion operates on the SYSTEMS' TOP-K LISTS, never the
corpus — each input frame is bounded by its retriever's k, so the union
+ groupBy here is trivially small however large the corpus behind the
retrievers. All the heavy lifting (bucket-pruned postings fetch,
cluster-pruned vector probe) already happened inside SearchIndex /
AnnIndex; RRF is deliberately rank-only so the two systems' incomparable
score scales never need calibration.

Determinism (the oracle gate hashes values): each reciprocal is rounded
to 6 dp and cast DECIMAL(18,6) BEFORE the sum — the repo's fixed-point
convention — and ordering ties break on the id.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale shared with search.py / importance.py
_SCALE = 6
_DEC = f"decimal(18,{_SCALE})"


def add_rank(df: DataFrame, id_col: str, score_col: str = "score") -> DataFrame:
    """(id, rank) from a scored frame: dense 1-based rank by score
    descending, ties broken on id (engine-independent)."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return df.select(
        F.col(id_col), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    rankings: List[DataFrame],
    id_col: str,
    rrf_k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Fuse ranked lists into (id, rrf_score), top ``top_n``. Each input
    frame carries (id_col, rank); a doc absent from a system simply
    contributes nothing for it (the standard RRF treatment). One union
    of bounded lists + one tiny aggregation."""
    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    tagged = rankings[0].select(F.col(id_col), F.col("rank"))
    for r in rankings[1:]:
        tagged = tagged.unionByName(r.select(F.col(id_col), F.col("rank")))
    contrib = F.round(
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank")), _SCALE
    ).cast(_DEC)
    return (
        tagged.select(F.col(id_col), contrib.alias("__c"))
        .groupBy(id_col)
        .agg(F.sum("__c").cast("double").alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(top_n)
    )
