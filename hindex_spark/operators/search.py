"""Lexical search over the documents table: BM25 ranked retrieval and
TF-IDF keyword extraction. The lexical complement of the embedding ANN
family (operators/similarity.py) — a corpus engine needs both the
"find docs like this vector" and the "find docs for these words" paths.

All JVM-side built-in functions (no Python anywhere), following the
text.py conventions: whitespace tokens mirrored in oracle SQL as
string_split_regex(trim(text), '\\s+').

Scale shapes (the 100 TB design):

- ``bm25_topk`` is SCAN-SHAPED: the query's terms are a plan-time
  constant, the corpus statistics they need (N, total length, one
  document frequency per term) collapse into ONE row — a single bounded
  aggregate — which cross-broadcasts onto the corpus; per-doc scoring is
  then a pure projection over the doc's own token array (no explode, no
  doc-keyed exchange), and selection is orderBy+limit =
  TakeOrderedAndProject (per-partition heaps, driver merges k rows).
  Zero shuffles besides the bounded stats aggregate, at any corpus size.

- ``tfidf_keywords`` genuinely needs the corpus vocabulary (document
  frequency of EVERY term), which no broadcast can hold at 100 TB: it
  stays a token-keyed equi-join — explode to distinct (doc, token)
  pairs, one groupBy(token) for the df table, one join back keyed on
  token, one per-doc window for the top-n. Every exchange is
  key-partitioned; nothing is all-pairs and nothing lands on the driver.

Determinism across engines (the oracle gate hashes values): every
logarithm is rounded to 6 dp and cast to DECIMAL(18,6) BEFORE any sum —
the DSIR fixed-point convention (importance.py module docstring) — and
every ranking breaks ties on the id/token so top-k boundaries cannot
flip between Spark and DuckDB.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hindex_spark.operators.text import tokens

#: fixed-point scale shared with importance.py
_SCALE = 6
_DEC = f"decimal(18,{_SCALE})"


def query_terms(query: str) -> List[str]:
    """Deterministic term list of a query string: whitespace tokens,
    first-occurrence dedup (mirrors tokens() exactly)."""
    seen, out = set(), []
    for t in query.strip().split():
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25 (Robertson/Sparck
    Jones; the Lucene idf variant ln(1 + (N - df + 0.5)/(df + 0.5)), so
    idf is always positive):

        score(d) = sum over query terms t of
            idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*|d|/avgdl))

    Only docs matching at least one term (score > 0) are candidates;
    rank ties break on id. Output: (id, score) of the top k.

    Per the module docstring this is scan-shaped: ONE bounded stats row
    (N, sum of doc lengths, df per query term — at most len(query)
    columns) broadcasts onto the corpus and each doc scores itself from
    its own token array. idf and the per-term tf normalization are
    rounded to 6 dp and multiplied/summed as exact decimals so the
    ranking is engine-independent.
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("bm25_topk: query has no terms")
    docs = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    dl = F.size("__toks")
    # one bounded aggregate: corpus size, total length, df per term
    stats = docs.agg(
        F.count("*").alias("__n"),
        F.sum(dl).cast("double").alias("__sumdl"),
        *[
            F.sum(F.when(F.array_contains("__toks", t), 1).otherwise(0))
            .cast("double")
            .alias(f"__df{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = docs.crossJoin(F.broadcast(stats))
    avgdl = F.col("__sumdl") / F.col("__n")
    parts = []
    for i, t in enumerate(terms):
        # NB: the lambda must take exactly ONE arg — F.filter hands a
        # 2-arg callable (element, index), so a `t=t` default-capture
        # silently turns the term into the array index
        lit_t = F.lit(t)
        tf = F.size(F.filter("__toks", lambda x: x == lit_t)).cast("double")
        idf = F.round(
            F.log(
                1.0
                + (F.col("__n") - F.col(f"__df{i}") + 0.5)
                / (F.col(f"__df{i}") + 0.5)
            ),
            _SCALE,
        ).cast(_DEC)
        norm = F.round(
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl.cast("double") / avgdl)),
            _SCALE,
        ).cast(_DEC)
        parts.append((idf * norm).alias(f"__s{i}"))
    total: Column = parts[0] if len(parts) == 1 else sum(
        parts[1:], start=parts[0]
    )
    return (
        scored.select(
            F.col(id_col), total.cast("double").alias("score")
        )
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 5,
) -> DataFrame:
    """Top-``top_n`` keywords per document by TF-IDF with the smoothed
    idf = ln((N+1)/(df+1)) + 1 (the sklearn convention — never
    negative, never divides by zero). score = tf * round(idf, 6) as an
    exact decimal, ties broken by token, so the per-doc cut is
    engine-independent. Output: (id, token, tf, score), top_n rows per
    doc.

    Shuffle inventory (see module docstring): explode -> one
    groupBy(id, token) for tf, one groupBy(token) for df, one
    token-keyed join, one id-keyed window. The df table is
    vocabulary-sized — kept as a key-partitioned join side, NOT a
    broadcast, because a 100 TB corpus's vocabulary is not
    driver-material."""
    toked = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    n_docs = toked.agg(F.count("*").alias("__n"))
    pairs = toked.select(
        F.col(id_col), F.explode("__toks").alias("token")
    )
    tf = pairs.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    # df comes from tf, which is already one row per (doc, token) — no
    # second explode/distinct pass over the corpus
    dfreq = (
        tf.groupBy("token")
        .agg(F.count("*").alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.round(
                F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)) + 1.0,
                _SCALE,
            )
            .cast(_DEC)
            .alias("__idf"),
        )
    )
    scored = tf.join(dfreq, "token").select(
        F.col(id_col),
        "token",
        "tf",
        (F.col("tf").cast(_DEC) * F.col("__idf")).cast("double").alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_n)
        .drop("__rn")
    )
