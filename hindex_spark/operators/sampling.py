"""Deterministic stratified sampling — corpus balancing for training-data
pipelines (down-weight over-represented languages/sources, cap any
stratum at a budget).

Scale design: the sampling decision is a pure per-row arithmetic hash of
the row's key — one projection, no shuffle, no RNG state, reproducible
across engines (the multiplicative bucket uses only integer * and %, so
the DuckDB oracle computes bit-identical buckets, unlike Spark's
``hash()``/``rand()``). The cap variant needs one shuffle keyed by the
stratum (the window) — the minimum for an exact per-stratum budget.

No reference analog (the closest is RandomRowFilter's Bernoulli sample,
RandomRowFilter.java); this is part of the LLM-pipeline operator set.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket space: keep-fraction f keeps rows with bucket < f * 10000
BUCKETS = 10_000
_KNUTH = 2654435761  # Knuth multiplicative hash constant
_PRIME = 1_000_003  # pre-modulus keeping the product inside int64


def sample_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, BUCKETS) from a NUMERIC key column.

    ``((key % p) * K) % BUCKETS`` with p, K coprime to the bucket count —
    scrambles sequential ids well enough for sampling and is expressible
    in any SQL dialect (the oracle must reproduce it exactly)."""
    return F.pmod(F.pmod(key.cast("long"), F.lit(_PRIME)) * F.lit(_KNUTH), F.lit(BUCKETS))


def sample_bucket_str(key: Column) -> Column:
    """Deterministic bucket for STRING keys: md5-prefix -> 60-bit int ->
    bucket (DuckDB replica:
    ``(CAST(CONCAT('0x', SUBSTRING(md5(k),1,15)) AS BIGINT) % 10000)``)."""
    return F.pmod(F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"), F.lit(BUCKETS))


def _bucket_for(df: DataFrame, key_col: str) -> Column:
    """Pick the bucket expression by the key column's type. A numeric
    key cast through ``sample_bucket_str`` or a string key cast through
    ``sample_bucket`` would both silently yield NULL buckets (dropping
    every row), so the choice is driven by the schema, not the caller."""
    dt = dict(df.dtypes).get(key_col, "")
    if dt in ("string", "varchar", "binary") or dt.startswith(("char", "varchar")):
        return sample_bucket_str(F.col(key_col))
    return sample_bucket(F.col(key_col))


def sample_bucket_sql(key_sql: str) -> str:
    """The identical bucket expression as ANSI SQL (for oracles)."""
    return f"((({key_sql}) % {_PRIME}) * {_KNUTH}) % {BUCKETS}"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    key_col: str,
    default: float = 0.0,
) -> DataFrame:
    """Keep each stratum at its own rate: rows whose bucket falls below
    fraction * BUCKETS survive. One shuffle-free projection + filter."""
    threshold = None
    for stratum, frac in fractions.items():
        t = int(round(frac * BUCKETS))
        threshold = (
            F.when(F.col(strata_col) == stratum, F.lit(t))
            if threshold is None
            else threshold.when(F.col(strata_col) == stratum, F.lit(t))
        )
    threshold = (
        threshold.otherwise(F.lit(int(round(default * BUCKETS))))
        if threshold is not None
        else F.lit(int(round(default * BUCKETS)))
    )
    return df.filter(_bucket_for(df, key_col) < threshold)


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    weights: Dict[str, float],
    budget_rows: int,
    key_col: str,
) -> DataFrame:
    """Resample a corpus to a target stratum mixture (DoReMi-style static
    domain weights, arXiv:2305.10429; multilingual temperature sampling):
    stratum ``s`` receives a row budget of ``weights[s] * budget_rows``,
    realized per row as ``floor(rate)`` whole copies plus one extra copy
    for rows whose deterministic bucket falls under the fractional
    remainder. rate > 1 therefore UPSAMPLES (epoch repetition), rate < 1
    downsamples; strata absent from ``weights`` are dropped, and so are
    rows whose ``strata_col`` is NULL (a NULL stratum can carry no
    weight; the count join is an inner equi-join on the stratum).

    Scale design: one tiny per-stratum count aggregate broadcast back
    onto the corpus (no driver collect), then a pure projection —
    ``explode(sequence)`` emits copies without shuffling the big side.
    The output carries ``copy`` (0-based, long) so downstream packing can
    tell repetitions apart.
    """
    clash = {"copy", "__n", "__nc"}.intersection(df.columns)
    if clash:
        raise ValueError(
            f"mixture_resample output columns {sorted(clash)} already exist "
            "in the input; rename them first (the operator emits 'copy' and "
            "uses '__n'/'__nc' internally)"
        )
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    wt: Optional[Column] = None
    for stratum, w in weights.items():
        wt = (
            F.when(F.col(strata_col) == stratum, F.lit(float(w)))
            if wt is None
            else wt.when(F.col(strata_col) == stratum, F.lit(float(w)))
        )
    wt = wt.otherwise(F.lit(0.0)) if wt is not None else F.lit(0.0)
    sized = df.join(F.broadcast(counts), strata_col)
    rate = wt * F.lit(float(budget_rows)) / F.col("__n")
    full = F.floor(rate).cast("long")
    frac = rate - full
    extra = (_bucket_for(df, key_col) < frac * F.lit(BUCKETS)).cast("long")
    return (
        sized.withColumn("__nc", full + extra)
        .filter(F.col("__nc") > 0)
        .withColumn(
            "copy",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__nc") - F.lit(1))),
        )
        .drop("__n", "__nc")
    )


def stratified_cap(
    df: DataFrame,
    strata_col: str,
    cap: int,
    key_col: str,
) -> DataFrame:
    """Exact per-stratum budget: keep the ``cap`` rows of each stratum
    with the smallest (bucket, key) — a deterministic 'random' subset.
    One shuffle keyed by the stratum; at scale prefer stratified_sample
    (shuffle-free) unless the budget must be exact."""
    w = Window.partitionBy(strata_col).orderBy(
        _bucket_for(df, key_col), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def cluster_balanced_sample(
    vectors: DataFrame,
    centroids: DataFrame,
    per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space diversity sampling — the cluster-balanced
    curation shape (SemDeDup's cluster step pointed at selection, the
    per-topic analog of ``stratified_cap``): assign every vector to
    its nearest centroid (cosine, ties to the lower cluster id —
    ``similarity.nearest_centroid``'s map-side-collapsed broadcast
    assignment, one narrow row per vector through the exchange), then
    keep the ``per_cluster`` lowest-id members of each cluster — an
    equal-representation subset no frequency-blind uniform sample
    gives (a 90%-one-topic corpus stays 90% one topic under uniform
    sampling; this returns one quota per REGION of embedding space).

    ``centroids``: (cluster, centroid) — from ``ivf_build``, a prior
    art run, or any fixed probe set. Output: (id, cluster, rank) with
    rank 1..per_cluster, deterministic across engines and runs.

    Scale: one broadcast assignment pass + one shuffle keyed by
    cluster for the quota window; the cap bounds each cluster's output,
    and the window sorts only ids (narrow rows)."""
    from hindex_spark.operators.similarity import nearest_centroid

    assigned = nearest_centroid(vectors, centroids, id_col, vec_col)
    w = Window.partitionBy("cluster").orderBy(F.col(id_col))
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_cluster)
        .select(id_col, "cluster", "rank")
    )


def select_token_budget(
    df: DataFrame,
    domain_col: str,
    budget_tokens: int,
    order_by: Optional[List[Column]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TOKEN-budget selection per domain — the data-mixing primitive a
    training recipe actually runs: each domain contributes its
    highest-priority documents until the next doc would push the
    domain's cumulative token count past ``budget_tokens`` (docs are
    kept iff their INCLUSIVE running total fits the budget, so the
    budget is a hard cap, never overshot by a partial doc).

    ``order_by`` ranks docs within a domain (default: longest docs
    first by ``n_chars`` if present, else token count); ties always
    break on ``id_col`` so the selection is deterministic across
    engines and runs.

    Scale shape: one projection for the per-doc token count, then ONE
    shuffle — the per-domain ordered cumulative sum (running SUM
    window). That is the minimum for an exact budget. If one domain is
    a dominant fraction of a 100 TB corpus, its window sort lands on
    one task — use the exact-global-rank pattern from
    ``importance.perplexity_split`` (range-partition by the sort key,
    per-partition running sums + partition-count offsets) for that
    shape; for the common many-domain mixture this window is the right
    plan.

    Output: (id, domain, n_tokens, cum_tokens) for the KEPT docs.
    """
    from hindex_spark.operators.text import token_count

    if order_by is None:
        if "n_chars" in df.columns:
            order_by = [F.col("n_chars").desc()]
        else:
            order_by = [token_count(F.col(text_col)).desc()]
    scored = df.filter(F.col(text_col).isNotNull()).withColumn(
        "n_tokens", token_count(F.col(text_col)).cast("long")
    )
    w = (
        Window.partitionBy(domain_col)
        .orderBy(*order_by, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select(id_col, domain_col, "n_tokens", "cum_tokens")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    id_col: str,
    weight_col: str,
    max_weight: int = 10_000,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k rows
    chosen with probability proportional to integer ``weight_col`` —
    the Efraimidis-Spirakis scheme, in exact integer arithmetic.

    E-S ranks items by u_i^(1/w_i) (u_i uniform) and takes the top k.
    The max of w_i independent uniforms has exactly that distribution,
    so this implementation explodes each row into w_i replicas, hashes
    each (id, replica) through the module's cross-engine md5 bucket
    integer, and ranks by the per-id MAX hash (ties broken by id) — no
    float pow/log whose last-ulp could differ between engines, so the
    oracle reproduces the selection bit-for-bit.

    Scale shape: one map-side explode (factor = mean weight; weights
    CLAMP to [1, max_weight] — pre-scale huge weights, they carry no
    extra selection resolution), one per-id max (partial agg), one
    global top-k (sort-limit). NULL/absent weights count as 1.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(1))
    w = F.least(F.greatest(w, F.lit(1)), F.lit(int(max_weight)))
    reps = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1).cast("long"), w)).alias("__rep"),
    )
    # 15 hex chars = a 60-bit integer: fits long exactly, and the same
    # SUBSTRING(md5(..),1,15) conversion is expressible in DuckDB
    # (sample_bucket_str's convention)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.col(id_col).cast("string"),
                              F.col("__rep").cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    keyed = reps.select(F.col(id_col), h.alias("__h")).groupBy(id_col).agg(
        F.max("__h").alias("__key")
    )
    return (
        keyed.orderBy(F.desc("__key"), F.col(id_col))
        .limit(int(k))
        .select(id_col, F.col("__key").alias("sample_key"))
    )
