"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and hyperplane-LSH-bucketed ANN (the scale path).

Scale design: brute force is a broadcast of the (small) query set against
the full embedding table — one scan, no shuffle of the big side, fully
JVM-side arithmetic. The LSH variant assigns every vector to a bucket via
fixed random-hyperplane sign bits (one scan, one narrow column added),
and queries probe only their own bucket: cost drops from O(N) per query
to O(N / 2^bits), the standard recall/cost dial. An IVF build would swap
the bucket assignment for nearest-centroid; the probe-side plumbing is
identical.
"""

from __future__ import annotations

import random
from typing import List, Sequence  # noqa: F401 (random used for hyperplanes)

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hindex_spark.operators.dedup import cosine_expr

N_PLANES = 8
_DIM = 64


def hyperplanes(dim: int = _DIM, n_planes: int = N_PLANES, seed: int = 42) -> List[List[float]]:
    """Deterministic 'random' hyperplanes (seeded, reproducible in the
    oracle as literal arrays)."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)
    ]


def _dot_literal(vec: Column, plane: Sequence[float]) -> Column:
    dv = F.transform(vec, lambda x: x.cast("double"))
    lit = F.array(*[F.lit(float(v)) for v in plane])
    return F.aggregate(F.zip_with(dv, lit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)


def lsh_bucket(vec: Column, planes: List[List[float]]) -> Column:
    """Sign-bit bucket id: bit j set iff dot(vec, plane_j) >= 0."""
    out = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        out = out + F.when(_dot_literal(vec, p) >= 0, F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def _not_self(queries: DataFrame, q_id_col: str, corpus: DataFrame, id_col: str) -> Column:
    """Self-match exclusion for top-k: drop pairs where the query IS the
    corpus vector. Only meaningful when the two id columns share a type
    (ids from one namespace); with differing types (string q_id vs long
    vec_id) no pair can be a self-match AND the raw `!=` would abort the
    whole job under ANSI mode's strict cast — so compare only when the
    types line up."""
    if queries.schema[q_id_col].dataType == corpus.schema[id_col].dataType:
        return F.col(q_id_col) != F.col(id_col)
    return F.lit(True)


#: max parquet footers actually opened by _estimate_rows; beyond this an
#: evenly-spaced sample is opened and the total extrapolated (the caller
#: needs a sampling-rate estimate, not an exact count)
_FOOTER_SAMPLE_CAP = 256
#: concurrent footer opens (metadata reads are I/O-bound; a thread pool
#: turns 256 serial opens into ~16 rounds of parallel ones)
_FOOTER_THREADS = 16


def _estimate_rows(df: DataFrame) -> int:
    """Row count from parquet footer metadata (driver-side reads, no
    Spark job) — the cheap estimate a sampling rate needs. The footer
    path is used ONLY for a bare local parquet scan (optionally
    column-pruned): a Filter/Join/Limit in the plan would make footer
    totals meaningless (inputFiles ignores them), and non-local URIs
    (s3a://, hdfs://) aren't openable from the driver with pyarrow —
    all of those fall back to count().

    Driver time is BOUNDED regardless of table size: at most
    ``_FOOTER_SAMPLE_CAP`` footers are opened (evenly spaced across the
    file list, scaled back up by the sampling fraction), through a
    ``_FOOTER_THREADS``-wide pool. A 100 TB table with 10^5 files costs
    ~256 parallel metadata opens, not minutes of serial driver I/O."""
    import re

    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        nodes = {
            m.group(1)
            for line in plan.splitlines()
            if (m := re.match(r"[\s:+\-']*([A-Za-z]+)", line))
        }
        if not nodes <= {"Relation", "LogicalRelation", "Project"}:
            return df.count()
        files = df.inputFiles()
        if not files or not all(
            f.endswith(".parquet") and (f.startswith("file:") or f.startswith("/"))
            for f in files
        ):
            return df.count()
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        paths = [f[7:] if f.startswith("file://") else f for f in files]
        if len(paths) > _FOOTER_SAMPLE_CAP:
            # evenly spaced, deterministic; covers size-skewed layouts
            # (e.g. one big file then many small) better than a prefix
            step = len(paths) / _FOOTER_SAMPLE_CAP
            sample = [paths[int(i * step)] for i in range(_FOOTER_SAMPLE_CAP)]
        else:
            sample = paths
        with ThreadPoolExecutor(max_workers=min(_FOOTER_THREADS, len(sample))) as ex:
            counts = list(
                ex.map(lambda p: pq.ParquetFile(p).metadata.num_rows, sample)
            )
        total = sum(counts)
        if len(sample) < len(paths):
            total = round(total * len(paths) / len(sample))
        return total
    except Exception:  # noqa: BLE001 - any metadata hiccup: pay the job
        return df.count()


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, rank per query.
    Output: (q_id, vec_id, cosine, rank)."""
    joined = embeddings.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    ).filter(_not_self(queries, q_id_col, embeddings, id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def nearest_centroid(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    keep_vector: bool = False,
) -> DataFrame:
    """(id, cluster[, vector]): nearest centroid by cosine, ties to the
    LOWER cluster id. Implemented as max(struct(sim, -cluster, ...))
    under groupBy(id) rather than a row_number window: the broadcast
    cross join emits each vector's n_clusters candidate rows inside one
    task, so the partial aggregate collapses them map-side and the
    exchange moves ONE narrow row per vector — at corpus scale that is
    the difference between shuffling n_vectors rows and sort-shuffling
    n_vectors x n_clusters (measured 4.6x on the 1M-vector index
    build). Winner identity with the window formulation is exact: the
    struct comparison is (sim desc, cluster asc) including Spark's
    NaN-is-greatest ordering."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine_expr(F.col(vec_col), F.col("centroid"))
    )
    fields = [
        F.col("__sim").alias("__s"),
        (-F.col("cluster")).alias("__negc"),
        F.col("cluster").alias("__c"),
    ]
    if keep_vector:
        fields.append(F.col(vec_col).alias("__v"))
    best = scored.groupBy(id_col).agg(F.max(F.struct(*fields)).alias("__b"))
    sel = [F.col(id_col), F.col("__b.__c").alias("cluster")]
    if keep_vector:
        sel.append(F.col("__b.__v").alias(vec_col))
    return best.select(*sel)


def ivf_build(
    embeddings: DataFrame,
    n_clusters: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 65536,
    keep_vectors: bool = False,
):
    """IVF index build: k-means-lite on a deterministic hash-sample.

    Scale design: centroids only need a REPRESENTATIVE sample, not the
    corpus — training iterates on ≤ ``sample_size`` vectors (hash-picked,
    so reproducible without a seed column), and the single full-corpus
    pass is the final assignment. Centroids are collected to the driver
    between rounds (n_clusters × dim doubles — tiny), so every round is
    one bounded job over the sample and lineage does not deepen with
    ``iters`` (the previous all-DataFrame loop re-shuffled posexploded
    vectors of the WHOLE table every iteration).

    Deterministic: hash-based sample, lowest-id init, stable tie-breaks.
    Returns (assignments: id_col/cluster, centroids: cluster/centroid).
    With ``keep_vectors`` the assignments also carry ``vec_col`` — the
    materialized-index shape ``ivf_topk`` probes without re-joining the
    embeddings (and what ``AnnIndex`` persists cluster-bucketed).

    No full-corpus action in the build: the sampling rate derives from
    parquet FOOTER row counts (driver-side metadata reads — no job),
    falling back to count() only for non-parquet inputs, and the
    centroid init takes the lowest-id members of the SAMPLE (one
    hash-filtered pass, no global TakeOrdered over the corpus). The only
    whole-corpus job left is the final assignment — irreducible, it IS
    the output.
    """
    spark = embeddings.sparkSession
    n = _estimate_rows(embeddings)
    mod = max(1, n // sample_size) if n > sample_size else 1

    def _train_df(m: int) -> DataFrame:
        if m <= 1:
            return embeddings
        return embeddings.filter(F.pmod(F.hash(F.col(id_col)), F.lit(m)) == 0)

    def _cent_df(rows):
        return spark.createDataFrame(rows, f"cluster int, centroid array<double>")

    train = _train_df(mod)
    init = train.orderBy(id_col).limit(n_clusters).collect()
    # Degenerate hash sample (row estimate was off): WIDEN the sample a
    # bounded number of times — never fall back to a TakeOrdered over
    # the full corpus (a 100 TB scan+sort for a path that should never
    # trigger on real data). mod==1 means no sampling was applied at
    # all (corpus ≤ sample_size), so init already saw every vector.
    attempts = 0
    while len(init) < n_clusters and mod > 1 and attempts < 3:
        mod = max(1, mod // 64)
        attempts += 1
        train = _train_df(mod)
        init = train.orderBy(id_col).limit(n_clusters).collect()
    if len(init) < n_clusters and mod > 1:
        raise ValueError(
            f"ivf_build: hash sample still has {len(init)} < "
            f"{n_clusters} vectors after {attempts} widenings (row "
            f"estimate {n} is off by orders of magnitude); lower "
            f"n_clusters/sample_size or fix the corpus row estimate"
        )
    if not init:
        raise ValueError("ivf_build: no vectors to train on")
    cent_rows = [
        (i + 1, [float(x) for x in r[vec_col]]) for i, r in enumerate(init)
    ]
    for _ in range(iters):
        cents = _cent_df(cent_rows)
        assign = nearest_centroid(train, cents, id_col, vec_col,
                                  keep_vector=True)
        means = (
            assign.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster",
                F.transform(F.col("pm"), lambda s: s.getField("m")).alias("centroid"),
            )
            .collect()
        )
        # clusters that lost every training member keep their centroid
        new = {r["cluster"]: [float(x) for x in r["centroid"]] for r in means}
        cent_rows = [(c, new.get(c, v)) for c, v in cent_rows]
    cents = _cent_df(cent_rows)
    assignments = nearest_centroid(
        embeddings, cents, id_col, vec_col, keep_vector=keep_vectors
    )
    return assignments, cents


def ivf_topk(
    embeddings: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF probe: each query scores the (tiny) centroid set, searches
    only its ``nprobe`` nearest clusters — cost O(N * nprobe/n_clusters)
    per query. Same output shape as brute_force_topk.

    If ``assignments`` already carries ``vec_col`` (a pre-joined
    cluster-partitioned vector store — the materialized IVF index, which
    is what a production deployment persists: vectors laid out BY
    cluster so a probe reads only its clusters' partitions), the
    embeddings join is skipped; per-probe cost is then pure scan+score."""
    q_scored = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine_expr(F.col(q_vec_col), F.col("centroid"))
    )
    wq = Window.partitionBy(q_id_col).orderBy(F.col("__sim").desc(), F.col("cluster"))
    probes = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(q_id_col, q_vec_col, "cluster")
    )
    if vec_col in assignments.columns:
        clustered = assignments
    else:
        clustered = embeddings.join(assignments, id_col)
    joined = clustered.join(F.broadcast(probes), "cluster")
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    ).filter(_not_self(queries, q_id_col, clustered, id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def semantic_dedup(
    embeddings: DataFrame,
    eps: float = 0.35,
    n_clusters: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame = None,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then inside
    each cluster prune every document whose cosine similarity to a
    lower-id clustermate reaches ``eps``. The lowest id in each near-dup
    neighborhood survives — a deterministic stand-in for the paper's
    "keep one random exemplar".

    Scale design: the quadratic pair search is confined to clusters
    (sum |c|^2 ≪ N^2 — the whole point of SemDeDup), clustering is
    ``ivf_build`` (sampled k-means, driver state = K×dim doubles), and
    the pair join is a hash equi-join on cluster id — no cartesian.

    Returns ``(kept, dropped)``: kept = (id, cluster) survivors;
    dropped = (id, cluster, dup_of, max_cosine) where dup_of is the
    smallest qualifying partner and max_cosine the strongest match
    (independent aggregates over the same partner set).
    """
    if assignments is None:
        assignments, _ = ivf_build(embeddings, n_clusters, iters, id_col, vec_col)
    clustered = embeddings.join(assignments, id_col).select(id_col, "cluster", vec_col)
    a, b = clustered.alias("a"), clustered.alias("b")
    cos = F.round(cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6)
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"b.{id_col}").alias(id_col),
            F.col("b.cluster").alias("cluster"),
            F.col(f"a.{id_col}").alias("dup_of"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= eps)
    )
    dropped = pairs.groupBy(id_col, "cluster").agg(
        F.min("dup_of").alias("dup_of"), F.max("cosine").alias("max_cosine")
    )
    kept = clustered.select(id_col, "cluster").join(
        dropped.select(id_col), id_col, "left_anti"
    )
    return kept, dropped


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    dim: int = _DIM,
    seed: int = 42,
) -> DataFrame:
    """ANN: probe only the query's hyperplane bucket, exact rank inside.
    Same output shape as brute_force_topk (approximate contents)."""
    planes = hyperplanes(dim, N_PLANES, seed)
    emb_b = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    q_b = queries.withColumn("bucket", lsh_bucket(F.col(q_vec_col), planes))
    joined = emb_b.join(F.broadcast(q_b), "bucket")
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    ).filter(_not_self(queries, q_id_col, embeddings, id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# product quantization (PQ) — memory-bounded ANN codes
# ---------------------------------------------------------------------------


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    iters: int = 10,
) -> List[List[List[float]]]:
    """Train a product quantizer: split the vector into ``m`` subspaces,
    k-means each with ``k`` centroids (the FAISS-style PQ codebook;
    Jegou et al., "Product Quantization for Nearest Neighbor Search").

    Scale design: PQ training classically runs on a SAMPLE — the
    codebook needs representative geometry, not the corpus. A
    deterministic hash-sample of <= ``sample_size`` vectors is collected
    and k-means runs driver-side in numpy (bounded: sample_size x dim
    doubles, ~2 MB at the defaults); the corpus-scale work — encoding
    and search — stays fully distributed (``pq_encode`` / ``pq_topk``).
    Deterministic: hash-picked sample ordered by id, first-k init, fixed
    iteration count, first-min tie-breaks.

    Returns codebooks ``[m][k][dim/m]`` (plain floats — broadcast as
    literals into JVM expressions downstream; driver state k x dim
    doubles, same as IVF's centroid table).
    """
    X = _pq_sample(embeddings, sample_size, id_col, vec_col)
    return _pq_kmeans(X, m, k, iters)


def _pq_sample(embeddings: DataFrame, sample_size: int, id_col: str,
               vec_col: str):
    """Deterministic hash-sample of <= sample_size vectors as a numpy
    matrix (bounded driver state)."""
    import numpy as np

    n = _estimate_rows(embeddings)
    if n > sample_size:
        mod = max(1, n // sample_size)
        train = embeddings.filter(F.pmod(F.hash(F.col(id_col)), F.lit(mod)) == 0)
    else:
        train = embeddings
    rows = train.orderBy(id_col).limit(sample_size).collect()
    return np.asarray([[float(v) for v in r[vec_col]] for r in rows])


def _pq_kmeans(X, m: int, k: int, iters: int) -> List[List[List[float]]]:
    """Per-subspace k-means on a driver-side sample matrix (the shared
    trainer for raw-vector and residual codebooks). Deterministic:
    first-k init, fixed iterations, first-min tie-breaks."""
    import numpy as np

    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    codebooks: List[List[List[float]]] = []
    for j in range(m):
        Xj = X[:, j * d_sub : (j + 1) * d_sub]
        cents = Xj[: min(k, len(Xj))].copy()
        if len(cents) < k:  # degenerate sample: pad by repeating
            reps = -(-k // max(1, len(cents)))
            cents = np.concatenate([cents] * reps)[:k]
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # first-min ties -> deterministic
            for c in range(k):
                members = Xj[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        codebooks.append([[float(x) for x in c] for c in cents])
    return codebooks


def _sq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_code_cols(codebooks: List[List[List[float]]], vec_col):
    """The (codes, norm) COLUMN expressions encoding ``vec_col`` (a
    column name or Column — e.g. a residual expression) against the
    codebooks — exposed so callers that already project per vector
    (AnnIndex's cluster assignment) can add the PQ columns in the SAME
    map pass instead of paying an id-keyed join with ``pq_encode``'s
    output. argmin = array_position of array_min (first-min tie-break);
    all-JVM, no shuffle, no Python. NB: ``norm`` is the norm of the
    ENCODED input — for residual encoding the caller supplies the true
    vector norm separately."""
    d_sub = len(codebooks[0][0])
    vec = (F.col(vec_col) if isinstance(vec_col, str) else vec_col).cast(
        "array<double>"
    )
    codes = []
    for j, cb in enumerate(codebooks):
        sub = F.slice(vec, j * d_sub + 1, d_sub)
        lit_cb = F.array(*[F.array(*[F.lit(x) for x in cent]) for cent in cb])
        dists = F.transform(lit_cb, lambda c: _sq_l2(sub, c))
        codes.append(F.array_position(dists, F.array_min(dists)).cast("int"))
    norm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return F.array(*codes), norm


def pq_encode(
    embeddings: DataFrame,
    codebooks: List[List[List[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus against the codebooks: each vector becomes
    ``m`` one-byte-ish codes (array<int>, 1-based) + its true norm.
    100 TB story: this is the point of PQ — the searchable corpus state
    shrinks from dim floats to m codes per vector. All-JVM expressions
    (codebooks enter the plan as literals), one narrow projection job,
    no shuffle, no Python."""
    codes, norm = pq_code_cols(codebooks, vec_col)
    return embeddings.select(
        F.col(id_col), codes.alias("codes"), norm.alias("norm")
    )


def pq_topk(
    embeddings: DataFrame,
    codes_df: DataFrame,
    codebooks: List[List[List[float]]],
    queries: DataFrame,
    k: int,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """PQ ANN: asymmetric-distance (ADC) shortlist over the codes, exact
    cosine re-rank of the ``shortlist`` best per query. Same output
    shape as brute_force_topk: (q_id, vec_id, cosine, rank).

    Per query the driver precomputes the m x k lookup table of
    subvector inner products (tiny — the query set is small and
    broadcast by contract, like brute_force_topk); each corpus vector's
    approximate dot product is then m array lookups, so the scan cost
    is independent of dim. approx cosine uses the stored true corpus
    norms. With ``shortlist`` >= corpus size the re-rank sees every
    vector and the result EXACTLY equals brute force — the
    oracle-checkable hard-signal configuration (same trick as
    ivf_topk at nprobe = n_clusters); recall at realistic shortlists is
    pinned by test_pq_ann_recall."""
    import math

    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    spark = embeddings.sparkSession
    q_rows = queries.collect()
    lut_rows = []
    for r in q_rows:
        qv = [float(x) for x in r[q_vec_col]]
        lut = [
            [
                sum(qv[j * d_sub + t] * cent[t] for t in range(d_sub))
                for cent in codebooks[j]
            ]
            for j in range(m)
        ]
        q_norm = math.sqrt(sum(x * x for x in qv)) or 1.0
        lut_rows.append((r[q_id_col], lut, q_norm))
    # the query-id type follows the caller's queries frame (string ids
    # are as legal here as in brute_force_topk — hardcoding long would
    # crash createDataFrame for them)
    qid_ddl = queries.schema[q_id_col].dataType.simpleString()
    qlut = spark.createDataFrame(
        lut_rows, f"{q_id_col} {qid_ddl}, lut array<array<double>>, q_norm double"
    )
    approx = (
        codes_df.crossJoin(F.broadcast(qlut))
        .filter(_not_self(queries, q_id_col, codes_df, id_col))
        .withColumn(
            "__adot",
            F.aggregate(
                F.zip_with(
                    F.col("codes"), F.col("lut"), lambda c, row: F.element_at(row, c)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "__acos",
            F.col("__adot") / (F.col("q_norm") * F.when(F.col("norm") > 0, F.col("norm")).otherwise(F.lit(1.0))),
        )
    )
    ws = Window.partitionBy(q_id_col).orderBy(F.col("__acos").desc(), F.col(id_col))
    short = (
        approx.withColumn("__srn", F.row_number().over(ws))
        .filter(F.col("__srn") <= shortlist)
        .select(q_id_col, id_col)
    )
    exact = (
        short.join(embeddings.select(id_col, vec_col), id_col)
        .join(F.broadcast(queries), q_id_col)
        .select(
            F.col(q_id_col),
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )
