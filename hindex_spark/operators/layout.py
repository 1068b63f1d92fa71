"""Multi-dimensional data layout: Z-order (Morton) clustering for
write-time file organization, so selective multi-column predicates
touch a small fraction of files/row-groups instead of the whole table.

The reference clusters physically on ONE key — the rowkey sort of its
HFiles (HFileWriterV2.java; our catalog mirrors it with bucketed/
range-sorted parquet) — which serves rowkey scans but nothing else;
its answer to second-column access is the secondary index. Z-ordering
is the complementary LAYOUT answer (Delta OPTIMIZE ZORDER BY /
Iceberg sort orders are the public analogs): interleave the bits of k
quantized key columns into one Morton key, range-partition and sort
the table by it, and every participating column's values become
spatially clustered — parquet min/max stats then skip row groups for
predicates on ANY prefix-free subset of the columns, at the cost of
each single column clustering slightly worse than a dedicated sort.

Mechanics (all JVM expressions, no UDF):

1. QUANTIZE each column to a ``bits``-bit bucket id:
   - ``"quantile"`` (default): bucket boundaries from one
     ``approxQuantile`` pass (driver-side array of 2^bits - 1 cuts,
     bits <= 10 enforced), mapped per row with a bounded
     ``aggregate`` fold over the boundary array — skew-proof, the
     Delta approach.
   - ``"linear"``: ``width_bucket`` between the observed min/max —
     one cheap agg, right for already-uniform keys.
2. INTERLEAVE the bucket bits round-robin (dim-major) into one long.
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the Morton
   key — one range exchange (sampled boundaries), each output file a
   contiguous Morton range, i.e. a hyper-rectangle-ish tile of the
   key space.

Scale: the quantize stats are one bounded pass, the layout itself is
the same single range-shuffle a plain sorted write pays; nothing here
grows with table width. Timestamp/date columns quantize via their
epoch micros (timeutil handles the physical-type drift).
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: quantile mode's per-dimension resolution cap: 2^10 boundaries is a
#: 1k-element driver array and a 1k-step fold per row — beyond that the
#: fold dominates the write; linear mode has no such cap
MAX_QUANTILE_BITS = 10

#: quantile mode's stats pass runs on a bounded deterministic hash
#: sample above this many rows (estimated from parquet footers, no
#: job): the cuts only need to be approximately equi-depth — they
#: decide file CLUSTERING, not any row's value — and an exact-rank
#: sketch over the full table is a full corpus pass whose cost at sf0.1
#: measured 2.8 s vs 0.6 s sampled for statistically identical cuts
#: (rank error from a 64k sample is ~1/sqrt(64k) ~ 0.4%, under half a
#: bucket at bits=8). At 100 TB this is the difference between a
#: bounded stats job and a full read before the layout even starts.
QUANTILE_SAMPLE_ROWS = 65536


def _numeric_view_sql(df: DataFrame, col: str) -> str:
    """SQL text of ``col`` as a double for quantization (timestamps
    via epoch micros — approxQuantile only takes numeric columns).
    Text, not Column: the quantize search tree references the view in
    hundreds of CASE nodes, and building those as Column objects costs
    a Py4J round trip per node (measured: ~4.5 s of pure driver time
    per layout call); one ``F.expr`` over generated text is one
    round trip."""
    q = "`" + col.replace("`", "``") + "`"
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampNTZType):
        return (f"CAST(timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {q}) AS DOUBLE)")
    if isinstance(dt, T.TimestampType):
        return f"CAST(unix_micros({q}) AS DOUBLE)"
    if isinstance(dt, T.DateType):
        return f"CAST(unix_date({q}) AS DOUBLE)"
    return f"CAST({q} AS DOUBLE)"


def _numeric_view(df: DataFrame, col: str) -> F.Column:
    return F.expr(_numeric_view_sql(df, col))


def _quantize_stats(df: DataFrame, cols: Sequence[str], bits: int,
                    quantize: str) -> List[List[float]]:
    """Per-dimension quantize parameters in ONE stats job for all
    dimensions: quantile mode returns each column's strictly-increasing
    cut list (possibly empty); linear mode returns ``[lo, hi]``
    (``[]`` for all-null/constant columns)."""
    views = [_numeric_view(df, c).alias(f"__q{i}")
             for i, c in enumerate(cols)]
    proj = df.select(*views)
    n = 1 << bits
    if quantize == "linear":
        aggs = []
        for i in range(len(cols)):
            aggs += [F.min(f"__q{i}"), F.max(f"__q{i}")]
        row = proj.agg(*aggs).first()
        out = []
        for i in range(len(cols)):
            lo, hi = row[2 * i], row[2 * i + 1]
            out.append([] if lo is None or hi is None or lo == hi
                       else [float(lo), float(hi)])
        return out
    if quantize != "quantile":
        raise ValueError(f"unknown quantize mode {quantize!r}")
    if bits > MAX_QUANTILE_BITS:
        raise ValueError(
            f"quantile mode supports bits <= {MAX_QUANTILE_BITS} "
            f"(got {bits}); use quantize='linear' for finer grids"
        )
    # bounded-sample stats (see QUANTILE_SAMPLE_ROWS): deterministic
    # xxhash64 row sample — never rand(), which draws fresh values on
    # task retry (guide §2.5 / SPARK-38388)
    from hindex_spark.operators.similarity import _estimate_rows

    est = _estimate_rows(df)
    if est > QUANTILE_SAMPLE_ROWS:
        mod = max(1, est // QUANTILE_SAMPLE_ROWS)
        proj = proj.filter(
            F.pmod(
                F.xxhash64(*[f"__q{i}" for i in range(len(cols))]),
                F.lit(mod),
            )
            == 0
        )
    probs = [i / n for i in range(1, n)]
    all_cuts = proj.approxQuantile(
        [f"__q{i}" for i in range(len(cols))], probs, 1.0 / (4 * n)
    )
    out = []
    for cuts in all_cuts:
        uniq: List[float] = []
        for c in cuts:
            if not uniq or c > uniq[-1]:
                uniq.append(c)
        out.append(uniq)
    return out


def _bucket_sql(v_sql: str, stats: List[float], bits: int,
                quantize: str) -> str:
    """SQL text of the bucket expression for one dimension. Generated
    as TEXT and parsed with one ``F.expr``: the quantile search tree
    has 2^bits CASE nodes, and assembling those as Column objects
    costs a Py4J round trip each (~4.5 s of driver time per call at
    bits=8, measured) — string assembly is free."""
    n = 1 << bits
    if not stats:
        return "CAST(0 AS BIGINT)"
    if quantize == "linear":
        lo, hi = stats
        # width_bucket returns 0 / n+1 for out-of-range; clamp to bits
        return (
            f"greatest(CAST(0 AS BIGINT), least(CAST({n - 1} AS BIGINT), "
            f"CAST(width_bucket({v_sql}, {lo!r}, {hi!r}, {n}) - 1 "
            f"AS BIGINT)))"
        )

    # balanced CASE-WHEN binary search over the cuts: bucket(v) =
    # #{cuts <= v}, log2(n) codegen'd comparisons per row. (The obvious
    # alternative — an ``aggregate`` fold over an array of cuts — runs
    # the higher-order lambda INTERPRETED per element: measured 34 s
    # vs ~2 s end-to-end for this tree on the sf0.1 layout job.) A
    # null value fails every WHEN and falls to the leftmost leaf =
    # bucket 0.
    def tree(lo: int, hi: int) -> str:
        if lo == hi:
            return f"CAST({lo} AS BIGINT)"
        mid = (lo + hi) // 2
        return (
            f"(CASE WHEN {v_sql} >= {float(stats[mid])!r} "
            f"THEN {tree(mid + 1, hi)} ELSE {tree(lo, mid)} END)"
        )

    return tree(0, len(stats))


def _bucket_from_stats(v_sql: str, stats: List[float], bits: int,
                       quantize: str) -> F.Column:
    return F.expr(_bucket_sql(v_sql, stats, bits, quantize))


def _bucket_col(df: DataFrame, col: str, bits: int, quantize: str) -> F.Column:
    """``col`` quantized to an integer bucket in [0, 2^bits) — nulls
    land in bucket 0 (they cluster together, which is what stats-based
    skipping wants). One stats job for THIS column; multi-dimension
    callers use ``_quantize_stats`` to batch."""
    stats = _quantize_stats(df, [col], bits, quantize)[0]
    return _bucket_from_stats(
        _numeric_view_sql(df, col), stats, bits, quantize
    )


def _murmur3_hash_long(value: int, seed: int = 42) -> int:
    """Spark's ``Murmur3Hash`` of one LongType column (Murmur3_x86_32
    ``hashLong``, seed 42) — the exact function behind
    ``repartition(n, col)``'s HashPartitioning, reproduced driver-side
    so ``_hash_partition_reps`` can pick representative values that
    route bin i to partition i. Pinned against ``F.hash`` by
    tests/test_layout.py::test_murmur3_long_matches_spark_hash."""
    m = 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & m

    def mixk1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & m
        k1 = rotl(k1, 15)
        return (k1 * 0x1B873593) & m

    def mixh1(h1: int, k1: int) -> int:
        h1 = (h1 ^ k1) & m
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & m

    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = mixh1(seed & m, mixk1(v & m))
    h1 = mixh1(h1, mixk1((v >> 32) & m))
    h1 ^= 8  # fmix(h1, len=8 bytes)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _hash_partition_reps(n: int) -> List[int]:
    """``reps[i]`` = smallest non-negative long whose Spark hash lands
    in partition ``i`` of ``n`` — the identity-routing table that lets
    a plain hash exchange place Morton bin i in partition i (python %
    on a positive modulus is already Spark's pmod)."""
    found: dict = {}
    v = 0
    while len(found) < n:
        p = _murmur3_hash_long(v) % n
        if p not in found:
            found[p] = v
        v += 1
    return [found[i] for i in range(n)]


def _sample_views(df: DataFrame, cols: Sequence[str]):
    """The quantize stats sample as one bounded driver-side matrix:
    the same deterministic ``xxhash64 % mod == 0`` row sample the
    approxQuantile pass used (never ``rand()`` — task-retry hazard,
    guide §2.5 / SPARK-38388), but COLLECTED (<= ~2x
    QUANTILE_SAMPLE_ROWS rows x ndims doubles, a few MB at worst) so
    per-dimension cuts AND Morton-key partition bounds both come out of
    ONE job — where the old shape paid approxQuantile here and then a
    second full execution of the keyed projection inside
    ``repartitionByRange``'s range-sampling job. Returns a list of
    per-dimension float lists (None for null)."""
    views = [_numeric_view(df, c).alias(f"__q{i}")
             for i, c in enumerate(cols)]
    proj = df.select(*views)
    from hindex_spark.operators.similarity import _estimate_rows

    est = _estimate_rows(df)
    if est > QUANTILE_SAMPLE_ROWS:
        mod = max(1, est // QUANTILE_SAMPLE_ROWS)
        proj = proj.filter(
            F.pmod(
                F.xxhash64(*[f"__q{i}" for i in range(len(cols))]),
                F.lit(mod),
            )
            == 0
        )
    rows = proj.collect()
    return [[r[i] for r in rows] for i in range(len(cols))]


def _sample_quantile_cuts(vals, bits: int) -> List[float]:
    """Strictly-increasing equi-depth cuts of one dimension's sample —
    nearest-rank ('lower') quantiles at i/2^bits, i.e. the same
    bucket(v) = #{cuts <= v} contract ``approxQuantile`` fed before.
    Nulls carry no rank signal and are dropped (they land in bucket 0
    via the CASE tree's fall-through, as before)."""
    xs = sorted(v for v in vals if v is not None)
    if not xs:
        return []
    n = 1 << bits
    cuts: List[float] = []
    m = len(xs)
    for i in range(1, n):
        # nearest-rank: the ceil(i*m/n)-th smallest (1-based)
        c = float(xs[(i * m - 1) // n])
        if not cuts or c > cuts[-1]:
            cuts.append(c)
    return cuts


def _sample_zkey_bounds(sample, all_stats, bits: int,
                        n_parts: int) -> List[int]:
    """Equi-depth Morton-key partition bounds from the SAME sample the
    cuts came from: quantize each sample row with the exact bucket rule
    the SQL tree applies (#{cuts <= v}, null -> 0), interleave
    driver-side, and take nearest-rank quantiles at i/n_parts. Strictly
    increasing (duplicates merge — skewed keys then share a partition,
    exactly the range partitioner's behavior)."""
    import numpy as np  # vectorized: the pure-Python loop cost ~0.3 s
    # of driver time per call at a 64k sample (measured)

    if n_parts <= 1 or not sample or not sample[0]:
        return []
    nd = len(sample)
    z = np.zeros(len(sample[0]), dtype=np.int64)
    for d in range(nd):
        vals = np.array([np.nan if v is None else v for v in sample[d]],
                        dtype=np.float64)
        cuts = np.asarray(all_stats[d], dtype=np.float64)
        # #{cuts <= v}; NaN (null view) sorts after everything under
        # searchsorted, so pin it to bucket 0 like the CASE tree does
        b = (np.searchsorted(cuts, vals, side="right")
             if cuts.size else np.zeros(len(vals), dtype=np.int64))
        b = np.where(np.isnan(vals), 0, b).astype(np.int64)
        for i in range(bits):
            z |= ((b >> i) & 1) << (i * nd + d)
    z.sort()
    m = len(z)
    bounds: List[int] = []
    for i in range(1, n_parts):
        c = int(z[(i * m - 1) // n_parts])
        if not bounds or c > bounds[-1]:
            bounds.append(c)
    return bounds


def _int_searchsorted_sql(v_sql: str, bounds: List[int]) -> str:
    """Balanced CASE tree computing #{bounds <= v} over INT bounds —
    ``_bucket_sql``'s tree with integer literals (the Morton key can
    exceed 2^53, so float literals would mis-compare)."""
    def tree(lo: int, hi: int) -> str:
        if lo == hi:
            return f"CAST({lo} AS INT)"
        mid = (lo + hi) // 2
        return (
            f"(CASE WHEN {v_sql} >= {int(bounds[mid])}L "
            f"THEN {tree(mid + 1, hi)} ELSE {tree(lo, mid)} END)"
        )

    return tree(0, len(bounds))


def _validate(cols: Sequence[str], bits: int) -> None:
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"{len(cols)} dims x {bits} bits = {bits * len(cols)} key "
            "bits > 62; lower bits or drop a dimension"
        )


def _interleave(buckets: Sequence[F.Column], bits: int) -> F.Column:
    """Round-robin Morton interleave: bit i of dimension d lands at
    position ``i * ndims + d``. Each bucket expression is referenced
    ``bits`` times, so callers MUST pass cheap references (materialized
    columns) — threading the quantize search tree through here
    verbatim multiplies it ``bits``-fold and blows codegen up (the OOM
    zorder_frame's withColumn staging exists to prevent)."""
    nd = len(buckets)
    terms = [
        F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), i * nd + d
        ).cast("long")
        for d, b in enumerate(buckets)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    quantize: str = "quantile",
) -> F.Column:
    """The Morton (Z-order) key of ``cols`` as a single long column
    expression. NOTE: inlines each dimension's quantize tree ``bits``
    times — fine for small grids (linear mode, or quantile at coarse
    bits); for production layout use ``zorder_frame``, which stages
    the buckets as materialized columns first."""
    _validate(cols, bits)
    buckets = [_bucket_col(df, c, bits, quantize) for c in cols]
    return _interleave(buckets, bits)


def zorder_frame(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: Optional[int] = None,
    bits: int = 8,
    quantize: str = "quantile",
) -> DataFrame:
    """``df`` re-laid-out in Z-order on ``cols``: one range exchange on
    the Morton key + an in-partition sort, Morton key dropped — write
    the result with ``.write.parquet`` (or hand it to the catalog) and
    every output file covers a contiguous Morton range, so parquet
    min/max stats skip files/row-groups for predicates on any of the
    participating columns. ``num_partitions`` sets the output file
    count (default: Spark's range-partition default).

    The per-dimension bucket expressions are staged as real columns
    BEFORE the interleave, so each quantize search tree appears once
    in the plan however many bits ride on it.

    Quantile mode (the default) runs the WHOLE layout as one bounded
    stats job + one hash exchange: the deterministic row sample is
    collected once and yields both the per-dimension cuts and the
    Morton-key partition bounds driver-side, each row's partition is
    ``#{bounds <= zkey}`` remapped through a hash-representative value
    that routes bin i to partition i — so partitions cover contiguous,
    globally ordered Morton ranges exactly like ``repartitionByRange``,
    WITHOUT the range partitioner's sampling pass (which re-executed
    the keyed projection — scan, quantize trees, interleave — over the
    full table a second time; at 100 TB that second pass is a full
    corpus read). Linear mode keeps the range exchange (its stats pass
    has no sample to reuse)."""
    _validate(cols, bits)
    sample = None
    if quantize == "quantile":
        if bits > MAX_QUANTILE_BITS:
            raise ValueError(
                f"quantile mode supports bits <= {MAX_QUANTILE_BITS} "
                f"(got {bits}); use quantize='linear' for finer grids"
            )
        sample = _sample_views(df, cols)
        all_stats = [_sample_quantile_cuts(v, bits) for v in sample]
    else:
        all_stats = _quantize_stats(df, cols, bits, quantize)
    # stage the numeric views as real columns first, so each quantize
    # tree's hundreds of CASE nodes reference a 6-char attribute (and
    # the view conversion runs once per row, not once per node)
    keyed = df
    names = []
    for idx, c in enumerate(cols):
        keyed = keyed.withColumn(
            f"__zv{idx}", F.expr(_numeric_view_sql(df, c))
        )
        keyed = keyed.withColumn(
            f"__zb{idx}",
            _bucket_from_stats(
                f"`__zv{idx}`", all_stats[idx], bits, quantize
            ),
        )
        names.append(f"__zb{idx}")
    keyed = keyed.withColumn(
        "__zkey", _interleave([F.col(n) for n in names], bits)
    )
    names += [f"__zv{i}" for i in range(len(cols))]
    if sample is not None:
        if num_partitions is not None:
            n_parts = int(num_partitions)
        else:
            try:
                n_parts = int(
                    df.sparkSession.conf.get("spark.sql.shuffle.partitions")
                )
            except (TypeError, ValueError):
                n_parts = df.sparkSession.sparkContext.defaultParallelism
        bounds = _sample_zkey_bounds(sample, all_stats, bits, n_parts)
        if n_parts > 1 and bounds:
            reps = _hash_partition_reps(n_parts)
            keyed = keyed.withColumn(
                "__zpid", F.expr(_int_searchsorted_sql("`__zkey`", bounds))
            ).withColumn(
                "__zrep",
                F.element_at(
                    F.array(*[F.lit(r).cast("long") for r in reps]),
                    F.col("__zpid") + 1,
                ),
            )
            keyed = keyed.repartition(n_parts, "__zrep")
            names += ["__zpid", "__zrep"]
        else:
            keyed = keyed.repartition(1)
    elif num_partitions is not None:
        keyed = keyed.repartitionByRange(num_partitions, "__zkey")
    else:
        keyed = keyed.repartitionByRange("__zkey")
    return keyed.sortWithinPartitions("__zkey").drop("__zkey", *names)
