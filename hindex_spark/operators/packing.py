"""Benchmark decontamination and sequence packing — the last-mile
operators of a training-data pipeline (after cleaning/dedup, before the
corpus ships to a trainer).

Decontamination: flag (or drop) training documents that share any
n-gram with an evaluation/benchmark set — the overlap rule used to keep
test sets out of training corpora. Scale shape: explode BOTH sides to
(ngram, id), equi-join on the n-gram and aggregate — an inverted-index
join whose cost is bounded by the (small) benchmark's n-gram set, never
a cross join; a broadcast hint keeps the big side shuffle-free when the
benchmark fits in memory (the common case).

Sequence packing: assign documents to fixed-token-budget bins (contexts)
with a greedy next-fit pass per shard — one window cumsum, no driver
loop. Bins are ``(shard, bin)`` pairs; within a shard the packing is the
deterministic next-fit over rowkey order, so the output is reproducible
and SQL-expressible (the oracle runs the same cumsum).

No reference analog (HBase has no text pipeline); part of the
LLM-pipeline operator set alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from hindex_spark.operators.dedup import doc_units
from hindex_spark.operators.sampling import _bucket_for
from hindex_spark.operators.text import token_count, tokens


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """(id, n_hits): training docs sharing >= ``min_hits`` distinct
    n-grams with the benchmark set. ``ngram`` defaults to 8 — long
    enough that natural-language collisions are rare (the GPT-3/Pile
    style overlap rule)."""
    train_units = doc_units(docs, id_col, text_col, ngram).distinct()
    bench_units = (
        doc_units(benchmark, id_col, text_col, ngram).select("token").distinct()
    )
    return (
        train_units.join(F.broadcast(bench_units), "token")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated docs (anti-join on the flagged id set)."""
    flagged = contaminated_ids(docs, benchmark, id_col, text_col, ngram, min_hits)
    return docs.join(flagged.select(id_col), id_col, "left_anti")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
    length_col: str | None = None,
) -> DataFrame:
    """Assign each doc a ``(shard, bin, pos)``: boundary-crossing packing
    of token counts into ``budget``-token bins, independently per shard.

    Semantics: within a shard, docs are laid end-to-end in id order and
    ``bin = floor((cumsum - 1) / budget)`` — a doc belongs to the budget
    window its inclusive running total ends in. A bin's payload can
    exceed the budget by less than the length of its first doc (lengths
    are capped at ``budget``), which is the standard streaming
    approximation: EXACT greedy next-fit needs the current bin's slack,
    which is recursive and cannot be one window — this form is within
    one doc of it, deterministic, and SQL-reproducible (the oracle runs
    the same cumsum). One shuffle (the per-shard window), no driver
    loop.

    Sharding is by id hash, so packing parallelism is ``n_shards``-wide
    and adding shards never changes intra-shard results."""
    raw_len = token_count(F.col(text_col)) if length_col is None else F.col(length_col)
    # clamp to [1, budget]: a 0/NULL user-supplied length would otherwise
    # put the first doc of a shard in bin -1 (floor(-1/budget));
    # tokenized text is always >= 1 token, so the gate oracle sees no
    # change
    L = F.least(F.greatest(raw_len, F.lit(1)), F.lit(budget))
    sized = docs.select(
        F.col(id_col),
        L.alias("__len"),
        # arithmetic bucket, not hash(): deterministic across engines
        F.pmod(_bucket_for(docs, id_col), F.lit(n_shards)).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    sized = sized.withColumn("__cum", F.sum("__len").over(w))
    out = sized.withColumn(
        "bin", F.floor((F.col("__cum") - 1) / F.lit(budget)).cast("int")
    )
    wpos = Window.partitionBy("shard", "bin").orderBy(id_col)
    return out.select(
        id_col,
        "shard",
        "bin",
        (F.row_number().over(wpos) - 1).alias("pos"),
        F.col("__len").alias("n_tokens"),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 42,
    hash_fn: str = "md5",
    with_positions: bool = True,
) -> DataFrame:
    """Deterministic GLOBAL shuffle + shard assignment — the step that
    turns a cleaned corpus into training shards whose read order is a
    seeded pseudo-random permutation (trainers stream shards
    sequentially; the shuffle must happen HERE, at write time, because
    no trainer can shuffle 100 TB at read time).

    Every doc gets ``key = H(id, seed)`` (seeded, so re-sharding with a
    new seed is a new permutation and the same seed is bit-reproducible
    across runs AND engines — no ``rand()``, no ``hash()``),
    ``shard = key % n_shards`` and, within the shard, ``position`` =
    rank by (key, id). Reading shards in position order IS the permuted
    corpus.

    ``hash_fn="md5"`` is the oracle-exact path (md5 prefix -> 60-bit
    int, the MinHash-family convention); ``"xx"`` is the production
    path (``xxhash64(id, seed)`` stays inside codegen, no string
    round-trip).

    Scale shape: the key and shard are a pure projection (no shuffle).
    ``with_positions=True`` adds ONE shuffle — a per-shard window sort —
    and each shard lands on one task, so size ``n_shards`` to your
    cluster (1024 shards over 100 TB = ~100 GB sorts: use more shards).
    ``with_positions=False`` skips the window entirely — callers that
    just write shard files should ``repartition(n_shards, "shard")``
    + ``sortWithinPartitions("key")``, which gets Spark's sort-spill
    machinery instead of a rank column.

    Output: (id, shard, position?, key).
    """
    if hash_fn == "md5":
        key = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    elif hash_fn == "xx":
        key = F.xxhash64(F.col(id_col), F.lit(seed))
    else:
        raise ValueError(f"hash_fn must be 'md5' or 'xx', got {hash_fn!r}")
    keyed = df.select(
        F.col(id_col),
        key.alias("key"),
    ).withColumn("shard", F.pmod(F.col("key"), F.lit(n_shards)).cast("int"))
    if not with_positions:
        return keyed.select(id_col, "shard", "key")
    w = Window.partitionBy("shard").orderBy("key", id_col)
    return keyed.select(
        id_col,
        "shard",
        F.row_number().over(w).alias("position"),
        "key",
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token-budgeted chunks with optional overlap
    — the context-window preparation step between cleaning and packing:
    a doc longer than the trainer's window must become several
    (optionally overlapping) windows, never be truncated silently.

    Chunk k covers 1-indexed token positions
    ``[1 + k*stride, 1 + k*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; the chunk count
    ``1 + ceil(max(n - max_tokens, 0) / stride)`` guarantees full
    coverage (every token is in some chunk; the last chunk may be
    short). Output: (id, chunk_idx, n_tokens, chunk_text), where
    chunk_text is the whitespace-CANONICAL rejoin (single spaces — the
    same normalization the tokenizer implies).

    Scale shape: one map-side projection (tokenize, explode a
    chunk-index sequence, slice) — no shuffle, no UDF; the explosion
    factor is exactly total_tokens/stride. NULL/whitespace-only texts
    produce no chunks (there is nothing to train on).
    """
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap=} {max_tokens=}")
    stride = max_tokens - overlap
    toks = tokens(F.trim(F.col(text_col)))
    base = docs.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - F.lit(max_tokens), F.lit(0))
             + F.lit(stride - 1)) / F.lit(stride)
        )
    ).cast("long")
    exploded = base.select(
        id_col, "__toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
        .alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("__toks"),
        (F.col("chunk_idx") * stride + 1).cast("int"),
        max_tokens,
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
