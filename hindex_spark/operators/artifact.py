"""Shared upsert/delete machinery for append-maintained artifact stores
(SearchIndex postings, DedupState rows).

The stores' update() contract is append-only: re-ingesting an id ADDS
rows. Replacement needs deletion, and the rows to delete are scattered
across the store's buckets (a document's postings hash by token, not by
id), so a partial rewrite can't be bucket-confined. The classic answer
is Lucene's: a generation-stamped store plus a small side set of
"superseded up to generation G" markers consulted at read time, purged
physically at the next compaction — the LSM newest-cell-wins rule this
engine already applies to cell versions (cells.py), applied to artifact
rows.

Mechanics:

- every store row carries ``gen`` (the writer generation that produced
  it; build = 0);
- a tombstone is ``(id, below_gen)``: rows of ``id`` with
  ``gen < below_gen`` are dead. Tombstones live in a small side parquet
  directory, appended per upsert/delete;
- the live view left-joins the BROADCAST per-id max(below_gen) onto the
  store and filters — one broadcast hash join, zero shuffles of the
  store, and key-pruning filters (token buckets, fp semi-joins) still
  push below it to the scan. With no tombstones the store frame is
  returned untouched;
- ``compact()`` applies the same filter while rewriting and clears the
  tombstone directory. Generations are PRESERVED across compaction, so
  re-applying a stale tombstone set after a crash-between-steps is a
  no-op (every surviving row already satisfies it).

Scale contract: the tombstone set is broadcast-material BY DESIGN —
it holds ids upserted/deleted since the last compaction, the exact
analog of Lucene's live-docs bitset. ``tombstone_count`` lets callers
schedule compaction before the set outgrows a broadcast.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tombstone_path(catalog_root: str, table_name: str) -> str:
    return os.path.join(catalog_root, f"{table_name}_tombstones")


def _has_tombstones(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def read_tombstone_cuts(spark: SparkSession, path: str):
    """Per-id generation cutoff, or None when no tombstones exist:
    (id-named column, __below = max below_gen)."""
    if not _has_tombstones(path):
        return None
    return spark.read.parquet(path)


def append_tombstones(ids: DataFrame, id_col: str, below_gen: int,
                      path: str) -> None:
    """Record 'rows of these ids below ``below_gen`` are dead'. The ids
    frame is expected to be small (an upsert batch's pre-existing ids);
    coalesced to one file so the side directory stays a handful of tiny
    parquet files between compactions."""
    (
        ids.select(F.col(id_col), F.lit(below_gen).cast("long").alias("below_gen"))
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def live_view(store: DataFrame, id_col: str, spark: SparkSession,
              path: str) -> DataFrame:
    """The store minus tombstoned generations. No tombstones -> the
    frame itself (zero overhead on never-upserted stores). A store
    written before the gen column existed has nothing to resolve."""
    if "gen" not in store.columns:
        return store
    tomb = read_tombstone_cuts(spark, path)
    if tomb is None:
        return store
    cuts = tomb.groupBy(id_col).agg(F.max("below_gen").alias("__below"))
    return (
        store.join(F.broadcast(cuts), id_col, "left")
        .filter(F.col("__below").isNull() | (F.col("gen") >= F.col("__below")))
        # the equi-join hoists the join key to column 0 — restore the
        # store's declared order, or a tombstone-purging compact()
        # rewrites the table key-first and the next positional
        # INSERT INTO miswrites (caught by the interleaving property
        # test: upsert -> compact -> upsert)
        .select(*store.columns)
    )


def clear_tombstones(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def tombstone_count(spark: SparkSession, path: str) -> int:
    """Distinct tombstoned ids — the broadcast-size gauge a maintenance
    job checks to schedule compaction."""
    tomb = read_tombstone_cuts(spark, path)
    if tomb is None:
        return 0
    return tomb.select(tomb.columns[0]).distinct().count()


def maintenance_stats(catalog, table_name: str) -> dict:
    """The numbers a maintenance job schedules compaction on:
    ``tombstoned_ids`` (distinct ids with live cuts — the broadcast-size
    gauge; Lucene's deleted-docs count) and ``data_files`` (parquet
    files under the store — files/bucket beyond 1 costs scans their
    reported sort order and per-file opens). Driver-side listing + one
    tiny tombstone aggregate; never touches the store's data."""
    data_dir = os.path.join(catalog.root, table_name, "data")
    files = 0
    if os.path.isdir(data_dir):
        files = sum(
            1 for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
    return {
        "tombstoned_ids": tombstone_count(
            catalog.spark, tombstone_path(catalog.root, table_name)
        ),
        "data_files": files,
    }


#: meta-file suffix -> artifact kind (the stores' open() entry points)
_KINDS = {
    "_postings_meta.json": "search_index",
    "_dedupstate_meta.json": "dedup_state",
    "_rollup_meta.json": "rollup_store",
    "_annindex_meta.json": "ann_index",
    "_importance_meta.json": "importance_model",
}


def list_artifacts(catalog) -> list:
    """(name, kind) of every artifact store in the catalog — the
    discovery surface ``Catalog.list_tables`` provides for tables,
    extended to the meta-file-rooted stores. Driver-side listing
    only."""
    out = []
    if not os.path.isdir(catalog.root):
        return out
    for f in sorted(os.listdir(catalog.root)):
        for suffix, kind in _KINDS.items():
            if f.endswith(suffix):
                out.append((f[: -len(suffix)], kind))
    return out


def maybe_compact(store, max_tombstoned: int = 100_000,
                  max_files_per_bucket: int = 8) -> bool:
    """Compact ``store`` when maintenance debt crosses either threshold:
    the tombstone set approaching non-broadcast size (Lucene's
    too-many-deletes merge trigger) or file fragmentation costing scans
    their bucket sort. Works on any artifact store (duck-typed:
    ``catalog``/``table_name``/``num_buckets``/``id_col``/``compact``).
    Returns whether a compaction ran — call it after the daily
    update/upsert batch and maintenance schedules itself."""
    stats = maintenance_stats(store.catalog, store.table_name)
    if (
        stats["tombstoned_ids"] > max_tombstoned
        or stats["data_files"] > max_files_per_bucket * store.num_buckets
    ):
        store.compact()
        return True
    return False
