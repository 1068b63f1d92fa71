"""Incrementally-maintained materialized join view (IVM): a persisted
equi-join of two append/correct streams that is updated by DELTA joins,
never recomputed — the Materialize / TimescaleDB-continuous-aggregate
answer to "this dashboard join rescans two huge tables every refresh",
and the join-shaped sibling of RollupStore (which maintains
aggregations the same way).

The reference maintains DERIVED state incrementally on every put — the
secondary index rows a mutation implies (IndexRegionObserver's
prePut/postPut derivation, build.py:59 mirrors it). A join view is the
same discipline applied to a two-table join: each side's new batch
implies exactly ``delta >< other_side`` new join rows.

Delta algebra (inner equi-join):

- ``update_left(dl)``:  MV += dl >< R_live;   L += dl    (one
  delta-sized join against the bucketed right store — co-located, the
  store side never reshuffles)
- ``update_right(dr)``: MV += L_live >< dr;   R += dr
- every MV row carries (lgen, rgen) — the generation of the left and
  right source rows that produced it. Retracting a batch therefore
  needs NO delta computation at all: killing left generation g kills
  exactly the MV rows with ``lgen = g``, however long ago they were
  produced and whichever later right-batches joined against g's rows.
- ``replace_*_batch`` = retract + append-corrected under one lease:
  the corrected rows join against the CURRENT live other side, so the
  view converges to exactly the join of the surviving batches (pinned
  by the interleaving property test).

Liveness needs no tombstone files: a generation is dead iff the meta's
correction map says so, and the whole-generation cut is a driver-side
``NOT IN (dead gens)`` scan filter — zero extra jobs, pushed to the
parquet scan. ``compact()`` rewrites the three tables without dead
rows and SEALS the folded generations (corrections of them are refused
afterwards — same rule as RollupStore.compact).

Scale: updates cost one delta-sized bucketed join + delta-sized
appends; reads cost a scan filter over the materialized result —
never the join. The MV is bucketed on the join key, so downstream
key-grouped consumption stays exchange-free.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class JoinView:
    """Persisted incrementally-maintained inner equi-join.

    Lifecycle::

        jv = JoinView.build(cat, orders, items, "o_orderkey", "oi")
        lg = jv.update_left(new_orders)     # delta join + append
        rg = jv.update_right(new_items)
        jv.replace_right_batch(rg, fixed)   # correct a bad batch
        joined = jv.read()                  # materialized, no join
    """

    def __init__(self, catalog, name: str, key: str,
                 left_cols: List[str], right_cols: List[str],
                 num_buckets: int = 32):
        self.catalog = catalog
        self.name = name
        self.key = key
        self.left_cols = list(left_cols)
        self.right_cols = list(right_cols)
        self.num_buckets = num_buckets
        self.cur_lgen = 0
        self.cur_rgen = 0
        self.sealed_lbelow = 0
        self.sealed_rbelow = 0
        #: str(gen) -> superseding gen (None = retracted); a gen is
        #: DEAD iff present here. Same refusal algebra as RollupStore.
        self.corrected_l = {}
        self.corrected_r = {}
        #: version history for time travel (read_asof): one entry per
        #: mutating verb — {"v", "op", "side", "add", "drop"}; compact
        #: seals everything before it. None on stores written before
        #: versions existed.
        self.history = [{"v": 0, "op": "build", "side": "",
                         "add": [], "drop": []}]
        self.cur_version = 0
        self.sealed_version = 0

    # -- storage ------------------------------------------------------------

    @property
    def table_name(self) -> str:
        """The MV table directory — what ``artifact.maybe_compact``'s
        duck-typed maintenance gauges (file fragmentation; this store
        has no tombstone files, so only the file trigger fires)."""
        return self._tbl("mv")

    def _tbl(self, side: str) -> str:
        return f"{self.name}_jv{side}_bucketed"

    def _sql(self, side: str) -> str:
        return self.catalog.bucketed_sql_name(self._tbl(side))

    def _meta_path(self) -> str:
        return os.path.join(self.catalog.root,
                            f"{self.name}_joinview_meta.json")

    def _meta(self) -> dict:
        return {"key": self.key, "left_cols": self.left_cols,
                "right_cols": self.right_cols,
                "num_buckets": self.num_buckets,
                "cur_lgen": self.cur_lgen, "cur_rgen": self.cur_rgen,
                "sealed_lbelow": self.sealed_lbelow,
                "sealed_rbelow": self.sealed_rbelow,
                "corrected_l": self.corrected_l,
                "corrected_r": self.corrected_r,
                "history": self.history,
                "cur_version": self.cur_version,
                "sealed_version": self.sealed_version}

    def _load(self, m: dict) -> None:
        self.num_buckets = m.get("num_buckets", 32)
        self.cur_lgen = m.get("cur_lgen", 0)
        self.cur_rgen = m.get("cur_rgen", 0)
        self.sealed_lbelow = m.get("sealed_lbelow", 0)
        self.sealed_rbelow = m.get("sealed_rbelow", 0)
        self.corrected_l = m.get("corrected_l", {})
        self.corrected_r = m.get("corrected_r", {})
        self.history = m.get("history")
        self.cur_version = m.get("cur_version", 0)
        self.sealed_version = m.get("sealed_version", 0)

    def _reload_meta(self) -> None:
        """Top of every locked mutation — another process may have
        advanced either side (the cross-process lost-update guard every
        store in this repo applies)."""
        with open(self._meta_path()) as f:
            self._load(json.load(f))

    def _commit_meta(self) -> None:
        with open(self._meta_path(), "w") as f:
            json.dump(self._meta(), f)

    @classmethod
    def build(cls, catalog, left: DataFrame, right: DataFrame, key: str,
              name: str, num_buckets: int = 32) -> "JoinView":
        """Materialize the initial join (generation 0 on both sides).
        Non-key column names must be disjoint across sides — the MV
        carries both payloads side by side."""
        from hindex_spark.table import Table

        lcols = [c for c in left.columns if c != key]
        rcols = [c for c in right.columns if c != key]
        clash = sorted(set(lcols) & set(rcols))
        if clash:
            raise ValueError(
                f"non-key columns present on both sides: {clash}; "
                "alias one side before build()"
            )
        if key not in left.columns or key not in right.columns:
            raise ValueError(f"join key {key!r} missing from a side")
        jv = cls(catalog, name, key, lcols, rcols, num_buckets)
        # Normalize to key-first column order BEFORE persisting: every
        # later append (_append) is a positional INSERT INTO that
        # selects (key, *cols, gen) — a build frame with the key not
        # first would otherwise store a swapped layout that appends
        # silently corrupt.
        left = left.select(key, *lcols)
        right = right.select(key, *rcols)
        lrows = left.withColumn("gen", F.lit(0).cast("long"))
        rrows = right.withColumn("gen", F.lit(0).cast("long"))
        mv = (
            left.join(right, key)
            .withColumn("lgen", F.lit(0).cast("long"))
            .withColumn("rgen", F.lit(0).cast("long"))
            .select(key, *lcols, *rcols, "lgen", "rgen")
        )
        for side, rows in (("l", lrows), ("r", rrows), ("mv", mv)):
            catalog.save_bucketed(
                Table(rows, key, f"{name}_jv{side}"), num_buckets=num_buckets
            )
        jv._commit_meta()
        return jv

    @classmethod
    def open(cls, catalog, name: str) -> "JoinView":
        with open(os.path.join(
                catalog.root, f"{name}_joinview_meta.json")) as f:
            m = json.load(f)
        jv = cls(catalog, name, m["key"], m["left_cols"], m["right_cols"])
        jv._load(m)
        return jv

    def _ensure_registered(self) -> None:
        for side in ("l", "r", "mv"):
            if not self.catalog.spark.catalog.tableExists(self._sql(side)):
                self.catalog._attach_bucketed(
                    self._sql(side),
                    os.path.join(self.catalog.root, self._tbl(side), "data"),
                    self.key, [self.key], self.num_buckets,
                )

    def _raw(self, side: str) -> DataFrame:
        self._ensure_registered()
        self.catalog.spark.catalog.refreshTable(self._sql(side))
        return self.catalog.spark.table(self._sql(side))

    @staticmethod
    def _minus_dead(df: DataFrame, gen_col: str, dead: dict) -> DataFrame:
        """Drop dead generations — a scan filter from meta, no jobs.
        No deaths -> the frame untouched."""
        if not dead:
            return df
        return df.filter(~F.col(gen_col).isin([int(g) for g in dead]))

    def left_rows(self) -> DataFrame:
        """The live left side (surviving batches)."""
        return self._minus_dead(self._raw("l"), "gen", self.corrected_l)

    def right_rows(self) -> DataFrame:
        return self._minus_dead(self._raw("r"), "gen", self.corrected_r)

    def read(self, with_gens: bool = False) -> DataFrame:
        """The maintained join — a filtered scan of the materialized
        table, NEVER a join. A row is live iff BOTH its source
        generations survive."""
        mv = self._minus_dead(
            self._minus_dead(self._raw("mv"), "lgen", self.corrected_l),
            "rgen", self.corrected_r,
        )
        return mv if with_gens else mv.drop("lgen", "rgen")

    def read_left_outer(self) -> DataFrame:
        """LEFT OUTER serving over the inner-maintained view: the
        materialized inner rows UNION the live left rows whose key has
        no live right match, right payload NULL. Outer semantics are
        DERIVED AT READ TIME (one key-projected anti-join of the two
        side stores — both bucketed on the key, so it co-partitions
        without a shuffle) instead of maintained: maintaining outer
        rows incrementally needs per-row match counting (a right batch
        adding the first match for a key must retract its null row),
        which buys nothing over this bounded read-time derivation.
        ``read_right_outer`` is the caller swapping sides at build."""
        mv_schema = {f.name: f.dataType for f in self._raw("mv").schema}
        rkeys = self.right_rows().select(self.key).distinct()
        unmatched = (
            self.left_rows().drop("gen")
            .join(rkeys, self.key, "left_anti")
        )
        for c in self.right_cols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(mv_schema[c])
            )
        return self.read().unionByName(
            unmatched.select(self.key, *self.left_cols, *self.right_cols)
        )

    def read_with(self, tail_left: Optional[DataFrame] = None,
                  tail_right: Optional[DataFrame] = None,
                  with_gens: bool = False) -> DataFrame:
        """REAL-TIME read (the lambda shape RollupStore.read_with and
        ProfileStore.read_with serve): the maintained view UNION the
        join rows the un-ingested tail batches imply — exactly what
        ``read()`` would return after ``update_left(tail_left)`` +
        ``update_right(tail_right)``, without writing anything. Same
        caller contract as update(): tails are batches the view has
        NOT seen. Delta algebra: tl><R + L><tr + tl><tr."""
        out = self.read(with_gens=True)
        mvcols = [self.key, *self.left_cols, *self.right_cols,
                  "lgen", "rgen"]
        fake = F.lit(-1).cast("long")
        if tail_left is not None:
            self._check_side(tail_left, self.left_cols)
            out = out.unionByName(
                tail_left.join(self.right_rows(), self.key)
                .withColumnRenamed("gen", "rgen")
                .withColumn("lgen", fake).select(*mvcols)
            )
        if tail_right is not None:
            self._check_side(tail_right, self.right_cols)
            out = out.unionByName(
                self.left_rows().withColumnRenamed("gen", "lgen")
                .join(tail_right, self.key)
                .withColumn("rgen", fake).select(*mvcols)
            )
        if tail_left is not None and tail_right is not None:
            out = out.unionByName(
                tail_left.join(tail_right, self.key)
                .withColumn("lgen", fake).withColumn("rgen", fake)
                .select(*mvcols)
            )
        return out if with_gens else out.drop("lgen", "rgen")

    def _record_version(self, op: str, side: str, add=(), drop=(),
                        seal: bool = False) -> None:
        """Append one verb to the version history (caller holds the
        lease and commits meta afterwards). Pre-history stores stay
        history-less — a partial history reconstructs WRONG states."""
        if self.history is None:
            return
        self.cur_version += 1
        self.history.append({
            "v": self.cur_version, "op": op, "side": side,
            "add": [int(g) for g in add], "drop": [int(g) for g in drop],
        })
        if seal:
            self.sealed_version = self.cur_version

    def _live_at(self, version: int) -> dict:
        """Replay the history prefix into per-side live generation
        sets. Compact's folded gens ADD without clearing — the same
        tolerant replay as RollupStore._live_gens_at (pre-fold rows
        and folded rows are disjoint alternatives carrying identical
        values, so the union reads correctly before AND after the
        rewrite, including a crash between meta commit and fold)."""
        live = {"l": {0}, "r": {0}}
        for ev in self.history:
            if ev["v"] > version:
                break
            if ev["side"] in live:
                live[ev["side"]] |= set(ev["add"])
                live[ev["side"]] -= set(ev["drop"])
            else:  # compact touches both sides
                live["l"] |= set(ev["add"][:1])
                live["r"] |= set(ev["add"][1:])
        return live

    def versions(self) -> list:
        """The store's version history (DESCRIBE HISTORY), oldest
        first; entries below ``sealed_version`` are listed but no
        longer readable."""
        return list(self.history or [])

    def read_asof(self, version: int, with_gens: bool = False) -> DataFrame:
        """TIME TRAVEL: the view exactly as ``read()`` returned it at
        store version ``version`` (build = 0; every mutating verb
        bumps, ``versions()`` lists them). A generation-set scan
        filter replayed from meta — zero extra jobs; versions before
        the last compact() rewrite are refused (the VACUUM rule)."""
        self._reload_meta()
        if self.history is None:
            raise ValueError(
                f"join view {self.name} predates version history; "
                "rebuild it to enable time travel"
            )
        if version > self.cur_version:
            raise ValueError(
                f"version {version} does not exist (cur_version="
                f"{self.cur_version})"
            )
        if version < self.sealed_version:
            sealing = next(
                ev for ev in self.history if ev["v"] == self.sealed_version
            )
            raise ValueError(
                f"version {version} was sealed by {sealing['op']}() at "
                f"version {self.sealed_version}: the rewrite purged rows "
                "its reconstruction needs"
            )
        live = self._live_at(version)
        mv = self._raw("mv").filter(
            F.col("lgen").isin([int(g) for g in sorted(live["l"])])
            & F.col("rgen").isin([int(g) for g in sorted(live["r"])])
        )
        return mv if with_gens else mv.drop("lgen", "rgen")

    # -- maintenance --------------------------------------------------------

    def _append(self, side: str, rows: DataFrame) -> None:
        view = f"__jv_append_{self.name}_{side}"
        sess = rows.sparkSession
        rows.createOrReplaceTempView(view)
        sess.sql(f"INSERT INTO {self._sql(side)} SELECT * FROM {view}")
        sess.catalog.dropTempView(view)
        self.catalog.spark.catalog.refreshTable(self._sql(side))

    def _append_pair(self, a, b) -> None:
        """Run two independent side appends as CONCURRENT jobs (they
        write different tables and share no input): Spark's scheduler
        happily overlaps them, so the update's wall time is the max of
        the two delta-sized writes instead of their sum — the
        idle-capacity overlap of optimization-guide §2.6. Thread count
        is fixed at 2; failures propagate from both futures. Still
        under the store's write lock, so external ordering and the
        meta commit are unchanged."""
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        with ThreadPoolExecutor(max_workers=2) as pool:
            fa = pool.submit(self._append, a[0], a[1])
            fb = pool.submit(self._append, b[0], b[1])
            fa.result()
            fb.result()

    def _check_side(self, batch: DataFrame, cols: List[str]) -> None:
        want = {self.key, *cols}
        if set(batch.columns) != want:
            raise ValueError(
                f"batch columns {sorted(batch.columns)} != view side "
                f"{sorted(want)}"
            )

    def update_left(self, batch: DataFrame) -> int:
        """Append a left batch: delta join against the live right
        store, both appends delta-sized. Returns the batch's
        generation (the handle corrections use)."""
        self._check_side(batch, self.left_cols)
        with self.catalog.write_lock(self._tbl("mv")):
            self._reload_meta()
            self._ensure_registered()
            gen = self.cur_lgen + 1
            delta = (
                batch.join(self.right_rows(), self.key)
                .withColumnRenamed("gen", "rgen")
                .withColumn("lgen", F.lit(gen).cast("long"))
            )
            # column order must match the stored MV exactly (positional
            # INSERT INTO)
            delta = delta.select(
                self.key, *self.left_cols, *self.right_cols, "lgen", "rgen"
            )
            self._append_pair(
                ("mv", delta),
                ("l", batch.select(self.key, *self.left_cols)
                 .withColumn("gen", F.lit(gen).cast("long"))),
            )
            self.cur_lgen = gen
            self._record_version("update", "l", add=[gen])
            self._commit_meta()
        return gen

    def update_right(self, batch: DataFrame) -> int:
        self._check_side(batch, self.right_cols)
        with self.catalog.write_lock(self._tbl("mv")):
            self._reload_meta()
            self._ensure_registered()
            gen = self.cur_rgen + 1
            delta = (
                self.left_rows().withColumnRenamed("gen", "lgen")
                .join(batch, self.key)
                .withColumn("rgen", F.lit(gen).cast("long"))
            )
            delta = delta.select(
                self.key, *self.left_cols, *self.right_cols, "lgen", "rgen"
            )
            self._append_pair(
                ("mv", delta),
                ("r", batch.select(self.key, *self.right_cols)
                 .withColumn("gen", F.lit(gen).cast("long"))),
            )
            self.cur_rgen = gen
            self._record_version("update", "r", add=[gen])
            self._commit_meta()
        return gen

    def _check_correctable(self, gen: int, side: str) -> None:
        cur = self.cur_lgen if side == "l" else self.cur_rgen
        sealed = self.sealed_lbelow if side == "l" else self.sealed_rbelow
        corrected = self.corrected_l if side == "l" else self.corrected_r
        if gen < sealed:
            raise ValueError(
                f"{side}-generation {gen} was folded by compact() "
                f"(sealed below {sealed}); its batch identity is gone"
            )
        if gen > cur:
            raise ValueError(
                f"{side}-generation {gen} does not exist (cur={cur})"
            )
        prior = corrected.get(str(gen), "__absent__")
        if prior is None:
            raise ValueError(
                f"{side}-generation {gen} was already retracted; "
                "nothing left to correct"
            )
        if prior != "__absent__":
            raise ValueError(
                f"{side}-generation {gen} was already superseded by "
                f"generation {prior}; correct that instead"
            )

    def delete_left_batch(self, gen: int) -> None:
        """Retract a left batch: one meta write — the MV rows it
        produced die by their ``lgen`` stamp, nothing is scanned or
        rewritten until compact()."""
        with self.catalog.write_lock(self._tbl("mv")):
            self._reload_meta()
            self._check_correctable(gen, "l")
            self.corrected_l[str(gen)] = None
            self._record_version("delete", "l", drop=[gen])
            self._commit_meta()

    def delete_right_batch(self, gen: int) -> None:
        with self.catalog.write_lock(self._tbl("mv")):
            self._reload_meta()
            self._check_correctable(gen, "r")
            self.corrected_r[str(gen)] = None
            self._record_version("delete", "r", drop=[gen])
            self._commit_meta()

    def replace_left_batch(self, gen: int, corrected: DataFrame) -> int:
        """Correct a left batch: retract + append-corrected under ONE
        lease (readers between the two steps of a lockless version
        would see the join without the batch). Returns the new
        generation."""
        self._check_side(corrected, self.left_cols)
        with self.catalog.write_lock(self._tbl("mv")):
            self._reload_meta()
            self._ensure_registered()
            self._check_correctable(gen, "l")
            new_gen = self.cur_lgen + 1
            self.corrected_l[str(gen)] = new_gen
            delta = (
                corrected.join(self.right_rows(), self.key)
                .withColumnRenamed("gen", "rgen")
                .withColumn("lgen", F.lit(new_gen).cast("long"))
            ).select(
                self.key, *self.left_cols, *self.right_cols, "lgen", "rgen"
            )
            self._append("mv", delta)
            self._append("l", corrected.select(self.key, *self.left_cols)
                         .withColumn("gen", F.lit(new_gen).cast("long")))
            self.cur_lgen = new_gen
            self._record_version("replace", "l", add=[new_gen], drop=[gen])
            self._commit_meta()
        return new_gen

    def replace_right_batch(self, gen: int, corrected: DataFrame) -> int:
        self._check_side(corrected, self.right_cols)
        with self.catalog.write_lock(self._tbl("mv")):
            self._reload_meta()
            self._ensure_registered()
            self._check_correctable(gen, "r")
            new_gen = self.cur_rgen + 1
            self.corrected_r[str(gen)] = new_gen
            delta = (
                self.left_rows().withColumnRenamed("gen", "lgen")
                .join(corrected, self.key)
                .withColumn("rgen", F.lit(new_gen).cast("long"))
            ).select(
                self.key, *self.left_cols, *self.right_cols, "lgen", "rgen"
            )
            self._append("mv", delta)
            self._append("r", corrected.select(self.key, *self.right_cols)
                         .withColumn("gen", F.lit(new_gen).cast("long")))
            self.cur_rgen = new_gen
            self._record_version("replace", "r", add=[new_gen], drop=[gen])
            self._commit_meta()
        return new_gen

    def compact(self, num_buckets: Optional[int] = None) -> None:
        """Purge dead generations physically and fold the survivors to
        one fresh generation per side — corrections of folded batches
        are refused afterwards (sealed), the RollupStore.compact rule.

        Crash safety is a TWO-step meta commit: (1) before any rewrite,
        bump + seal the generation counters but KEEP the correction
        maps — a crash after some table swaps leaves every dead row
        still filtered (folded tables' renamed gens aren't in the maps;
        unfolded tables' dead gens still are) and the bumped counters
        prevent a later update from colliding with a folded gen;
        (2) only after all three rewrites, clear the maps."""
        from hindex_spark.table import Table

        with self.catalog.write_lock(self._tbl("mv")):
            self._reload_meta()
            self._ensure_registered()
            if num_buckets is None:
                num_buckets = self.num_buckets
            new_l, new_r = self.cur_lgen + 1, self.cur_rgen + 1
            dead_l, dead_r = dict(self.corrected_l), dict(self.corrected_r)
            live_l = self._minus_dead(
                self.catalog.read_raw(self._tbl("l")), "gen", dead_l
            ).withColumn("gen", F.lit(new_l).cast("long"))
            live_r = self._minus_dead(
                self.catalog.read_raw(self._tbl("r")), "gen", dead_r
            ).withColumn("gen", F.lit(new_r).cast("long"))
            live_mv = self._minus_dead(
                self._minus_dead(
                    self.catalog.read_raw(self._tbl("mv")), "lgen", dead_l
                ), "rgen", dead_r,
            ).withColumn("lgen", F.lit(new_l).cast("long")) \
             .withColumn("rgen", F.lit(new_r).cast("long"))
            self.cur_lgen, self.cur_rgen = new_l, new_r
            self.sealed_lbelow, self.sealed_rbelow = new_l, new_r
            self.num_buckets = num_buckets
            self._record_version("compact", "", add=[new_l, new_r],
                                 seal=True)
            self._commit_meta()            # step 1: bump + seal
            for side, rows in (("l", live_l), ("r", live_r),
                               ("mv", live_mv)):
                self.catalog.save_bucketed(
                    Table(rows, self.key, f"{self.name}_jv{side}"),
                    num_buckets=num_buckets,
                )
            self.corrected_l, self.corrected_r = {}, {}
            self._commit_meta()            # step 2: maps cleared
