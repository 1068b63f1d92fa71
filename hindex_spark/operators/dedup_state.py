"""Persisted dedup state — steady-state incremental dedup.

``incremental_dedup`` (operators/dedup.py) recomputes corpus
fingerprints and minhash signatures from the raw text on every batch:
correct, but at 100 TB the daily batch then pays a full corpus
re-shingle — the dominant cost of the daily-crawl shape. ``DedupState``
is the catalog artifact that removes it: ONE narrow row per corpus doc
(id, content fingerprint, mh0..mh7) persisted as a bucketed table, built
once and maintained by the same job that accepts a batch — the
index-maintenance pattern (index/build.py:59) applied to dedup state.

Per-batch cost with the store (batch ≪ corpus):
  * exact pass — the state's fingerprint column is semi-restricted to
    the BROADCAST batch fingerprints (stream the state scan, no
    shuffle), then the batch anti-joins the (tiny) hit set;
  * near-dup pass — corpus band rows derive from the STORED signatures
    (a map-only explode over the narrow state table, never the text)
    and join the broadcast batch bands; candidate verification
    re-shingles ONLY docs named in a candidate pair (the corpus text is
    semi-joined down to candidate ids before tokenization).
The corpus parquet is scanned exactly once per batch — for candidate
verification — and never through the signature fold. Asserted by
``tests/test_pipeline_ops.py::test_dedup_state_corpus_not_reshingled``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Union

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from hindex_spark.operators.dedup import (
    AUTO_VALVE_FLOOR,
    AUTO_VALVE_MULT,
    BY_HASH,
    DEFAULT_MAX_BUCKET,
    N_HASHES,
    _band_rows,
    _resolve_valve,
    _rotate_caches,
    _hashed_units,
    _signature_lane_cols,
    doc_unit_arrays,
    shingle_expr,
)
from hindex_spark.operators.text import distinct_tokens, fingerprint, tokens


def state_rows(
    docs: DataFrame, id_col: str, text_col: str, ngram: int = 3,
    hash_fn: str = "md5", n_hashes: int = N_HASHES,
) -> DataFrame:
    """(id, __fp, mh0..mh{n-1}) in ONE map pass over the text:
    fingerprint and the n-way minhash fold share a single
    scan/projection — no shuffle, no second read of the text."""
    if ngram <= 1:
        base = docs.select(
            F.col(id_col),
            fingerprint(F.col(text_col)).alias("__fp"),
            distinct_tokens(F.col(text_col)).alias("__units"),
        )
    else:
        base = docs.select(
            F.col(id_col),
            fingerprint(F.col(text_col)).alias("__fp"),
            tokens(F.col(text_col)).alias("__toks"),
        ).select(
            F.col(id_col), "__fp",
            shingle_expr(F.col("__toks"), ngram).alias("__units"),
        )
    # hashed array staged as a real column so the n per-lane minima in
    # the next projection never re-hash a unit (see _signature_lane_cols)
    hs = base.select(
        F.col(id_col), "__fp",
        _hashed_units(F.col("__units"), hash_fn).alias("__hs"),
    )
    return hs.select(
        F.col(id_col), "__fp",
        *_signature_lane_cols(F.col("__hs"), n_hashes),
    )


class DedupState:
    """Handle to a persisted dedup-state table inside a ``Catalog``.

    Lifecycle::

        st = DedupState.build(cat, corpus, "doc_id", "text", "docs")
        survivors = st.dedup_batch(batch, corpus, threshold=0.9)
        st.update(survivors)          # accepted docs join the state
        ...
        st = DedupState.open(cat, "docs")   # next session / next day
    """

    def __init__(self, catalog, name: str, id_col: str, text_col: str,
                 ngram: int = 3, hash_fn: str = "md5",
                 n_hashes: int = N_HASHES, band_size: int = 2,
                 num_buckets: int = 32, cur_gen: int = 0,
                 band_mod: Optional[int] = None):
        self.num_buckets = num_buckets
        self.cur_gen = cur_gen
        self.catalog = catalog
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.ngram = ngram
        self.hash_fn = hash_fn
        # The LSH family is part of the ARTIFACT's identity: stored
        # signatures are only band-compatible with themselves, so both
        # knobs persist in the meta and every query derives from them.
        self.n_hashes = n_hashes
        self.band_size = band_size
        self.table_name = f"{name}_dedupstate_bucketed"
        # ``band_mod`` present <=> the store carries the BAND SIDE TABLE
        # (bk, band, bucket, id, gen), bucketed on bk =
        # pmod(xxhash64(band, bucket), band_mod): the inverted layout
        # that lets a batch's near-dup pass read only the state buckets
        # it touches (bucket pruning on a bk IN (...) literal list —
        # bounded by band_mod values however large the batch) instead of
        # re-deriving every band row from a full state scan per batch
        # (guide §6: at 100 TB the full state read per daily batch is
        # the dominant store-side cost). None = a pre-band store; every
        # consumer falls back to the explode-from-state path.
        self.band_mod = band_mod
        self.band_table_name = f"{name}_dedupstate_bands_bucketed"

    @property
    def sql_name(self) -> str:
        """Root-tagged session registration name (``table_name`` is the
        catalog-root-relative directory; session SQL names are global —
        Catalog.bucketed_sql_name)."""
        return self.catalog.bucketed_sql_name(self.table_name)

    @property
    def band_sql_name(self) -> str:
        return self.catalog.bucketed_sql_name(self.band_table_name)

    def _band_side_rows(self, sig_rows: DataFrame) -> DataFrame:
        """(bk, band, bucket, id, gen) band-side rows derived from a
        gen-carrying state-rows frame — the SAME banding explode
        ``dedup_batch`` would run, materialized once at write time with
        the pruning key attached. Column order is the side table's
        positional INSERT contract."""
        b = _band_rows(sig_rows, self.id_col, self.band_size,
                       extra_cols=("gen",))
        return b.select(
            F.pmod(F.xxhash64("band", "bucket"), F.lit(self.band_mod))
            .cast("int").alias("bk"),
            F.col("band"), F.col("bucket"), F.col(self.id_col),
            F.col("gen"),
        )

    # -- storage ------------------------------------------------------------

    def _meta_path(self) -> str:
        return os.path.join(self.catalog.root, f"{self.name}_dedupstate_meta.json")

    @classmethod
    def build(cls, catalog, corpus: DataFrame, id_col: str, text_col: str,
              name: str, ngram: int = 3, hash_fn: str = "md5",
              num_buckets: int = 32, n_hashes: int = N_HASHES,
              band_size: int = 2) -> "DedupState":
        """One-time (or rebuild) pass: shingle the corpus ONCE, persist
        the narrow state bucketed on id. ~tens of bytes/doc — the 100 TB
        corpus's state is a few hundred GB, rewritten never, appended to
        per accepted batch."""
        from hindex_spark.table import Table

        st = cls(catalog, name, id_col, text_col, ngram, hash_fn,
                 n_hashes, band_size, num_buckets=num_buckets,
                 band_mod=num_buckets)
        rows = state_rows(
            corpus, id_col, text_col, ngram, hash_fn, n_hashes
        ).withColumn("gen", F.lit(0).cast("long"))
        catalog.save_bucketed(
            Table(rows, id_col, f"{name}_dedupstate"), num_buckets=num_buckets
        )
        # the band side table derives from the JUST-SAVED state (one
        # narrow state-sized pass — never a second corpus re-shingle);
        # build cost is one-time setup, every batch then reads a
        # bucket-pruned slice instead of exploding the full state
        bands = st._band_side_rows(catalog.spark.table(st.sql_name))
        catalog.save_bucketed(
            Table(bands, "bk", f"{name}_dedupstate_bands"),
            num_buckets=num_buckets,
        )
        # a REBUILD starts at gen 0: clear the previous incarnation's
        # tombstones or they'd kill every fresh row
        from hindex_spark.operators.artifact import clear_tombstones, tombstone_path

        clear_tombstones(tombstone_path(catalog.root, f"{name}_dedupstate_bucketed"))
        with open(st._meta_path(), "w") as f:
            json.dump(
                {"id_col": id_col, "text_col": text_col, "ngram": ngram,
                 "hash_fn": hash_fn, "n_hashes": n_hashes,
                 "band_size": band_size, "num_buckets": num_buckets,
                 "cur_gen": 0, "band_mod": num_buckets}, f,
            )
        return st

    @classmethod
    def open(cls, catalog, name: str) -> "DedupState":
        with open(os.path.join(
                catalog.root, f"{name}_dedupstate_meta.json")) as f:
            m = json.load(f)
        return cls(catalog, name, m["id_col"], m["text_col"],
                   m["ngram"], m["hash_fn"],
                   m.get("n_hashes", N_HASHES), m.get("band_size", 2),
                   num_buckets=m.get("num_buckets", 32),
                   cur_gen=m.get("cur_gen", 0),
                   band_mod=m.get("band_mod"))

    def _ensure_registered(self) -> None:
        """Re-attach the session-scoped bucketed registration from the
        files + persisted num_buckets on a fresh SparkSession. Uses
        tableExists, never a resolve (see SearchIndex.update: resolving
        would prime a file-listing cache that a later clone-session
        INSERT silently misses)."""
        if not self.catalog.spark.catalog.tableExists(self.sql_name):
            self.catalog._attach_bucketed(
                self.sql_name,
                os.path.join(self.catalog.root, self.table_name, "data"),
                self.id_col, [self.id_col], self.num_buckets,
            )

    def _tombstone_path(self) -> str:
        from hindex_spark.operators.artifact import tombstone_path

        return tombstone_path(self.catalog.root, self.table_name)

    @property
    def _df_raw(self) -> DataFrame:
        """The state table as stored — tombstoned generations included
        (self-repairing registration)."""
        self._ensure_registered()
        self.catalog.spark.catalog.refreshTable(self.sql_name)
        return self.catalog.spark.table(self.sql_name)

    @property
    def df(self) -> DataFrame:
        """The LIVE persisted (id, __fp, mh0..mh7, gen) rows: the
        stored table minus generations superseded by
        ``upsert``/``delete`` tombstones (operators/artifact.py). No
        tombstones -> the raw frame, zero overhead."""
        from hindex_spark.operators.artifact import live_view

        return live_view(
            self._df_raw, self.id_col, self.catalog.spark,
            self._tombstone_path(),
        )

    def _ensure_bands_registered(self) -> None:
        if not self.catalog.spark.catalog.tableExists(self.band_sql_name):
            self.catalog._attach_bucketed(
                self.band_sql_name,
                os.path.join(self.catalog.root, self.band_table_name, "data"),
                "bk", ["bk"], self.num_buckets,
            )

    @property
    def bands(self) -> DataFrame:
        """LIVE (bk, band, bucket, id, gen) rows of the band side table.
        The STATE's tombstone path applies verbatim: band rows carry
        exactly their state row's (id, gen), so one tombstone file cuts
        both tables — ``delete``/``upsert`` never write the side table's
        history twice."""
        from hindex_spark.operators.artifact import live_view

        self._ensure_bands_registered()
        self.catalog.spark.catalog.refreshTable(self.band_sql_name)
        return live_view(
            self.catalog.spark.table(self.band_sql_name), self.id_col,
            self.catalog.spark, self._tombstone_path(),
        )

    def _reload_meta(self) -> None:
        """Re-read the persisted meta (cur_gen, num_buckets) into this
        handle — MUST run at the top of every locked mutation: another
        process may have bumped the generation since open/build, and a
        delta applied to the stale baseline loses its update (caught by
        the two-process chaos test)."""
        if os.path.isfile(self._meta_path()):
            with open(self._meta_path()) as f:
                m = json.load(f)
            self.num_buckets = m.get("num_buckets", self.num_buckets)
            self.cur_gen = m.get("cur_gen", 0)
            # absent key = a pre-band-table store: fall back everywhere
            self.band_mod = m.get("band_mod")

    def _insert_one(self, sess, sql_name: str, rows: DataFrame,
                    view: str) -> None:
        rows.createOrReplaceTempView(view)
        sess.sql(f"INSERT INTO {sql_name} SELECT * FROM {view}")
        sess.catalog.dropTempView(view)

    def _append_rows(self, sess, rows: DataFrame, view: str) -> None:
        """Append a batch's state rows and (when the store carries the
        band side table) its band rows. The batch frame is persisted so
        the signature fold runs ONCE for both appends, and the two
        delta-sized INSERTs run as concurrent jobs (guide §2.6 — same
        overlap as JoinView._append_pair; different tables, no shared
        input, still under the caller's write lock). A crash between
        the two appends can leave the pair torn; ``compact()`` rebuilds
        the band table FROM the state, so the next maintenance pass
        converges them."""
        self._ensure_registered()
        if self.band_mod is None:
            self._insert_one(sess, self.sql_name, rows, view)
            self.catalog.spark.catalog.refreshTable(self.sql_name)
            return
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        from pyspark import StorageLevel  # noqa: PLC0415

        self._ensure_bands_registered()
        rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            bands = self._band_side_rows(rows)
            with ThreadPoolExecutor(max_workers=2) as pool:
                fa = pool.submit(self._insert_one, sess, self.sql_name,
                                 rows, view)
                fb = pool.submit(self._insert_one, sess,
                                 self.band_sql_name, bands,
                                 f"{view}_bands")
                fa.result()
                fb.result()
        finally:
            rows.unpersist()
        self.catalog.spark.catalog.refreshTable(self.sql_name)
        self.catalog.spark.catalog.refreshTable(self.band_sql_name)

    def update(self, accepted: DataFrame) -> None:
        """Append the accepted batch's state rows — the per-batch
        maintenance step. INSERT INTO honors the table's bucket spec, so
        appends stay bucketed on id; no rewrite of existing state."""
        view = f"__dedupstate_append_{self.name}"
        # the batch's own session: inside foreachBatch the frame lives
        # in a session clone and temp views are session-scoped (same
        # fix as SearchIndex.update)
        sess = accepted.sparkSession
        with self.catalog.write_lock(self.table_name):
            self._reload_meta()
            rows = state_rows(
                accepted, self.id_col, self.text_col, self.ngram, self.hash_fn,
                self.n_hashes,
            ).withColumn("gen", F.lit(self.cur_gen).cast("long"))
            self._append_rows(sess, rows, view)

    def _bump_gen(self, new_gen: int) -> None:
        self.cur_gen = new_gen
        m = json.load(open(self._meta_path()))
        m["cur_gen"] = new_gen
        with open(self._meta_path(), "w") as f:
            json.dump(m, f)

    def upsert(self, docs: DataFrame) -> None:
        """Replace-or-insert state rows for a batch of doc ids: ids
        already in the store get their (fingerprint, signature) row
        superseded — a tombstone cuts every older generation — and new
        ids just append. Tombstone -> state-append write order (the new
        rows carry ``gen == below_gen``, so the tombstone can never
        kill them); physical purge at the next ``compact()``. The shape
        a re-crawled/re-processed document needs: its OLD signature
        must stop matching candidates."""
        from hindex_spark.operators.artifact import append_tombstones

        with self.catalog.write_lock(self.table_name):
            self._reload_meta()
            self._ensure_registered()
            new_gen = self.cur_gen + 1
            batch_ids = docs.select(self.id_col).distinct()
            existing = (
                self._df_raw
                .join(F.broadcast(batch_ids), self.id_col, "left_semi")
                .select(self.id_col).distinct()
            )
            # pure-insert upsert: no pre-existing ids -> no tombstone
            # file (AnnIndex/SearchIndex.upsert's guard). The hit set is
            # batch-bounded — persist it so the probe and the tombstone
            # write share ONE state-scan job instead of replaying the
            # semi-join twice.
            existing = existing.persist()
            try:
                if existing.take(1):
                    append_tombstones(
                        existing, self.id_col, new_gen,
                        self._tombstone_path(),
                    )
            finally:
                existing.unpersist()
            rows = state_rows(
                docs, self.id_col, self.text_col, self.ngram, self.hash_fn,
                self.n_hashes,
            ).withColumn("gen", F.lit(new_gen).cast("long"))
            view = f"__dedupstate_upsert_{self.name}"
            self._append_rows(rows.sparkSession, rows, view)
            self._bump_gen(new_gen)

    def delete(self, ids: DataFrame) -> None:
        """Remove docs from the state (the corpus dropped them): one
        tombstone append cutting every current generation of the given
        ids. Nothing is rewritten until ``compact()``."""
        from hindex_spark.operators.artifact import append_tombstones

        with self.catalog.write_lock(self.table_name):
            self._reload_meta()
            self._ensure_registered()
            new_gen = self.cur_gen + 1
            append_tombstones(
                ids.select(self.id_col).distinct(), self.id_col, new_gen,
                self._tombstone_path(),
            )
            self._bump_gen(new_gen)

    def compact(self, num_buckets: Optional[int] = None) -> None:
        """Rewrite the state table as one file per bucket, purging
        tombstoned generations (gens preserved — a crash between the
        save and the tombstone clear re-applies the cuts as a no-op).
        Every ``update()`` INSERT adds a file set per bucket; multi-file
        buckets cost the scan its reported sort order and per-file
        opens — periodic compaction restores build-time layout. Staged
        write + atomic swap via the catalog. Source read as RAW parquet
        (same reason as SearchIndex.compact: the bucketed scan's claimed
        partitioning would elide the repartition and leave multi-file
        buckets in place)."""
        from hindex_spark.operators.artifact import clear_tombstones, live_view
        from hindex_spark.table import Table

        with self.catalog.write_lock(self.table_name):
            # reload first: another process may have changed the bucket
            # count; None means KEEP it (a maintenance pass must never
            # silently reset a custom layout)
            self._reload_meta()
            if num_buckets is None:
                num_buckets = self.num_buckets
            rows = self.catalog.read_raw(self.table_name)
            rows = live_view(
                rows, self.id_col, self.catalog.spark, self._tombstone_path()
            )
            self.catalog.save_bucketed(
                Table(rows, self.id_col, f"{self.name}_dedupstate"),
                num_buckets=num_buckets,
            )
            if self.band_mod is not None:
                # rebuild the band side table FROM the compacted state
                # (never from its own history): purges its tombstoned
                # generations AND heals any torn state/band append pair
                # left by a crash between _append_rows' two INSERTs
                bands = self._band_side_rows(
                    self.catalog.spark.table(self.sql_name)
                )
                self.catalog.save_bucketed(
                    Table(bands, "bk", f"{self.name}_dedupstate_bands"),
                    num_buckets=num_buckets,
                )
            clear_tombstones(self._tombstone_path())
            self.num_buckets = num_buckets
            m = json.load(open(self._meta_path()))
            m["num_buckets"] = num_buckets
            with open(self._meta_path(), "w") as f:
                json.dump(m, f)

    # -- the per-batch query ------------------------------------------------

    def dedup_batch(
        self,
        new: DataFrame,
        corpus: DataFrame,
        threshold: float = 0.9,
        max_bucket: Union[int, None, str] = BY_HASH,
        dropped: Optional[Observation] = None,
    ) -> DataFrame:
        """Surviving rows of ``new`` (original schema) after exact +
        near-dup checks against the persisted state. ``corpus`` supplies
        text ONLY for candidate verification (semi-joined to candidate
        ids before any tokenization); its signatures/fingerprints come
        from the store. Result-identical to
        ``incremental_dedup(new, corpus, ...)`` at the same settings
        (same signature family, same banding, same exact-Jaccard
        verification) — asserted in tests.

        ``max_bucket`` defaults to ``BY_HASH`` resolved against the
        STORE's hash family (minhash_join's production-entry-point
        semantics): md5 keeps the constant DEFAULT_MAX_BUCKET cap,
        xxhash64 derives the cap from the store's own bucket-size
        distribution (``"auto"``)."""
        id_col, text_col = self.id_col, self.text_col
        if max_bucket == BY_HASH:
            max_bucket = DEFAULT_MAX_BUCKET if self.hash_fn == "md5" else "auto"
        else:
            max_bucket = _resolve_valve(max_bucket, self.hash_fn)
        state = self.df

        # exact pass: exists_batch shape — semi-restrict the state's fp
        # column by the broadcast batch fps (no state-side shuffle),
        # then anti-join the batch against the tiny hit set.
        nf = new.withColumn("__fp", fingerprint(F.col(text_col)))
        batch_fps = nf.select("__fp").distinct()
        fp_hits = (
            state.join(F.broadcast(batch_fps), "__fp", "left_semi")
            .select("__fp").distinct()
        )
        # BATCH-bounded lineage truncation (Table.AUTO_CHECKPOINT's
        # analog for store verbs): ``fresh`` is referenced three times
        # downstream (signatures, verification arrays, survivor join);
        # each reference replays the fingerprint anti-join + batch scan
        # and the replayed subtrees triple the plan (27 -> 10 exchanges
        # in the upsert gate's plan with the truncation). Safe BECAUSE
        # the frame is batch-sized — the corpus-sized state stays lazy.
        # Measured against plain and persist() variants at sf0.1:
        # warm-run times are noise-equivalent (~1.5-1.9 s all three),
        # so the plan-size win is free.
        fresh = (
            nf.join(F.broadcast(fp_hits), "__fp", "left_anti")
            .drop("__fp")
            .localCheckpoint(eager=False)
        )

        # near-dup pass: corpus bands from the STORE (map-only explode,
        # no text), batch bands broadcast into the equi-join.
        batch_sigs = state_rows(
            fresh, id_col, text_col, self.ngram, self.hash_fn, self.n_hashes
        )
        bb = _band_rows(
            batch_sigs.drop("__fp"), id_col, self.band_size
        ).select(F.col(id_col).alias("id_a"), "band", "bucket")
        if self.band_mod is not None:
            # the banding explode was materialized at write time into
            # the bk-bucketed side table — read it (pruned below when
            # the batch's touched bk set is collectable) instead of
            # re-deriving every band row from a full state scan
            cb = self.bands.select(
                F.col(id_col).alias("id_b"), "band", "bucket", "bk"
            )
        else:
            cb = _band_rows(
                state.drop("__fp"), id_col, self.band_size
            ).select(F.col(id_col).alias("id_b"), "band", "bucket")
        if max_bucket is not None:
            # corpus-side valve (the batch side is bounded by the batch):
            # over-cap (band, bucket) keys are boilerplate, not near-dups.
            # ``cb`` feeds BOTH the size pass and the candidate join —
            # persist the narrow (id, band, bucket) frame so the state
            # scan + band explode runs once, not twice (guide §2.4; the
            # cache is adopted by this call's _rotate_caches).
            from pyspark import StorageLevel as _SL  # noqa: PLC0415

            from hindex_spark.operators.dedup import (  # noqa: PLC0415
                _register_aux_cache as _reg_aux,
            )

            if isinstance(max_bucket, int) and dropped is None:
                # TOUCHED-BUCKET narrowing (constant cap, no caller
                # accounting): only buckets the BATCH bands touch can
                # produce candidates, and a broadcast semi-join on the
                # batch-bounded (band, bucket) keys filters the state
                # bands map-side BEFORE the persist + size pass — the
                # per-bucket counts of surviving buckets are unchanged
                # (the semi-join keeps every state row of a touched
                # bucket), so exactly the same buckets are dropped and
                # the result is identical. Skipped under ``"auto"``
                # (the cap derives from the FULL store's bucket-size
                # distribution) and under a ``dropped`` Observation
                # (which reports store-wide over-cap keys).
                if "bk" in cb.columns:
                    # BUCKET-PRUNED state read: the batch's touched bk
                    # set is bounded by band_mod values however large
                    # the batch is, so collecting it is always
                    # driver-material, and the IN literal list makes
                    # the bk-bucketed scan read only the touched
                    # buckets' files (the AnnIndex cluster-pruning
                    # shape). ``bb`` is persisted so the batch
                    # signature fold runs once for the collect, the
                    # semi-join broadcast and the candidate join —
                    # previously it ran once per broadcast build.
                    bb = bb.persist(_SL.MEMORY_AND_DISK)
                    _reg_aux(bb)
                    touched = sorted({
                        r["bk"]
                        for r in bb.select(
                            F.pmod(
                                F.xxhash64("band", "bucket"),
                                F.lit(self.band_mod),
                            ).cast("int").alias("bk")
                        ).distinct().collect()
                    })
                    cb = cb.filter(F.col("bk").isin(touched))
                cb = cb.join(
                    F.broadcast(bb.select("band", "bucket").distinct()),
                    ["band", "bucket"], "left_semi",
                )
            cb = cb.drop("bk").persist(_SL.MEMORY_AND_DISK)
            _reg_aux(cb)
            sizes = cb.groupBy("band", "bucket").agg(F.count("*").alias("__n"))
            if max_bucket == "auto":
                # corpus-adaptive cap, same formula as lsh_candidate_pairs;
                # persist the size agg before the sketch action so the
                # state-band scan upstream runs once, not twice (the
                # cache is adopted by this call's _rotate_caches)
                from pyspark import StorageLevel  # noqa: PLC0415

                from hindex_spark.operators.dedup import _register_aux_cache

                sizes = sizes.persist(StorageLevel.MEMORY_AND_DISK)
                _register_aux_cache(sizes)
                q = sizes.select(
                    F.col("__n").cast("double").alias("s")
                ).approxQuantile("s", [0.999], 0.001)
                max_bucket = int(
                    max(AUTO_VALVE_FLOOR, (q[0] if q else 0) * AUTO_VALVE_MULT)
                )
            big = sizes.filter(F.col("__n") > max_bucket)
            if dropped is not None:
                big = big.observe(
                    dropped,
                    F.coalesce(F.count("*"), F.lit(0)).alias("dropped_buckets"),
                    F.coalesce(F.sum("__n"), F.lit(0)).alias("dropped_rows"),
                )
            cb = cb.join(
                F.broadcast(big.select("band", "bucket")),
                ["band", "bucket"], "left_anti",
            )
        cands = (
            cb.join(F.broadcast(bb), ["band", "bucket"])
            .select("id_a", "id_b").distinct().persist()
        )

        # verification: exact Jaccard on unit arrays, re-shingling ONLY
        # candidate docs — the single corpus-text scan of the batch.
        ua = doc_unit_arrays(
            fresh.join(
                cands.select(F.col("id_a").alias(id_col)).distinct(),
                id_col, "left_semi",
            ),
            id_col, text_col, self.ngram,
        ).select(F.col(id_col).alias("id_a"), F.col("units").alias("u_a"))
        ub = doc_unit_arrays(
            corpus.join(
                F.broadcast(cands.select(F.col("id_b").alias(id_col)).distinct()),
                id_col, "left_semi",
            ),
            id_col, text_col, self.ngram,
        ).select(F.col(id_col).alias("id_b"), F.col("units").alias("u_b"))
        near = (
            cands.join(ua, "id_a")
            .join(ub, "id_b")
            .withColumn("c", F.size(F.array_intersect(F.col("u_a"), F.col("u_b"))))
            .withColumn(
                "jaccard", F.col("c") / (F.size("u_a") + F.size("u_b") - F.col("c"))
            )
            .filter(F.col("jaccard") >= threshold)
            .select(F.col("id_a").alias(id_col)).distinct()
        )
        _rotate_caches(cands)
        return fresh.join(near, id_col, "left_anti")
