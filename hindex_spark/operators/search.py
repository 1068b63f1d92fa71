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


def _bm25_term_score(
    tf: Column,
    dl: Column,
    df_t: Column,
    n: Column,
    avgdl: Column,
    k1: float,
    b: float,
) -> Column:
    """One term's BM25 contribution as an exact DECIMAL product —
    round(idf, 6) * round(tf-normalization, 6). Shared by the full-scan
    and the inverted-index paths so their expression trees (and hence
    every last double bit) are identical."""
    idf = F.round(
        F.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5)), _SCALE
    ).cast(_DEC)
    norm = F.round(
        tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)), _SCALE
    ).cast(_DEC)
    # the (18,6)x(18,6) product is decimal(37,12); one more ADD would
    # overflow Spark's 38-digit cap, which silently REDUCES THE SCALE
    # to 11 (allowPrecisionLoss) — the scan path's 3-term sum then
    # differs from the index path's SUM (which keeps scale 12) in the
    # 11th decimal. Values are tiny (|score term| < ~100), so pin the
    # exact value into (25,12) and every downstream add/sum stays exact
    # and identical across both paths and both engines.
    return (idf * norm).cast("decimal(25,12)")


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
        parts.append(
            _bm25_term_score(
                tf,
                dl.cast("double"),
                F.col(f"__df{i}"),
                F.col("__n"),
                avgdl,
                k1,
                b,
            ).alias(f"__s{i}")
        )
    # fold with a fixed-type running total: precision can never creep
    # up to the 38-digit cliff however many query terms there are
    total: Column = parts[0]
    for p_ in parts[1:]:
        total = (total + p_).cast("decimal(30,12)")
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


# ---------------------------------------------------------------------------
# persisted inverted index — BM25 without the corpus scan
# ---------------------------------------------------------------------------


class SearchIndex:
    """Persisted inverted index for BM25 retrieval — the secondary-index
    design of this engine (catalog-bucketed, query-key-local) applied to
    lexical search. ``bm25_topk`` scans every document for every query;
    at 100 TB a 3-term query must not read 100 TB. The index persists
    ONE postings table — (token, id, tf, dl), bucketed AND sorted on
    token — so a query reads only its terms' postings: bucket pruning
    keeps all other buckets unread (plan-asserted via
    SelectedBucketsCount) and the within-bucket token sort gives
    parquet row-group pruning on top.

    Result-identity with the full scan: per-term document frequency is
    exactly the fetched posting-list length, corpus size / total length
    persist in the meta, and the per-term decimal score is the SAME
    expression (``_bm25_term_score``) — a doc's grouped posting sum
    equals the scan's per-term column sum because absent terms
    contribute an exact decimal zero. Gated against the same oracle SQL
    as the scan path.

    Lifecycle (the DedupState pattern)::

        ix = SearchIndex.build(cat, docs, "doc_id", "text", "docs")
        hits = ix.topk("spark merge vector", k=25)
        ix.update(new_docs)            # postings append + stats bump
        ix = SearchIndex.open(cat, "docs")   # next session
    """

    def __init__(self, catalog, name: str, id_col: str, text_col: str,
                 n_docs: int, sum_dl: float, num_buckets: int = 32,
                 cur_gen: int = 0):
        self.catalog = catalog
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.n_docs = n_docs
        self.sum_dl = sum_dl
        self.num_buckets = num_buckets
        self.cur_gen = cur_gen
        self.table_name = f"{name}_postings_bucketed"

    @property
    def sql_name(self) -> str:
        """Root-tagged session registration name (``table_name`` is the
        catalog-root-relative directory; session SQL names are global —
        Catalog.bucketed_sql_name)."""
        return self.catalog.bucketed_sql_name(self.table_name)

    def _meta(self) -> dict:
        return {"id_col": self.id_col, "text_col": self.text_col,
                "n_docs": self.n_docs, "sum_dl": self.sum_dl,
                "num_buckets": self.num_buckets, "cur_gen": self.cur_gen}

    # -- storage ------------------------------------------------------------

    def _meta_path(self) -> str:
        import os

        return os.path.join(
            self.catalog.root, f"{self.name}_postings_meta.json"
        )

    @staticmethod
    def _posting_rows(docs: DataFrame, id_col: str, text_col: str,
                      gen: int = 0) -> DataFrame:
        """(token, id, tf, dl, positions, gen): one row per distinct
        (doc, token). dl is the doc's token count, constant per doc
        (max() only fixes the aggregate's shape); positions is the
        sorted 1-based occurrence list — what makes the index
        POSITIONAL, so phrase queries resolve from postings alone. BM25
        never reads the column (parquet column pruning keeps it off
        disk for ranked retrieval). ``gen`` is the writer generation
        (operators/artifact.py) — what upsert's tombstones cut
        against."""
        toked = docs.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col), tokens(F.col(text_col)).alias("__toks")
        )
        return (
            toked.select(
                F.col(id_col),
                F.size("__toks").alias("__dl"),
                F.posexplode("__toks").alias("__p0", "token"),
            )
            .groupBy("token", id_col)
            .agg(
                F.count("*").alias("tf"),
                F.max("__dl").alias("dl"),
                F.array_sort(F.collect_list(F.col("__p0") + 1)).alias(
                    "positions"
                ),
            )
            .withColumn("gen", F.lit(gen).cast("long"))
        )

    @classmethod
    def build(cls, catalog, docs: DataFrame, id_col: str, text_col: str,
              name: str, num_buckets: int = 32) -> "SearchIndex":
        """One corpus pass: explode + one (token, id) aggregate, persist
        bucketed/sorted on token. Postings are ~tens of bytes per (doc,
        distinct token) — the artifact a 100 TB corpus amortizes over
        every query ever run against it."""
        import json

        from hindex_spark.table import Table

        toked = docs.filter(F.col(text_col).isNotNull()).select(
            tokens(F.col(text_col)).alias("__toks")
        )
        stats = toked.agg(
            F.count("*").alias("n"),
            F.sum(F.size("__toks")).cast("double").alias("sumdl"),
        ).collect()[0]
        rows = cls._posting_rows(docs, id_col, text_col)
        catalog.save_bucketed(
            Table(rows, "token", f"{name}_postings"), num_buckets=num_buckets
        )
        # a REBUILD under an existing name starts at gen 0 — tombstones
        # from the previous incarnation (below_gen >= 1) would silently
        # kill every fresh row
        from hindex_spark.operators.artifact import clear_tombstones, tombstone_path

        clear_tombstones(tombstone_path(catalog.root, f"{name}_postings_bucketed"))
        ix = cls(catalog, name, id_col, text_col,
                 int(stats["n"]), float(stats["sumdl"] or 0.0),
                 num_buckets=num_buckets)
        catalog.save_bucketed(
            Table(ix._doclen_rows(docs, 0), id_col, f"{name}_doclen"),
            num_buckets=num_buckets,
        )
        with open(ix._meta_path(), "w") as f:
            json.dump(ix._meta(), f)
        return ix

    @classmethod
    def open(cls, catalog, name: str) -> "SearchIndex":
        import json
        import os

        with open(os.path.join(
                catalog.root, f"{name}_postings_meta.json")) as f:
            m = json.load(f)
        return cls(catalog, name, m["id_col"], m["text_col"],
                   m["n_docs"], m["sum_dl"],
                   num_buckets=m.get("num_buckets", 32),
                   cur_gen=m.get("cur_gen", 0))

    def _ensure_registered(self) -> None:
        """Re-attach the session-scoped bucketed registration from the
        files + persisted num_buckets when a FRESH SparkSession opens
        the artifact (registrations do not survive session restarts;
        the files and meta do)."""
        import os

        if not self.catalog.spark.catalog.tableExists(self.sql_name):
            self.catalog._attach_bucketed(
                self.sql_name,
                os.path.join(self.catalog.root, self.table_name, "data"),
                "token", ["token"], self.num_buckets,
            )

    def _tombstone_path(self) -> str:
        from hindex_spark.operators.artifact import tombstone_path

        return tombstone_path(self.catalog.root, self.table_name)

    @property
    def _postings_raw(self) -> DataFrame:
        """The postings table as stored — tombstoned generations
        included (self-repairing registration). Refreshed at every read
        entry: an earlier resolve primes the session's file-listing
        cache and a cross-process/clone-session INSERT since would be
        silently invisible (the documented table-cache trap)."""
        self._ensure_registered()
        self.catalog.spark.catalog.refreshTable(self.sql_name)
        return self.catalog.spark.table(self.sql_name)

    @property
    def postings(self) -> DataFrame:
        """The LIVE postings: the stored table minus generations
        superseded by ``upsert``/``delete`` tombstones
        (operators/artifact.py — Lucene's live-docs rule). With no
        tombstones this is the raw frame, zero overhead; with them, one
        broadcast left join that token-bucket pruning still pushes
        below."""
        from hindex_spark.operators.artifact import live_view

        return live_view(
            self._postings_raw, self.id_col, self.catalog.spark,
            self._tombstone_path(),
        )

    def repair_stats(self) -> None:
        """Recompute the persisted corpus stats FROM the postings table
        and rewrite the meta. ``update()`` appends postings before it
        bumps the meta, so a crash between the two leaves stats stale
        (scores slightly off, queries still correct in shape) — this
        closes that window after the fact. One bounded aggregate: dl is
        constant per doc, so (n, sumdl) come from the distinct (id, dl)
        pairs."""
        import json

        stats = (
            self.postings.select(F.col(self.id_col), "dl")
            .distinct()
            .agg(
                F.count("*").alias("n"),
                F.sum("dl").cast("double").alias("sumdl"),
            )
            .collect()[0]
        )
        self.n_docs = int(stats["n"])
        self.sum_dl = float(stats["sumdl"] or 0.0)
        with open(self._meta_path(), "w") as f:
            json.dump(self._meta(), f)

    # -- doclen side table ----------------------------------------------------
    # One narrow row per LIVE doc version: (id, dl, gen), bucketed on
    # id. Exists so upsert's old-stats probe reads ~20 bytes/doc instead
    # of the postings' row-per-(doc, token) — the documented 100 TB
    # upsert cost, closed. Shares the postings table's tombstone set
    # (generations are bumped identically), is appended alongside every
    # postings INSERT, and is REBUILT FROM the postings at compact(), so
    # a crash between the two INSERTs self-heals at the next compaction.

    @property
    def doclen_table_name(self) -> str:
        return f"{self.name}_doclen_bucketed"

    @property
    def doclen_sql_name(self) -> str:
        return self.catalog.bucketed_sql_name(self.doclen_table_name)

    def _doclen_rows(self, docs: DataFrame, gen: int) -> DataFrame:
        return docs.filter(F.col(self.text_col).isNotNull()).select(
            F.col(self.id_col),
            F.size(tokens(F.col(self.text_col))).alias("dl"),
            F.lit(gen).cast("long").alias("gen"),
        )

    def _has_doclen(self) -> bool:
        import os

        return os.path.isdir(os.path.join(
            self.catalog.root, self.doclen_table_name, "data"
        ))

    def _ensure_doclen_registered(self) -> None:
        import os

        if not self.catalog.spark.catalog.tableExists(self.doclen_sql_name):
            self.catalog._attach_bucketed(
                self.doclen_sql_name,
                os.path.join(self.catalog.root, self.doclen_table_name, "data"),
                self.id_col, [self.id_col], self.num_buckets,
            )

    @property
    def doclens(self) -> DataFrame:
        """LIVE (id, dl, gen) rows — same tombstone cut as postings."""
        from hindex_spark.operators.artifact import live_view

        self._ensure_doclen_registered()
        self.catalog.spark.catalog.refreshTable(self.doclen_sql_name)
        return live_view(
            self.catalog.spark.table(self.doclen_sql_name),
            self.id_col, self.catalog.spark, self._tombstone_path(),
        )

    def _append_doclens(self, docs: DataFrame, gen: int) -> None:
        """INSERT the batch's doclen rows (caller holds the lock)."""
        rows = self._doclen_rows(docs, gen)
        view = f"__doclen_append_{self.name}"
        sess = docs.sparkSession
        self._ensure_doclen_registered()
        rows.createOrReplaceTempView(view)
        sess.sql(f"INSERT INTO {self.doclen_sql_name} SELECT * FROM {view}")
        sess.catalog.dropTempView(view)
        self.catalog.spark.catalog.refreshTable(self.doclen_sql_name)

    def _reload_meta(self) -> None:
        """Re-read the persisted meta into this handle. MUST run at the
        top of every locked mutation: the in-memory n_docs/sum_dl/
        cur_gen were loaded at open/build time, and another process may
        have mutated the artifact since — applying a delta to the stale
        baseline silently loses its update (caught by the two-process
        chaos test). Under the writer lease the disk meta is the one
        truth."""
        import json
        import os

        if os.path.isfile(self._meta_path()):
            with open(self._meta_path()) as f:
                m = json.load(f)
            self.n_docs = m["n_docs"]
            self.sum_dl = m["sum_dl"]
            self.num_buckets = m.get("num_buckets", self.num_buckets)
            self.cur_gen = m.get("cur_gen", 0)

    def _migrate_gen_locked(self) -> None:
        """One-time migration of a PRE-GENERATION store (written before
        upsert/delete existed): rewrite postings (and the doclen side
        table, if any) with gen=0 so every mutation path — positional
        INSERT INTO, tombstone cuts, compact's doclen rebuild — sees one
        consistent schema. Caller holds the writer lock. No-op on
        current stores (one driver-side schema probe)."""
        if "gen" in self.catalog.read_raw(self.table_name).columns:
            return
        from hindex_spark.table import Table

        rows = self.catalog.read_raw(self.table_name).withColumn(
            "gen", F.lit(0).cast("long")
        )
        self.catalog.save_bucketed(
            Table(rows, "token", f"{self.name}_postings"),
            num_buckets=self.num_buckets,
        )
        if self._has_doclen():
            dl = self.catalog.read_raw(self.doclen_table_name)
            if "gen" not in dl.columns:
                self.catalog.save_bucketed(
                    Table(
                        dl.withColumn("gen", F.lit(0).cast("long")),
                        self.id_col, f"{self.name}_doclen",
                    ),
                    num_buckets=self.num_buckets,
                )

    def update(self, new_docs: DataFrame) -> None:
        """Per-batch maintenance: append the batch's postings (INSERT
        INTO honors the bucket spec) and bump the persisted corpus
        stats. Assumes batch ids are new — re-ingesting a doc id adds,
        not replaces, its postings (the DedupState.update contract).
        The postings append and the meta bump are two steps; a crash
        between them leaves stats stale — recoverable exactly with
        ``repair_stats()`` (the meta is always derivable from the
        postings)."""
        import json

        view = f"__postings_append_{self.name}"
        # run the INSERT on the batch's OWN session: inside a streaming
        # foreachBatch the micro-batch frame lives in a session clone,
        # and temp views are session-scoped — registering on rows'
        # session and inserting from the catalog's would not resolve
        sess = new_docs.sparkSession
        with self.catalog.write_lock(self.table_name):
            self._reload_meta()
            self._migrate_gen_locked()
            rows = self._posting_rows(
                new_docs, self.id_col, self.text_col, gen=self.cur_gen
            )
            # re-attach the registration on a fresh session via
            # tableExists — NOT by resolving the table: resolving primes
            # the catalog session's file-listing cache BEFORE the
            # clone-session INSERT below, and later reads then silently
            # miss the appended files
            self._ensure_registered()
            rows.createOrReplaceTempView(view)
            sess.sql(f"INSERT INTO {self.sql_name} SELECT * FROM {view}")
            sess.catalog.dropTempView(view)
            # the INSERT ran on the batch's session; invalidate the
            # catalog session's cached listing so its readers see it
            self.catalog.spark.catalog.refreshTable(self.sql_name)
            if self._has_doclen():
                self._append_doclens(new_docs, self.cur_gen)
            batch = (
                new_docs.filter(F.col(self.text_col).isNotNull())
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.size(tokens(F.col(self.text_col))))
                    .cast("double")
                    .alias("sumdl"),
                )
                .collect()[0]
            )
            self.n_docs += int(batch["n"])
            self.sum_dl += float(batch["sumdl"] or 0.0)
            with open(self._meta_path(), "w") as f:
                json.dump(self._meta(), f)

    def _live_id_stats(self, ids: DataFrame):
        """(count, sum dl) of the LIVE docs among ``ids`` — one bounded
        aggregate over the postings' distinct (id, dl) pairs, restricted
        by the broadcast id set before the distinct.

        Honest 100 TB cost: the broadcast semi-join filters rows, not
        bytes — this is a column-pruned (id, dl, gen) scan of the
        postings per upsert batch (a few % of the index's width, paid
        once per batch). If upserts dominate the workload, the next
        step is a doclen side table bucketed on id (the DedupState
        shape), which turns this into a probe of the batch's buckets."""
        source = (
            self.doclens if self._has_doclen() else
            # pre-doclen store: fall back to the postings scan
            self.postings
        )
        row = (
            source.join(F.broadcast(ids), self.id_col, "left_semi")
            .select(F.col(self.id_col), "dl")
            .distinct()
            .agg(
                F.count("*").alias("n"),
                F.sum("dl").cast("double").alias("sumdl"),
            )
            .collect()[0]
        )
        return int(row["n"]), float(row["sumdl"] or 0.0)

    def upsert(self, docs: DataFrame) -> None:
        """Replace-or-insert a batch: ids already in the index get their
        postings superseded (a tombstone cuts every older generation —
        including tokens the new version no longer contains), new ids
        just append. Write order is tombstone -> postings -> meta:
        the new rows carry ``gen == below_gen`` so the tombstone can
        never kill them, and a crash mid-sequence leaves the doc
        temporarily absent (a delete that hasn't re-inserted yet) —
        re-running the upsert completes it, and ``repair_stats()``
        rebuilds the meta from live postings. Physical purge happens at
        the next ``compact()``."""
        import json

        from hindex_spark.operators.artifact import append_tombstones

        with self.catalog.write_lock(self.table_name):
            self._reload_meta()
            self._migrate_gen_locked()
            self._ensure_registered()
            batch_ids = docs.select(self.id_col).distinct()
            old_n, old_sumdl = self._live_id_stats(batch_ids)
            new_gen = self.cur_gen + 1
            if old_n:
                # existence set from the RAW table: the tombstone write
                # must not read the directory it appends to, and
                # tombstoning an already-dead id is a no-op (stats came
                # from the live view above)
                existing = (
                    self._postings_raw
                    .join(F.broadcast(batch_ids), self.id_col, "left_semi")
                    .select(self.id_col).distinct()
                )
                append_tombstones(
                    existing, self.id_col, new_gen, self._tombstone_path()
                )
            rows = self._posting_rows(
                docs, self.id_col, self.text_col, gen=new_gen
            )
            view = f"__postings_upsert_{self.name}"
            sess = rows.sparkSession  # foreachBatch clone, see update()
            rows.createOrReplaceTempView(view)
            sess.sql(f"INSERT INTO {self.sql_name} SELECT * FROM {view}")
            sess.catalog.dropTempView(view)
            self.catalog.spark.catalog.refreshTable(self.sql_name)
            if self._has_doclen():
                self._append_doclens(docs, new_gen)
            batch = (
                docs.filter(F.col(self.text_col).isNotNull())
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.size(tokens(F.col(self.text_col))))
                    .cast("double")
                    .alias("sumdl"),
                )
                .collect()[0]
            )
            self.cur_gen = new_gen
            self.n_docs += int(batch["n"]) - old_n
            self.sum_dl += float(batch["sumdl"] or 0.0) - old_sumdl
            with open(self._meta_path(), "w") as f:
                json.dump(self._meta(), f)

    def delete(self, ids: DataFrame) -> None:
        """Remove docs from the index: one tombstone append cutting
        every current generation of the given ids, plus the stats
        adjustment. No postings are rewritten until ``compact()``."""
        import json

        from hindex_spark.operators.artifact import append_tombstones

        with self.catalog.write_lock(self.table_name):
            self._reload_meta()
            self._migrate_gen_locked()
            self._ensure_registered()
            id_set = ids.select(self.id_col).distinct()
            old_n, old_sumdl = self._live_id_stats(id_set)
            new_gen = self.cur_gen + 1
            append_tombstones(
                id_set, self.id_col, new_gen, self._tombstone_path()
            )
            self.cur_gen = new_gen
            self.n_docs -= old_n
            self.sum_dl -= old_sumdl
            with open(self._meta_path(), "w") as f:
                json.dump(self._meta(), f)

    # -- the query ----------------------------------------------------------

    def topk(
        self,
        query: str,
        k: int,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Top-``k`` (id, score) for ``query`` from postings only. Reads
        the query terms' buckets (bucket pruning + token-sorted row
        groups), derives df from the fetched posting lists, scores each
        posting with the shared decimal expression and sums per doc —
        one bounded groupBy over candidate docs, then
        TakeOrderedAndProject."""
        terms = query_terms(query)
        if not terms:
            raise ValueError("SearchIndex.topk: query has no terms")
        p = self.postings.filter(F.col("token").isin(terms))
        dfreqs = p.groupBy("token").agg(
            F.count("*").cast("double").alias("__df")
        )
        n = F.lit(float(self.n_docs))
        avgdl = F.lit(self.sum_dl) / F.lit(float(self.n_docs))
        scored = p.join(F.broadcast(dfreqs), "token").select(
            F.col(self.id_col),
            _bm25_term_score(
                F.col("tf").cast("double"),
                F.col("dl").cast("double"),
                F.col("__df"),
                n,
                avgdl,
                k1,
                b,
            ).alias("__s"),
        )
        return (
            scored.groupBy(self.id_col)
            .agg(F.sum("__s").cast("double").alias("score"))
            .filter(F.col("score") > 0)
            .orderBy(F.col("score").desc(), F.col(self.id_col))
            .limit(k)
        )

    def phrase_search(self, phrase: str) -> DataFrame:
        """Exact-phrase retrieval from the positional postings: (id,
        n_occurrences) for every doc containing the phrase's tokens
        CONSECUTIVELY, n_occurrences = number of start positions. No
        document text is read — the positional index resolves the
        phrase alone (the classic positional-inverted-index algorithm:
        intersect the terms' posting lists on doc, then check
        position adjacency).

        Scale shape: the postings filter reads only the phrase's
        tokens' buckets (bucket pruning); ONE id-keyed aggregation
        pivots the <= m distinct posting lists per candidate doc; the
        adjacency check is a per-doc array fold. Cost is proportional
        to the phrase terms' posting lists, never the corpus."""
        slots = phrase.strip().split()
        if not slots:
            raise ValueError("SearchIndex.phrase_search: empty phrase")
        uniq = query_terms(phrase)
        p = self.postings.filter(F.col("token").isin(uniq)).select(
            "token", F.col(self.id_col), "positions"
        )
        # pivot the distinct terms' posting lists onto one row per doc
        per_doc = p.groupBy(self.id_col).agg(
            *[
                F.max(
                    F.when(F.col("token") == t, F.col("positions"))
                ).alias(f"__pos{j}")
                for j, t in enumerate(uniq)
            ]
        )
        for j in range(len(uniq)):
            per_doc = per_doc.filter(F.col(f"__pos{j}").isNotNull())
        # a start is a position of slot 0 whose i-th successor appears
        # in slot i's posting list, for every later slot
        starts = F.col("__pos0")
        for i, tok in enumerate(slots[1:], start=1):
            j = uniq.index(tok)
            pos_j = F.col(f"__pos{j}")
            off = F.lit(i)
            starts = F.filter(
                starts, lambda s: F.array_contains(pos_j, s + off)
            )
        return (
            per_doc.select(
                F.col(self.id_col),
                F.size(starts).cast("long").alias("n_occurrences"),
            )
            .filter(F.col("n_occurrences") > 0)
            .orderBy(self.id_col)
        )

    def boolean_search(
        self,
        must: "tuple | list" = (),
        should: "tuple | list" = (),
        must_not: "tuple | list" = (),
    ) -> DataFrame:
        """Boolean retrieval from postings alone: docs containing ALL
        ``must`` terms, at least one ``should`` term (when any are
        given), and none of ``must_not``. Output: (id), ordered.

        Same scale shape as ``phrase_search``: ONE bucket-pruned
        postings fetch for every referenced term, one id-keyed pivot of
        term-presence flags, a pure-projection predicate. must_not is
        evaluated on the pivoted flags — docs matching ONLY negative
        terms never enter the aggregation, and docs matching nothing
        are correct to exclude because at least one positive term is
        required (enforced below: pure-negation needs the corpus, not
        an index)."""
        must, should, must_not = list(must), list(should), list(must_not)
        if not must and not should:
            raise ValueError(
                "boolean_search: need at least one must/should term "
                "(pure negation would require a corpus scan, not the index)"
            )
        terms = []
        for t in must + should + must_not:
            if t not in terms:
                terms.append(t)
        p = self.postings.filter(F.col("token").isin(terms)).select(
            "token", F.col(self.id_col)
        )
        per_doc = p.groupBy(self.id_col).agg(
            *[
                F.max(F.when(F.col("token") == t, True)).alias(f"__h{j}")
                for j, t in enumerate(terms)
            ]
        )
        cond = F.lit(True)
        for t in must:
            cond = cond & F.coalesce(F.col(f"__h{terms.index(t)}"), F.lit(False))
        if should:
            any_should = F.lit(False)
            for t in should:
                any_should = any_should | F.coalesce(
                    F.col(f"__h{terms.index(t)}"), F.lit(False)
                )
            cond = cond & any_should
        for t in must_not:
            cond = cond & ~F.coalesce(
                F.col(f"__h{terms.index(t)}"), F.lit(False)
            )
        return (
            per_doc.filter(cond)
            .select(self.id_col)
            .orderBy(self.id_col)
        )

    def compact(self, num_buckets: Optional[int] = None) -> None:
        """Rewrite the postings table as one file per bucket. Every
        ``update()`` INSERT adds a file set per bucket, and multi-file
        buckets cost the scan its reported sort order (an extra Sort
        before merges) plus per-file open overhead — after many daily
        batches, compaction restores build-time layout. Runs through
        the catalog's staged write + atomic swap, so readers never see
        a partial rewrite.

        NB: the source is read as RAW parquet, not through the
        registered bucketed table — the bucketed scan CLAIMS the target
        hash partitioning, which lets Catalyst elide the compaction's
        repartition, and each of the N input tasks then writes its own
        per-bucket files (measured: 9 files survive the 'compaction').
        The raw read claims nothing, so the exchange really runs and
        the write lands one file per bucket."""
        import os

        from hindex_spark.table import Table

        import json

        from hindex_spark.operators.artifact import clear_tombstones, live_view

        with self.catalog.write_lock(self.table_name):
            self._reload_meta()
            self._migrate_gen_locked()
            # None = KEEP the (just-reloaded) bucket count: a
            # maintenance pass must never silently reset a custom layout
            if num_buckets is None:
                num_buckets = self.num_buckets
            rows = self.catalog.read_raw(self.table_name)
            # physical purge of tombstoned generations (Lucene's merge
            # rule); gens are PRESERVED so a crash between the save and
            # the tombstone clear re-applies the cuts as a no-op
            rows = live_view(
                rows, self.id_col, self.catalog.spark, self._tombstone_path()
            )
            self.catalog.save_bucketed(
                Table(rows, "token", f"{self.name}_postings"),
                num_buckets=num_buckets,
            )
            # doclen rebuilt FROM the just-written purged postings (dl
            # is constant per (doc, gen)) — self-heals a crash between
            # the postings and doclen INSERTs. MUST re-read the NEW
            # files: the lazy pre-rewrite frame points at data the swap
            # above already removed.
            purged = self.catalog.read_raw(self.table_name)
            self.catalog.save_bucketed(
                Table(
                    purged.select(F.col(self.id_col), "dl", "gen").distinct(),
                    self.id_col, f"{self.name}_doclen",
                ),
                num_buckets=num_buckets,
            )
            clear_tombstones(self._tombstone_path())
            self.num_buckets = num_buckets  # bucket count is part of the
            with open(self._meta_path(), "w") as f:  # attach contract
                json.dump(self._meta(), f)

    def tfidf_keywords(self, top_n: int = 5) -> DataFrame:
        """``tfidf_keywords`` served from the postings table — the
        explode + groupBy(id, token) pass the corpus-scan version pays
        is exactly what postings already persist, so per-run cost drops
        to one groupBy(token) for df + the token-keyed idf join + the
        per-doc window. Same smoothed-idf decimal math, same output
        schema (id, token, tf, score), result-identical (shared-oracle
        gate)."""
        tf = self.postings.select(F.col(self.id_col), "token", "tf")
        n = F.lit(float(self.n_docs))
        dfreq = (
            tf.groupBy("token")
            .agg(F.count("*").alias("__df"))
            .select(
                "token",
                F.round(
                    F.log((n + 1.0) / (F.col("__df") + 1.0)) + 1.0, _SCALE
                )
                .cast(_DEC)
                .alias("__idf"),
            )
        )
        scored = tf.join(dfreq, "token").select(
            F.col(self.id_col),
            "token",
            "tf",
            (F.col("tf").cast(_DEC) * F.col("__idf")).cast("double").alias(
                "score"
            ),
        )
        w = Window.partitionBy(self.id_col).orderBy(
            F.col("score").desc(), F.col("token")
        )
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_n)
            .drop("__rn")
        )
