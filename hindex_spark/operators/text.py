"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language ID, document
fingerprinting. All JVM-side built-in functions (no Python UDFs) so the
whole pipeline stays in whole-stage codegen — at 100 TB these run as a
single pass over the documents table with full column pruning.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Whitespace tokenizer shared by every operator (and mirrored in oracle
# SQL as string_split_regex(trim(text), '\s+')).
TOKEN_RE = r"\s+"

# BPE-ish word/number/punct splitter (mirrored in DuckDB regexp_extract_all).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# n-gram language markers: deterministic scoring sets (the reference for a
# real pipeline would be character-n-gram profiles; same plumbing).
LANG_MARKERS: Dict[str, List[str]] = {
    "de": ["und", "der", "die", "nicht", "batch", "slow"],
    "en": ["the", "a", "and", "fast", "data", "row"],
    "es": ["el", "la", "que", "query", "line", "scan"],
    "fr": ["le", "la", "et", "spark", "part", "join"],
    "zh": ["de", "shi", "bu", "merge", "value", "agg"],
}


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), TOKEN_RE)


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count via the BPE-ish regex."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), F.lit(0)))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation."""
    punct = F.length(F.regexp_replace(col, r"[^.!?,;:]", ""))
    return punct / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    # sum of token lengths == length of the separator-less join — ONE
    # native expression instead of an aggregate lambda that evaluates
    # interpreted per token (guide §1.2); identical value (elements are
    # non-null, so array_join drops nothing), identical NULL/empty
    # behavior (null text -> null either way, empty array -> 0)
    total = F.length(F.array_join(toks, ""))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1]-ish quality heuristic: long enough, low punct,
    moderate stopword density, sane word lengths — the usual cheap
    pre-filter before expensive dedup/classification stages."""
    len_score = F.least(F.length(col) / F.lit(200.0), F.lit(1.0))
    punct_pen = punct_ratio(col) * 2.0
    stop = stopword_ratio(col)
    wordlen = mean_token_len(col)
    wordlen_pen = F.when((wordlen < 2) | (wordlen > 12), F.lit(0.3)).otherwise(F.lit(0.0))
    return F.greatest(
        F.least(len_score - punct_pen - wordlen_pen + stop * 0.2, F.lit(1.0)), F.lit(0.0)
    )


def lang_scores(col: Column) -> Dict[str, Column]:
    toks = distinct_tokens(col)
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(*markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }


def lang_id(col: Column) -> Column:
    """Predicted language = argmax marker hits, alphabetical tie-break."""
    scores = lang_scores(col)
    # build: CASE with langs in alphabetical order, strict > keeps earlier
    # (alphabetically smaller) lang on ties
    langs = sorted(scores.keys())
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best_lang


def repetition_ratio(toks: Column, n: int = 3) -> Column:
    """Fraction of repeated word n-grams (Gopher-style repetition
    signal): 1 - distinct_ngrams/total_ngrams; 0 = no repetition.

    ``toks`` must be a MATERIALIZED token-array column (select
    ``tokens(text)`` into a column first) — an inline tokens(text) here
    would re-run split() per element inside the lambda (O(n^2))."""
    # Docs shorter than n tokens have no n-grams: collapse to a single
    # whole-text window (ratio 0 — same rule as shingle_expr and the
    # text_gopher_rules oracle). The when-guard also keeps ANSI mode
    # (Spark 4 default) from throwing INVALID_ARRAY_INDEX_IN_ELEMENT_AT:
    # the old greatest(size-n, 0) bound still indexed past the array for
    # 1..n-1-token docs, crashing the whole job on one short doc.
    windows = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + off + 1) for off in range(n)]),
    )
    ng = F.when(F.size(toks) >= n, windows).otherwise(F.array(F.concat_ws(" ", toks)))
    total = F.size(ng)
    distinct = F.size(F.array_distinct(ng))
    return (1 - distinct / F.greatest(total, F.lit(1))).cast("double")


def max_word_length(toks: Column) -> Column:
    """Longest token (Gopher rule: drop docs with absurdly long words).
    ``toks`` = materialized token-array column."""
    return F.array_max(F.transform(toks, lambda x: F.length(x)))


def normalize_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(col: Column) -> Column:
    """Exact-content fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


def bag_fingerprint(col: Column) -> Column:
    """Order-insensitive fingerprint: md5 of the sorted distinct token
    bag (catches shuffled near-dups that exact fingerprints miss)."""
    return F.md5(F.array_join(F.array_sort(distinct_tokens(col)), " "))


#: PII patterns chosen to parse identically under Java regex (Spark) and
#: RE2 (DuckDB oracle): no backreferences, no lookaround, bounded
#: quantifiers — so redaction is oracle-checkable byte-for-byte.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{3,4}-\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(col: Column) -> Column:
    """Training-data scrubbing: replace emails, dashed phone numbers and
    IPv4 literals with typed placeholder tokens. Pure JVM regexp_replace
    chain — one projection, no UDF, safe at any scale."""
    out = col
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text analysis: all metrics as added columns."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio"),
        F.round(quality_score(c), 4).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
        bag_fingerprint(c).alias("bag_fingerprint"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k token n-grams by EXACT count: (gram, cnt),
    highest first, gram-lexicographic tie-break so the cut is
    deterministic across engines. The vocabulary/boilerplate report a
    curation pass reads before choosing stop-grams or dedup shingle
    sizes. One explode (map-side, ~tokens-per-doc rows) + one
    gram-keyed count with map-side combine + a global top-k (Spark's
    TakeOrderedAndProject — never a full sort of the vocabulary)."""
    if n < 1 or k < 1:
        raise ValueError(f"n and k must be >= 1 (got n={n}, k={k})")
    # guard short docs: sequence(1, 0) steps BACKWARDS in Spark, so an
    # under-n token list must short-circuit to an empty position array.
    # Gram strings are assembled by a top-level slice/concat_ws AFTER
    # the position explode (Generate + Project fuse in codegen) instead
    # of a transform lambda that ran interpreted per position and
    # materialized each doc's full gram array first — the same rewrite
    # as remove_duplicate_spans' k-gram builder. __toks is materialized
    # before the explode so tokenization runs once per doc, not once
    # per gram.
    toked = df.filter(F.col(text_col).isNotNull()).select(
        tokens(F.col(text_col)).alias("__toks")
    )
    positions = F.when(
        F.size("__toks") < n, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), F.size("__toks") - (n - 1)))
    return (
        toked.select(F.col("__toks"), F.explode(positions).alias("__p"))
        .select(
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__p"), n)
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram"))
        .limit(k)
    )


# --- domain-level corpus operators ------------------------------------------
# Web-scale pipelines curate per SOURCE DOMAIN before per-document work
# (CCNet/RefinedWeb/Dolma style): cap documents per domain, drop
# blocklisted domains, and report per-domain quality so curation
# decisions are data-driven. ``source`` plays the domain here.


def domain_stats(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-domain curation report: document count, distinct-content
    count (within-domain exact-dup signal), mean quality, mean length.
    One hash aggregate on the domain key — scale-free."""
    c = F.col(text_col)
    return df.groupBy(F.col(source_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(c)).alias("n_unique"),
        F.round(F.avg(quality_score(c)), 4).alias("avg_quality"),
        F.round(F.avg(F.length(c)), 2).alias("avg_chars"),
    )


def domain_filter(
    df: DataFrame,
    source_col: str = "source",
    blocklist: Optional[Sequence[str]] = None,
    allowlist: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Drop blocklisted domains / keep only allowlisted ones. Plain
    pushed-down predicates (isin compiles to an In filter reaching the
    parquet scan); at real blocklist sizes (millions of domains) switch
    to a broadcast anti-join on a blocklist table — same semantics."""
    out = df
    if blocklist:
        out = out.filter(~F.col(source_col).isin(list(blocklist)))
    if allowlist:
        out = out.filter(F.col(source_col).isin(list(allowlist)))
    return out


def domain_cap(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    max_per_domain: int = 1000,
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per domain — the
    deterministic lowest-id members, so reruns and replicas agree
    (RefinedWeb-style per-domain caps against boilerplate-heavy hosts).

    One window per domain key. Skew note for 100 TB: a single giant
    domain serializes its own partition's sort; since everything past
    the cap is discarded anyway, pre-thin pathological domains first
    (e.g. filter by a hash-mod keeping ~2x the cap per known-giant
    domain from ``domain_stats``), then apply the exact window on the
    survivors."""
    w = Window.partitionBy(source_col).orderBy(id_col)
    return (
        df.withColumn("__dn", F.row_number().over(w))
        .filter(F.col("__dn") <= max_per_domain)
        .drop("__dn")
    )
