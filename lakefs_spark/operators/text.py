"""Text-analysis operators for large-scale training-data pipelines.

Not present in the reference (lakeFS versions objects, it doesn't look
inside them) — these are the §"beyond the reference" operators: token
counting, quality scoring, language ID, and document fingerprinting
over a ``documents(doc_id, text, ...)`` table.

Everything here is built from JVM-side ``pyspark.sql.functions``
(whole-stage codegen, no Python in the hot path); each helper returns a
column or DataFrame so callers can fuse them into one scan projection.
At 100 TB these are embarrassingly parallel single-pass projections —
no shuffle at all unless the caller aggregates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword lists for the n-gram/stopword language
# heuristic. Deliberately small: the point is the *operator shape*
# (pure-projection scoring), not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est"],
    "es": ["el", "la", "los", "de", "que", "y", "un", "una"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (split on single space, empties counted —
    matches the DuckDB oracle's ``length(split(text,' '))``)."""
    return F.size(F.split(text, " "))


# GPT-2-style pre-tokenizer classes, restated without lookahead so the
# same pattern runs on Java regex (Spark) and RE2 (DuckDB oracle):
# contraction suffixes | letter runs | digit runs | symbol runs.
# (The original's trailing-space lookahead only affects whitespace
# tokens, which a counter ignores anyway.)
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2 pre-tokenizer classes.

    A cheap, library-free estimate of LLM token cost (the real BPE
    merge table only splits *within* these pre-tokens, so this counts
    a lower bound that tracks closely for natural text)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def occurrence_count(text: Column, needle: str) -> Column:
    """Non-overlapping occurrences of ``needle`` via length difference."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / F.lit(len(needle))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Count of stopword occurrences (space-delimited) for a language.

    Case-insensitive (title-case sentence starts count), and spaces are
    doubled before matching so ADJACENT repeats each count — with
    single spacing, non-overlapping replace of " the " consumes the
    delimiter the next occurrence needs ("the the the" would count 2,
    not 3, systematically under-scoring repetitive text)."""
    padded = F.concat(
        F.lit(" "), F.replace(F.lower(text), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    hits = None
    for w in STOPWORDS[lang]:
        c = occurrence_count(padded, f" {w} ")
        hits = c if hits is None else hits + c
    return hits.cast("long")


def lang_id(text: Column) -> Column:
    """Pick the language with the most stopword hits; 'unk' if none.

    Deterministic tie-break: earlier language in STOPWORDS wins
    (encoded as a priority field inside the max-struct).
    """
    arr = F.array(
        *[
            F.struct(
                stopword_hits(text, lang).alias("s"),
                F.lit(-i).alias("p"),
                F.lit(lang).alias("l"),
            )
            for i, lang in enumerate(STOPWORDS)
        ]
    )
    best = F.array_max(arr)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("unk"))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: lengths, ratios, scores.

    Mirrors common pre-training quality filters (length, punctuation
    density, stopword ratio) as a single fused projection.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_spaces = n_chars - F.length(F.replace(t, F.lit(" "), F.lit("")))
    # case-insensitive: all-caps / title-case text is alphabetic too
    alpha = F.length(F.regexp_replace(F.lower(t), "[^a-z]", ""))
    sw = stopword_hits(t, "en")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_spaces.cast("long").alias("n_spaces"),
        alpha.cast("long").alias("n_alpha"),
        F.round(alpha / F.greatest(n_chars, F.lit(1)), 4).alias("alpha_ratio"),
        sw.alias("stopword_hits"),
        F.round(sw / F.greatest(n_tokens.cast("double"), F.lit(1.0)), 4).alias("stopword_ratio"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Fixed-weight logistic quality classifier — the fastText /
    CCNet-style quality-filter analog with deterministic, auditable
    weights instead of a learned model:

        z = -3 + 4*alpha_ratio + 6*stopword_ratio + 0.35*ln(1+n_tokens)
        q_score = sigmoid(z),  kept iff round(q_score, 6) >= threshold

    Inputs are :func:`quality_features`' ROUNDED ratios, so the score
    is a pure function both engines compute identically; the keep
    decision applies to the rounded score (no hidden-precision flips).
    One fused projection per doc — no shuffle, stays in codegen.
    """
    q = quality_features(df, text_col, id_col)
    z = (
        F.lit(-3.0)
        + F.lit(4.0) * F.col("alpha_ratio")
        + F.lit(6.0) * F.col("stopword_ratio")
        + F.lit(0.35) * F.log1p(F.col("n_tokens"))
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return q.select(
        F.col(id_col),
        score.alias("q_score"),
        (score >= F.lit(threshold)).alias("is_kept"),
    )


def token_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-language tokenizer fertility: characters per whitespace
    token and per BPE-ish token — the standard multilinguality
    diagnostic for tokenizer budgeting (a high chars/BPE-token ratio
    means the tokenizer under-serves that language). ONE groupBy with
    map-side partial aggregation."""
    t = F.col(text_col)
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            F.length(t).alias("nc"),
            token_count(t).alias("nt"),
            bpe_token_count(t).alias("nb"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nc").cast("long").alias("total_chars"),
            F.sum("nt").cast("long").alias("total_tokens"),
            F.sum("nb").cast("long").alias("total_bpe_tokens"),
            F.round(F.sum("nc") / F.sum("nt"), 6).alias("chars_per_token"),
            F.round(F.sum("nc") / F.sum("nb"), 6).alias("chars_per_bpe_token"),
        )
    )


def vocab_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_k: int = 200
) -> DataFrame:
    """Corpus vocabulary table: per token, total occurrences, document
    frequency, and IDF — the stats a BPE trainer or tf-idf filter
    starts from. Top-k by (count desc, token asc).

    Scale shape: explode -> ONE hash aggregation with map-side partial
    combine (token skew collapses map-side, so 'the' never concentrates
    a reducer); df via count(distinct doc) inside the same agg; top-k
    is a TakeOrdered, not a global sort.
    """
    n_docs = df.count()  # driver scalar; the corpus row count is cheap
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")
    stats = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    out = stats.select(
        F.col("tok").alias("token"),
        "n_total",
        "n_docs",
        F.round(F.log(F.lit(float(n_docs)) / F.col("n_docs")), 6).alias("idf"),
    )
    # orderBy+limit plans TakeOrderedAndProject (per-partition partial
    # top-k), never a global single-task window; (n_total desc, token)
    # is a total order, so the cut is deterministic
    return out.orderBy(F.col("n_total").desc(), F.col("token")).limit(top_k)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval over whitespace tokens: the standard
    lexical relevance score (Robertson/Sparck-Jones, the Lucene
    default) of every document against a fixed query-term set, top-k
    by (score desc, id). idf uses the +0.5-smoothed log form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``; scores round to 6 so the
    rank cut is engine-deterministic.

    Scale shape: the token stream is filtered to the query terms
    BEFORE any aggregation, so the per-(doc, term) TF agg sees only
    matching tokens — O(hits), not O(corpus tokens). Document lengths
    are one map-side-combined groupBy over the same stream; per-term
    df and idf collapse to |query| rows and broadcast back; N and
    avgdl are driver scalars. Top-k plans TakeOrderedAndProject, never
    a global sort.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs = df.count()  # driver scalar
    avgdl = float(dl.agg(F.avg("dl")).first()[0] or 1.0)
    tf = (
        tok.where(F.col("tok").isin(list(query_terms)))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).select(
        "tok",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, id_col)
        .select(
            F.col(id_col),
            (
                F.col("idf")
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
                )
            ).alias("s"),
        )
    )
    top = (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("s"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col))  # k rows only
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), F.col(id_col), "score"
    )


def unigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1024,
) -> DataFrame:
    """CCNet/KenLM-style quality signal, distributed: train a top-K
    unigram LM on the corpus itself and score every document by its
    mean negative log-likelihood under that model (out-of-vocabulary
    tokens get a one-count floor). High NLL = far from the corpus
    distribution (gibberish, boilerplate, wrong language); low =
    prototypical text. Sorting documents by this column is the
    standard perplexity-filter ranking, with the corpus itself as the
    reference model instead of an external KenLM binary.

    Scale shape: one token hash-aggregation with map-side partial
    combine (token skew collapses map-side), a TakeOrdered top-K cut
    whose K is FIXED regardless of corpus size (same lesson as the
    fixed-K ANN codebooks), a broadcast join of the tiny vocab back
    onto the token stream, and one per-document aggregation. No
    per-row Python anywhere.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt")).first()[0] or 1  # driver scalar
    vocab = counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(vocab_size)
    scored = tok.join(F.broadcast(vocab), "tok", "left").select(
        F.col(id_col),
        (
            -F.log(
                F.coalesce(F.col("cnt"), F.lit(1)).cast("double")
                / F.lit(float(total))
            )
        ).alias("nll"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("nll"), 6).alias("mean_nll"),
    )


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set. Two documents with the same bag of unique
    tokens collide — by design (shingle-free near-dup prefilter)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(F.split(text, " "))), " "))


def repetition_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Gopher-style repetition filter signal: fraction of a document's
    word n-gram windows that are duplicates of an earlier window —
    ``1 - distinct_ngrams / total_windows`` (0 when too short).

    One shingle explode + one groupBy; the distinct count rides the
    same aggregation. High scores mark boilerplate/spam for dropping.
    (A zero-exchange per-row projection form — distinct_shingle_count —
    measured 13% FASTER standalone but +0.5 s SLOWER inside the
    text_signals gate union, where its per-row array work serializes on
    the scan stage's few splits while the exploded aggregate overlaps
    with the other members; the gate is what the driver times, so the
    aggregate stays. Round-11 A/Bs in OPTIMIZATION_r11.md.)
    """
    from lakefs_spark.operators.dedup import shingles

    toks = F.split(F.col(text_col), " ")
    total = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    base = df.select(F.col(id_col), total.alias("n_windows"))
    dist = (
        shingles(df, text_col, id_col, n)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        base.join(dist, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_windows").cast("long").alias("n_windows"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias("n_distinct"),
            F.when(
                F.col("n_windows") > 0,
                F.round(
                    1.0 - F.coalesce(F.col("n_distinct"), F.lit(0)) / F.col("n_windows"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("rep_ratio"),
        )
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination with a Bloom-filter pre-pass: the
    100 TB shape of :func:`contamination_scores`.

    The plain semi-join shuffles the full training shingle stream on
    the shingle key. Here the eval set is folded into an ``m_bits``
    Bloom bitmap (32-bit words, <= m/32 rows), and the corpus-side
    probe is ``k`` BROADCAST hash joins + bit tests — the corpus never
    shuffles; only Bloom *candidates* (true hits + the bounded
    false-positive tail) reach the exact shingle equi-join. With
    k=3 / m=2^18 and an eval set of ~1e4 shingles the FP rate is
    ~(k*|ev|/m)^k ~ 1e-3; m scales to the eval set, never the corpus.

    Hash family: the same engine-portable md5-derived affine family as
    MinHash (functions/hashfam.py), so a DuckDB oracle rebuilds the
    identical bitmap and candidate set. Words are 32-bit inside int64
    to keep shift semantics identical on both engines (no sign bit).

    Output per training doc: (id, n_sh, n_candidates, n_exact,
    contamination) — n_exact matches contamination_scores' n_hit
    exactly (a Bloom filter has no false negatives).
    """
    from functools import reduce

    from lakefs_spark.functions.hashfam import MERSENNE31, affine_constants
    from lakefs_spark.operators.dedup import _base_hash, shingles

    consts = affine_constants(k)
    ev = shingles(eval_set, text_col, id_col, n).select("shingle").distinct()
    ev_x = ev.select(_base_hash(F.col("shingle")).alias("x"))

    def _pos(x, a: int, b: int):
        return F.pmod(F.pmod(F.lit(a) * x + F.lit(b), F.lit(MERSENNE31)), F.lit(m_bits))

    words = (
        ev_x.select(
            F.explode(F.array(*[_pos(F.col("x"), a, b) for a, b in consts])).alias("pos")
        )
        .select(
            F.expr("pos div 32").alias("bucket"),
            F.expr("shiftleft(cast(1 as bigint), cast(pmod(pos, 32) as int))").alias("bit"),
        )
        .groupBy("bucket")
        .agg(F.bit_or("bit").alias("word"))
    )

    tr = shingles(train, text_col, id_col, n)
    probe = tr.withColumn("x", _base_hash(F.col("shingle")))
    hit_tests = []
    for i, (a, b) in enumerate(consts):
        probe = probe.withColumn(f"__p{i}", _pos(F.col("x"), a, b))
        wi = words.select(
            F.col("bucket").alias(f"__bk{i}"), F.col("word").alias(f"__w{i}")
        )
        probe = probe.join(
            F.broadcast(wi), F.expr(f"__p{i} div 32") == F.col(f"__bk{i}"), "left"
        )
        mask = F.expr(
            f"shiftleft(cast(1 as bigint), cast(pmod(__p{i}, 32) as int))"
        )
        hit_tests.append(
            (F.coalesce(F.col(f"__w{i}"), F.lit(0)).bitwiseAND(mask) != 0)
        )
    bloom_hit = reduce(lambda p, q: p & q, hit_tests)
    cand = probe.where(bloom_hit).select(id_col, "shingle")

    # ONE aggregation over the candidate stream for both n_candidates
    # and n_exact: the exact-hit flag rides a broadcast left join
    # against the distinct eval set (no row multiplication), so the
    # expensive Bloom-probe plan is evaluated once instead of twice
    # (guide §1.2). The denominator stays the exploded aggregate — the
    # projection form measured slower (see contamination_scores).
    totals = tr.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    ev_flag = ev.select("shingle", F.lit(1).alias("__hit"))
    per_doc = (
        cand.join(F.broadcast(ev_flag), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count("__hit").alias("n_exact"),
        )
    )
    return (
        totals.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_sh").cast("long").alias("n_sh"),
            F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce(F.col("n_exact"), F.lit(0)).cast("long").alias("n_exact"),
            F.round(
                F.coalesce(F.col("n_exact"), F.lit(0)) / F.col("n_sh"), 6
            ).alias("contamination"),
        )
    )


def contamination_scores(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark-decontamination signal: per training document, the
    fraction of its distinct word n-grams that appear anywhere in the
    eval set — docs above a threshold get dropped before training.

    Shape: distinct eval shingles (small relative to the corpus) feed a
    semi-join against the training shingle stream — an equi-join on the
    shingle, never a doc x doc comparison. (A per-row projection form
    of the denominator — distinct_shingle_count — was measured ~7%
    SLOWER than this exploded aggregate at sf0.1, 5-rep interleaved
    A/B; the heavy per-doc string work then serializes on the scan
    stage's few splits. Kept as the aggregate.)
    """
    from lakefs_spark.operators.dedup import shingles

    tr = shingles(train, text_col, id_col, n)
    ev = shingles(eval_set, text_col, id_col, n).select("shingle").distinct()
    totals = tr.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        tr.join(ev, "shingle", "semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_sh").cast("long").alias("n_sh"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_sh"), 6).alias(
                "contamination"
            ),
        )
    )


# -- text normalization (corpus-prep pre-hash canonical form) ---------------


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    casefold: bool = False,
) -> DataFrame:
    """Canonical text form for hashing/dedup: Unicode NFC, control
    characters stripped, whitespace runs collapsed, edges trimmed,
    optional casefold. The pre-hash normalization every exact/fuzzy
    dedup pipeline needs — byte-different encodings of the same string
    ("e" + COMBINING ACUTE vs precomposed U+00E9) must collapse to one
    digest or the dedup silently under-merges.

    Spark shape: NFC runs in an Arrow-batched pandas UDF
    (unicodedata.normalize — Spark has no built-in normalizer); the
    control-strip / whitespace-collapse / trim stay JVM-side
    regexp_replace so only the NFC step crosses into Python. Returns
    (id, norm_text, norm_len, changed).
    """
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    # NULL text coalesces to "" BEFORE normalization: a cleaning stage
    # must never silently drop documents (the dedup_lines contract
    # below), and NULL norm_text would vanish from any downstream
    # hash/dedup keyed on it. A NULL doc yields norm_text="",
    # norm_len=0, changed=false.
    src = F.coalesce(F.col(text_col), F.lit(""))
    cleaned = F.regexp_replace(
        _nfc(src), r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""
    )
    collapsed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    norm = F.lower(collapsed) if casefold else collapsed
    return df.select(
        F.col(id_col).alias("id"),
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("norm_len"),
        (norm != src).alias("changed"),
    )


# -- URL canonicalization + domain rollup (crawl-corpus prep) ---------------


def canonicalize_urls(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Canonical URL form — the dedup key for crawl corpora (two
    fetches of one page must collapse before any content dedup runs):

    - scheme and host lowercased
    - default ports dropped (:80 for http, :443 for https)
    - fragment dropped
    - query parameters SORTED (k=v order is not semantic)
    - trailing slash on the path trimmed (but a bare "/" path kept
      implicit: path "" and "/" canonicalize identically)
    - registered domain extracted (host minus one leading "www.")

    All JVM-side: regexp_extract for the parts, split + array_sort +
    concat_ws for the query sort — no Python in the hot path. Returns
    (id, canon_url, domain).
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    # userinfo (user:pass@) is DROPPED from the canonical form: two
    # fetches of one page with different credentials are the same page,
    # and credentials must never leak into dedup keys or domain stats
    hostport = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)", 1
    )
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = ~(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    sorted_query = F.concat_ws("&", F.array_sort(F.split(query, "&")))
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_query)).otherwise(F.lit("")),
    )
    domain = F.regexp_replace(host, r"^www\.", "")
    return df.select(
        F.col(id_col).alias("id"),
        canon.alias("canon_url"),
        domain.alias("domain"),
    )


def domain_stats(canon: DataFrame) -> DataFrame:
    """Per-domain corpus accounting over canonicalized URLs: page
    count, distinct canonical URLs (the URL-dedup survivor count), and
    the duplicate ratio — the standard crawl-mix report. ONE hash
    aggregation with map-side partial agg; never a distinct-then-join.
    """
    return (
        canon.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("canon_url").alias("n_unique_urls"),
        )
        .withColumn(
            "dup_ratio",
            F.round(1.0 - F.col("n_unique_urls") / F.col("n_pages"), 6),
        )
    )


# -- line-level dedup (CCNet/RefinedWeb boilerplate removal) ----------------


def dedup_lines(
    df: DataFrame,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove lines that appear in >= ``min_df`` DISTINCT documents —
    the line-level dedup stage of CCNet-style pipelines (navigation
    chrome, cookie banners, boilerplate headers repeat across pages;
    dropping them before document-level dedup/quality scoring removes
    the dominant cross-site noise).

    Spark shape, no all-pairs anywhere: explode to (doc, pos, line),
    ONE hash aggregation for per-line distinct-doc counts (map-side
    partial agg collapses within-partition repeats), a LEFT join of
    the banned-line set back onto the exploded stream (left — not
    semi/anti — because the kept/removed COUNTS need both outcomes in
    one pass), and order-preserving reassembly via
    array_sort(collect_list(struct(pos, line))) — document order
    survives without a window. Blank lines never count toward df and
    are kept as-is (they carry structure, not boilerplate). NULL text
    is treated as empty, so every input doc yields exactly one output
    row (a cleaning stage must never silently drop documents). Returns
    (id, clean_text, n_kept, n_removed).
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    banned = (
        lines.where(F.col("line") != "")
        .groupBy("line")
        .agg(F.countDistinct("id").alias("df"))
        .where(F.col("df") >= min_df)
        .select("line")
    )
    is_kept = F.col("__banned").isNull()
    return (
        lines.join(banned.withColumn("__banned", F.lit(True)), "line", "left")
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(is_kept, F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.when(is_kept, 1)).cast("long").alias("n_kept"),
            F.count(F.when(~is_kept, 1)).cast("long").alias("n_removed"),
        )
    )


def bpe_pair_stats(
    df: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Corpus-scale BPE merge-candidate statistics: the top-``k``
    adjacent character pairs weighted by word frequency — the counting
    step of the first BPE training iteration (Sennrich et al. 2016),
    run the way tokenizer training actually does it: collapse the
    corpus to a (word, freq) vocabulary FIRST, then count pairs over
    the vocab.

    Returns ``(rank, pair, n_words, n_occ)``: distinct words
    containing the pair and total frequency-weighted occurrences,
    ranked by n_occ desc (pair asc tie-break).

    Scale shape (100 TB): the token explode feeds ONE map-side-combined
    hash aggregation down to vocab size (Heaps' law: ~10^6-10^7 rows
    regardless of corpus size); pair explosion runs over the VOCAB, not
    the corpus — per-word pairs are a JVM transform over character
    positions — and the final top-k is TakeOrdered. No Python, no
    second pass over the text.
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.where(F.length("word") >= 2).select(
        "word",
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    stats = pairs.groupBy("pair").agg(
        F.countDistinct("word").cast("long").alias("n_words"),
        F.sum("freq").cast("long").alias("n_occ"),
    )
    topk = stats.orderBy(F.col("n_occ").desc(), F.col("pair")).limit(k)
    from pyspark.sql.window import Window

    win = Window.orderBy(F.col("n_occ").desc(), F.col("pair"))
    return topk.select(
        F.row_number().over(win).cast("long").alias("rank"),
        "pair",
        "n_words",
        "n_occ",
    )
