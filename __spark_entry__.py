"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

Spark side: deterministic fixture views (lakefs_spark/sources/relspec.py,
dialect-portable SQL shared with the oracle) + the Python operator
implementations (lakefs_spark/operators/*). Oracle side: independent
relational restatement (lakefs_spark/sources/oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakefs_spark.operators import dedup as D
from lakefs_spark.operators import diff as DF_
from lakefs_spark.operators import gc as GC
from lakefs_spark.operators import listing as L
from lakefs_spark.operators import merge as M
from lakefs_spark.operators import overlay as O
from lakefs_spark.operators import similarity as SIM
from lakefs_spark.operators import sync as SY
from lakefs_spark.operators import text as TX
from lakefs_spark.sources import oracle as ORC
from lakefs_spark.sources.fixtures import create_fixture_views, entries_view, staged_view

_FIXTURES_READY: set[tuple[int, str]] = set()


def _session_tag(spark: SparkSession) -> str:
    # applicationId, not id(spark): a GC'd session's id can be reused
    # by a new session object, which would serve stale cached state
    return spark.sparkContext.applicationId


def _fixtures(spark: SparkSession, sf_dir: str) -> None:
    tag = (_session_tag(spark), sf_dir)
    if tag not in _FIXTURES_READY:
        create_fixture_views(spark, sf_dir)
        _FIXTURES_READY.add(tag)


def _snap(spark, sf_dir, name) -> DataFrame:
    _fixtures(spark, sf_dir)
    return entries_view(spark, name)


# -- listing ---------------------------------------------------------------


def q_snapshot_listing(spark, sf_dir):
    return L.list_entries(_snap(spark, sf_dir, "snap_a")).select(
        "key", "identity", "address", "size", "etag"
    )


def q_list_prefix_page(spark, sf_dir):
    return L.list_entries(
        _snap(spark, sf_dir, "snap_a"),
        prefix=ORC.LIST_PREFIX,
        after=ORC.LIST_AFTER,
        limit=ORC.LIST_LIMIT,
    ).select("key", "identity", "size", "etag")


def q_list_delimiter_groups(spark, sf_dir):
    out = L.list_entries(_snap(spark, sf_dir, "merge_source"), prefix="tables/", delimiter="/")
    return out.select("key", "is_common_prefix")


def q_list_delimiter_leaves(spark, sf_dir):
    out = L.list_entries(_snap(spark, sf_dir, "snap_a"), prefix=ORC.LIST_PREFIX, delimiter="/")
    return out.select("key", "is_common_prefix", "identity", "size", "etag")


# -- overlay / staging -----------------------------------------------------


def _staged_layers(spark, sf_dir):
    _fixtures(spark, sf_dir)
    return [
        staged_view(spark, "staged_active"),
        staged_view(spark, "staged_sealed"),
    ]


def q_overlay_visible(spark, sf_dir):
    committed = O.with_layer(_snap(spark, sf_dir, "entries"), seq=2)
    layers = _staged_layers(spark, sf_dir) + [committed]
    return O.overlay(layers).select("key", "identity", "size", "etag")


def q_uncommitted_diff(spark, sf_dir):
    staged = O.overlay_raw(_staged_layers(spark, sf_dir))
    committed = _snap(spark, sf_dir, "entries")
    return DF_.uncommitted_diff(staged, committed).select("key", "diff_type", "identity")


# -- diff / compare / merge ------------------------------------------------


def q_diff_refs(spark, sf_dir):
    return DF_.diff(_snap(spark, sf_dir, "snap_a"), _snap(spark, sf_dir, "snap_b")).select(
        "key", "diff_type", "left_identity", "identity"
    )


def q_local_sync_diff(spark, sf_dir):
    """lakectl-local walk-vs-listing diff (pkg/local/diff.go:268-336)."""
    return SY.local_diff(
        _snap(spark, sf_dir, "snap_b"), _snap(spark, sf_dir, "snap_a"), path_col="key"
    )


def q_sync_plan(spark, sf_dir):
    """3-way sync plan: local/remote change lists vs the synced base
    merged into operations (pkg/local/diff.go:109-149, sync.go)."""
    base = _snap(spark, sf_dir, "merge_base")
    lc = SY.local_diff(_snap(spark, sf_dir, "merge_source"), base, path_col="key")
    rc = SY.local_diff(_snap(spark, sf_dir, "merge_dest"), base, path_col="key")
    return SY.sync_plan(lc, rc)


def q_diff_summary(spark, sf_dir):
    d = DF_.diff(_snap(spark, sf_dir, "snap_a"), _snap(spark, sf_dir, "snap_b"))
    return DF_.diff_summary(d)


def q_compare_refs(spark, sf_dir):
    return DF_.compare(
        _snap(spark, sf_dir, "merge_base"),
        _snap(spark, sf_dir, "merge_source"),
        _snap(spark, sf_dir, "merge_dest"),
    ).select("key", "diff_type", "identity")


def _merge(spark, sf_dir, strategy):
    return M.merge(
        _snap(spark, sf_dir, "merge_base"),
        _snap(spark, sf_dir, "merge_source"),
        _snap(spark, sf_dir, "merge_dest"),
        strategy=strategy,
    )


def q_merge_result_src(spark, sf_dir):
    merged, _ = _merge(spark, sf_dir, "src")
    return merged.select("key", "identity", "size", "etag")


def q_merge_result_dest(spark, sf_dir):
    merged, _ = _merge(spark, sf_dir, "dest")
    return merged.select("key", "identity", "size", "etag")


def q_merge_conflicts(spark, sf_dir):
    _, conflicts = _merge(spark, sf_dir, "none")
    return conflicts.select("key", "identity")


# -- gc --------------------------------------------------------------------


def q_gc_mark(spark, sf_dir):
    _fixtures(spark, sf_dir)
    listing = spark.table("storage_listing")
    committed = GC.committed_addresses(_snap(spark, sf_dir, "entries"))
    uncommitted = spark.table("uncommitted_addresses")
    return GC.gc_mark(listing, committed, uncommitted)


def q_gc_committed_addresses(spark, sf_dir):
    _fixtures(spark, sf_dir)
    union = (
        _snap(spark, sf_dir, "entries")
        .unionByName(_snap(spark, sf_dir, "merge_source"))
        .unionByName(_snap(spark, sf_dir, "merge_dest"))
    )
    return GC.committed_addresses(union)


# -- range stats -----------------------------------------------------------


def q_range_stats(spark, sf_dir):
    from lakefs_spark.functions.rownum import with_global_row_number

    snap = _snap(spark, sf_dir, "snap_a")
    # distributed global row number (functions/rownum.py) instead of an
    # unpartitioned window — the latter collapses 100 TB to one task
    return (
        with_global_row_number(snap.select("key", "size"), ["key"], out_col="rn")
        .select(
            "key",
            "size",
            F.floor((F.col("rn") - 1) / 5000).cast("long").alias("chunk_idx"),
        )
        .groupBy("chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
            F.sum("size").alias("total_size"),
        )
    )


# -- text / dedup ----------------------------------------------------------


def _docs(spark, sf_dir):
    _fixtures(spark, sf_dir)
    return spark.table("documents")


def q_dedup_exact(spark, sf_dir):
    return D.exact_duplicates(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", TX.token_count(F.col("text")).cast("long").alias("n_tokens")
    )


def q_bpe_pair_stats(spark, sf_dir):
    """Corpus-scale BPE merge-candidate counting (Sennrich et al.
    2016, first training iteration): top-50 adjacent character pairs
    by word-frequency-weighted occurrences — vocab-sized aggregation,
    pair explode over the vocab only, TakeOrdered top-k
    (operators/text.bpe_pair_stats)."""
    return TX.bpe_pair_stats(_docs(spark, sf_dir), k=50)


def q_train_val_split(spark, sf_dir):
    """Deterministic hash-based corpus split (90/10): bucket =
    portable base hash (functions/hashfam.py) of 'split|<doc_id>'
    mod 100 — stable across runs, partitionings, and engines."""
    from lakefs_spark.functions.hashfam import X_MOD

    docs = _docs(spark, sf_dir)
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(X_MOD),
    ) % 100
    return docs.select(
        "doc_id",
        bucket.cast("long").alias("bucket"),
        F.when(bucket < 90, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


def q_pii_counts(spark, sf_dir):
    """PII signal extraction (operators/pipeline.pii_signals) over a
    probe corpus synthesized from customer rows: a deterministic mix
    of rows with emails (custkey%3), phones (custkey%5, the c_phone
    format), IPv4s (custkey%7), and rows with none of them."""
    from lakefs_spark.operators import pipeline as P

    _fixtures(spark, sf_dir)
    c = spark.table("customer")
    k = F.col("c_custkey")
    phone = F.concat_ws(
        "-",
        (k % 90 + 10).cast("string"),
        (k % 900 + 100).cast("string"),
        ((k * 7) % 900 + 100).cast("string"),
        (k % 9000 + 1000).cast("string"),
    )
    probe = c.select(
        k.alias("id"),
        F.concat_ws(
            " ",
            F.col("c_name"),
            F.col("c_mktsegment"),
            F.when(
                k % 3 == 0,
                F.concat(
                    F.regexp_replace(F.lower("c_name"), "[^a-z0-9]", "."),
                    F.lit("@example.com"),
                ),
            ),
            F.when(k % 5 == 0, phone),
            F.when(
                k % 7 == 0,
                F.concat(
                    F.lit("10.20."),
                    (k % 256).cast("string"),
                    F.lit("."),
                    (k % 100).cast("string"),
                ),
            ),
        ).alias("text"),
    )
    return P.pii_signals(probe, id_col="id")


def q_sampling_weights(spark, sf_dir):
    """Temperature-based language sampling mix (alpha=0.7, 1000-doc
    budget) — operators/pipeline.sampling_weights."""
    from lakefs_spark.operators import pipeline as P

    return P.sampling_weights(_docs(spark, sf_dir), "lang", alpha=0.7, budget=1000)


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): per-doc sum of
    add-one-smoothed log ratios of hashed unigram+bigram buckets,
    target = src0 exemplars vs the whole corpus — bucket-weight table
    broadcasts, corpus aggregates once on doc_id
    (operators/pipeline.dsir_importance)."""
    from lakefs_spark.operators import pipeline as P

    docs = _docs(spark, sf_dir)
    return P.dsir_importance(docs, docs.where(F.col("source") == "src0"))


def q_dsir_top(spark, sf_dir):
    """Deterministic DSIR importance-resampling selection: top-50 by
    rounded log_weight, doc_id tie-break
    (operators/pipeline.dsir_select)."""
    from lakefs_spark.operators import pipeline as P

    docs = _docs(spark, sf_dir)
    return P.dsir_select(docs, docs.where(F.col("source") == "src0"), k=50)


def q_sequence_packing(spark, sf_dir):
    """Greedy token-budget sequence packing (budget=512, 8 shards) via
    applyInPandas per shard; the oracle replays the same greedy walk
    with a recursive CTE (operators/pipeline.pack_sequences)."""
    from lakefs_spark.operators import pipeline as P

    return P.pack_sequences(_docs(spark, sf_dir), budget=512, n_shards=8)


def q_passage_dedup(spark, sf_dir):
    """Passage-level exact dedup: 3-word windows occurring in >=2
    distinct documents (operators/pipeline.passage_dedup)."""
    from lakefs_spark.operators import pipeline as P

    return P.passage_dedup(_docs(spark, sf_dir), w=3, min_docs=2)


def q_boilerplate_strip(spark, sf_dir):
    """Per-document boilerplate fraction: passages repeated across >=5
    docs are boilerplate; reports the cleaned token count
    (operators/pipeline.boilerplate_strip)."""
    from lakefs_spark.operators import pipeline as P

    return P.boilerplate_strip(_docs(spark, sf_dir), w=3, boiler_min_docs=5)


def q_length_band_filter(spark, sf_dir):
    """Quantile-band corpus filter: keep documents inside the exact
    [p05, p95] band of n_chars (operators/pipeline.band_filter)."""
    from lakefs_spark.operators import pipeline as P

    return P.band_filter(_docs(spark, sf_dir), "n_chars", 0.05, 0.95)


def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids (operators/similarity.
    label_centroids): posexplode + one partial-agg groupBy."""
    from lakefs_spark.operators.similarity import label_centroids

    _fixtures(spark, sf_dir)
    return label_centroids(spark.table("embeddings"))


def q_prototypicality(spark, sf_dir):
    """Data-pruning metric (SSL-prototypes / SemDeDup family): cosine
    of each vector to its own label centroid + within-label rank
    (operators/similarity.prototypicality)."""
    from lakefs_spark.operators.similarity import prototypicality

    _fixtures(spark, sf_dir)
    return prototypicality(spark.table("embeddings"))


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampler realizing the alpha=0.7
    temperature mix via the portable md5 hash family
    (operators/pipeline.stratified_sample)."""
    from lakefs_spark.operators import pipeline as P

    return P.stratified_sample(_docs(spark, sf_dir), "lang", alpha=0.7, budget=1000)


def q_corpus_funnel(spark, sf_dir):
    """The corpus-prep filter funnel composed end-to-end over the
    training slice (doc_id < 450): exact length band -> alpha-ratio
    quality cut -> repetition cut -> benchmark decontamination, with
    per-stage surviving doc/token counts. Each stage is its own gated
    operator; thresholds compare the same rounded values on both
    engines, so the cut is reproducible bit-for-bit."""
    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") < 450)
    qf = TX.quality_features(train).select("doc_id", "alpha_ratio")
    rep = TX.repetition_scores(train).select("doc_id", "rep_ratio")
    cont = TX.contamination_scores(
        train, docs.where(F.col("doc_id") >= 450)
    ).select("doc_id", "contamination")
    from lakefs_spark.operators import pipeline as P

    band = P.band_filter(train, "n_chars", 0.05, 0.95).select("doc_id", "in_band")
    base = (
        train.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_toks"))
        .join(band, "doc_id")
        .join(qf, "doc_id")
        .join(rep, "doc_id", "left")
        .join(cont, "doc_id", "left")
    )
    s1 = F.col("in_band")
    s2 = s1 & (F.col("alpha_ratio") >= 0.75)
    s3 = s2 & (F.coalesce("rep_ratio", F.lit(0.0)) <= 0.2)
    s4 = s3 & (F.coalesce("contamination", F.lit(0.0)) <= 0.05)
    flags = base.select(
        "n_toks",
        F.lit(True).alias("s0_all"),
        s1.alias("s1_length"),
        s2.alias("s2_quality"),
        s3.alias("s3_repetition"),
        s4.alias("s4_decontaminated"),
    )
    stages = ["s0_all", "s1_length", "s2_quality", "s3_repetition", "s4_decontaminated"]
    return flags.agg(
        *[F.sum(F.when(F.col(s), 1).otherwise(0)).cast("long").alias(f"d_{s}") for s in stages],
        *[F.sum(F.when(F.col(s), F.col("n_toks")).otherwise(0)).cast("long").alias(f"t_{s}") for s in stages],
    ).select(
        F.expr(
            "stack(5, "
            + ", ".join(f"'{s}', d_{s}, t_{s}" for s in stages)
            + ") as (stage, n_docs, n_tokens)"
        )
    )


def q_repetition_scores(spark, sf_dir):
    """Gopher-style duplicate-3gram ratio per document
    (operators/text.repetition_scores)."""
    return TX.repetition_scores(_docs(spark, sf_dir))


def q_unigram_nll(spark, sf_dir):
    """Corpus-trained unigram-LM mean negative log-likelihood per
    document — the distributed analog of the CCNet/KenLM perplexity
    filter (operators/text.unigram_nll): fixed-K vocabulary with an
    OOV one-count floor, broadcast back over the token stream."""
    return TX.unigram_nll(_docs(spark, sf_dir), vocab_size=1024)


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: per training doc (doc_id < 450), the
    fraction of its distinct 3-grams appearing anywhere in the eval
    slice (doc_id >= 450) — shingle equi-join, never doc x doc."""
    docs = _docs(spark, sf_dir)
    return TX.contamination_scores(
        docs.where(F.col("doc_id") < 450), docs.where(F.col("doc_id") >= 450)
    )


def q_bloom_decontamination(spark, sf_dir):
    """Bloom-prefiltered decontamination (operators/text.
    bloom_decontaminate): the eval slice folds into a 2^18-bit Bloom
    bitmap; the training shingle stream is probed via k=3 broadcast
    joins + bit tests (the corpus never shuffles) and only candidates
    reach the exact equi-join. n_exact must equal the plain semi-join's
    n_hit (no false negatives); n_candidates >= n_exact bounds the FP
    tail — both hashed against an oracle that rebuilds the identical
    bitmap."""
    docs = _docs(spark, sf_dir)
    return TX.bloom_decontaminate(
        docs.where(F.col("doc_id") < 450), docs.where(F.col("doc_id") >= 450)
    )


def q_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (operators/pipeline.
    doc_chunks): 32-token windows every 24 tokens (8-token overlap),
    one JVM projection + posexplode — the RAG/context-prep shape."""
    from lakefs_spark.operators import pipeline as P

    return P.doc_chunks(_docs(spark, sf_dir).where(F.col("doc_id") < 450), size=32, stride=24)


def q_bm25_topk(spark, sf_dir):
    """BM25 top-20 for a fixed 4-term query (operators/text.bm25_topk):
    TF only over the pre-filtered query-term token stream, per-term
    smoothed idf broadcast back, rounded scores, TakeOrdered cut."""
    return TX.bm25_topk(
        _docs(spark, sf_dir), ["vector", "hash", "merge", "query"], k=20
    )


def q_quality_classifier(spark, sf_dir):
    """Fixed-weight logistic quality filter (operators/text.
    quality_score): deterministic fastText-filter analog over the
    rounded quality ratios; keep decision on the rounded score."""
    return TX.quality_score(_docs(spark, sf_dir))


def q_token_fertility(spark, sf_dir):
    """Per-language tokenizer fertility (operators/text.
    token_fertility): chars per whitespace / BPE-ish token, one
    map-side-combined groupBy."""
    return TX.token_fertility(_docs(spark, sf_dir))


def q_length_percentiles(spark, sf_dir):
    """Exact per-language length percentiles (quality-filter
    thresholds): one groupBy with a multi-percentile aggregate —
    F.percentile is exact with linear interpolation, same definition
    as the oracle's quantile_cont."""
    docs = _docs(spark, sf_dir)
    ps = [0.25, 0.5, 0.75, 0.9]
    agg = (
        docs.select(
            TX.lang_id(F.col("text")).alias("lang_pred"),
            F.length("text").alias("n"),
        )
        .groupBy("lang_pred")
        .agg(F.percentile("n", F.lit(ps)).alias("pct"))
    )
    return agg.select(
        "lang_pred", F.posexplode("pct").alias("pos", "val")
    ).select("lang_pred", F.col("pos").cast("long").alias("pos"), F.round("val", 6).alias("val"))


def q_vocab_stats(spark, sf_dir):
    """Corpus vocabulary: term frequency, document frequency, IDF —
    top-200 tokens (operators/text.vocab_stats)."""
    return TX.vocab_stats(_docs(spark, sf_dir), top_k=200)


def q_bpe_token_counts(spark, sf_dir):
    """BPE-ish token counting (GPT-2 pre-tokenizer classes, lookahead-
    free so Spark's Java regex and the RE2 oracle agree)."""
    return _docs(spark, sf_dir).select(
        "doc_id", TX.bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens")
    )


def q_incremental_text_stats(spark, sf_dir):
    """Diff-driven incremental processing — the versioning x pipeline
    integration: token stats are recomputed ONLY for documents whose
    backing object changed between two refs. The diff is
    manifest-pruned (O(changed ranges)) and the semi-join pushes the
    touched-doc set into the corpus scan, so at 100 TB a 1% commit
    reprocesses 1% of the corpus instead of all of it."""
    from lakefs_spark.operators.dedup import _base_hash

    d = DF_.diff(_snap(spark, sf_dir, "snap_a"), _snap(spark, sf_dir, "snap_b"))
    touched = d.select(
        F.pmod(_base_hash(F.col("key")), F.lit(500)).alias("doc_id")
    ).distinct()
    docs = _docs(spark, sf_dir).join(touched, "doc_id", "semi")
    return docs.select(
        "doc_id", TX.token_count(F.col("text")).cast("long").alias("n_tokens")
    )


def q_text_quality(spark, sf_dir):
    return TX.quality_features(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return _docs(spark, sf_dir).select("doc_id", TX.lang_id(F.col("text")).alias("lang_pred"))


def q_doc_fingerprints(spark, sf_dir):
    return _docs(spark, sf_dir).select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


def q_text_normalize(spark, sf_dir):
    """Pre-hash canonical text form (operators/text.normalize_text):
    NFC (combining acute + 'e' collapses to U+00E9), control chars
    stripped, whitespace runs collapsed, edges trimmed. The fixture
    DIRTIES each doc deterministically (decomposed accent + bell +
    tab + space runs) so the oracle hash proves real normalization,
    not a no-op on ASCII corpus text."""
    docs = _docs(spark, sf_dir)
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.lit("Ae\u0301 "),  # decomposed: e + U+0301 COMBINING ACUTE
            F.substring("text", 1, 40),
            F.lit("\x07\t  tail  "),  # bell + tab + space runs
        ).alias("text"),
    )
    out = TX.normalize_text(dirty)
    return out.select(
        F.col("id").alias("doc_id"),
        F.md5("norm_text").alias("norm_md5"),
        "norm_len",
        "changed",
    )


def q_url_canonical(spark, sf_dir):
    """Canonical URL form (operators/text.canonicalize_urls): scheme/
    host lowercase, default ports dropped (non-default kept), fragment
    dropped, query params sorted, trailing slash trimmed, registered
    domain extracted. URLs synthesized deterministically per doc over
    a small host set so domains repeat (feeding q_domain_stats)."""
    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP://"))
        .otherwise(F.lit("HTTPS://")),
        # userinfo on every 11th doc — credentials must DROP from the
        # canonical form (same page regardless of who fetched it)
        F.when(F.col("doc_id") % 11 == 0, F.lit("User:Pw@")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.Example"))
        .otherwise(F.lit("Example")),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(":80"))
        .when(F.col("doc_id") % 5 == 0, F.lit(":8443"))
        .otherwise(F.lit(":443")),
        F.lit("/p/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("/"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?b=2&a=1&c=3")).otherwise(F.lit("")),
        F.lit("#frag"),
    )
    return TX.canonicalize_urls(docs.select("doc_id", url.alias("url"))).select(
        F.col("id").alias("doc_id"), "canon_url", "domain"
    )


def q_domain_stats(spark, sf_dir):
    """Per-domain crawl accounting over the canonicalized URL set:
    page count, distinct canonical URLs, duplicate ratio — ONE hash
    aggregation (operators/text.domain_stats)."""
    canon = q_url_canonical(spark, sf_dir).select(
        F.col("doc_id").alias("id"), "canon_url", "domain"
    )
    return TX.domain_stats(canon).orderBy("domain")


def q_line_dedup(spark, sf_dir):
    """CCNet-style line-level boilerplate removal (text.dedup_lines):
    lines appearing in >= 3 distinct docs are dropped; blank lines
    never count and are kept. The fixture builds multi-line docs with
    a universal banner (banned), a mostly-unique body line, a blank
    line, and a 25%-shared footer (banned at sf >= 0.001)."""
    docs = _docs(spark, sf_dir)
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.lit("COOKIE BANNER\n"),
            F.substring("text", 1, 60),
            F.lit("\n\n"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("NAV FOOTER"))
            .otherwise(F.concat(F.lit("tail-"), F.col("doc_id").cast("string"))),
        ).alias("text"),
    )
    out = TX.dedup_lines(dirty, min_df=3)
    return out.select(
        F.col("id").alias("doc_id"), "clean_text", "n_kept", "n_removed"
    )


def q_ngram_jaccard(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    return D.ngram_jaccard_pairs(docs, threshold=0.3)


# -- similarity ------------------------------------------------------------


def _embeddings(spark, sf_dir):
    _fixtures(spark, sf_dir)
    return spark.table("embeddings")


def q_cosine_pairs(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8)
    pairs = SIM.cosine_pairs(q, emb).where(F.col("qa") < F.col("qb"))
    return pairs.select("qa", "qb", F.round("sim", 4).alias("sim"))


def q_hybrid_rerank(spark, sf_dir):
    """Hybrid lexical+dense retrieval (operators/similarity.
    hybrid_rerank): BM25 top-50 -> Rocchio PRF query vector (mean of
    the top-3 candidates' embeddings, 6dp-rounded before the dot) ->
    blended rerank 0.5*bm25_norm + 0.5*cosine, rounded 4dp, top-10."""
    return SIM.hybrid_rerank(
        _docs(spark, sf_dir), _embeddings(spark, sf_dir),
        ["vector", "hash", "merge", "query"],
    )


def q_ann_topk(spark, sf_dir):
    # rank dropped from the contract: row order within float-noise ties
    # is engine-specific; (membership, sim@4dp) is not (see ivf_topk)
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8)
    return SIM.brute_force_topk(q, emb, k=5).select("qa", "qb", "sim")


def q_lsh_topk(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8)
    return SIM.lsh_topk(q, emb, dim=64, k=5, n_planes=6).select("qa", "qb", "sim")


def q_ann_recall(spark, sf_dir):
    """ANN quality evaluation: recall@5 of the LSH-bucketed top-k
    against the exact brute-force top-k, per query vector — the metric
    that decides bucket/plane counts before scaling an index out."""
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8)
    exact = SIM.brute_force_topk(q, emb, k=5).select("qa", "qb")
    approx = SIM.lsh_topk(q, emb, dim=64, k=5, n_planes=6).select("qa", "qb")
    hits = (
        exact.join(approx, ["qa", "qb"], "semi")
        .groupBy("qa")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        exact.select("qa")
        .distinct()
        .join(hits, "qa", "left")
        .select(
            "qa",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / 5.0, 6).alias("recall"),
        )
    )


def q_ivf_topk(spark, sf_dir):
    """IVF ANN: deterministic coarse codebook, inverted-list probe,
    exact rerank (the scale path next to lsh_topk)."""
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8)
    return SIM.ivf_topk(q, emb, n_centroids=25, nprobe=3, k=5)


def q_kmeans_codebook(spark, sf_dir):
    """Spherical k-means IVF-codebook training (2 Lloyd iterations,
    deterministic init): one row per (cid, dim) with the trained value
    rounded to 6dp (float sum-order noise is far below that)."""
    from lakefs_spark.operators.similarity import kmeans_codebook

    emb = _embeddings(spark, sf_dir)
    cents = kmeans_codebook(emb, n_centroids=25, iters=2, dim=64)
    rows = [
        (cid, j, round(v, 6)) for cid, vec in cents for j, v in enumerate(vec)
    ]
    return spark.createDataFrame(rows, "cid long, dim long, val double")


def q_pq_codes(spark, sf_dir):
    """Product-quantization encoding: 4 subspaces x deterministic
    per-subspace codebooks; one (vec_id, m, code) row per subspace.
    Codes compress 64 float32 dims to 4 small ints — the 100 TB
    memory story for embedding search (see operators/similarity.py)."""
    return SIM.pq_codes(_embeddings(spark, sf_dir), n_centroids=25)


def q_pq_topk(spark, sf_dir):
    """PQ/ADC approximate top-k: per-query distance tables over the
    subspace codebooks, fixed-order summed lookups over the codes."""
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8)
    return SIM.pq_topk(q, emb, n_centroids=25)


def q_ivfpq_topk(spark, sf_dir):
    """IVFPQ: coarse IVF routing + PQ/ADC scoring inside the probed
    lists (no-residual variant) — the production ANN composition."""
    emb = _embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8)
    return SIM.ivfpq_topk(q, emb, n_centroids=25)


def q_minhash_candidates(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    return D.minhash_candidates(docs, num_hashes=32, bands=8)


def q_incremental_dedup_pairs(spark, sf_dir):
    """Dedup-on-commit (versioning × dedup): LSH candidates touching
    only the docs whose backing object changed between two refs — the
    new docs' bands probe the corpus band index, old×old pairs never
    generated (operators/dedup.incremental_minhash_candidates)."""
    from lakefs_spark.operators.dedup import _base_hash

    d = DF_.diff(_snap(spark, sf_dir, "snap_a"), _snap(spark, sf_dir, "snap_b"))
    touched = d.select(
        F.pmod(_base_hash(F.col("key")), F.lit(500)).alias("doc_id")
    ).distinct()
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    return D.incremental_minhash_candidates(
        docs, touched, num_hashes=32, bands=8
    )


def q_minhash_jaccard_est(spark, sf_dir):
    """Estimator calibration: MinHash-estimated vs exact n-gram Jaccard
    per LSH candidate pair (error ~ 1/sqrt(num_hashes))."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    return D.minhash_jaccard_estimate(docs, num_hashes=32, bands=8)


def q_token_overlap(spark, sf_dir):
    """Multiset token containment over the LSH candidate pairs — the
    near-subset signal Jaccard under-scores."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    cand = D.minhash_candidates(docs, num_hashes=32, bands=8)
    return D.token_overlap_pairs(docs, cand)


_CLUSTERS_CACHE: dict = {}


def _dedup_clusters_rows(spark, sf_dir):
    """Materialized (member, rep) clusters, computed once per session:
    the label-propagation loop is iterative, so both consumers
    (clusters + survivors) share one run."""
    key = (_session_tag(spark), sf_dir)
    rows = _CLUSTERS_CACHE.get(key)
    if rows is None:
        docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
        pairs = D.minhash_candidates(docs, num_hashes=32, bands=8)
        rows = [(r["member"], r["rep"]) for r in D.duplicate_clusters(pairs).collect()]
        _CLUSTERS_CACHE[key] = rows
    return rows


def q_substring_spans(spark, sf_dir):
    """Exact-substring dedup (ExactSubstr, Lee et al. 2021) — maximal
    per-doc spans of tokens covered by any 8-token window occurring
    2+ times anywhere in the corpus (operators/dedup.
    duplicated_window_spans): window shuffle + gaps-and-islands fold,
    no cartesian, no UDF."""
    return D.duplicated_window_spans(_docs(spark, sf_dir), n=8, min_count=2)


def q_substring_stats(spark, sf_dir):
    """Per-doc roll-up of the exact-substring pass: span count,
    duplicated-token count (spans are disjoint — exact, never
    double-counted), total tokens, dup ratio; zero rows for clean
    docs (operators/dedup.substring_dedup_stats)."""
    return D.substring_dedup_stats(_docs(spark, sf_dir), n=8, min_count=2)


def q_substring_cut(spark, sf_dir):
    """The ExactSubstr cleaning action: duplicated spans removed and
    docs reassembled — spans collapse to one array per doc, the cut is
    a JVM filter/exists over (token, position) structs
    (operators/dedup.cut_duplicated_spans)."""
    return D.cut_duplicated_spans(_docs(spark, sf_dir), n=8, min_count=2)


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the MinHash candidate pairs
    (operators/dedup.duplicate_clusters): (member, rep=min id) — the
    keep-one step; oracle = recursive transitive-closure min."""
    return spark.createDataFrame(
        _dedup_clusters_rows(spark, sf_dir), "member long, rep long"
    )


def q_dedup_survivors(spark, sf_dir):
    """The dedup pipeline end-to-end: MinHash candidates -> connected
    components -> keep-one-per-cluster -> surviving-corpus stats per
    language. Every stage is its own gated operator; this composes
    them the way a production pass would run."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    clusters = spark.createDataFrame(
        _dedup_clusters_rows(spark, sf_dir), "member long, rep long"
    )
    dropped = clusters.where(F.col("member") != F.col("rep")).select(
        F.col("member").alias("doc_id")
    )
    survivors = docs.join(dropped, "doc_id", "anti")
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )


def q_simhash(spark, sf_dir):
    return D.simhash(_docs(spark, sf_dir))


def q_simhash_near_dups(spark, sf_dir):
    """SimHash near-dup pairs (operators/dedup.simhash_near_dups):
    banded candidate equi-join + exact Hamming verify, over a probe
    corpus with planted near-copies (one token appended)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    mod = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    sigs = D.simhash(docs.unionByName(mod))
    return D.simhash_near_dups(sigs)


def q_near_dup_embeddings(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    pairs = SIM.cosine_pairs(emb, emb).where(F.col("qa") < F.col("qb"))
    return pairs.where(F.col("sim") >= 0.35).select("qa", "qb")


def q_embedding_dedup_survivors(spark, sf_dir):
    """Embedding-cosine near-dup DEDUP (SemDeDup-shaped keep-one): the
    near-dup pair graph -> connected components
    (operators/dedup.duplicate_clusters) -> keep the min-id member per
    component, emit the surviving vec_ids. Completes the pair-listing
    gate into an actual corpus-reduction decision."""
    emb = _embeddings(spark, sf_dir)
    pairs = (
        SIM.cosine_pairs(emb, emb)
        .where(F.col("qa") < F.col("qb"))
        .where(F.col("sim") >= 0.35)
        .select(F.col("qa").alias("id_a"), F.col("qb").alias("id_b"))
    )
    clusters = D.duplicate_clusters(pairs)
    dropped = clusters.where(F.col("member") != F.col("rep")).select(
        F.col("member").alias("vec_id")
    )
    return emb.select("vec_id").join(dropped, "vec_id", "anti")


# -- import / export / multimodal ------------------------------------------


def q_import_prefix_replace(spark, sf_dir):
    from lakefs_spark.operators.importer import prefix_replace
    from lakefs_spark.functions.prefix import prefix_predicate

    p = ORC.IMPORT_PREFIX
    dest = _snap(spark, sf_dir, "entries")
    source = _snap(spark, sf_dir, "snap_b").where(prefix_predicate(F.col("key"), p))
    return prefix_replace(dest, source, [p]).select("key", "identity", "address", "size", "etag")


def q_symlink_manifest(spark, sf_dir):
    from lakefs_spark.operators.export import symlink_manifest

    return symlink_manifest(_snap(spark, sf_dir, "entries"))


def q_hive_partitions(spark, sf_dir):
    """Glue/Hive catalog-exporter partition inventory
    (catalogexport/glue_exporter.lua + table_extractor.lua)."""
    from lakefs_spark.operators.export import hive_partitions

    return hive_partitions(_snap(spark, sf_dir, "entries"), "tables/orders/")


def q_delta_log_actions(spark, sf_dir):
    """Delta-log exporter round-trip (operators/export.delta_log_export;
    catalogexport/delta_exporter.lua analog): write the snapshot's
    transaction log (adds streamed executor-side via toLocalIterator,
    never a full collect), then read the log file back through Spark's
    JSON reader and return the add actions."""
    import tempfile

    from lakefs_spark.operators.export import delta_log_export

    path = delta_log_export(
        _snap(spark, sf_dir, "entries"), tempfile.mkdtemp(prefix="lakefs_delta_")
    )
    # explicit schema: bare read.json runs a whole-file inference JOB
    # before the real read; the query consumes only add.path/add.size,
    # so declare exactly that (non-add actions parse with add = null,
    # same rows as the inferred read)
    log = spark.read.schema("add struct<path: string, size: long>").json(path)
    return log.where(F.col("add").isNotNull()).select(
        F.col("add.path").alias("path"), F.col("add.size").cast("long").alias("size")
    )


def q_glue_partition_batches(spark, sf_dir):
    """Glue BatchCreatePartition request bodies flattened to rows
    (operators/export.glue_partition_input): partition values under
    tables/orders/, batch-chunked at the API's 100-input cap."""
    from lakefs_spark.operators.export import glue_partition_input, hive_partitions

    parts = hive_partitions(_snap(spark, sf_dir, "entries"), "tables/orders/")
    batches = glue_partition_input(parts, "db", "orders", "s3://bucket/orders")
    rows = []
    for bi, req in enumerate(batches):
        for pi, p in enumerate(req["PartitionInputList"]):
            rows.append(
                (bi, pi, p["Values"][0], p["StorageDescriptor"]["Location"])
            )
    return spark.createDataFrame(
        rows, "batch_idx long, pos long, part_value string, location string"
    )


def q_unity_table_payload(spark, sf_dir):
    """Unity external-table registration payload
    (operators/export.unity_table_input): the metadata-scale aggregates
    the exporter stamps into the request."""
    from lakefs_spark.operators.export import unity_table_input

    req = unity_table_input(
        _snap(spark, sf_dir, "entries"), "cat", "sch", "orders", "s3://bucket/orders"
    )
    return spark.createDataFrame(
        [
            (
                req["name"],
                req["table_type"],
                req["data_source_format"],
                req["storage_location"],
                int(req["properties"]["exported_objects"]),
                int(req["properties"]["exported_bytes"]),
            )
        ],
        "name string, table_type string, data_source_format string, "
        "storage_location string, n_objects long, n_bytes long",
    )


def _media(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 3 == 0)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("video/mp4").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.lit(1000) + (F.col("n_chars") % 5) * 500).cast("long").alias("duration_ms"),
    )


def q_media_frame_sample(spark, sf_dir):
    from lakefs_spark.operators.multimodal import frame_sample

    return frame_sample(_media(spark, sf_dir), every_ms=500).select(
        "media_id", F.col("ts_ms").cast("long").alias("ts_ms")
    )


def q_media_features(spark, sf_dir):
    """mapInPandas feature extraction over binary media payloads; the
    stub decoder's md5-byte features are restated relationally, so
    this checks the full Arrow batch plumbing against the oracle."""
    from lakefs_spark.operators.multimodal import extract_features

    out = extract_features(_media(spark, sf_dir))
    return out.select(
        "media_id", "kind", F.posexplode("features").alias("dim", "value")
    ).select("media_id", "kind", F.col("dim").cast("long").alias("dim"), "value")


def q_audio_chunks(spark, sf_dir):
    """Audio chunking plan (multimodal.audio_chunk_plan): hop-strided
    windows from typed metadata, clamped single chunk for short clips,
    sample cut points floor(ms*rate/1000) — all JVM arithmetic, one
    explode(sequence), no decode. Audio clips = every doc_id % 3 == 1
    (disjoint from the video fixture); durations straddle the window
    so both the multi-chunk and the clamped-short cases are hashed."""
    from lakefs_spark.operators.multimodal import audio_chunk_plan

    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 3 == 1)
    clips = docs.select(
        F.col("doc_id").alias("media_id"),
        # rate varies OFF the fixture filter modulus and is NOT a
        # multiple of 1000, so floor(ms*rate/1000) genuinely rounds
        (F.lit(8000) + (F.col("n_chars") % 5) * 4100).cast("long").alias("sample_rate"),
        (F.lit(1200) + (F.col("n_chars") % 7) * 800).cast("long").alias("duration_ms"),
    )
    return audio_chunk_plan(clips, window_ms=2000, hop_ms=1000)


def q_media_resize(spark, sf_dir):
    """Aspect-preserving resize plan (multimodal.resize): geometry is
    JVM-side metadata math; the stubbed pixel pass rides mapInPandas.
    Payload excluded from the contract (binary passthrough)."""
    from lakefs_spark.operators.multimodal import resize

    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 3 == 1)
    imgs = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("image/png").alias("mime"),
        (F.lit(200) + (F.col("doc_id") % 7) * 100).cast("int").alias("width"),
        (F.lit(150) + (F.col("doc_id") % 5) * 120).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return resize(imgs, max_w=512, max_h=384).select(
        "media_id", "out_w", "out_h", "resized"
    )


def q_gc_key_match(spark, sf_dir):
    _fixtures(spark, sf_dir)
    return staged_view(spark, "staged_active").where(F.col("key").rlike("b[13]/")).select("key")


def q_usage_report(spark, sf_dir):
    """Daily usage counters (§2.4 usage report —
    pkg/api/controller.go getUsageReportSummary): count per day per
    operation type, one map-side-combined groupBy."""
    _fixtures(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy(F.to_date("ts").cast("string").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_multipart_etags(spark, sf_dir):
    """S3-convention composite ETag flow (§2.8 multipart checksum;
    gateway CompleteMultipartUpload). Driver-gate variant: the parts'
    md5s are folded as concatenated HEX STRINGS so DuckDB can express
    the oracle (DuckDB 1.0 cannot md5 a BLOB). The true S3 semantics —
    md5 over the *binary* concat of part digests — live in
    lakefs_spark.functions.checksum.multipart_etag_col and are pinned
    byte-level against hashlib by tests/test_checksum.py."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where("l_orderkey % 50 = 0")
    parts = li.select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber"),
            F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")).alias("pmd5"),
        ).alias("part"),
    )
    return (
        parts.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("part")).alias("ps"))
        .select(
            F.col("l_orderkey").alias("okey"),
            F.concat(
                F.md5(F.concat_ws("", F.transform("ps", lambda s: s["pmd5"]))),
                F.lit("-"),
                F.size("ps").cast("string"),
            ).alias("etag"),
        )
    )


def q_point_lookup(spark, sf_dir):
    snap = _snap(spark, sf_dir, "snap_a")
    return snap.where(F.col("key") == ORC.POINT_KEY).select(
        "key", "identity", "address", "size", "etag"
    )


def q_uncommitted_addresses(spark, sf_dir):
    _fixtures(spark, sf_dir)
    staged = staged_view(spark, "staged_all")
    return (
        staged.where(~F.col("is_tombstone") & F.col("address").isNotNull())
        .select("address")
        .distinct()
    )


def q_range_join_acctbal(spark, sf_dir):
    """Range join (operators/rangejoin.py): customers whose account
    balance falls inside [supplier.acctbal, +500] within the same
    nation — bucketized equi-join, never a per-key cross product."""
    from lakefs_spark.operators.rangejoin import range_join

    _fixtures(spark, sf_dir)
    intervals = spark.table("supplier").select(
        "s_suppkey",
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("lo"),
        (F.col("s_acctbal") + 500.0).alias("hi"),
    )
    points = spark.table("customer").select(
        "c_custkey", F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("bal")
    )
    out = range_join(points, intervals, on=["nationkey"], point_col="bal",
                     lo_col="lo", hi_col="hi", bucket_width=512.0)
    return out.select("s_suppkey", "c_custkey", "nationkey")


def q_asof_click_attribution(spark, sf_dir):
    """As-of join (operators/asof.py): for each purchase, the latest
    click of the same user at-or-before the purchase. Right side
    deduped per (user, ts) so the match is deterministic; oracle uses
    DuckDB's native ASOF LEFT JOIN (an independent implementation)."""
    from lakefs_spark.operators.asof import asof_join

    _fixtures(spark, sf_dir)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.table("events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(purchases, clicks, on=["user_id"])
    # null-free contract: unmatched purchases carry -1 sentinels
    return out.select(
        "purchase_id",
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("purchase_ts_s"),
        F.coalesce(F.col("click_id"), F.lit(-1)).cast("long").alias("click_id"),
        F.coalesce(
            F.col("matched_ts").cast("timestamp").cast("long"), F.lit(-1)
        ).alias("click_ts_s"),
    )


def q_event_time_rollup(spark, sf_dir):
    """Day⊃hour continuous-aggregate rollup in one grouping-sets pass
    (streaming/ingest.event_time_rollup); oracle restates it as an
    independent union of per-grain aggregates."""
    from lakefs_spark.streaming.ingest import event_time_rollup

    _fixtures(spark, sf_dir)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = event_time_rollup(spark.table("events"))
    # null-free contract: day-grain rows carry hour='' (null ordering /
    # hashing is comparator-specific)
    return out.withColumn("hour", F.coalesce(F.col("hour"), F.lit("")))


def q_sliding_event_counts(spark, sf_dir):
    """Sliding windows (10min window / 5min hop): every event counted
    in window/slide overlapping windows."""
    from lakefs_spark.streaming.ingest import windowed_event_counts

    _fixtures(spark, sf_dir)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = windowed_event_counts(spark.table("events"), slide="5 minutes")
    return out.select(
        F.col("window_start").cast("timestamp").cast("long").alias("window_start_s"),
        F.col("window_end").cast("timestamp").cast("long").alias("window_end_s"),
        "event_type",
        "n_events",
        "total_value",
    )


def q_session_event_stats(spark, sf_dir):
    """Session windows (gap=30min) per user (streaming/ingest.py
    session_event_stats; F.session_window): oracle re-derives sessions
    with gaps-and-islands SQL. Epochs under the UTC session TZ."""
    from lakefs_spark.streaming.ingest import session_event_stats

    _fixtures(spark, sf_dir)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = session_event_stats(spark.table("events"))
    return out.select(
        "user_id",
        F.col("session_start").cast("timestamp").cast("long").alias("session_start_s"),
        F.col("session_end").cast("timestamp").cast("long").alias("session_end_s"),
        "n_events",
        "total_value",
    )


def q_windowed_event_counts(spark, sf_dir):
    from lakefs_spark.streaming.ingest import windowed_event_counts

    _fixtures(spark, sf_dir)
    # the NTZ->timestamp->long hop below is only epoch-correct under UTC;
    # re-assert it here (runtime-settable) so a recycled session or later
    # timeZone change can't silently shift the epochs
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = windowed_event_counts(spark.table("events"))
    return out.select(
        # ts may arrive as TIMESTAMP_NTZ (naive parquet micros); NTZ->long is
        # an illegal cast, so hop through timestamp (session TZ is UTC, set in
        # fixtures, so the epoch matches the DuckDB oracle's epoch(ts)).
        F.col("window_start").cast("timestamp").cast("long").alias("window_start_s"),
        F.col("window_end").cast("timestamp").cast("long").alias("window_end_s"),
        "event_type",
        "n_events",
        "total_value",
    )


# -- end-to-end storage engine (Repository on a temp root) -----------------

_E2E_REPOS: dict = {}


def _e2e_repo(spark, sf_dir):
    """Real Repository driven end-to-end from the fixtures: import ->
    chunker -> content-addressed ranges -> metarange -> commit-apply ->
    revert / cherry-pick -> manifest-pruned snapshot reads. Exercises
    the storage engine (SURVEY §2.1/§2.11) inside the driver gate; the
    oracles restate the *final snapshots* relationally."""
    key = (_session_tag(spark), sf_dir)
    repo = _E2E_REPOS.get(key)
    if repo is None:
        import tempfile

        from lakefs_spark.storage.repo import Repository

        _fixtures(spark, sf_dir)
        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_e2e_"))
        # c1: bulk import of the committed fixture set
        repo.import_entries("main", _snap(spark, sf_dir, "entries"), message="base import")
        # c2: stage the active-layer changes (upserts + tombstones), commit
        sa = staged_view(spark, "staged_active")
        repo.stage_entries("main", sa.where(~F.col("is_tombstone")))
        repo.stage_deletes("main", sa.where(F.col("is_tombstone")).select("key"))
        repo.commit("main", "apply staged_active")
        # revert c2 on a fork -> back to the c1 snapshot
        repo.create_branch("rev", "main")
        repo.revert("rev", "rev")
        # cherry-pick c2 onto a fork of c1 -> the c2 snapshot again
        repo.create_branch("cp", "main~1")
        repo.cherry_pick("cp", "main")
        # fork of c1 with the same staged changes, but ResetPrefix
        # drops everything under LIST_PREFIX before committing
        repo.create_branch("rs", "main~1")
        repo.stage_entries("rs", sa.where(~F.col("is_tombstone")))
        repo.stage_deletes("rs", sa.where(F.col("is_tombstone")).select("key"))
        repo.reset_branch("rs", prefix=ORC.LIST_PREFIX)
        repo.commit("rs", "apply staged_active outside prefix")
        # conditional writes on a fork of c1: IfAbsent + identity-CAS,
        # with the negative cases asserted in-gate (a regression turns
        # this query red)
        from lakefs_spark.storage.repo import PreconditionFailedError

        repo.create_branch("cw", "main~1")
        ent = _snap(spark, sf_dir, "entries")
        min_key = ent.agg(F.min("key")).first()[0]
        cur = repo.get("cw", min_key)
        try:
            repo.set_entry("cw", {"key": min_key, "identity": "x"}, if_absent=True)
            raise RuntimeError("IfAbsent overwrote an existing key")
        except PreconditionFailedError:
            pass
        try:
            repo.set_entry("cw", {"key": min_key, "identity": "x"}, expected_identity="wrong")
            raise RuntimeError("identity CAS accepted a stale identity")
        except PreconditionFailedError:
            pass
        repo.set_entry(
            "cw",
            {"key": min_key, "identity": "cond-upd", "size": 4242, "etag": "cond-upd-etag"},
            expected_identity=cur["identity"],
        )
        repo.set_entry(
            "cw",
            {"key": "tables/zz/cond-new", "identity": "cond-new", "size": 1, "etag": "cond-new-etag"},
            if_absent=True,
        )
        repo.commit("cw", "conditional writes")
        # compaction invariance: same staged changes, folded into a
        # compacted base — the visible snapshot must be unchanged
        repo.create_branch("cpt", "main~1")
        repo.stage_entries("cpt", sa.where(~F.col("is_tombstone")))
        repo.stage_deletes("cpt", sa.where(F.col("is_tombstone")).select("key"))
        repo.compact("cpt")
        # CopyEntry: shallow copy of min(key) to a new key on a fork of
        # c1 — same identity/address, no byte copy (catalog.go:3064-3176)
        repo.create_branch("cpy", "main~1")
        repo.copy_entry("main~1", min_key, "cpy", "tables/zz/copied")
        repo.commit("cpy", "copy entry")
        _E2E_REPOS[key] = repo
    return repo


def _e2e_restored_repo(spark, sf_dir):
    """Dump the e2e repo's refs, copy its content-addressed storage to
    a fresh root, restore — the snapshot must survive the round-trip
    (graveler.go Dump/Restore)."""
    key = (_session_tag(spark), sf_dir, "restored")
    repo2 = _E2E_REPOS.get(key)
    if repo2 is None:
        import os
        import shutil
        import tempfile

        from lakefs_spark.storage.repo import Repository

        repo = _e2e_repo(spark, sf_dir)
        dump_dir = tempfile.mkdtemp(prefix="lakefs_dump_")
        repo.dump_refs(dump_dir)
        root2 = tempfile.mkdtemp(prefix="lakefs_restored_")
        repo2 = Repository.create(spark, root2)
        for d in ("ranges", "manifests"):
            shutil.copytree(
                os.path.join(repo.root, d), os.path.join(root2, d), dirs_exist_ok=True
            )
        repo2.restore_refs(dump_dir)
        _E2E_REPOS[key] = repo2
    return repo2


def _restage_to(repo, branch, base_df, target_df, msg):
    """Stage exactly the base->target diff on ``branch`` and commit, so
    the branch's snapshot becomes ``target_df`` (any diff error here is
    caught downstream: the merged snapshot would miss its oracle)."""
    d = DF_.diff(base_df, target_df)
    ups = target_df.join(
        d.where(F.col("diff_type").isin("added", "changed")).select("key"), "key", "semi"
    )
    repo.stage_entries(branch, ups)
    dels = d.where(F.col("diff_type") == "removed").select("key")
    if dels.head(1):
        repo.stage_deletes(branch, dels)
    repo.commit(branch, msg)


_E2E_MERGE: dict = {}


def _e2e_merge_repo(spark, sf_dir):
    """Repository whose branches hold the merge_base / merge_source /
    merge_dest fixture states, then a real repo.merge(strategy=src) —
    end-to-end merge orchestration (dirty check, merge-base via the
    commit DAG, manifest-pruned 3-way diff, commit-apply)."""
    key = (_session_tag(spark), sf_dir)
    repo = _E2E_MERGE.get(key)
    if repo is None:
        import tempfile

        from lakefs_spark.storage.repo import Repository

        _fixtures(spark, sf_dir)
        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_e2e_mrg_"))
        base = _snap(spark, sf_dir, "merge_base")
        repo.import_entries("main", base, message="base")
        repo.create_branch("src", "main")
        _restage_to(repo, "src", base, _snap(spark, sf_dir, "merge_source"), "to source")
        repo.create_branch("dst", "main")
        _restage_to(repo, "dst", base, _snap(spark, sf_dir, "merge_dest"), "to dest")
        repo.create_branch("dsq", "dst")  # pre-merge dest, for the squash variant
        repo.merge("src", "dst", strategy="src")
        # squash merge: same snapshot, single-parent commit
        sq = repo.merge("src", "dsq", strategy="src", squash=True)
        if len(repo.commits.get(sq.commit_id).parents) != 1:
            raise RuntimeError("squash merge must produce a single-parent commit")
        # revert the merge commit w.r.t. its first (dest) parent
        repo.create_branch("rvm", "dst")
        repo.revert("rvm", "rvm", parent_number=1)
        _E2E_MERGE[key] = repo
    return repo


def q_repo_merge_snapshot(spark, sf_dir):
    return (
        _e2e_merge_repo(spark, sf_dir)
        .snapshot("dst")
        .select("key", "identity", "size", "etag")
    )


def q_repo_reset_prefix_snapshot(spark, sf_dir):
    return _e2e_snapshot(spark, sf_dir, "rs")


def q_repo_conditional_set_snapshot(spark, sf_dir):
    return _e2e_snapshot(spark, sf_dir, "cw")


def q_repo_compact_snapshot(spark, sf_dir):
    return _e2e_snapshot(spark, sf_dir, "cpt")


def q_stream_ingest_snapshot(spark, sf_dir):
    """Structured-Streaming ingest end-to-end (streaming/ingest.py):
    readStream over the events table -> foreachBatch stage+commit (one
    atomic commit per microbatch, epoch-guarded exactly-once) -> final
    committed snapshot. The oracle restates the event->entry mapping
    relationally; commit mechanics cancel out by construction."""
    key = (_session_tag(spark), sf_dir, "stream")
    repo = _E2E_REPOS.get(key)
    if repo is None:
        import tempfile

        from lakefs_spark.storage.repo import Repository
        from lakefs_spark.streaming.ingest import (
            entries_from_events,
            foreach_batch_committer,
        )

        _fixtures(spark, sf_dir)
        events = spark.table("events").where(F.col("event_id") % 10 == 0)
        src = tempfile.mkdtemp(prefix="lakefs_stream_src_")
        ckpt = tempfile.mkdtemp(prefix="lakefs_stream_ckpt_")
        events.coalesce(3).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_stream_"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_committer(repo, "main", entries_from_events, query_name="ingest")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        _E2E_REPOS[key] = repo
    return repo.snapshot("main").select("key", "identity", "size", "etag")


_SRC_DIRS: dict = {}


def _src_dir(spark, sf_dir, fmt):
    """Materialize the documents table once per (session, sf, format)
    for source-format round-trip gates; written single-file so DuckDB
    reads the identical bytes."""
    key = (_session_tag(spark), sf_dir, fmt)
    d = _SRC_DIRS.get(key)
    if d is None:
        import tempfile

        d = tempfile.mkdtemp(prefix=f"lakefs_src_{fmt}_")
        docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
        w = docs.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(d)
        elif fmt == "json":
            w.json(d)
        elif fmt == "orc":
            w.orc(d)
        _SRC_DIRS[key] = d
    return d


def q_csv_source(spark, sf_dir):
    """CSV source round-trip: the engine reads back a CSV export of
    the documents table with an explicit schema; the oracle reads the
    same files via read_csv. Spark-side: header + schema, no
    inference job at scale."""
    d = _src_dir(spark, sf_dir, "csv")
    return (
        spark.read.schema("doc_id long, lang string, text string")
        .option("header", True)
        .csv(d)
    )


def q_json_source(spark, sf_dir):
    """JSON-lines source round-trip (schema supplied, no inference)."""
    d = _src_dir(spark, sf_dir, "json")
    return spark.read.schema("doc_id long, lang string, text string").json(d)


def q_orc_source(spark, sf_dir):
    """ORC source round-trip: native columnar alternative to Parquet
    (spark-sql ships the ORC reader). DuckDB cannot read ORC, so the
    oracle is the source-of-truth projection from the parquet table —
    the gate checks lossless write+read fidelity."""
    d = _src_dir(spark, sf_dir, "orc")
    return spark.read.orc(d).select("doc_id", "lang", "text")


def q_binary_file_source(spark, sf_dir):
    """binaryFile source: ingest opaque objects (the media/object
    ingestion path) — one row per file with length and payload md5;
    the oracle reads the same bytes via read_blob."""
    import os as _os

    key = (_session_tag(spark), sf_dir, "bin")
    d = _SRC_DIRS.get(key)
    if d is None:
        import tempfile

        d = tempfile.mkdtemp(prefix="lakefs_src_bin_")
        for r in (
            _docs(spark, sf_dir).where(F.col("doc_id") < 20).select("doc_id", "text").collect()
        ):
            with open(_os.path.join(d, f"doc_{r['doc_id']:05d}.bin"), "wb") as f:
                f.write(r["text"].encode())
        _SRC_DIRS[key] = d
    bf = spark.read.format("binaryFile").load(d)
    return bf.select(
        F.element_at(F.split("path", "/"), -1).alias("name"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5("content").alias("payload_md5"),
    )


_SENSOR_ALERTS: dict = {}


def q_tombstone_alert_stream(spark, sf_dir):
    """Stateful streaming delete sensor end-to-end (streaming/sensors.
    tombstone_alerts; pkg/graveler/delete_sensor.go:48-125): a
    deterministic change stream replayed in microbatches through
    applyInPandasWithState; per-branch crossings summed over the alert
    stream equal floor(total_tombstones / threshold) — invariant to how
    the stream was batched, which is exactly what the oracle restates."""
    key = (_session_tag(spark), sf_dir)
    rows = _SENSOR_ALERTS.get(key)
    if rows is None:
        import tempfile

        from lakefs_spark.streaming.sensors import tombstone_alerts

        _fixtures(spark, sf_dir)
        changes = (
            spark.table("events")
            .where(F.col("event_id") % 5 == 0)
            .select(
                F.concat(F.lit("b"), (F.col("user_id") % 3).cast("string")).alias("branch"),
                (F.col("event_id") % 4 == 0).alias("is_tombstone"),
            )
        )
        src = tempfile.mkdtemp(prefix="lakefs_sensor_src_")
        changes.coalesce(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        name = f"sensor_alerts_{abs(hash(key)) % (1 << 30)}"
        q = (
            tombstone_alerts(stream, threshold=40)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="lakefs_sensor_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        rows = [
            (r["branch"], r["n_crossings"], r["threshold"])
            for r in spark.table(name)
            .groupBy("branch", "threshold")
            .agg(F.sum("crossings").alias("n_crossings"))
            .select("branch", "n_crossings", "threshold")
            .collect()
        ]
        _SENSOR_ALERTS[key] = rows
    return spark.createDataFrame(rows, "branch string, n_crossings long, threshold long")


_STREAM_SESSIONS: dict = {}


def q_stream_session_stats(spark, sf_dir):
    """Stateful streaming sessionization (streaming/sessions.py):
    events replayed across microbatches in RANDOMIZED order (md5-
    shuffled files, no watermark); per-user mergeable-interval state
    makes the final session set exactly the batch gaps-and-islands
    result for any batching and any arrival disorder — the oracle IS
    the batch session SQL."""
    key = (_session_tag(spark), sf_dir)
    rows = _STREAM_SESSIONS.get(key)
    if rows is None:
        import tempfile

        from lakefs_spark.streaming.sessions import (
            latest_sessions,
            session_stats_stream,
        )

        _fixtures(spark, sf_dir)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        feed = spark.table("events").select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "value",
        )
        src = tempfile.mkdtemp(prefix="lakefs_sess_src_")
        # event-time disorder across batches: rows land in files by an
        # md5 shuffle, one file per microbatch
        feed.orderBy(F.md5(F.concat_ws("|", "user_id", "ts_us"))).coalesce(
            4
        ).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        name = f"sess_stream_{abs(hash(key)) % (1 << 30)}"
        q = (
            session_stats_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="lakefs_sess_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        rows = [
            (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"], r["total_value"])
            for r in latest_sessions(spark.table(name)).collect()
        ]
        _STREAM_SESSIONS[key] = rows
    return spark.createDataFrame(
        rows,
        "user_id long, session_start_s long, session_end_s long, "
        "n_events long, total_value double",
    )


_STREAM_DEDUP: dict = {}


def q_stream_dedup_hashes(spark, sf_dir):
    """Streaming exact-dedup on ingest (streaming/sensors.
    first_seen_hashes): documents replayed twice across microbatches
    (every doc appears in 2 files); per-hash state swallows every
    occurrence after the first, so the emitted set is exactly the
    distinct content hashes, invariant to batch order."""
    key = (_session_tag(spark), sf_dir)
    rows = _STREAM_DEDUP.get(key)
    if rows is None:
        import tempfile

        from lakefs_spark.streaming.sensors import first_seen_hashes

        feed = _docs(spark, sf_dir).select(F.md5("text").alias("fp"))
        src = tempfile.mkdtemp(prefix="lakefs_sdedup_src_")
        # two copies of the corpus across 4 files: duplicates both
        # inside one batch and across batches
        feed.coalesce(2).write.mode("overwrite").parquet(src)
        feed.coalesce(2).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        name = f"sdedup_{abs(hash(key)) % (1 << 30)}"
        q = (
            first_seen_hashes(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="lakefs_sdedup_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        rows = [(r["fp"],) for r in spark.table(name).collect()]
        _STREAM_DEDUP[key] = rows
    return spark.createDataFrame(rows, "fp string")


def q_packing_efficiency(spark, sf_dir):
    """Packing quality per shard: sequences opened and fill efficiency
    sum(tokens) / (n_seqs * budget) — the metric that tunes shard
    count and budget before a full-corpus pack."""
    from lakefs_spark.operators import pipeline as P

    packed = P.pack_sequences(_docs(spark, sf_dir), budget=512, n_shards=8)
    return packed.groupBy("shard").agg(
        (F.max("seq_id") + 1).cast("long").alias("n_seqs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.sum("n_tokens") / ((F.max("seq_id") + 1) * 512.0), 6).alias("fill_efficiency"),
    )


def q_repo_uncommitted_compacted(spark, sf_dir):
    """Combined diff on a compacted branch (§2.3;
    pkg/graveler/joined_diff_iterator.go + combined_diff_iterator.go):
    uncommitted state = overlay(staging, compacted) diffed against the
    committed head, range-pruned on both manifest-id inequality and
    staged-key interval probes."""
    repo = _e2e_repo(spark, sf_dir)
    return repo.uncommitted("cpt").select("key", "diff_type", "identity")


def q_repo_copy_entry_snapshot(spark, sf_dir):
    """CopyEntry (§2.11; pkg/catalog/catalog.go:3064-3176): shallow
    copy staged + committed — the snapshot gains one key aliasing the
    source row's identity/address."""
    return _e2e_snapshot(spark, sf_dir, "cpy")


def q_commit_ordered(spark, sf_dir):
    """Ordered commit iterator (§2.9;
    pkg/graveler/ref/commit_ordered_iterator.go): all commits in id
    order — the GC commit-map scan."""
    store, _, _ = _dag_store()
    rows = [
        (i + 1, c) for i, c in enumerate(store.all_ids())
    ]
    return spark.createDataFrame(rows, "pos long, commit_id string")


def q_repo_restore_snapshot(spark, sf_dir):
    return (
        _e2e_restored_repo(spark, sf_dir)
        .snapshot("main")
        .select("key", "identity", "size", "etag")
    )


def q_repo_annotate(spark, sf_dir):
    """Per-object blame over the e2e repo's history (lakectl annotate;
    storage/repo.annotate): every key upserted WITH a new identity by
    c2 attributes to 'apply staged_active', everything else visible on
    main attributes to the 'base import' root — one manifest-pruned
    diff per log step, attribution by semi/anti joins (no key stream
    on the driver)."""
    repo = _e2e_repo(spark, sf_dir)
    return repo.annotate("main").select("key", "message")


def q_repo_log_paths(spark, sf_dir):
    """Path-filtered log, manifest-range-pruned (§2.9;
    pkg/catalog/catalog.go:1772-1800): a row per (probe path, log
    position). Probes: an upserted key, an untouched key, a deleted
    key — chosen deterministically from the fixtures."""
    repo = _e2e_repo(spark, sf_dir)
    sa = staged_view(spark, "staged_active")
    ent = _snap(spark, sf_dir, "entries")
    changed = sa.where(~F.col("is_tombstone")).join(
        ent, on=["key", "identity"], how="left_anti"
    )
    # the three one-row probe derivations ride ONE job (crossJoin of
    # one-row aggregates — same values, a third of the job round-trips)
    probe_row = (
        changed.agg(F.min("key").alias("p_upsert"))
        .crossJoin(
            ent.join(sa.select("key"), "key", "left_anti")
            .agg(F.min("key").alias("p_untouched"))
        )
        .crossJoin(
            sa.where(F.col("is_tombstone"))
            .join(ent.select("key"), "key", "semi")
            .agg(F.min("key").alias("p_deleted"))
        )
        .first()
    )
    p_upsert, p_untouched, p_deleted = (
        probe_row["p_upsert"], probe_row["p_untouched"], probe_row["p_deleted"]
    )
    rows = []
    for p in (p_upsert, p_untouched, p_deleted):
        for i, c in enumerate(repo.log_with_paths("main", [p])):
            rows.append((p, i + 1, c.message))
    return spark.createDataFrame(rows, "path string, pos long, message string")


def _e2e_snapshot(spark, sf_dir, ref):
    return _e2e_repo(spark, sf_dir).snapshot(ref).select("key", "identity", "size", "etag")


def q_repo_commit_snapshot(spark, sf_dir):
    return _e2e_snapshot(spark, sf_dir, "main")


def q_repo_revert_snapshot(spark, sf_dir):
    return _e2e_snapshot(spark, sf_dir, "rev")


def q_repo_cherry_pick_snapshot(spark, sf_dir):
    return _e2e_snapshot(spark, sf_dir, "cp")


# -- governance: branch/tag CRUD, protection, hooks, pull requests --------

_GOV_REPOS: dict = {}


def _gov_repo(spark, sf_dir):
    """Governance surface driven end-to-end on a real Repository:
    branch/tag CRUD, branch protection (commits blocked, merges
    allowed — pkg/graveler/branch/protection_manager.go), the hook
    run log including an aborted pre-commit
    (pkg/actions/kv_run_results_iterator.go), and the pull-request
    lifecycle create -> merge/close (pkg/graveler/graveler.go:360-392,
    pkg/catalog/catalog.go:3362-3420). The negative paths (hook abort,
    protected-branch rejection) are asserted in-gate so a regression
    turns these queries red."""
    key = (_session_tag(spark), sf_dir)
    st = _GOV_REPOS.get(key)
    if st is None:
        import tempfile

        from lakefs_spark.storage.repo import (
            HookAbortError,
            ProtectedBranchError,
            Repository,
        )

        _fixtures(spark, sf_dir)
        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_gov_"))
        ent = _snap(spark, sf_dir, "entries")
        repo.import_entries("main", ent, message="base import")

        # hidden import work branch (graveler.go:227-267 WithHidden):
        # committed-to but absent from every listing — the oracle's
        # expected branch set omitting it is the exclusion proof.
        # Scripted before hook registration so its commit adds no rows
        # to the run-log gates.
        repo.create_branch("_import-work", "main", hidden=True)
        repo.set_entry(
            "_import-work",
            {"key": "tables/zz/hidden-wip", "identity": "hw", "size": 1, "etag": "hw-etag"},
        )
        repo.commit("_import-work", "staged on hidden branch")

        # hooks registered after the import: the run log captures
        # exactly the scripted events below
        def policy_guard(repo_, event, ctx):
            if "forbidden" in (ctx.get("message") or ""):
                raise HookAbortError("message vetoed by policy hook")

        repo.on("pre-commit", policy_guard)
        repo.on("post-commit", lambda repo_, event, ctx: None)
        repo.on("post-delete-branch", lambda repo_, event, ctx: None)

        for b in ("feature", "dev", "wip", "tmp", "stg"):
            repo.create_branch(b, "main")
        repo.create_tag("v1", "main")

        def salted(df, s):
            return df.withColumn(
                "identity", F.md5(F.concat(F.col("identity").cast("string"), F.lit(s)))
            )

        repo.stage_entries(
            "feature", salted(ent.where(F.col("key").startswith(ORC.LIST_PREFIX)), "F")
        )
        repo.commit("feature", "feature work")
        repo.stage_entries(
            "dev", salted(ent.where(F.col("key").startswith("tables/orders/b5/")), "D")
        )
        repo.set_entry(
            "dev",
            {"key": "tables/zz/dev-note", "identity": "dev-note", "size": 1, "etag": "dev-note-etag"},
        )
        repo.commit("dev", "dev work")
        # the policy hook vetoes this message -> aborted run, no commit
        repo.stage_entries("dev", salted(ent.orderBy("key").limit(1), "X"))
        try:
            repo.commit("dev", "forbidden tweak")
            raise RuntimeError("policy hook failed to abort the commit")
        except HookAbortError:
            pass
        repo.reset_branch("dev")
        # protection: direct commits to main are blocked, merges stay
        # allowed (the PR merge below proves the allowed path)
        repo.protect_branch("main")
        try:
            repo.commit("main", "direct to protected", allow_empty=True)
            raise RuntimeError("protected branch accepted a direct commit")
        except ProtectedBranchError:
            pass
        # read-only repositories: every write refuses without force,
        # forced writes land (graveler.go:1309-1347) — asserted in-gate
        # so a veto regression turns the governance gate red
        from lakefs_spark.storage.repo import ReadOnlyRepositoryError

        ro = Repository.create(
            spark, tempfile.mkdtemp(prefix="lakefs_ro_"), read_only=True
        )
        try:
            ro.set_entry("main", {"key": "a", "identity": "i", "size": 1, "etag": "e"})
            raise RuntimeError("read-only repo accepted a write")
        except ReadOnlyRepositoryError:
            pass
        ro.set_entry("main", {"key": "a", "identity": "i", "size": 1, "etag": "e"},
                     force=True)
        ro.commit("main", "forced", force=True)
        if ro.get("main", "a") is None:
            raise RuntimeError("forced write did not land on read-only repo")

        pr1 = repo.pulls.create("feature", "main", title="feature work")
        pr2 = repo.pulls.create("dev", "main", title="dev work")
        pr3 = repo.pulls.create("wip", "main", title="empty")
        repo.pulls.merge(pr1)
        repo.pulls.close(pr3)
        repo.delete_branch("tmp")
        # leave LIVE staging on the dedicated 'stg' branch (NOT 'wip',
        # whose PR diff would see it — bare-branch refs include
        # staging): one staged-only key + a tombstone on the smallest
        # committed key — the overlay point-lookup fixtures
        # (staged wins / tombstone hides / fallthrough)
        min_key = ent.agg(F.min("key")).first()[0]
        repo.set_entry(
            "stg",
            {"key": "tables/zz/staged-only", "identity": "st-1", "size": 9, "etag": "st-e"},
        )
        repo.stage_deletes("stg", spark.createDataFrame([(min_key,)], "key string"))
        st = (repo, [pr1, pr2, pr3])
        _GOV_REPOS[key] = st
    return st


def q_pull_requests(spark, sf_dir):
    """PR lifecycle snapshot: status after merge/close plus the live
    conflict-aware PR diff size (a merged PR's diff collapses to 0
    because its source head becomes the merge base)."""
    repo, prs = _gov_repo(spark, sf_dir)
    # all PR diff sizes ride ONE tagged-union count job instead of one
    # Spark job per PR (guide §1.2 — at small sizes the sequential job
    # count IS the cost; same values, the per-PR counts are just
    # grouped by tag). A merged PR's diff is empty, so absent tags
    # count as 0.
    tagged = None
    for pos, pid in enumerate(prs, 1):
        part = repo.pulls.diff(pid).select(F.lit(pos).alias("pos"))
        tagged = part if tagged is None else tagged.unionByName(part)
    n_diff = {
        r["pos"]: r["n"]
        for r in tagged.groupBy("pos").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = []
    for pos, pid in enumerate(prs, 1):
        rec = repo.pulls.get(pid)
        rows.append(
            (pos, rec["status"], rec["source"], rec["destination"], int(n_diff.get(pos, 0)))
        )
    return spark.createDataFrame(
        rows, "pos long, status string, source string, destination string, n_diff long"
    )


def q_branch_listing(spark, sf_dir):
    """Branch/tag listing after the scripted CRUD: snapshot entry
    counts per ref and the effective protection flag (deleted 'tmp'
    must be absent; the tag pins the pre-merge snapshot)."""
    import fnmatch

    repo, _ = _gov_repo(spark, sf_dir)
    pats = [r["pattern"] for r in repo.protection_rules()]
    rows = []
    for name in sorted(repo.branches()):
        # count_entries: manifest-count sum on committed views (zero
        # Spark jobs; identical value — ranges partition the keyspace)
        rows.append(
            (name, "branch", repo.count_entries(name), any(fnmatch.fnmatch(name, p) for p in pats))
        )
    for name in sorted(repo.tags()):
        rows.append((name, "tag", repo.count_entries(name), False))
    return spark.createDataFrame(
        rows, "name string, kind string, n_entries long, is_protected boolean"
    )


def q_point_lookup_branch(spark, sf_dir):
    """Branch point lookup through the staging overlay
    (storage/repo.get: staged wins, tombstone hides, committed falls
    through; `@` pins the committed head past live staging)."""
    repo, _ = _gov_repo(spark, sf_dir)
    ent = _snap(spark, sf_dir, "entries")
    k1 = ent.agg(F.min("key")).first()[0]
    k2 = ent.where(F.col("key") > k1).agg(F.min("key")).first()[0]
    hit = repo.get("stg", "tables/zz/staged-only")
    gone = repo.get("stg", k1)
    thru = repo.get("stg", k2)
    committed = repo.get("stg@", k1)
    rows = [
        (1, "staged_only", "tables/zz/staged-only", hit["identity"], hit["size"]),
        (2, "tombstoned", k1, None if gone is None else gone["identity"], None),
        (3, "fallthrough", k2, thru["identity"], thru["size"]),
        (4, "committed_at", k1, committed["identity"], committed["size"]),
    ]
    return spark.createDataFrame(
        rows, "pos long, kind string, key string, identity string, size long"
    )


def q_list_page_probe(spark, sf_dir):
    """Pagination with the amount+1 has-more probe
    (storage/repo.list_page; pkg/catalog/catalog.go:1270-1325): walk
    the committed prefix page by page; every page except the last must
    report has_more and fill the page."""
    repo, _ = _gov_repo(spark, sf_dir)
    amount, after, page, rows = 997, "", 0, []
    while True:
        items, more = repo.list_page("main", prefix=ORC.LIST_PREFIX, after=after, amount=amount)
        if more and len(items) != amount:
            raise RuntimeError("non-final page underfilled")
        for r in items:
            rows.append((r["key"], page))
        if not more:
            break
        after = items[-1]["key"]
        page += 1
    return spark.createDataFrame(rows, "key string, page long")


def q_path_time_prune(spark, sf_dir):
    """Time-partitioned physical addresses (functions/pathtime.py, the
    pkg/upload/path_provider.go analog): mint 40 addresses at scripted
    half-hour steps + 2 legacy addresses, resolve each path's rotation
    hour back (in-gate roundtrip assert), and evaluate the GC
    in-flight-upload guard — "newer than cutoff" as ONE string range
    predicate over the address column."""
    import hashlib

    from lakefs_spark.functions import pathtime as PT

    base = 1_700_000_000
    rows = []
    for i in range(40):
        ts = base + i * 1800
        addr = PT.new_physical_path(hashlib.md5(str(i).encode()).hexdigest(), ts)
        resolved = PT.resolve_path_time(addr)
        if resolved != float(int(ts) // 3600 * 3600):  # mint/resolve roundtrip
            raise RuntimeError(f"path time roundtrip broke: {addr} -> {resolved}")
        rows.append((i, addr, int(resolved)))
    rows.append((100, "data/ab/legacy0", None))
    rows.append((101, "other/x", None))
    df = spark.createDataFrame(rows, "pos long, address string, resolved_ts long")
    cutoff = base + 20 * 1800
    return df.select(
        "pos", "address",
        PT.path_newer_than(F.col("address"), cutoff).alias("is_new"),
        "resolved_ts",
    )


def q_hook_runs(spark, sf_dir):
    """Hook run-results log, newest first: completed pre/post-commit
    pairs, the aborted pre-commit (policy veto), and the
    post-delete-branch run."""
    repo, _ = _gov_repo(spark, sf_dir)
    rows = [
        (i + 1, r["event"], r["hook_index"], r["status"], r["error"] is not None)
        for i, r in enumerate(repo.hook_runs())
    ]
    return spark.createDataFrame(
        rows, "pos long, event string, hook_index long, status string, has_error boolean"
    )


_TTL_RESULT: dict = {}


def q_run_ttl_expiry(spark, sf_dir):
    """TTL cleanup of the hook run-results log (storage/repo.
    expire_runs; pkg/catalog/catalog.go:3177-3208 expired-task delete):
    two hook-run groups separated by a 50 ms gap; expiring with a
    cutoff between them must drop exactly the first group and keep the
    second, atomically."""
    key = _session_tag(spark)
    row = _TTL_RESULT.get(key)
    if row is None:
        import tempfile
        import time as _time

        from lakefs_spark.storage.repo import Repository

        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_ttl_"))
        repo.on("pre-commit", lambda repo_, event, ctx: None)
        repo.on("post-commit", lambda repo_, event, ctx: None)
        repo.set_entry("main", {"key": "t/1", "identity": "i1", "size": 1, "etag": "e1"})
        repo.commit("main", "old group")
        _time.sleep(0.05)
        repo.set_entry("main", {"key": "t/2", "identity": "i2", "size": 2, "etag": "e2"})
        repo.commit("main", "new group")
        runs = repo.hook_runs()
        n_before = len(runs)
        times = sorted(r["start_time"] for r in runs)
        newest = times[-1]
        # cutoff strictly between the first commit's runs and the
        # second's (guaranteed separated by the sleep above)
        midpoint = (times[1] + times[2]) / 2
        dropped = repo.expire_runs(newest + 0.001 - midpoint, now=newest + 0.001)
        survivors = repo.hook_runs()
        row = (
            n_before,
            dropped,
            len(survivors),
            sorted(r["event"] for r in survivors) == ["post-commit", "pre-commit"],
        )
        _TTL_RESULT[key] = row
    return spark.createDataFrame(
        [row], "n_before long, n_dropped long, n_after long, newest_group_kept boolean"
    )


_EXPECT_LOG: dict = {}


def q_expectation_gate(spark, sf_dir):
    """Data-quality expectation hooks (storage/expectations.py): all
    rules evaluated in ONE aggregation pass over the branch's
    post-commit view at pre-commit; a failing rule vetoes the commit
    (asserted in-gate: the head does not move). The audit trail of
    observed values is the query output — fixture-derived, so the
    oracle recomputes it relationally."""
    key = (_session_tag(spark), sf_dir)
    rows = _EXPECT_LOG.get(key)
    if rows is None:
        import tempfile

        from lakefs_spark.storage.expectations import Expectation, expectations_hook
        from lakefs_spark.storage.repo import HookAbortError, Repository

        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_exp_"))
        sink: list = []
        rules = [
            Expectation("no_negative_size", F.min("size"), lambda v: v is not None and v >= 0),
            Expectation(
                "no_duplicate_keys",
                F.count(F.lit(1)) - F.count_distinct(F.col("key")),
                lambda v: v == 0,
            ),
            Expectation("bounded_object_count", F.count(F.lit(1)), lambda v: v <= 10_000_000),
        ]
        repo.on("pre-commit", expectations_hook(rules, results_sink=sink))
        subset = _snap(spark, sf_dir, "entries").where(
            F.col("key").startswith(ORC.LIST_PREFIX)
        )
        repo.stage_entries("main", subset)
        c1 = repo.commit("main", "clean subset")
        # a poisoned row (negative size) must be vetoed pre-commit
        repo.set_entry(
            "main", {"key": "tables/zz/bad", "identity": "bad", "size": -1, "etag": "x"}
        )
        try:
            repo.commit("main", "poisoned")
            raise RuntimeError("expectation hook failed to veto the commit")
        except HookAbortError:
            pass
        if repo.resolve("main").commit_id != c1.commit_id:
            raise RuntimeError("vetoed commit moved the branch head")
        rows = [
            (i + 1, r["event"], r["name"], int(r["observed"]), r["passed"])
            for i, r in enumerate(sink)
        ]
        _EXPECT_LOG[key] = rows
    return spark.createDataFrame(
        rows, "pos long, event string, rule string, observed long, passed boolean"
    )


_WEBHOOK_LOG: dict = {}


def q_webhook_deliveries(spark, sf_dir):
    """Webhook hook runner driven end-to-end over real loopback HTTP
    (storage/webhook.py; pkg/actions/webhook.go:85-133): a local server
    records each POSTed EventInfo payload; a 200 endpoint lets the
    commit proceed, a 500 endpoint vetoes it (abort-on-non-2xx).
    Asserted in-gate: the vetoed commit leaves the head unmoved."""
    key = _session_tag(spark)
    rows = _WEBHOOK_LOG.get(key)
    if rows is None:
        import http.server
        import json as _json
        import tempfile
        import threading

        from lakefs_spark.storage.repo import HookAbortError, Repository
        from lakefs_spark.storage.webhook import webhook_hook

        deliveries: list[tuple] = []

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
                status = 500 if self.path.startswith("/deny") else 200
                deliveries.append(
                    (self.path, body["event_type"], body["branch_id"], status)
                )
                self.send_response(status)
                self.end_headers()

            def log_message(self, *a):  # keep the gate's stdout clean
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{srv.server_address[1]}"
            repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_wh_"))
            repo.on("pre-commit", webhook_hook(f"{base}/ok", hook_id="ci-gate"))
            repo.set_entry("main", {"key": "a/1", "identity": "i1", "size": 1, "etag": "e1"})
            c1 = repo.commit("main", "first")
            # a second webhook vetoes: both hooks POST, the op aborts
            repo.on("pre-commit", webhook_hook(f"{base}/deny", hook_id="veto"))
            repo.set_entry("main", {"key": "a/2", "identity": "i2", "size": 2, "etag": "e2"})
            try:
                repo.commit("main", "second")
                raise RuntimeError("500 webhook failed to veto the commit")
            except HookAbortError:
                pass
            if repo.resolve("main").commit_id != c1.commit_id:
                raise RuntimeError("vetoed commit moved the branch head")
        finally:
            srv.shutdown()
            srv.server_close()
        rows = [(i + 1, *d) for i, d in enumerate(deliveries)]
        _WEBHOOK_LOG[key] = rows
    return spark.createDataFrame(
        rows, "pos long, path string, event string, branch string, http_status long"
    )


_ACTION_TASKS: dict = {}


def q_action_task_results(spark, sf_dir):
    """Declarative actions end-to-end (storage/actions.py;
    pkg/actions/action.go Validate/Match + service.go:300-430 run loop +
    airflow.go DAG-run POST + lua.go script surface): YAML specs with
    branch globs, a script hook writing output, an airflow hook
    delivering a DAG run, an ``if: failure()`` cleanup hook, a
    feature-branch guard that vetoes, and a post-commit failure that is
    recorded but does not abort. The per-hook task-result log is the
    query output. Asserted in-gate: airflow URL/dag_run_id shape, the
    vetoed head does not move, the post-failure head does."""
    key = _session_tag(spark)
    rows = _ACTION_TASKS.get(key)
    if rows is None:
        import tempfile

        from lakefs_spark.storage.actions import ActionsService
        from lakefs_spark.storage.repo import HookAbortError, Repository

        dag_posts: list[tuple] = []

        def transport(url, data, headers, timeout):
            import json as _json

            dag_posts.append((url, _json.loads(data)))
            return 200

        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_act_"))
        svc = ActionsService(
            repo, env_getter={"MIN_SIZE": "1"}.get, transport=transport
        )
        svc.add_action(
            """
name: size gate
on:
  pre-commit:
    branches: ["main"]
hooks:
  - id: check_size
    type: script
    properties:
      script: "output('min_size=' + args['min_size'])"
      args: {min_size: "{{ ENV.MIN_SIZE }}"}
  - id: notify
    type: airflow
    properties:
      url: "http://airflow.local"
      dag_id: "corpus_refresh"
      username: "svc"
      password: "pw"
      dag_conf: {team: data}
  - id: cleanup
    type: script
    if: "failure()"
    properties:
      script: "output('cleanup ran')"
"""
        )
        svc.add_action(
            """
name: feature guard
on:
  pre-commit:
    branches: ["feature-*"]
hooks:
  - id: deny
    type: script
    properties:
      script: "fail('no direct commits to ' + action['branch_id'])"
"""
        )
        svc.add_action(
            """
name: audit
on:
  post-commit: null
hooks:
  - id: boom
    type: script
    properties:
      script: "fail('audit sink down')"
"""
        )
        repo.set_entry("main", {"key": "a/1", "identity": "i1", "size": 1, "etag": "e1"})
        c1 = repo.commit("main", "ok commit")
        if repo.resolve("main").commit_id != c1.commit_id:
            raise RuntimeError("post-commit hook failure moved/blocked the head")
        url, body = dag_posts[0]
        if url != "http://airflow.local/api/v1/dags/corpus_refresh/dagRuns":
            raise RuntimeError(f"airflow DAG-run URL wrong: {url}")
        if not body["dag_run_id"].startswith("lakeFS_hook_notify_"):
            raise RuntimeError("dag_run_id missing the lakeFS_hook prefix")
        if body["conf"]["team"] != "data" or "lakeFS_event" not in body["conf"]:
            raise RuntimeError("dag conf merge wrong")
        repo.create_branch("feature-x", "main")
        repo.set_entry(
            "feature-x", {"key": "a/2", "identity": "i2", "size": 2, "etag": "e2"}
        )
        try:
            repo.commit("feature-x", "blocked")
            raise RuntimeError("feature guard failed to veto")
        except HookAbortError:
            pass
        if repo.resolve("feature-x").commit_id != c1.commit_id:
            raise RuntimeError("vetoed commit moved the feature head")
        tasks = list(reversed(svc.task_results()))  # oldest first
        rows = [
            (i + 1, t["action"], t["hook_id"], t["hook_type"], t["event"], t["status"])
            for i, t in enumerate(tasks)
        ]
        _ACTION_TASKS[key] = rows
    return spark.createDataFrame(
        rows,
        "pos long, action string, hook_id string, hook_type string, "
        "event string, status string",
    )


_LUA_TASKS: dict = {}


def q_lua_hook_runs(spark, sf_dir):
    """Embedded Lua hooks end-to-end (lakefs_spark/lua; the
    pkg/actions/lua.go analog): a ``type: lua`` metadata gate runs the
    interpreter proper — pairs() over args, string patterns, arithmetic,
    string.format, the injected action record — printing a computed
    line to the hook output; a bad-metadata commit is vetoed by
    error(); a post-commit script requiring out-of-scope stdlib
    (``io``) records the explicit ``unsupported`` row. Output rows =
    the task log (oldest first) joined with each hook's first output
    line, so the hash proves the interpreter COMPUTED (not just ran)."""
    key = _session_tag(spark)
    rows = _LUA_TASKS.get(key)
    if rows is None:
        import tempfile

        from lakefs_spark.storage.actions import ActionsService, read_hook_output
        from lakefs_spark.storage.repo import HookAbortError, Repository

        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_lua_"))
        svc = ActionsService(repo)
        svc.add_action(
            """
name: lua meta gate
on:
  pre-commit:
    branches: ["main"]
hooks:
  - id: lua_gate
    type: lua
    properties:
      script: |
        local checked = 0
        for k, props in pairs(args.fields) do
          local v = action.commit.metadata[k]
          if v == nil then
            error("missing mandatory metadata field: " .. k)
          end
          if props.pattern and not string.match(v, props.pattern) then
            error("field " .. k .. " does not match " .. props.pattern)
          end
          checked = checked + 1
        end
        print(string.format("%s|checked=%d|msg=%s", action.branch_id,
                            checked, string.upper(action.commit.message)))
      args:
        fields:
          source: {pattern: "^corpus%-v%d+$"}
          shard: {}
"""
        )
        svc.add_action(
            """
name: lua legacy audit
on:
  post-commit: null
hooks:
  - id: lua_io
    type: lua
    properties:
      script: |
        local io = require("io")
        io.write("never reached")
"""
        )
        repo.set_entry("main", {"key": "a/1", "identity": "i1", "size": 1, "etag": "e1"})
        c1 = repo.commit(
            "main", "ingest", metadata={"source": "corpus-v3", "shard": "7"}
        )
        if repo.resolve("main").commit_id != c1.commit_id:
            raise RuntimeError("lua post-commit unsupported row moved the head")
        repo.set_entry("main", {"key": "a/2", "identity": "i2", "size": 1, "etag": "e2"})
        try:
            repo.commit("main", "bad", metadata={"source": "not-a-corpus", "shard": "1"})
            raise RuntimeError("lua gate failed to veto the bad metadata")
        except HookAbortError:
            pass
        if repo.resolve("main").commit_id != c1.commit_id:
            raise RuntimeError("vetoed lua commit moved the head")
        tasks = list(reversed(svc.task_results()))  # oldest first
        rows = []
        for i, t in enumerate(tasks):
            out = read_hook_output(repo, t["run_id"], t["hook_run_id"])
            rows.append(
                (
                    i + 1,
                    t["action"],
                    t["hook_id"],
                    t["hook_type"],
                    t["event"],
                    t["status"],
                    out[0] if out else None,
                )
            )
        _LUA_TASKS[key] = rows
    return spark.createDataFrame(
        rows,
        "pos long, action string, hook_id string, hook_type string, "
        "event string, status string, output string",
    )


_LUA_DIFF_DELIM_ROWS: dict = {}


def q_lua_diff_delimiter(spark, sf_dir):
    """The Lua client shim's GROUPED diff (round-9 advice closed): a
    non-empty delimiter in ``lakefs.diff_refs`` folds diff rows into
    common-prefix groups exactly like the reference
    (pkg/catalog/catalog.go listDiffHelper:2014-2035 via
    pkg/api/controller.go DiffRefs) — one ``common_prefix`` row per
    group, ALWAYS typed ``prefix_changed``; delimiter-free keys pass
    through as objects. The paged walk additionally pins the
    reference's cursor seek, GetStartPos → UpperBoundForPrefix
    (catalog.go:1983-1991): paging past leaf 'c' seeks to 'd', so leaf
    'ca' is skipped — the reference's exact (documented) semantics,
    reproduced rather than 'fixed'. mode=all is the one-shot listing;
    mode=walk re-reads it one row per page through the cursor."""
    key = _session_tag(spark)
    rows = _LUA_DIFF_DELIM_ROWS.get(key)
    if rows is None:
        import tempfile

        from lakefs_spark.lua.modules import run_lua_hook
        from lakefs_spark.schema import ENTRY_SCHEMA
        from lakefs_spark.storage.repo import Repository

        repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_ldd_"))
        repo.set_entry("main", {"key": "seed", "identity": "i0",
                                "size": 1, "etag": "e"})
        repo.commit("main", "seed")
        repo.create_branch("dev", "main")
        repo.stage_entries(
            "dev",
            spark.createDataFrame(
                [(k, f"id-{k}", f"a/{k}", "RELATIVE", 1, "e", None, None, "t")
                 for k in ["a/1", "a/2", "b/1", "c", "ca"]],
                ENTRY_SCHEMA,
            ),
        )
        repo.commit("dev", "adds")
        out: list = []
        run_lua_hook(
            """
            local lakefs = require("lakefs")
            local code, body = lakefs.diff_refs("r", "main", "dev", "", "", "/", 10)
            for _, d in ipairs(body.results) do
              print("all|" .. d.path .. "|" .. d.path_type .. "|" .. d.type)
            end
            local cursor = ""
            while true do
              local c, b = lakefs.diff_refs("r", "main", "dev", cursor, "", "/", 1)
              for _, d in ipairs(b.results) do
                print("walk|" .. d.path .. "|" .. d.path_type .. "|" .. d.type)
              end
              if not b.pagination.has_more then break end
              cursor = b.pagination.next_offset
            end
            """,
            repo=repo,
            output_sink=out.append,
        )
        rows = [
            (i + 1, *line.split("|"))
            for i, line in enumerate(out)
        ]
        _LUA_DIFF_DELIM_ROWS[key] = rows
    return spark.createDataFrame(
        rows,
        "pos long, mode string, path string, path_type string, dtype string",
    )


_STOCK_VALIDATOR_ROWS: dict = {}


def q_lua_stock_validators(spark, sf_dir):
    """The reference's example VALIDATOR hooks (tests/data/hooks —
    vendored verbatim from examples/hooks) dispatched as real type:lua
    pre-merge / pre-commit gates, hash-checked on their task log:

    - format_validator.lua: a branch adding a .csv is vetoed
      ('forbidden paths found'); parquet + _hidden paths merge.
    - dataset_validator.lua: a dataset without dataset_metadata.yaml is
      vetoed via hook.fail; a dataset with valid yaml fields merges.
    - commit_metadata_validator.lua: regexp-pattern metadata gate
      (running on the linear-time re2 engine) passes good metadata and
      vetoes a mismatch.

    Plus the round-9 VERBATIM additions — action_logger,
    s3_branch_head_exporter, s3_hive_manifest_exporter (clean AND diff
    mode), delta_lake_S3_export, delta_lake_azure_export,
    unity_table_export, unity_table_export_azure — each dispatched
    post-commit and reduced to a deterministic marker row proving the
    observable behavior (file landed with the right content, only the
    dirty partition regenerated, Unity statement carries the abfss
    location). With these, ALL TWELVE of the reference's
    examples/hooks/*.lua are driver-gated running unmodified.

    Fourteen deterministic task rows — the stock-hook compatibility
    claim as a driver gate, not just pytest."""
    key = _session_tag(spark)
    rows = _STOCK_VALIDATOR_ROWS.get(key)
    if rows is None:
        import os
        import tempfile

        from lakefs_spark.schema import ENTRY_SCHEMA
        from lakefs_spark.storage.actions import ActionsService
        from lakefs_spark.storage.repo import HookAbortError, Repository
        from lakefs_spark.fixtures import HOOKS_DATA
        from lakefs_spark.fixtures import put_file as _put_file

        def _stock(name):
            with open(os.path.join(HOOKS_DATA, name)) as f:
                return f.read()

        rows = []

        def _run_scenario(validator, action_spec, setup_bad, setup_good,
                          veto_marker):
            root = tempfile.mkdtemp(prefix=f"lakefs_val_{validator}_")
            repo = Repository.create(spark, os.path.join(root, "repo"))
            repo.stage_entries(
                "main",
                spark.createDataFrame(
                    [("seed", "i0", _put_file(repo, "data/seed", "s"),
                      "RELATIVE", 1, "e0", None, None, "t")],
                    ENTRY_SCHEMA,
                ),
            )
            repo.commit("main", "seed")
            svc = ActionsService(repo)
            svc.add_action(action_spec)
            try:
                setup_bad(spark, repo)
                raise RuntimeError(f"{validator}: veto did not fire")
            except HookAbortError as e:
                vetoed = veto_marker in str(e)
            setup_good(spark, repo)
            tasks = list(reversed(svc.task_results()))  # oldest first
            for t in tasks:
                rows.append(
                    (validator, t["event"], t["status"],
                     "veto-marker-seen" if (t["status"] == "failed" and vetoed)
                     else "")
                )

        def _branch_with(spark, repo, name, entries):
            repo.create_branch(name, "main")
            repo.stage_entries(
                name, spark.createDataFrame(entries, ENTRY_SCHEMA)
            )
            repo.commit(name, f"{name} changes")
            repo.merge(name, "main")

        # 1. format validator
        _run_scenario(
            "format_validator",
            {
                "name": "format check",
                "on": {"pre-merge": {"branches": ["main"]}},
                "hooks": [{"id": "check_formats", "type": "lua",
                           "properties": {
                               "script": _stock("format_validator.lua"),
                               "args": {"allow_list": ["parquet", "orc"],
                                        "ignore_hidden": True}}}],
            },
            lambda spark, repo: _branch_with(
                spark, repo, "bad",
                [("t/x.csv", "i1", "x", "RELATIVE", 1, "e", None, None, "t")],
            ),
            lambda spark, repo: _branch_with(
                spark, repo, "good",
                [("t/x.parquet", "i2", "x", "RELATIVE", 1, "e", None, None, "t"),
                 ("_tmp/scratch", "i3", "x", "RELATIVE", 1, "e", None, None, "t")],
            ),
            "forbidden paths found",
        )

        # 2. dataset validator
        meta = ("contains_pii: false\n"
                "approval_link: https://a.example.com/1\nrank: 3\n")

        def _ds_bad(spark, repo):
            _branch_with(
                spark, repo, "bad",
                [("datasets/orphan/p.parquet", "i4", "x", "RELATIVE", 1,
                  "e", None, None, "t")],
            )

        def _ds_good(spark, repo):
            rel = _put_file(repo, "data/meta.yaml", meta)
            _branch_with(
                spark, repo, "good",
                [("datasets/users/dataset_metadata.yaml", "im", rel,
                  "RELATIVE", len(meta), "em", None, None, "t"),
                 ("datasets/users/p.parquet", "i5", "x", "RELATIVE", 1,
                  "e", None, None, "t")],
            )

        _run_scenario(
            "dataset_validator",
            {
                "name": "dataset fields",
                "on": {"pre-merge": {"branches": ["main"]}},
                "hooks": [{"id": "validate_datasets", "type": "lua",
                           "properties": {
                               "script": _stock("dataset_validator.lua"),
                               "args": {
                                   "prefix": "datasets/",
                                   "metadata_file_name": "dataset_metadata.yaml",
                                   "fields": [
                                       {"name": "contains_pii",
                                        "required": True, "type": "boolean"},
                                       {"name": "approval_link",
                                        "required": True, "type": "string",
                                        "match_pattern": r"https?:\/\/.*"},
                                       {"name": "rank", "required": True,
                                        "type": "number"},
                                   ]}}}],
            },
            _ds_bad,
            _ds_good,
            "No dataset metadata found",
        )

        # 3. commit metadata validator (pre-commit)
        def _cm_bad(spark, repo):
            repo.set_entry("main", {"key": "a/1", "identity": "i1",
                                    "size": 1, "etag": "e"})
            repo.commit("main", "bad", metadata={"notebook_url": "x.com/1"})

        def _cm_good(spark, repo):
            repo.set_entry("main", {"key": "a/2", "identity": "i2",
                                    "size": 1, "etag": "e"})
            repo.commit("main", "ok", metadata={
                "notebook_url": "my-jupyter.example.com/nb/7"})

        _run_scenario(
            "commit_metadata_validator",
            {
                "name": "commit metadata",
                "on": {"pre-commit": {"branches": ["main"]}},
                "hooks": [{"id": "check_commit_metadata", "type": "lua",
                           "properties": {
                               "script": _stock("commit_metadata_validator.lua"),
                               "args": {"notebook_url": {
                                   "pattern": "my-jupyter.example.com/.*"}}}}],
            },
            _cm_bad,
            _cm_good,
            "does not match",
        )

        # -- round 9: the remaining stock hooks, VERBATIM ------------------
        import json as _j

        from lakefs_spark.fixtures import delta_repo_ns as _delta_repo_ns
        from lakefs_spark.storage.actions import read_hook_output

        class _TP:
            def __init__(self, base):
                self.base = base

            def __truediv__(self, sub):
                return os.path.join(self.base, sub)

        def _svc_repo(prefix, **repo_kw):
            root = tempfile.mkdtemp(prefix=prefix)
            repo = Repository.create(spark, os.path.join(root, "repo"),
                                     **repo_kw)
            export_root = os.path.join(root, "exports")
            return root, repo, export_root

        # action_logger: output line is the full action record as JSON
        _root, repo, _er = _svc_repo("lakefs_alog_")
        svc = ActionsService(repo)
        svc.add_action({
            "name": "log_everything",
            "on": {"post-commit": {"branches": ["main"]}},
            "hooks": [{"id": "log_it", "type": "lua",
                       "properties": {"script": _stock("action_logger.lua")}}],
        })
        repo.stage_entries("main", spark.createDataFrame(
            [("a/1", "i1", "x", "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA))
        c = repo.commit("main", "logged")
        t = svc.task_results()[0]
        rec = _j.loads(read_hook_output(repo, t["run_id"], t["hook_run_id"])[0])
        ok = (rec.get("event_type") == "post-commit"
              and rec.get("commit_id") == c.commit_id
              and rec.get("commit", {}).get("message") == "logged")
        rows.append(("action_logger", "post-commit", t["status"],
                     "action-json-roundtrips" if ok else "MISSING"))

        # s3_branch_head_exporter: head file content == the commit id
        _root, repo, export_root = _svc_repo("lakefs_bhead_")
        svc = ActionsService(repo, export_root=export_root)
        svc.add_action({
            "name": "export_all_heads",
            "on": {"post-commit": {"branches": None}},
            "hooks": [{"id": "export_branch_head", "type": "lua",
                       "properties": {
                           "script": _stock("s3_branch_head_exporter.lua"),
                           "args": {"aws_access_key_id": "k",
                                    "aws_secret_access_key": "s",
                                    "aws_region": "r",
                                    "export_bucket": "ext",
                                    "export_path": "heads"}}}],
        })
        repo.stage_entries("main", spark.createDataFrame(
            [("b/1", "i1", "x", "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA))
        c = repo.commit("main", "head")
        p_head = os.path.join(export_root, "ext", "heads", "repositories",
                              repo.name, "heads", "main")
        with open(p_head) as f:
            got = f.read()
        rows.append(("s3_branch_head_exporter", "post-commit",
                     svc.task_results()[0]["status"],
                     "head-file-is-commit-id" if got == c.commit_id
                     else "MISSING"))

        # s3_hive_manifest_exporter: clean mode then diff mode
        _root, repo, export_root = _svc_repo("lakefs_hive_")
        recorder: list = []
        svc = ActionsService(repo, export_root=export_root,
                             export_recorder=recorder)
        svc.add_action({
            "name": "auto symlink",
            "on": {"post-commit": {"branches": ["main"]}},
            "hooks": [{"id": "symlink_creator", "type": "lua",
                       "properties": {
                           "script": _stock("s3_hive_manifest_exporter.lua"),
                           "args": {"aws_access_key_id": "k",
                                    "aws_secret_access_key": "s",
                                    "aws_region": "r",
                                    "export_bucket": "oz",
                                    "export_path": "tables",
                                    "sources": ["tables/t/"]}}}],
        })
        repo.stage_entries("main", spark.createDataFrame(
            [(f"tables/t/dt={d}/p{i}.parquet", f"i{d}{i}",
              f"s3://phys/{d}/{i}", "FULL", 1, "e", None, None, "t")
             for d in ("a", "b") for i in range(2)], ENTRY_SCHEMA))
        repo.commit("main", "partitions")
        n_links = sum(1 for r in recorder
                      if str(r.get("key", "")).endswith("symlink.txt"))
        rows.append(("s3_hive_manifest_exporter", "post-commit",
                     svc.task_results()[0]["status"],
                     f"clean-mode-symlinks={n_links}"))
        recorder.clear()
        repo.stage_entries("main", spark.createDataFrame(
            [("tables/t/dt=b/p9.parquet", "inew", "s3://phys/b/9", "FULL",
              1, "e", None, None, "t")], ENTRY_SCHEMA))
        repo.commit("main", "append one partition")
        puts = [str(r["key"]) for r in recorder if "key" in r]
        diff_ok = (not any("dt=a" in k for k in puts)
                   and any(k.endswith("dt=b/symlink.txt") for k in puts))
        rows.append(("s3_hive_manifest_exporter", "post-commit",
                     svc.task_results()[0]["status"],
                     "diff-mode-regenerates-dirty-only" if diff_ok
                     else "MISSING"))

        # the four delta/unity VERBATIM exporters (s3 + azure flavors)
        def _delta_stock(hook_file, ns, phys, extra_args, marker_fn):
            root = tempfile.mkdtemp(prefix="lakefs_dstock_")
            repo, _b = _delta_repo_ns(spark, _TP(root), ns, phys=phys)
            export_root = os.path.join(root, "exports")
            rec2: list = []
            svc = ActionsService(repo, export_root=export_root,
                                 export_recorder=rec2)
            svc.add_action({
                "name": "exporter",
                "on": {"post-commit": {"branches": ["main*"]}},
                "hooks": [{"id": "exp", "type": "lua",
                           "properties": {"script": _stock(hook_file),
                                          "args": {
                                              "table_defs": ["famous"],
                                              "lakefs": {"access_key_id": "lk",
                                                         "secret_access_key": "ls"},
                                              **extra_args}}}],
            })
            c = repo.commit("main", "land")
            t = svc.task_results()[0]
            return t["status"], marker_fn(c, export_root, rec2)

        aws_args = {"aws": {"access_key_id": "k", "secret_access_key": "s",
                            "region": "r"}, "region": "r"}
        az_args = {"azure": {"storage_account": "acct", "access_key": "k"}}
        dbx_args = {"table_descriptors_path": "_lakefs_tables",
                    "databricks_host": "h", "databricks_token": "t",
                    "warehouse_id": "wh-1"}

        def _log_marker(prefix_parts):
            def fn(c, export_root, _rec):
                p = os.path.join(export_root, *prefix_parts, "main",
                                 c.commit_id[:6], "famous", "_delta_log",
                                 "00000000000000000000.json")
                return ("delta-log-exported" if os.path.exists(p)
                        else "MISSING")
            return fn

        st, mk = _delta_stock("delta_lake_S3_export.lua", "s3://ext/ns",
                              "s3://phys-bucket/data", aws_args,
                              _log_marker(["ext", "ns", "_lakefs",
                                           "exported"]))
        rows.append(("delta_lake_S3_export", "post-commit", st, mk))

        st, mk = _delta_stock(
            "delta_lake_azure_export.lua",
            "https://acct.blob.core.windows.net/cont/ns",
            "s3://phys-bucket/data", az_args,
            _log_marker(["azure", "acct", "cont", "ns", "_lakefs",
                         "exported"]))
        rows.append(("delta_lake_azure_export", "post-commit", st, mk))

        def _unity_marker(loc_prefix):
            def fn(_c, _er, rec2):
                regs = [r for r in rec2
                        if r.get("service") == "databricks"
                        and r.get("op") == "register_external_table"]
                ok = (len(regs) == 1 and regs[0]["table"] == "famous"
                      and loc_prefix in regs[0]["statement"])
                return "unity-registered" if ok else "MISSING"
            return fn

        st, mk = _delta_stock("unity_table_export.lua", "s3://ext/ns",
                              "s3://phys-bucket/data",
                              {**aws_args, **dbx_args},
                              _unity_marker("LOCATION 's3://ext/ns/"))
        rows.append(("unity_table_export", "post-commit", st, mk))

        st, mk = _delta_stock(
            "unity_table_export_azure.lua",
            "https://acct.blob.core.windows.net/cont/ns",
            "https://acct.blob.core.windows.net/phys/data",
            {**az_args, **dbx_args},
            _unity_marker("LOCATION 'abfss://cont@acct.dfs.core.windows"))
        rows.append(("unity_table_export_azure", "post-commit", st, mk))

        rows = [(i + 1, *r) for i, r in enumerate(rows)]
        _STOCK_VALIDATOR_ROWS[key] = rows
    return spark.createDataFrame(
        rows, "pos long, validator string, event string, status string, "
        "marker string"
    )


_SSTABLE_ROWS: dict = {}


def q_sstable_import(spark, sf_dir):
    """Migration path from a REAL lakeFS repository: the reference's own
    golden SSTables (tests/data/sstable — range/metarange/ok1.sst from
    clients/spark/src/test/resources, written by pkg/graveler/sstable/
    writer.go) parsed by the from-scratch Pebble block reader
    (lakefs_spark/sources/sstable.py) and landed as a commit.

    'migrated' rows: metarange.sst → range ids → range SSTables →
    migrate_from_lakefs → snapshot listing of the new commit (the full
    adoption flow). 'ok1' rows: the 105-entry range parsed through the
    DISTRIBUTED binaryFile+mapInPandas path. Keys, identities,
    addresses, sizes, etags and mtimes must equal what the reference's
    writer serialized — byte-level interop, not shape parity."""
    key = _session_tag(spark)
    rows = _SSTABLE_ROWS.get(key)
    if rows is None:
        import os
        import shutil
        import tempfile

        from lakefs_spark.sources import sstable as S
        from lakefs_spark.storage.repo import Repository

        data = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tests", "data", "sstable")
        root = tempfile.mkdtemp(prefix="lakefs_sst_")
        ranges_dir = os.path.join(root, "lakefs-ranges")
        os.makedirs(ranges_dir)
        (desc,) = S.read_metarange_sstable(
            S.read_file(os.path.join(data, "metarange.sst"))
        )
        shutil.copy(os.path.join(data, "range.sst"),
                    os.path.join(ranges_dir, desc["range_id"]))
        repo = Repository.create(spark, os.path.join(root, "repo"))
        commit, _nr, _ne = S.migrate_from_lakefs(
            repo, os.path.join(data, "metarange.sst"), ranges_dir
        )
        import calendar

        def _epoch(lm):
            # collected timestamps are UTC wall-clock (session TZ is
            # UTC); timegm avoids the host-local-TZ dependency of
            # datetime.timestamp() on naive values
            return calendar.timegm(lm.timetuple()) if lm else 0

        rows = []
        for r in sorted(
            repo.snapshot(commit.commit_id).collect(), key=lambda r: r["key"]
        ):
            rows.append(
                ("migrated", r["key"], r["identity"], r["address"],
                 r["address_type"], r["size"], r["etag"],
                 _epoch(r["last_modified"]))
            )
        ok1 = S.sst_entries_df(spark, os.path.join(data, "ok1.sst"))
        for r in sorted(ok1.collect(), key=lambda r: r["key"]):
            rows.append(
                ("ok1", r["key"], r["identity"], r["address"],
                 r["address_type"], r["size"], r["etag"],
                 _epoch(r["last_modified"]))
            )
        # the WRITE direction: a fixed entry set exported as a lakeFS
        # range+metarange must carry the deterministic content
        # addresses of the reference's ident protocol, and the export
        # must read back through our own reader identically
        fixed = [
            {"key": f"exp/{i:03d}", "identity": f"{i:064x}",
             "address": f"data/{i}", "address_type": "RELATIVE",
             "size": i + 1, "etag": f"e{i}",
             "last_modified_s": 1700000000 + i, "metadata": None,
             "content_type": "t"}
            for i in range(5)
        ]
        ebuf, rid, rd = S.write_range_sstable(fixed)
        _mbuf, mid = S.write_metarange_sstable([rd])
        back = S.read_range_sstable(ebuf)
        ok = all(
            b["key"] == e["key"] and b["identity"] == e["identity"]
            and b["size"] == e["size"]
            for b, e in zip(back, fixed)
        ) and len(back) == len(fixed)
        rows.append(("export", "range_id", rid, "", "", len(back),
                     "roundtrip_ok" if ok else "roundtrip_FAILED", 0))
        rows.append(("export", "metarange_id", mid, "", "", 1, "", 0))
        rows = [(i + 1, *r) for i, r in enumerate(rows)]
        _SSTABLE_ROWS[key] = rows
    return spark.createDataFrame(
        rows,
        "pos long, source string, key string, identity string, "
        "address string, address_type string, size long, etag string, "
        "last_modified_s long",
    )


_LUA_EXPORTER_ROWS: dict = {}


def q_lua_exporters(spark, sf_dir):
    """The reference's remaining stock catalogexport chains running as
    real ``type: lua`` (lakefs_spark/lua/modules.py embedded ports of
    pkg/actions/lua/lakefs/catalogexport/{delta,glue,unity}_exporter.lua
    + host modules crypto/time/uuid/encoding/formats/glue/databricks):

    - the esti delta-export action spec dispatched post-commit —
      changed_table_defs via paged diff_refs, formats.delta_client over
      the committed _delta_log, physical-address rewrite, z85-encoded
      deletion-vector handling, s3 stand-in writes;
    - the esti glue_exporter.lua body — hive schema → Glue table input
      (integer→int, partition split, EXTERNAL_TABLE, symlink location);
    - unity register_tables over the delta response — per-branch schema
      + CREATE EXTERNAL TABLE statement;
    - a crypto/time/z85 constant computed IN Lua.

    Rows are normalized (the run's commit sha → '<sha>') so the hash is
    deterministic while proving each chain computed real values."""
    key = _session_tag(spark)
    rows = _LUA_EXPORTER_ROWS.get(key)
    if rows is None:
        import json as _j
        import os
        import tempfile

        from lakefs_spark.lua.modules import run_lua_hook
        from lakefs_spark.schema import ENTRY_SCHEMA
        from lakefs_spark.storage.actions import ActionsService, lua_event_record
        from lakefs_spark.storage.repo import Repository
        from lakefs_spark.fixtures import (
            DELTA_EXPORT_SCRIPT,
            GLUE_EXPORT_SCRIPT,
            HIVE_DESCRIPTOR,
            delta_repo as _delta_repo,
            put_file as _put_file,
        )

        rows = []
        root = tempfile.mkdtemp(prefix="lakefs_luaexp_")

        class _TP:
            def __init__(self, spark, base):
                self.spark = spark
                self.base = base

            def __truediv__(self, sub):
                return os.path.join(self.base, sub)

        # -- delta chain (dispatched stock action spec) ---------------------
        repo, _base = _delta_repo(spark, _TP(spark, root))
        export_root = os.path.join(root, "exports")
        svc = ActionsService(repo, export_root=export_root)
        svc.add_action(
            {
                "name": "Delta Exporter",
                "on": {"post-commit": {"branches": ["main*"]}},
                "hooks": [
                    {
                        "id": "delta_exporter",
                        "type": "lua",
                        "properties": {
                            "script": DELTA_EXPORT_SCRIPT,
                            "args": {
                                "export_namespace": "s3://ext-bucket/ns",
                                "aws": {"access_key_id": "k",
                                        "secret_access_key": "s",
                                        "region": "r"},
                                "lakefs": {"access_key_id": "lk",
                                           "secret_access_key": "ls"},
                                "table_names": ["famous"],
                            },
                        },
                    }
                ],
            }
        )
        c = repo.commit("main", "land the delta table")
        short = c.commit_id[:6]
        log_dir = os.path.join(export_root, "ext-bucket", "ns", "_lakefs",
                               "exported", "main", short, "famous", "_delta_log")
        for fname in sorted(os.listdir(log_dir)):
            with open(os.path.join(log_dir, fname)) as f:
                # concatenated JSON objects — count kinds + paths
                body = f.read()
            kinds = []
            for piece in body.splitlines():  # NDJSON, one action per line
                if not piece.strip():
                    continue
                d = _j.loads(piece)
                (kind,) = d.keys()
                target = d[kind].get("path", "") if isinstance(d[kind], dict) else ""
                kinds.append(f"{kind}:{target}" if target else kind)
            rows.append(("delta", f"famous/_delta_log/{fname}",
                         "|".join(sorted(kinds))))

        # -- glue chain (esti glue_exporter.lua body) ------------------------
        grepo = Repository.create(spark, os.path.join(root, "grepo"))
        grepo.stage_entries(
            "main",
            spark.createDataFrame(
                [("_lakefs_tables/animals.yaml", "iy",
                  _put_file(grepo, "data/animals.yaml", HIVE_DESCRIPTOR),
                  "RELATIVE", len(HIVE_DESCRIPTOR), "ey", None, None, "t")],
                ENTRY_SCHEMA,
            ),
        )
        gc = grepo.commit("main", "descriptor")
        record = lua_event_record(
            grepo, "post-commit", {"branch": "main", "commit": gc, "run_id": "r1"},
            "Glue Exporter", "glue_exporter",
        )
        recorder: list = []
        run_lua_hook(
            GLUE_EXPORT_SCRIPT,
            action=record,
            args={
                "aws": {"aws_access_key_id": "k", "aws_secret_access_key": "s",
                        "aws_region": "r"},
                "table_source": "_lakefs_tables/animals.yaml",
                "export_base_uri": "s3://ext-bucket/ns",
                "catalog": {
                    "db_name": "my-db",
                    "table_input": {
                        "StorageDescriptor": {
                            "InputFormat": "org.apache.hadoop.hive.ql.io.SymlinkTextInputFormat",
                            "OutputFormat": "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
                            "SerdeInfo": {"SerializationLibrary":
                                          "org.apache.hadoop.hive.serde2.OpenCSVSerde"},
                        },
                        "Parameters": {"classification": "csv"},
                    },
                },
            },
            repo=grepo,
            export_root=os.path.join(root, "gexports"),
            export_recorder=recorder,
        )
        gshort = gc.commit_id[:6]
        ops = {r["op"]: r for r in recorder if r.get("service") == "glue"}
        ti = ops["create_table"]["table_input"]
        cols = ",".join(f"{cc['Name']}:{cc['Type']}"
                        for cc in ti["StorageDescriptor"]["Columns"])
        parts = ",".join(f"{p['Name']}:{p['Type']}" for p in ti["PartitionKeys"])
        rows.append(("glue", "create_database", ops["create_database"]["database"]))
        rows.append((
            "glue", "create_table",
            "|".join([
                ti["Name"].replace(gshort, "<sha>"),
                ti["TableType"],
                f"cols={cols}",
                f"parts={parts}",
                ti["StorageDescriptor"]["Location"].replace(gshort, "<sha>"),
                ti["StorageDescriptor"]["InputFormat"],
                ti["Parameters"]["classification"],
            ]),
        ))

        # -- unity chain over the delta response ------------------------------
        urecorder: list = []
        run_lua_hook(
            """
            local unity = require("lakefs/catalogexport/unity_exporter")
            local databricks = require("databricks")
            local resp = unity.register_tables(action, "_lakefs_tables",
                args.details, databricks.client("h", "t"), "wh-1")
            return resp["famous"]
            """,
            action={"repository_id": repo.name, "commit_id": c.commit_id,
                    "branch_id": "main"},
            args={"details": {"famous": {
                "path": f"s3://ext-bucket/ns/_lakefs/exported/main/{short}/famous",
                "metadata": {"description": "famous animals"},
            }}},
            repo=repo,
            export_recorder=urecorder,
        )
        ureg = next(r for r in urecorder if r["op"] == "register_external_table")
        rows.append(("unity", "register_external_table",
                     ureg["statement"].replace(short, "<sha>")))
        rows.append(("unity", "create_schema", "main-cat.main"))

        # -- crypto/time/z85 constants computed IN Lua -------------------------
        ret = run_lua_hook(
            """
            local hex = require("encoding/hex")
            local hmac = require("crypto/hmac")
            local md5 = require("crypto/md5")
            local time = require("time")
            local z85 = require("encoding/z85enc")
            local uuid, prefix = z85.decode_uuid("HelloWorldHelloWorld")
            return hex.encode(hmac.sign_sha256("lakefs", "spark")) .. "|" ..
                   md5.digest("lakefs") .. "|" ..
                   time.format_iso(time.parse("2006-01-02 15:04:05 -0700",
                                              "2024-03-05 12:30:45 +0200"), "") ..
                   "|" .. uuid .. prefix
            """,
            repo=repo,
        )
        rows.append(("hostmods", "crypto_time_z85", ret[0]))
        rows = [(i + 1, comp, item, val)
                for i, (comp, item, val) in enumerate(rows)]
        _LUA_EXPORTER_ROWS[key] = rows
    return spark.createDataFrame(
        rows, "pos long, component string, item string, value string"
    )


# -- commit DAG (storage.refs over the shared dagspec DAG) -----------------

_DAG_STORE = None


def _dag_store():
    """CommitStore materialized from sources/dagspec.py (driver-sized
    by design — see storage/refs.py docstring); built once per process."""
    global _DAG_STORE
    if _DAG_STORE is None:
        import tempfile

        from lakefs_spark.sources.dagspec import build_store

        _DAG_STORE = build_store(tempfile.mkdtemp(prefix="lakefs_dag_"))
    return _DAG_STORE


_LOG_SCHEMA = "pos long, commit_id string, creation_ts long"


def _log_df(spark, **kwargs):
    from lakefs_spark.sources import dagspec as DG
    from lakefs_spark.storage.refs import log_commits

    store, _, _ = _dag_store()
    rows = [
        (i + 1, c.commit_id, int(c.creation_date))
        for i, c in enumerate(log_commits(store, DG.cid(DG.LOG_HEAD), **kwargs))
    ]
    return spark.createDataFrame(rows, _LOG_SCHEMA)


def q_commit_log(spark, sf_dir):
    """Commit log: BFS by (creation_date desc, commit_id)
    (pkg/graveler/ref/commit_iterator.go:75-189)."""
    return _log_df(spark)


def q_commit_log_since(spark, sf_dir):
    from lakefs_spark.sources import dagspec as DG

    return _log_df(spark, since=DG.date_of(DG.LOG_SINCE_IDX))


def q_commit_log_first_parent(spark, sf_dir):
    return _log_df(spark, first_parent=True)


def q_merge_base(spark, sf_dir):
    """Best-common-ancestor per ref pair, generation-ordered two-sided
    walk (pkg/graveler/ref/merge_base_finder.go:23-76)."""
    from lakefs_spark.sources import dagspec as DG
    from lakefs_spark.storage.refs import merge_base

    store, _, _ = _dag_store()
    rows = [
        (DG.cid(a), DG.cid(b), merge_base(store, DG.cid(a), DG.cid(b)))
        for a, b in DG.MB_PAIRS
    ]
    return spark.createDataFrame(rows, "a string, b string, base_id string")


def q_ref_resolve(spark, sf_dir):
    """Ref-expression battery ``base[~N][^N][@|$]``
    (pkg/graveler/ref/parse_ref.go:11-68, resolve_ref.go:32-133)."""
    from lakefs_spark.sources import dagspec as DG
    from lakefs_spark.storage.refs import resolve_ref

    store, branches, tags = _dag_store()
    rows = [
        (e, resolve_ref(e, branches, tags, store).commit_id) for e in DG.REF_EXPRS
    ]
    return spark.createDataFrame(rows, "expr string, commit_id string")


def q_gc_summary(spark, sf_dir):
    return GC.gc_summary(q_gc_mark(spark, sf_dir))


def q_active_commits(spark, sf_dir):
    """GC active-commit set over the shared DAG (§2.12;
    pkg/graveler/retention/active_commits.go): per-branch retention
    cutoffs, first-beyond-cutoff commit survives, tags always survive."""
    from lakefs_spark.sources import dagspec as DG
    from lakefs_spark.storage.refs import active_commit_set

    store, branches, tags = _dag_store()
    cutoffs = {
        branches[b]: DG.date_of(DG.GC_CUTOFF_IDX[b]) for b in DG.BRANCHES
    }
    active = active_commit_set(store, cutoffs, list(tags.values()))
    return spark.createDataFrame([(c,) for c in sorted(active)], "commit_id string")


def q_walker_entries(spark, sf_dir):
    """Object-store walker -> import entry rows (§2.1;
    pkg/block/walker.go semantics): anchored base-prefix strip (keys
    repeating the base substring mid-path survive), metadata-derived
    etag, typed identity hash excluding address/mtime
    (pkg/catalog/entry.go:21-38)."""
    from lakefs_spark.sources.walker import entries_from_walk

    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 7 == 0)
    walked = docs.select(
        # path repeats the base's trailing segment mid-path on purpose
        F.concat(
            F.lit("file:///data/x/data/"),
            F.col("doc_id").cast("string"),
            F.lit("/part-"),
            (F.col("doc_id") % 4).cast("string"),
        ).alias("path"),
        F.col("n_chars").cast("long").alias("size"),
        F.lit(None).cast("timestamp").alias("last_modified"),
    )
    out = entries_from_walk(walked, "file:///data/x", key_prefix="imported/")
    return out.select("key", "identity", "address", "size", "etag")


def q_s3_list_pages(spark, sf_dir):
    """S3-gateway ListObjectsV2 pagination driven end-to-end on the
    real Repository via the catalog facade (§2.2/§2.13;
    pkg/gateway/operations/listobjects.go:106-360): the flat listing
    resumes with NextContinuationToken page over page; the delimiter
    listing folds CommonPrefixes. One row per emitted item with its
    page index and the page's IsTruncated flag."""
    from lakefs_spark.catalog import Catalog

    repo = _e2e_repo(spark, sf_dir)
    cat = Catalog(repo)
    rows = []
    token, page = "", 0
    while True:
        resp = cat.list_objects_v2(
            "main", prefix="tables/", max_keys=4000, continuation_token=token
        )
        for f in resp["Contents"]:
            rows.append(("flat", page, f["Key"], False, resp["IsTruncated"]))
        if not resp["IsTruncated"]:
            break
        token = resp["NextContinuationToken"]
        page += 1
    resp = cat.list_objects_v2("main", prefix="tables/", delimiter="/", max_keys=1000)
    for d in resp["CommonPrefixes"]:
        rows.append(("delim", 0, d["Prefix"], True, resp["IsTruncated"]))
    for f in resp["Contents"]:
        rows.append(("delim", 0, f["Key"], False, resp["IsTruncated"]))
    # Arrow path: a 150k-row local relation through the row-verifier
    # costs seconds of pure driver time; one pandas frame ships as
    # Arrow batches with identical rows/schema (guide §6).
    import pandas as _pd

    return spark.createDataFrame(
        _pd.DataFrame(
            rows, columns=["mode", "page", "key", "is_common_prefix", "is_truncated"]
        ),
        "mode string, page long, key string, is_common_prefix boolean, is_truncated boolean",
    )


def q_s3_list_v1_pages(spark, sf_dir):
    """S3-gateway ListObjects V1 (marker/NextMarker) paging on the real
    Repository (pkg/gateway/operations/listobjects.go:236-360): each
    page records the marker it resumed from; with no delimiter the
    gateway omits NextMarker (ListV1 parity), so the client resumes
    from the last Contents key of the truncated page."""
    from lakefs_spark.catalog import Catalog

    repo = _e2e_repo(spark, sf_dir)
    cat = Catalog(repo)
    rows = []
    marker, page = "", 0
    while True:
        resp = cat.list_objects_v1("main", prefix="tables/", max_keys=3000, marker=marker)
        for f in resp["Contents"]:
            rows.append(("v1", page, f["Key"], marker, resp["IsTruncated"]))
        if not resp["IsTruncated"]:
            break
        assert "NextMarker" not in resp  # ListV1: only set with delimiter
        marker = resp["Contents"][-1]["Key"]
        page += 1
    # Arrow path — same rationale as q_s3_list_pages
    import pandas as _pd

    return spark.createDataFrame(
        _pd.DataFrame(rows, columns=["mode", "page", "key", "marker", "is_truncated"]),
        "mode string, page long, key string, marker string, is_truncated boolean",
    )


def q_repo_squash_merge_snapshot(spark, sf_dir):
    """Squash merge (graveler.go:3192, SquashMerge): same merged
    snapshot as the 2-parent merge, but the result commit has exactly
    one parent — asserted in-build so a regression turns the gate red."""
    repo = _e2e_merge_repo(spark, sf_dir)
    return repo.snapshot("dsq").select("key", "identity", "size", "etag")


def q_repo_revert_merge_snapshot(spark, sf_dir):
    """Revert of a merge commit with parent_number=1
    (graveler.go:2829-2960): applying the inverse of the merge relative
    to its first (dest) parent restores the pre-merge dest snapshot."""
    repo = _e2e_merge_repo(spark, sf_dir)
    return repo.snapshot("rvm").select("key", "identity", "size", "etag")


# -- driver contract -------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3-way merge (strategy=src) over sf0.001 fixtures."""
    return q_merge_result_src(spark, "/root/testdata/sf0.001")


def part_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every oracle-checked operator query, one callable per operator.

    The driver contract exposes only the 50-slot layout built by
    ``queries()`` (see lakefs_spark/gatespec.py); the full per-operator
    set stays available here for tests and direct use.
    """
    return {
        "snapshot_listing": q_snapshot_listing,
        "list_prefix_page": q_list_prefix_page,
        "list_delimiter_groups": q_list_delimiter_groups,
        "list_delimiter_leaves": q_list_delimiter_leaves,
        "overlay_visible": q_overlay_visible,
        "uncommitted_diff": q_uncommitted_diff,
        "diff_refs": q_diff_refs,
        "local_sync_diff": q_local_sync_diff,
        "sync_plan": q_sync_plan,
        "diff_summary": q_diff_summary,
        "compare_refs": q_compare_refs,
        "merge_result_src": q_merge_result_src,
        "merge_result_dest": q_merge_result_dest,
        "merge_conflicts": q_merge_conflicts,
        "gc_mark": q_gc_mark,
        "gc_committed_addresses": q_gc_committed_addresses,
        "range_stats": q_range_stats,
        "dedup_exact": q_dedup_exact,
        "token_counts": q_token_counts,
        "bpe_token_counts": q_bpe_token_counts,
        "bpe_pair_stats": q_bpe_pair_stats,
        "vocab_stats": q_vocab_stats,
        "dedup_clusters": q_dedup_clusters,
        "dedup_survivors": q_dedup_survivors,
        "substring_spans": q_substring_spans,
        "substring_stats": q_substring_stats,
        "substring_cut": q_substring_cut,
        "incremental_dedup_pairs": q_incremental_dedup_pairs,
        "corpus_funnel": q_corpus_funnel,
        "length_percentiles": q_length_percentiles,
        "repetition_scores": q_repetition_scores,
        "unigram_nll": q_unigram_nll,
        "bm25_topk": q_bm25_topk,
        "pii_counts": q_pii_counts,
        "sampling_weights": q_sampling_weights,
        "dsir_weights": q_dsir_weights,
        "dsir_top": q_dsir_top,
        "sequence_packing": q_sequence_packing,
        "doc_chunks": q_doc_chunks,
        "passage_dedup": q_passage_dedup,
        "boilerplate_strip": q_boilerplate_strip,
        "length_band_filter": q_length_band_filter,
        "label_centroids": q_label_centroids,
        "prototypicality": q_prototypicality,
        "stratified_sample": q_stratified_sample,
        "contamination": q_contamination,
        "bloom_decontamination": q_bloom_decontamination,
        "quality_classifier": q_quality_classifier,
        "token_fertility": q_token_fertility,
        "train_val_split": q_train_val_split,
        "text_quality": q_text_quality,
        "incremental_text_stats": q_incremental_text_stats,
        "lang_id": q_lang_id,
        "doc_fingerprints": q_doc_fingerprints,
        "ngram_jaccard": q_ngram_jaccard,
        "cosine_pairs": q_cosine_pairs,
        "near_dup_embeddings": q_near_dup_embeddings,
        "embedding_dedup_survivors": q_embedding_dedup_survivors,
        "ivf_topk": q_ivf_topk,
        "kmeans_codebook": q_kmeans_codebook,
        "pq_codes": q_pq_codes,
        "pq_topk": q_pq_topk,
        "ivfpq_topk": q_ivfpq_topk,
        "hybrid_rerank": q_hybrid_rerank,
        "import_prefix_replace": q_import_prefix_replace,
        "symlink_manifest": q_symlink_manifest,
        "hive_partitions": q_hive_partitions,
        "delta_log_actions": q_delta_log_actions,
        "glue_partition_batches": q_glue_partition_batches,
        "unity_table_payload": q_unity_table_payload,
        "media_frame_sample": q_media_frame_sample,
        "media_resize": q_media_resize,
        "gc_key_match": q_gc_key_match,
        "path_time_prune": q_path_time_prune,
        "windowed_event_counts": q_windowed_event_counts,
        "session_event_stats": q_session_event_stats,
        "asof_click_attribution": q_asof_click_attribution,
        "range_join_acctbal": q_range_join_acctbal,
        "sliding_event_counts": q_sliding_event_counts,
        "event_time_rollup": q_event_time_rollup,
        "usage_report": q_usage_report,
        "point_lookup": q_point_lookup,
        "uncommitted_addresses": q_uncommitted_addresses,
        "multipart_etags": q_multipart_etags,
        "commit_log": q_commit_log,
        "commit_log_since": q_commit_log_since,
        "commit_log_first_parent": q_commit_log_first_parent,
        "merge_base": q_merge_base,
        "ref_resolve": q_ref_resolve,
        "gc_summary": q_gc_summary,
        "active_commits": q_active_commits,
        "walker_entries": q_walker_entries,
        "s3_list_pages": q_s3_list_pages,
        "s3_list_v1_pages": q_s3_list_v1_pages,
        "repo_squash_merge_snapshot": q_repo_squash_merge_snapshot,
        "repo_revert_merge_snapshot": q_repo_revert_merge_snapshot,
        "pull_requests": q_pull_requests,
        "branch_listing": q_branch_listing,
        "hook_runs": q_hook_runs,
        "webhook_deliveries": q_webhook_deliveries,
        "action_task_results": q_action_task_results,
        "lua_hook_runs": q_lua_hook_runs,
        "lua_diff_delimiter": q_lua_diff_delimiter,
        "lua_exporters": q_lua_exporters,
        "lua_stock_validators": q_lua_stock_validators,
        "sstable_import": q_sstable_import,
        "audio_chunks": q_audio_chunks,
        "line_dedup": q_line_dedup,
        "text_normalize": q_text_normalize,
        "url_canonical": q_url_canonical,
        "domain_stats": q_domain_stats,
        "point_lookup_branch": q_point_lookup_branch,
        "list_page_probe": q_list_page_probe,
        "run_ttl_expiry": q_run_ttl_expiry,
        "expectation_gate": q_expectation_gate,
        "repo_copy_entry_snapshot": q_repo_copy_entry_snapshot,
        "repo_uncommitted_compacted": q_repo_uncommitted_compacted,
        "commit_ordered": q_commit_ordered,
        "stream_ingest_snapshot": q_stream_ingest_snapshot,
        "tombstone_alert_stream": q_tombstone_alert_stream,
        "stream_session_stats": q_stream_session_stats,
        "stream_dedup_hashes": q_stream_dedup_hashes,
        "csv_source": q_csv_source,
        "json_source": q_json_source,
        "binary_file_source": q_binary_file_source,
        "orc_source": q_orc_source,
        "packing_efficiency": q_packing_efficiency,
        "repo_commit_snapshot": q_repo_commit_snapshot,
        "repo_revert_snapshot": q_repo_revert_snapshot,
        "repo_cherry_pick_snapshot": q_repo_cherry_pick_snapshot,
        "repo_merge_snapshot": q_repo_merge_snapshot,
        "repo_reset_prefix_snapshot": q_repo_reset_prefix_snapshot,
        "repo_conditional_set_snapshot": q_repo_conditional_set_snapshot,
        "repo_compact_snapshot": q_repo_compact_snapshot,
        "repo_restore_snapshot": q_repo_restore_snapshot,
        "repo_log_paths": q_repo_log_paths,
        "repo_annotate": q_repo_annotate,
        # Spark-only (no SQL-expressible oracle): rows-only checks
        "ann_topk": q_ann_topk,
        "ann_recall": q_ann_recall,
        "lsh_topk": q_lsh_topk,
        "minhash_candidates": q_minhash_candidates,
        "minhash_jaccard_est": q_minhash_jaccard_est,
        "token_overlap": q_token_overlap,
        "simhash": q_simhash,
        "simhash_near_dups": q_simhash_near_dups,
        "media_features": q_media_features,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract: exactly 50 entries (the driver grades the first
    50 in dict order). Flagship operators keep solo entries; the rest
    are folded into combined gates — tagged unions canonicalized to
    (gate, row_repr) on both engines (lakefs_spark/gatespec.py)."""
    from lakefs_spark import gatespec as GS

    parts = part_queries()
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: parts[name] for name in GS.SOLO
    }
    for gate, members in GS.GATES.items():
        out[gate] = (
            lambda spark, sf_dir, _m=members: GS.spark_gate(
                spark, sf_dir, _m, GS.COLSPECS, parts
            )
        )
    return out


def oracle_sql() -> dict[str, str]:
    return ORC.all_oracles()
