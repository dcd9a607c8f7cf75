"""Physical-plan regression tests — the 100 TB discipline, pinned.

These assert properties of the *optimized plans*, not results: filters
reach the Parquet scan, small sides broadcast, candidate generation
never degenerates into a cartesian product, and scans prune columns.
A refactor that silently loses one of these would still pass every
row-level test while becoming unusable at scale (SURVEY.md §4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_point_filter_pushed_to_parquet_scan(spark):
    """A key-equality filter must reach the scan (PushedFilters), and
    the projection must prune to the selected columns (ReadSchema)."""
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .where(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_totalprice")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]" in plan, plan
    # column pruning: the scan schema must not include unselected cols
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_comment" not in read_schema, read_schema


def test_snapshot_range_scan_prunes_and_pushes(spark, tmp_path):
    """Manifest-pruned snapshot read still pushes the key bounds into
    the surviving range files' Parquet scan."""
    from lakefs_spark.storage.repo import Repository

    ents = spark.range(0, 2000).select(
        F.concat(F.lit("k/"), F.lpad("id", 8, "0")).alias("key"),
        F.md5(F.col("id").cast("string")).alias("identity"),
        F.md5(F.concat(F.lit("a"), "id")).alias("address"),
        F.lit("RELATIVE").alias("address_type"),
        F.col("id").alias("size"),
        F.md5(F.concat(F.lit("e"), "id")).alias("etag"),
        F.lit(None).cast("timestamp").alias("last_modified"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit("application/octet-stream").alias("content_type"),
    )
    repo = Repository.create(spark, str(tmp_path / "repo"))
    repo.import_entries("main", ents, message="m")
    snap = repo.snapshot("main", key_lower="k/00000100", key_upper="k/00000200")
    plan = _plan(snap)
    assert "GreaterThanOrEqual(key,k/00000100)" in plan, plan
    assert "LessThan(key,k/00000200)" in plan, plan


def test_cosine_pairs_broadcasts_query_side(spark, emb):
    from lakefs_spark.operators.similarity import cosine_pairs

    q = emb.where(F.col("vec_id") < 8)
    plan = _plan(cosine_pairs(q, emb))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_cosine_pairs_fills_idle_parallelism_conditionally(spark, emb):
    """The O(n_q*n_c) pair work above the broadcast join inherits the
    STREAM side's partitioning, so a single-split corpus must be
    round-robin-repartitioned up to defaultParallelism — and a corpus
    that already fills the cluster must NOT pay an extra exchange
    (guide §2.6; the repartition is scale-adaptive, not a local tune)."""
    from pyspark.sql import functions as F

    from lakefs_spark.operators.similarity import cosine_pairs

    q = emb.where(F.col("vec_id") < 8)
    par = spark.sparkContext.defaultParallelism

    # emb is one parquet file / one row group -> single scan split
    assert emb.rdd.getNumPartitions() < par
    filled = _plan(cosine_pairs(q, emb))
    assert "RoundRobinPartitioning" in filled, filled

    wide = emb.repartition(par)
    unfilled = _plan(cosine_pairs(q, wide))
    # exactly the caller's exchange — the operator adds none of its own
    assert unfilled.count("RoundRobinPartitioning") == 1, unfilled


def test_lsh_topk_has_no_cartesian_product(spark, emb):
    """The LSH bucket equi-join must plan as a hash/sort-merge join on
    bucket — never a cartesian/broadcast-nested-loop over the corpus."""
    from lakefs_spark.operators.similarity import lsh_topk

    q = emb.where(F.col("vec_id") < 8)
    plan = _plan(lsh_topk(q, emb, dim=64, k=5, n_planes=6))
    assert "CartesianProduct" not in plan, plan


def test_ivf_assignment_is_shuffle_free(spark, emb):
    """Corpus→centroid assignment is one projection (codebook folded
    into the expression) — no Exchange before the assignment project."""
    from lakefs_spark.operators.similarity import ivf_topk

    # build only the assignment stage: corpus side of the operator
    q = emb.where(F.col("vec_id") < 8)
    df = ivf_topk(q, emb, n_centroids=100, nprobe=2, k=3)
    # full operator needs shuffles (windows, joins) — but no cartesian
    assert "CartesianProduct" not in _plan(df)


def test_large_k_assignment_partial_aggregates_before_exchange(spark, emb):
    """Above FOLD_MAX_K the centroid assignment is broadcast-NLJ +
    max_by argmax: partial aggregation must collapse the N×K scored
    stream back to N rows on the map side, so the only exchange carries
    one candidate per row — never the K-times blowup a
    Window.partitionBy(id) shape would shuffle."""
    from lakefs_spark.operators.similarity import FOLD_MAX_K, assign_centroids

    k = FOLD_MAX_K + 1
    cents = [(i, [float((i * j) % 7) for j in range(4)]) for i in range(k)]
    df = emb.select("vec_id", F.slice("embedding", 1, 4).alias("embedding"))
    res = assign_centroids(df, "vec_id", "embedding", cents)
    plan = _plan(res)
    assert "partial_max_by" in plan
    assert "Window" not in plan and "row_number" not in plan
    # the partial aggregate sits below the exchange: map-side combine
    exch = plan.index("Exchange")
    assert plan.index("partial_max_by") > exch  # deeper in the tree = below
    assert "BroadcastNestedLoopJoin" in plan  # codebook rides a broadcast


def test_path_time_prune_pushes_range_to_scan(spark, tmp_path):
    """The GC in-flight-upload guard is a string RANGE predicate on the
    address column, so it must reach the parquet scan as PushedFilters
    — never a per-row UDF or post-scan regex."""
    from lakefs_spark.functions.pathtime import new_physical_path, prune_new_addresses

    rows = [(new_physical_path(f"t{i:04d}", 1_700_000_000 + i * 3600),) for i in range(50)]
    p = str(tmp_path / "addrs.parquet")
    spark.createDataFrame(rows, "address string").write.parquet(p)
    df = prune_new_addresses(spark.read.parquet(p), 1_700_000_000 + 25 * 3600)
    plan = _plan(df)
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters"):].split("]")[0]
    assert "address" in pushed and ("LessThan" in pushed or "GreaterThan" in pushed or "Or(" in pushed)
    assert df.count() == 25  # the cutoff's own hour counts as NEW (protected)


def test_bm25_prefilters_terms_and_takeordered(spark):
    """BM25: the query-term filter sits below the TF aggregation (the
    token stream reaching the agg is O(hits)); the top-k cut is a
    TakeOrdered, never a global sort; the idf side broadcasts."""
    from lakefs_spark.operators.text import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = bm25_topk(docs, ["vector", "hash"], k=10)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # idf joins back as a broadcast


def test_minhash_candidates_no_cartesian(spark):
    from lakefs_spark.operators.dedup import minhash_candidates

    docs = spark.read.parquet(f"{SF}/documents.parquet").where(F.col("doc_id") < 100)
    plan = _plan(minhash_candidates(docs, num_hashes=16, bands=4))
    assert "CartesianProduct" not in plan, plan


def test_diff_uses_sort_merge_join_on_key(spark):
    from lakefs_spark.operators.diff import diff

    a = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.md5(F.col("o_orderkey").cast("string")).alias("identity"),
        F.lit("a").alias("address"),
        F.lit("RELATIVE").alias("address_type"),
        F.lit(1).cast("long").alias("size"),
        F.lit("e").alias("etag"),
        F.lit(None).cast("timestamp").alias("last_modified"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit("t").alias("content_type"),
    )
    b = a.withColumn("identity", F.md5(F.concat(F.col("identity"), F.lit("x"))))
    plan = _plan(diff(a, b))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_whole_stage_codegen_covers_text_features(spark):
    """Text quality features stay JVM-side inside WholeStageCodegen —
    no Python UDF (BatchEvalPython/ArrowEvalPython) in the plan."""
    from lakefs_spark.operators.text import quality_features

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(quality_features(docs))
    # codegen'd operators print with the '*(stage)' star marker
    assert plan.lstrip().startswith("*(") or "WholeStageCodegen" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_simhash_is_python_free_single_aggregation(spark):
    """SimHash (md5-digit bits) must stay JVM-side: no Python eval
    nodes, and exactly one aggregation (partial+final over one shuffle)."""
    from lakefs_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(simhash(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_minhash_signatures_python_free(spark):
    """The affine minhash family is arithmetic over one md5 base hash —
    no Python eval nodes may appear."""
    from lakefs_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet").where(F.col("doc_id") < 50)
    plan = _plan(minhash_signatures(docs, num_hashes=16))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_range_write_manifest_agg_partial_combines(spark, tmp_path):
    """The manifest aggregation re-reads the chunk files just written
    (write_ranges_prechunked does not persist — caching the full-width
    post-shuffle rows would spill ~data size to disk per commit). The
    content address hashes EVERY persisted column (the reference's
    SSTable id covers the file's actual bytes — a range differing only
    in an entry's physical address must not collapse), so the re-read
    is full-width by design; the scale property that must hold is
    map-side PARTIAL aggregation, so only O(1)-state per-chunk partials
    cross the exchange."""
    df = spark.range(500).select(
        (F.col("id") % 5).alias("chunk_idx"),
        F.col("id").cast("string").alias("key"),
        F.md5(F.col("id").cast("string")).alias("identity"),
        F.lit(7).cast("long").alias("size"),
        F.md5(F.col("id").cast("string")).alias("etag"),
    )
    out = str(tmp_path / "chunks")
    df.repartition("chunk_idx").write.partitionBy("chunk_idx").parquet(out)
    written = spark.read.parquet(out)
    agg = written.groupBy("chunk_idx").agg(
        F.bit_xor(F.xxhash64(F.concat("key", "identity", "etag"))).alias("x0"),
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
        F.count(F.lit(1)).alias("count"),
        F.sum("size").alias("estimated_size"),
    )
    plan = _plan(agg)
    # partial agg below the Exchange: only per-chunk partials shuffle
    # (SortAggregate — string min/max buffers are not hash-agg eligible)
    assert "partial_bit_xor" in plan.split("Exchange")[1], plan


def test_asof_join_is_single_shuffle_no_cartesian(spark):
    """The as-of merge-scan must plan one Exchange on the join key and
    never a cartesian/theta join."""
    from lakefs_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", "ts"
    )
    right = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    plan = _plan(asof_join(left, right, on=["user_id"]))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # union sides coalesce into one shuffle + AQE reads


def test_range_join_is_equi_join_not_theta(spark):
    """The bucketized range join must plan as a hash/sort-merge
    equi-join — never BroadcastNestedLoopJoin/CartesianProduct."""
    from lakefs_spark.operators.rangejoin import range_join

    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("bal")
    )
    supp = spark.read.parquet(f"{SF}/supplier.parquet").select(
        "s_suppkey", F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("lo"), (F.col("s_acctbal") + 500.0).alias("hi"),
    )
    plan = _plan(range_join(cust, supp, on=["nationkey"], point_col="bal",
                            lo_col="lo", hi_col="hi", bucket_width=512.0))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_vocab_topk_plans_take_ordered(spark):
    """vocab_stats' top-k must plan TakeOrderedAndProject — never a
    global single-partition window/sort."""
    from lakefs_spark.operators.text import vocab_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(vocab_stats(docs, top_k=50))
    assert "TakeOrderedAndProject" in plan, plan


def test_pii_signals_python_free_codegen(spark):
    """PII extraction is one fused JVM projection: no Python eval
    nodes, no Exchange (pure scan+project)."""
    from lakefs_spark.operators.pipeline import pii_signals

    docs = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id as id", "text"
    )
    plan = _plan(pii_signals(docs, id_col="id"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_passage_dedup_single_distinct_agg(spark):
    """Passage dedup is explode + one distinct-aggregate: no Python,
    no cartesian, and at most the two Exchanges a count-distinct agg
    plans (partial on (hash, doc), final on hash)."""
    from lakefs_spark.operators.pipeline import passage_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(passage_dedup(docs, w=3, min_docs=2))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_pack_sequences_one_arrow_stage_on_shard(spark):
    """Sequence packing is exactly one Arrow-grouped stage keyed by
    shard: one FlatMapGroupsInPandas over one Exchange — the text
    column must NOT flow into the Python worker."""
    from lakefs_spark.operators.pipeline import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(pack_sequences(docs, budget=512, n_shards=8))
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "text" not in plan.split("FlatMapGroupsInPandas")[1].splitlines()[0], plan


def test_stratified_sample_broadcasts_rates(spark):
    """The per-group rate frame must broadcast; the corpus side joins
    without a shuffle of its own (no SortMergeJoin on the scan)."""
    from lakefs_spark.operators.pipeline import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(stratified_sample(docs, "lang"))
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_label_centroids_single_aggregation(spark):
    """Centroids: posexplode + ONE hash aggregation (partial+final over
    a single Exchange), all JVM-side."""
    from lakefs_spark.operators.similarity import label_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(label_centroids(emb))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_bucketed_export_joins_without_exchange(spark, tmp_path):
    """Two snapshots exported with the same bucketing must sort-merge
    join with ZERO Exchange — the co-located-join contract that makes
    repeated snapshot joins free at scale."""
    import pyspark.sql.functions as F

    from lakefs_spark.operators.export import export_bucketed_table
    from lakefs_spark.sources.fixtures import create_fixture_views, entries_view
    from tests.conftest import SF_SMOKE

    create_fixture_views(spark, SF_SMOKE)
    ents = entries_view(spark, "entries").select("key", "identity", "size")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        export_bucketed_table(ents, "bkt_a", buckets=4)
        export_bucketed_table(
            ents.withColumn("size", F.col("size") + 1), "bkt_b", buckets=4
        )
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "key")
        j.count()
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists bkt_a")
        spark.sql("drop table if exists bkt_b")


def test_pq_codes_single_projection_no_exchange(spark):
    """PQ encoding is ONE shuffle-free scan: the folded argmin
    projections + posexplode add no Exchange."""
    from lakefs_spark.operators.similarity import pq_codes
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    plan = _plan(pq_codes(emb))
    assert "Exchange" not in plan, plan


def test_pq_topk_no_pivot_roundtrip(spark):
    """PQ/ADC search computes the wide code columns directly (n_sub
    folded argmin projections) instead of exploding pq_codes to long
    form and pivoting back — exactly one Exchange (the per-query
    top-k window) and zero aggregates in the whole plan."""
    import pyspark.sql.functions as F

    from lakefs_spark.operators.similarity import pq_topk
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4)
    plan = _plan(pq_topk(q, emb))
    assert plan.count("Exchange") == 1, plan
    assert "HashAggregate" not in plan, plan


def test_ivfpq_corpus_side_shuffles_only_for_topk(spark):
    """IVFPQ's corpus side (coarse id + codes + ADC scores) stays
    shuffle-free until the per-query top-k window — exactly one
    Exchange (hash on qa) in the whole plan."""
    import pyspark.sql.functions as F

    from lakefs_spark.operators.similarity import ivfpq_topk
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4)
    plan = _plan(ivfpq_topk(q, emb))
    assert plan.count("Exchange") == 1, plan


def test_gc_mark_single_aggregation_one_exchange(spark):
    """GC mark is ONE hash aggregation over the tagged union of the
    listing and the (raw, duplicated) committed/uncommitted address
    streams: exactly one Exchange in the plan, partial aggregation
    below it collapsing snapshot-shared duplicates map-side, and no
    join operator anywhere — the two-anti-join shape paid a distinct
    shuffle plus a join shuffle and bent the 100x scale curve."""
    from lakefs_spark.operators.gc import gc_mark

    listing = spark.range(0, 1000).select(
        F.concat(F.lit("data/g1/"), F.md5(F.col("id").cast("string"))).alias("address")
    )
    committed = spark.range(0, 2700).select(
        F.concat(F.lit("data/g1/"), F.md5((F.col("id") % 900).cast("string"))).alias(
            "address"
        )
    )
    plan = _plan(gc_mark(listing, committed))
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "BatchEvalPython" not in plan, plan
    assert "partial_max" in plan or "HashAggregate" in plan, plan


def test_commit_apply_overlay_is_broadcast_anti_join(spark):
    """The COW overlay (commit-apply step 3) must not shuffle or sort
    the touched base rows: the deduped change stream turns layer
    precedence into an anti-join whose small (change-key) side
    broadcasts, and the surviving change rows union in plan-side. A
    regression back to the window-over-union shape re-introduces a
    full shuffle+sort of every touched range's payload per commit."""
    from lakefs_spark.storage.commit_apply import cow_overlay
    from lakefs_spark.schema import ENTRY_COLS

    def entries(n, tag):
        return spark.range(0, n).select(
            F.concat(F.lit("k/"), F.lpad("id", 8, "0")).alias("key"),
            F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))).alias("identity"),
            F.md5(F.concat(F.lit("a"), "id")).alias("address"),
            F.lit("RELATIVE").alias("address_type"),
            F.col("id").alias("size"),
            F.md5(F.concat(F.lit("e"), "id")).alias("etag"),
            F.lit(None).cast("timestamp").alias("last_modified"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.lit("application/octet-stream").alias("content_type"),
        )

    base = entries(5000, "b")
    changes = entries(50, "c").select(
        (F.col("size") % 7 == 0).alias("is_tombstone"), *ENTRY_COLS
    )
    plan = _plan(cow_overlay(base, changes))
    assert "LeftAnti" in plan, plan
    assert "BroadcastExchange" in plan, plan
    # no data shuffle, no window, no sort of the base payload
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Window" not in plan and "Sort " not in plan, plan


def test_unigram_nll_fixed_vocab_broadcasts(spark):
    """The unigram-LM scorer must keep its vocabulary bounded and
    broadcast: the top-K cut plans TakeOrdered (never a global sort)
    and the vocab joins back onto the token stream via a broadcast
    hash join — no cartesian product, no Python."""
    from lakefs_spark.operators.text import unigram_nll

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(unigram_nll(docs, vocab_size=64))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan, plan


def test_prototypicality_broadcasts_centroids(spark, emb):
    """The prototypicality score joins each exploded vector dim to its
    label centroid via a broadcast hash join (the centroid side is
    |labels| x dim rows), aggregates dot/norms with map-side partial
    sums, and sorts only inside the per-label rank window — no
    cartesian product, no Python."""
    from lakefs_spark.operators.similarity import prototypicality

    plan = _plan(prototypicality(emb))
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_sum" in plan, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan, plan


def test_quality_score_python_free_no_exchange(spark):
    """The fixed-weight logistic quality filter is ONE fused JVM
    projection over the scan: no Python eval nodes, no Exchange."""
    from lakefs_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(quality_score(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_token_fertility_single_aggregation(spark):
    """Per-language fertility: one partial+final aggregation pair over
    one exchange, all JVM."""
    from lakefs_spark.operators.text import token_fertility

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(token_fertility(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # one exchange (+AQE read)
    assert plan.count("HashAggregate") == 2, plan


def test_doc_chunks_no_shuffle_no_python(spark):
    """Overlapping chunking is a projection + generator — chunk
    parallelism equals input parallelism, nothing crosses to Python."""
    from lakefs_spark.operators.pipeline import doc_chunks

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(doc_chunks(docs, size=32, stride=24))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Generate" in plan, plan  # the posexplode


def test_plans_md_not_stale():
    """PLANS.md must match a fresh `tools/gen_plans.py` run — the plan
    audit is the cheapest drift detector the repo has, so regenerating
    it can never be forgotten again (round-7 verdict hygiene ask). The
    generator normalizes temp paths / plan ids, so the artifact is
    byte-reproducible; this runs it in a subprocess for a fresh,
    deterministic Spark session."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "gen_plans.py")],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    with open(os.path.join(root, "PLANS.md")) as f:
        committed = f.read()
    assert out.stdout == committed, (
        "PLANS.md is stale — regenerate with "
        "`python tools/gen_plans.py > PLANS.md` and commit the diff"
    )


def test_substring_spans_no_cartesian_python_free(spark):
    """ExactSubstr spans (round 10): duplication detection is a window
    aggregation on the window text and span merging is gaps-and-islands
    on (doc, pos) — no cartesian product, no self-join blowup, no
    Python in the row path (pure explode/transform + windows)."""
    from lakefs_spark.operators.dedup import duplicated_window_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet").where(F.col("doc_id") < 100)
    plan = _plan(duplicated_window_spans(docs, n=8))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas", "MapInPandas"):
        assert marker not in plan, plan


def test_dsir_corpus_join_is_broadcast_hash(spark):
    """DSIR (round 10): the corpus-side scoring join must broadcast the
    (<= n_buckets)-row weight table as a HASH join; the only
    nested-loop in the plan is the one-row totals broadcast (the same
    sanctioned shape as sampling_weights'), and no Python touches the
    row path."""
    from lakefs_spark.operators.pipeline import dsir_importance

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tgt = docs.where(F.col("source") == "src0")
    plan = _plan(dsir_importance(docs, tgt, n_buckets=512))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_dsir_select_is_take_ordered_not_global_sort(spark):
    """dsir_select must plan the top-k as TakeOrderedAndProject
    (per-partition heaps); the rank window may only run AFTER the
    limit, over k rows — a global-order row_number over the whole
    corpus would single-partition the sort at scale."""
    from lakefs_spark.operators.pipeline import dsir_select

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tgt = docs.where(F.col("source") == "src0")
    plan = _plan(dsir_select(docs, tgt, k=50, n_buckets=512))
    assert "TakeOrderedAndProject" in plan, plan
