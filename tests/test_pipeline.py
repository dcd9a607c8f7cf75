"""Unit tests for operators/pipeline.py (corpus-preparation operators).

The oracle-parity sweep (tests/test_oracle_parity.py + the driver gate)
covers value equality vs DuckDB; these tests pin the operator
invariants that SQL parity alone can't express (greedy packing
feasibility, window coverage, band monotonicity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakefs_spark.operators import pipeline as P
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_pii_signals_counts_and_redaction(spark):
    rows = [
        (1, "reach me at bob@example.com or 10.1.2.3"),
        (2, "call 12-345-678-9012 twice 12-345-678-9012"),
        (3, "nothing to see here"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in P.pii_signals(df, id_col="id").collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 0)
    assert out[1]["has_pii"] and out[1]["redacted_len"] == len("reach me at <EMAIL> or <IP>")
    assert out[2]["n_phone"] == 2 and out[2]["redacted_len"] == len("call <PHONE> twice <PHONE>")
    assert not out[3]["has_pii"] and out[3]["redacted_len"] == len(rows[2][1])
    assert out[4]["redacted_len"] == 0


def test_sampling_weights_sum_to_one(spark):
    out = P.sampling_weights(_docs(spark), "lang", alpha=0.7, budget=1000).collect()
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-4
    # alpha<1 upsamples the tail: every group's weight exceeds its raw share
    n_total = sum(r["n_docs"] for r in out)
    smallest = min(out, key=lambda r: r["n_docs"])
    assert smallest["weight"] > smallest["n_docs"] / n_total


def test_pack_sequences_greedy_invariants(spark):
    budget = 128
    out = P.pack_sequences(_docs(spark), budget=budget, n_shards=4).collect()
    assert len(out) == _docs(spark).count()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        seq, fill = 0, 0
        for r in rows:
            assert r["doc_id"] % 4 == shard
            t = r["n_tokens"]
            if fill and fill + t > budget:
                seq, fill = seq + 1, t
            else:
                fill += t
            # replayed greedy state must match the operator's output
            assert (r["seq_id"], r["seq_fill"]) == (seq, fill)
            # a sequence never exceeds the budget unless it holds a
            # single oversized document
            assert r["seq_fill"] <= budget or r["seq_fill"] == t


def test_passage_windows_cover_every_token(spark):
    docs = _docs(spark).limit(50)
    p = P.passage_windows(docs, w=3)
    # re-joining a doc's passages in win_idx order reconstructs it
    rebuilt = (
        p.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("win_idx", "passage"))),
                    lambda s: s["passage"],
                ),
                " ",
            ).alias("text2")
        )
    )
    joined = docs.join(rebuilt, "doc_id").where(F.col("text") != F.col("text2"))
    assert joined.count() == 0


def test_passage_dedup_thresholds(spark):
    docs = _docs(spark)
    dup = P.passage_dedup(docs, w=3, min_docs=2)
    assert dup.where(F.col("n_docs") < 2).count() == 0
    assert dup.where(F.col("n_occurrences") < F.col("n_docs")).count() == 0


def test_boilerplate_strip_bounds(spark):
    out = P.boilerplate_strip(_docs(spark), w=3, boiler_min_docs=3)
    bad = out.where(
        (F.col("n_boiler") > F.col("n_windows"))
        | (F.col("clean_ratio") < 0)
        | (F.col("clean_ratio") > 1)
        | (F.col("clean_tokens") < 0)
    )
    assert bad.count() == 0
    # the corpus-wide repeated tail must exist at this threshold
    assert out.where(F.col("n_boiler") > 0).count() > 0


def test_band_filter_trims_both_tails(spark):
    docs = _docs(spark)
    out = P.band_filter(docs, "n_chars", 0.25, 0.75)
    n = docs.count()
    kept = out.where("in_band").count()
    # central band holds roughly half the corpus, and extremes are out
    assert 0.4 * n <= kept <= 0.65 * n
    lo = out.orderBy("value").first()
    hi = out.orderBy(F.col("value").desc()).first()
    assert not lo["in_band"] and not hi["in_band"]


def test_stratified_sample_tracks_budgets(spark):
    docs = _docs(spark)
    out = P.stratified_sample(docs, "lang", alpha=0.7, budget=200)
    assert out.count() == docs.count()
    # kept counts land near each group's budget (hash-uniformity bound)
    w = {r["lang"]: r for r in P.sampling_weights(docs, "lang", 0.7, 200).collect()}
    kept = {r["lang"]: r["n"] for r in
            out.where("is_kept").groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, rec in w.items():
        target = min(rec["budget_docs"], rec["n_docs"])
        assert abs(kept.get(lang, 0) - target) <= max(5, 0.5 * target), (lang, kept.get(lang), target)


def test_label_centroids_shape(spark):
    from lakefs_spark.operators.similarity import label_centroids

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = label_centroids(emb)
    dims = emb.selectExpr("size(embedding) d").distinct().collect()[0]["d"]
    labels = emb.select("label").distinct().count()
    assert out.count() == dims * labels
    # every (label, dim) carries that label's full vector count
    bad = out.join(
        emb.groupBy(F.col("label").cast("long").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_expect")),
        "label",
    ).where(F.col("n_vectors") != F.col("n_expect"))
    assert bad.count() == 0


def test_passage_windows_edge_cases(spark):
    rows = [(1, ""), (2, "one"), (3, "a b c"), (4, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = P.passage_windows(df, w=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["win_idx"], r["passage"]))
    # empty text -> split yields [""], one empty passage (doc survives)
    assert got[1] == [(0, "")]
    assert got[2] == [(0, "one")]
    assert got[3] == [(0, "a b c")]
    # short tail window keeps the remainder
    assert sorted(got[4]) == [(0, "a b c"), (1, "d")]


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    rows = [(0, "a " * 600), (8, "b"), (16, "c")]  # same shard (mod 8)
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], "doc_id long, text string")
    out = sorted(P.pack_sequences(df, budget=512, n_shards=8).collect(),
                 key=lambda r: r["doc_id"])
    # oversized first doc occupies bin 0 alone; the next doc opens bin 1
    assert out[0]["seq_id"] == 0 and out[0]["n_tokens"] == 600
    assert out[1]["seq_id"] == 1 and out[2]["seq_id"] == 1


def test_doc_chunks_overlap_and_coverage(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y"), (3, "p q r s t")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk"])
        for r in P.doc_chunks(docs, size=5, stride=3).collect()
    }
    # doc 1: 8 tokens -> starts 0 and 3; the second window reaches the end
    assert rows[(1, 0)] == (5, "a b c d e")
    assert rows[(1, 1)] == (5, "d e f g h")
    # doc 2: shorter than size -> one whole-doc chunk
    assert rows[(2, 0)] == (2, "x y")
    # doc 3: exactly size -> one chunk
    assert rows[(3, 0)] == (5, "p q r s t")
    assert len(rows) == 4
    # consecutive chunks share size - stride tokens
    a, b = rows[(1, 0)][1].split(" "), rows[(1, 1)][1].split(" ")
    assert a[-2:] == b[:2]


def test_bloom_decontaminate_matches_exact_semi_join(spark):
    from lakefs_spark.operators.text import bloom_decontaminate, contamination_scores

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    train = docs.where(F.col("doc_id") < 40)
    ev = docs.where(F.col("doc_id") >= 40)
    bl = {
        r["doc_id"]: (r["n_sh"], r["n_candidates"], r["n_exact"])
        for r in bloom_decontaminate(train, ev).collect()
    }
    ex = {
        r["doc_id"]: (r["n_sh"], r["n_hit"])
        for r in contamination_scores(train, ev).collect()
    }
    assert set(bl) == set(ex)
    for did, (n_sh, n_cand, n_exact) in bl.items():
        # no false negatives: exact hits agree with the plain semi-join,
        # and the Bloom candidate set contains every exact hit
        assert (n_sh, n_exact) == ex[did]
        assert n_cand >= n_exact


def test_bloom_decontaminate_probe_is_broadcast_only(spark):
    from lakefs_spark.operators.text import bloom_decontaminate

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    df = bloom_decontaminate(
        docs.where(F.col("doc_id") < 40), docs.where(F.col("doc_id") >= 40)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # the k probe joins


def test_shingles_short_docs_yield_zero_not_crash(spark):
    """Review regression: a doc with fewer than n tokens must produce
    ZERO shingles (sequence(1,0) used to descend and slice(…,0,…)
    crashed the stage — one short doc killed every dedup operator)."""
    from lakefs_spark.operators.dedup import shingles

    docs = spark.createDataFrame(
        [(1, "just two"), (2, "one"), (3, "a b c d")], "doc_id long, text string"
    )
    rows = shingles(docs, n=3).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert {r["shingle"] for r in rows} == {"a b c", "b c d"}


def test_stopword_hits_adjacent_repeats_and_case(spark):
    """Review regressions: adjacent repeated stopwords each count
    (space-doubling), and matching is case-insensitive."""
    from lakefs_spark.operators.text import quality_features, stopword_hits

    docs = spark.createDataFrame(
        [(1, "the the the"), (2, "THE QUICK BROWN FOX"), (3, "The end of The road")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", stopword_hits(F.col("text")).alias("h")).collect()
    }
    assert got[1] == 3          # was 2 under single-space padding
    assert got[2] == 1          # 'THE' counts case-insensitively
    assert got[3] == 3          # The, of, The
    qf = {r["doc_id"]: r["alpha_ratio"] for r in quality_features(docs).collect()}
    assert qf[2] > 0.7          # all-caps text is alphabetic


def test_simhash_bands_guard_and_minhash_divisibility(spark):
    import pytest as _pytest

    from lakefs_spark.operators.dedup import minhash_bands, simhash_near_dups

    sigs = spark.createDataFrame([(1, 0), (2, 3)], "doc_id long, simhash long")
    with _pytest.raises(ValueError, match="bands"):
        simhash_near_dups(sigs, bands=1)
    with _pytest.raises(ValueError, match="bands"):
        simhash_near_dups(sigs, bands=7)
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="divisible"):
        minhash_bands(docs, num_hashes=10, bands=3)


def test_pq_dim_divisibility_guard(spark):
    import pytest as _pytest

    from lakefs_spark.operators.similarity import pq_codebooks

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with _pytest.raises(ValueError, match="divisible"):
        pq_codebooks(emb, n_sub=7, dim=64)


def test_band_filter_decides_on_rounded_bounds(spark):
    docs = spark.createDataFrame(
        [(i, i) for i in range(1, 101)], "doc_id long, n_chars long"
    )
    rows = P.band_filter(docs, "n_chars", 0.05, 0.95).collect()
    for r in rows:
        assert r["in_band"] == (r["q_lo"] <= r["value"] <= r["q_hi"]), r


def test_duplicated_window_spans_semantics(spark):
    """ExactSubstr spans (round 10): shared runs merge into maximal
    spans, same-doc repeats count as duplication, short/clean docs
    produce nothing, and the stats roll-up never double-counts."""
    from lakefs_spark.operators import dedup as D

    rows = [
        (1, "a b c d e f g h i j u1 u2"),     # shares a..j with doc 2
        (2, "a b c d e f g h i j v1 v2"),
        (3, "z y x w v u t s r q p o"),        # clean
        (4, "m m m m m m m m m m m m m m m m"),  # self-repeating
        (5, "too short"),                        # < n tokens: no windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"], r["span_tokens"])
        for r in D.duplicated_window_spans(df, n=8).collect()
    }
    # windows at positions 0-2 of docs 1/2 match pairwise -> span [0,10)
    assert spans == {(1, 0, 10, 10), (2, 0, 10, 10), (4, 0, 16, 16)}
    stats = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["total_tokens"], r["dup_ratio"])
        for r in D.substring_dedup_stats(df, n=8).collect()
    }
    assert stats[1] == (1, 10, 12, 0.833333)
    assert stats[3] == (0, 0, 12, 0.0)
    assert stats[4] == (1, 16, 16, 1.0)
    assert stats[5] == (0, 0, 2, 0.0)


def test_dsir_importance_upweights_target_like_docs(spark):
    """DSIR (round 10): corpus docs sharing the target exemplars'
    n-gram profile must outscore the rest; ranking is deterministic
    (rounded weight desc, doc_id tie-break); feature-less docs score 0
    with n_feats 0."""
    from lakefs_spark.operators.pipeline import dsir_importance, dsir_select

    rows = [
        (1, "alpha beta gamma delta alpha beta", "t"),
        (2, "alpha beta gamma epsilon beta gamma", "t"),
        (3, "alpha gamma beta delta gamma", "c"),      # target-like
        (4, "zeta eta theta iota kappa lambda", "c"),  # disjoint vocab
        (5, "", "c"),                                   # no features
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    from pyspark.sql import functions as F

    tgt = df.where(F.col("kind") == "t")
    imp = {r["doc_id"]: r for r in dsir_importance(df, tgt, n_buckets=256).collect()}
    assert set(imp) == {1, 2, 3, 4, 5}
    assert imp[3]["log_weight"] > imp[4]["log_weight"]
    assert imp[5]["n_feats"] == 0 and imp[5]["log_weight"] == 0.0
    # unigrams + bigrams: 6 tokens -> 6 + 5 features
    assert imp[4]["n_feats"] == 11
    sel = dsir_select(df, tgt, k=3, n_buckets=256).collect()
    assert [r["rank"] for r in sel] == [1, 2, 3]
    weights = [r["log_weight"] for r in sel]
    assert weights == sorted(weights, reverse=True)
    assert 4 not in {r["doc_id"] for r in sel}


def test_duplicated_window_spans_random_cross_check(spark):
    """Randomized pin: the relational ExactSubstr pipeline must agree
    with an independent pure-Python reference (dict-count windows,
    then merge islands) on random small corpora — 3 fixed seeds."""
    import random

    from lakefs_spark.operators import dedup as D

    n = 5
    for seed in (11, 23, 47):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40))))
            for i in range(30)
        ]
        # reference: count every n-window, mark positions, merge islands
        from collections import Counter

        wins = {}
        cnt = Counter()
        for did, text in docs:
            toks = text.split(" ")
            ps = []
            for p in range(len(toks) - n + 1):
                w = " ".join(toks[p : p + n])
                cnt[w] += 1
                ps.append((p, w))
            wins[did] = ps
        expected = set()
        for did, ps in wins.items():
            dup = [p for p, w in ps if cnt[w] >= 2]
            if not dup:
                continue
            start = prev = dup[0]
            for p in dup[1:]:
                if p - prev > n:
                    expected.add((did, start, prev + n, prev + n - start))
                    start = p
                prev = p
            expected.add((did, start, prev + n, prev + n - start))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["doc_id"], r["start_tok"], r["end_tok"], r["span_tokens"])
            for r in D.duplicated_window_spans(df, n=n).collect()
        }
        assert got == expected, f"seed {seed}: {got ^ expected}"


def test_cut_duplicated_spans_action(spark):
    """The ExactSubstr cut: span tokens removed, clean docs verbatim,
    fully-duplicated docs come back empty; n_kept + n_removed always
    equals the doc's token count."""
    from lakefs_spark.operators import dedup as D

    rows = [
        (1, "a b c d e f g h i j u1 u2"),
        (2, "a b c d e f g h i j v1 v2"),
        (3, "z y x w v u t s r q p o"),
        (4, "m m m m m m m m m m m m m m m m"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.cut_duplicated_spans(df, n=8).collect()}
    assert out[1]["clean_text"] == "u1 u2" and out[1]["n_removed"] == 10
    assert out[3]["clean_text"] == rows[2][1] and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0
    for did, text in rows:
        assert out[did]["n_kept"] + out[did]["n_removed"] == len(text.split(" "))


def test_incremental_minhash_candidates_equals_filtered_full(spark):
    """Dedup-on-commit: the incremental candidate set must equal the
    full all-pairs candidate set restricted to pairs touching a new
    doc — and old×old pairs must never appear."""
    from pyspark.sql import functions as F

    from lakefs_spark.operators import dedup as D

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where(F.col("doc_id") < 200)
    )
    new_ids = spark.createDataFrame([(i,) for i in range(0, 200, 7)], "doc_id long")
    inc = {
        (r["id_a"], r["id_b"])
        for r in D.incremental_minhash_candidates(
            docs, new_ids, num_hashes=32, bands=8
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidates(docs, num_hashes=32, bands=8).collect()
    }
    newset = set(range(0, 200, 7))
    expected = {p for p in full if p[0] in newset or p[1] in newset}
    assert inc == expected
    assert all(p[0] in newset or p[1] in newset for p in inc)
