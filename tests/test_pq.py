"""Product quantization + ListObjects V1 unit tests (gate-independent).

The driver gates hash these against DuckDB; these tests pin the
operator-level invariants that survive refactors: code ranges, exact
self-retrieval, page disjointness/completeness of marker paging.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakefs_spark.operators import similarity as SIM
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_pq_codes_shape_and_range(spark):
    emb = _emb(spark)
    n_vec = emb.count()
    codes = SIM.pq_codes(emb)
    rows = codes.collect()
    assert len(rows) == n_vec * 4, "one code per (vector, subspace)"
    cids = {cid for cid, _ in SIM.pq_codebooks(emb)[0]}
    assert all(r["code"] in cids for r in rows), "codes must be centroid ids"
    assert {r["m"] for r in rows} == {0, 1, 2, 3}


def test_pq_codebook_vectors_encode_to_themselves(spark):
    """A vector that IS a centroid must pick itself in every subspace
    (its L2 distance to itself is 0, and ties break to min cid only
    among exact duplicates)."""
    emb = _emb(spark)
    codes = SIM.pq_codes(emb)
    cids = [cid for cid, _ in SIM.pq_codebooks(emb)[0]]
    cents = codes.where(F.col("vec_id").isin(cids))
    mismatches = cents.where(F.col("code") != F.col("vec_id")).collect()
    # identical subvectors across centroids are legal (tie -> min cid);
    # verify any mismatch is an exact subvector duplicate
    if mismatches:
        books = SIM.pq_codebooks(emb)
        for r in mismatches:
            m, got, want = int(r["m"]), int(r["code"]), int(r["vec_id"])
            sub = dict(books[m])
            assert sub[got] == sub[want], f"non-duplicate mismatch {r}"


def test_pq_topk_finds_exact_duplicate(spark):
    """Duplicate a query vector under a new id: ADC must rank the twin
    in the query's top-k (identical codes => identical ADC score)."""
    emb = _emb(spark)
    twin = emb.where(F.col("vec_id") == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(twin)
    q = emb.where(F.col("vec_id") == 0)
    got = {(r["qa"], r["qb"]) for r in SIM.pq_topk(q, corpus, k=5).collect()}
    assert (0, 100000) in got


def test_codebook_is_fixed_k_regardless_of_corpus_rows(spark):
    """The VERDICT r4 scale fix: codebook size is exactly K however
    large the corpus — the hash-ranked sample replaces the every-Nth
    rule whose K grew linearly with rows."""
    emb = _emb(spark)
    small = emb.limit(120)
    big = emb.unionByName(emb.withColumn("vec_id", F.col("vec_id") + 100000))
    for corpus in (small, emb, big):
        rows = SIM._codebook_rows(corpus, 16)
        assert len(rows) == 16
    # deterministic: same corpus -> same codebook, and K caps at corpus size
    assert SIM._codebook_rows(emb, 16) == SIM._codebook_rows(emb, 16)
    assert len(SIM._codebook_rows(emb.limit(5), 16)) == 5
    # membership is the md5-ranked prefix (what the oracle restates)
    import hashlib

    ids = [int(r["vec_id"]) for r in emb.select("vec_id").collect()]
    want = sorted(sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:16])
    assert [cid for cid, _ in SIM._codebook_rows(emb, 16)] == want


def test_assign_centroids_broadcast_path_matches_fold(spark, monkeypatch):
    """K > FOLD_MAX_K switches assignment to the broadcast-join +
    window plan; both paths must produce identical (id, cid) pairs
    (including the sim-desc, cid-asc tie-break)."""
    emb = _emb(spark).select(
        F.col("vec_id").alias("qb"), F.col("embedding").alias("vb")
    )
    cents = SIM._normalize_codebook(SIM._codebook_rows(_emb(spark), 40))
    folded = {
        (r["qb"], r["cid"])
        for r in SIM.assign_centroids(emb, "qb", "vb", cents).collect()
    }
    monkeypatch.setattr(SIM, "FOLD_MAX_K", 8)  # force the join path
    joined = {
        (r["qb"], r["cid"])
        for r in SIM.assign_centroids(emb, "qb", "vb", cents).collect()
    }
    assert folded == joined


def test_list_objects_v1_pages_partition_the_listing(spark, tmp_path):
    from lakefs_spark.catalog import Catalog
    from lakefs_spark.sources.fixtures import create_fixture_views, entries_view
    from lakefs_spark.storage.repo import Repository

    create_fixture_views(spark, SF_SMOKE)
    repo = Repository.create(spark, str(tmp_path / "repo"))
    repo.raggedness = 97
    repo.import_entries(
        "main", entries_view(spark, "entries").where("key like 'tables/orders/b1/%'"),
        message="seed",
    )
    cat = Catalog(repo)
    keys = []
    marker = ""
    pages = 0
    while True:
        resp = cat.list_objects_v1("main", prefix="", max_keys=7, marker=marker)
        batch = [f["Key"] for f in resp["Contents"]]
        assert len(batch) <= 7
        if marker:
            assert all(k > marker for k in batch), "marker is exclusive"
        keys += batch
        pages += 1
        # no delimiter => NextMarker never present (ListV1/S3 parity);
        # clients resume from the last Contents key
        assert "NextMarker" not in resp
        if not resp["IsTruncated"]:
            break
        marker = batch[-1]
    assert pages > 1, "test should exercise multiple pages"
    assert keys == sorted(keys) and len(keys) == len(set(keys))
    flat = cat.list_objects_v2("main", prefix="", max_keys=100000)
    assert keys == [f["Key"] for f in flat["Contents"]]
