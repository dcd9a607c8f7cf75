"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(n_queries * n_corpus),
fine when the query set is small or broadcastable. Scale path: LSH
bucketing (random-hyperplane signs) — candidates share a bucket, so
the join is an equi-join on (bucket), not a cross join; probing
multiple hyperplane tables trades recall for cost. An IVF-style
variant (coarse k-means centroids) would slot into the same shape;
the deterministic hyperplane LSH avoids an iterative training step.

Dot products run as JVM higher-order functions (zip_with + aggregate)
in double precision — no Python UDF in the hot path. For very wide
vectors a Pandas-UDF BLAS path can be swapped in per-batch; at 64-dim
the codegen'd fold wins on serialization alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _round_half_up(x: float, ndigits: int) -> float:
    """Round half AWAY from zero — the semantics of Spark's F.round and
    DuckDB's round(), unlike Python's built-in (half-to-even). Used for
    driver-side constants that must hash-match the SQL oracle."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _sql_d(x: float) -> str:
    """Exact SQL double literal: ``repr`` emits the shortest decimal
    that round-trips, and Spark's parser (Double.parseDouble) is
    correctly rounded — so the JVM-side double is bit-identical to the
    Python one. Non-finite values take the cast('...') spelling the
    parser accepts."""
    import math

    x = float(x)
    if math.isinf(x):
        return "cast('Infinity' as double)" if x > 0 else "cast('-Infinity' as double)"
    if math.isnan(x):
        return "cast('NaN' as double)"
    return repr(x) + "D"


def _lit_double_array(vals: list[float]) -> Column:
    """array<double> literal built as ONE parsed SQL expression.

    ``F.array(*[F.lit(x) ...])`` costs one py4j round-trip per scalar
    (~1 ms each); a folded codebook is thousands of scalars, so plan
    CONSTRUCTION — pure driver time, before any job — was dominating
    the ANN operators. One ``F.expr`` string is parsed JVM-side in
    microseconds per element and yields bit-identical literals
    (guide §5: keep the driver out of the hot path)."""
    return F.expr("array(" + ",".join(_sql_d(v) for v in vals) + ")")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _fill_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition a pairwise-join STREAM side up to the
    cluster's default parallelism when its scan yields fewer splits
    (guide §2.6 — stragglers and idle capacity).

    The O(n_q * n_c) pair evaluation above a broadcast join inherits
    the stream side's partitioning, and a small corpus often arrives
    as one single-row-group parquet file = ONE task doing ALL the n²
    work while every other core idles. The exchange this adds moves
    only the corpus rows (O(n_c)) — strictly dominated by the O(n²)
    work it fans out. Scale-adaptive by construction: a corpus big
    enough to matter already scans as >= defaultParallelism splits and
    this is a NO-OP (no exchange in the plan). Row placement, not
    values, changes — the pair set and every double are identical."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def cosine_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, corpus) cosine pairs: (qa, qb, sim).

    Broadcast the query side — corpus streams through unshuffled when
    its scan already fills the cluster (see ``_fill_parallelism``).
    """
    # Norms are hoisted into the per-row projections BELOW the join
    # (guide §1.2 per-task work): inlining cosine() in the post-join
    # select re-evaluates BOTH norms per PAIR — O(n_q * n_c) aggregate
    # passes over the vectors instead of O(n_q + n_c). The division
    # consumes the identical double values in the identical order, so
    # results are bit-equal to the inlined form.
    q = queries.select(
        F.col(id_col).alias("qa"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    c = _fill_parallelism(
        corpus.select(
            F.col(id_col).alias("qb"),
            F.col(vec_col).alias("vb"),
            _norm(F.col(vec_col)).alias("__nb"),
        )
    )
    return (
        c.join(F.broadcast(q))
        .select(
            "qa",
            "qb",
            (_dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))).alias("sim"),
        )
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (qa, qb, sim, rank).

    Excludes self-matches. Deterministic tie-break by neighbor id.
    """
    pairs = cosine_pairs(queries, corpus, id_col, vec_col).where(F.col("qa") != F.col("qb"))
    w = Window.partitionBy("qa").orderBy(F.col("sim").desc(), F.col("qb").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qa", "qb", F.round("sim", 4).alias("sim"), "rank")
    )


def _hyperplane(dim: int, seed: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (hash-based,
    no RNG state — reproducible across engines and runs)."""
    import hashlib
    import struct

    vals = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}|{plane}|{j}".encode()).digest()
        (u,) = struct.unpack("<q", h[:8])
        vals.append(u / float(2**63))
    return vals


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: (id, bucket).

    bucket = sign-bit string over n_planes fixed hyperplanes. Cosine-
    similar vectors collide with prob 1 - theta/pi per plane.
    """
    planes = [_hyperplane(dim, seed, p) for p in range(n_planes)]
    bits = []
    for p in planes:
        plane_col = _lit_double_array(p)
        bits.append(F.when(_dot(F.col(vec_col), plane_col) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact rerank within shared LSH buckets only.

    The bucket equi-join replaces the cross join — at 100 TB this is
    the difference between feasible and not. Recall is tunable via
    n_planes (fewer planes -> bigger buckets -> higher recall/cost).
    """
    qb = lsh_buckets(queries, dim, n_planes, seed, id_col, vec_col).withColumnRenamed(id_col, "qa")
    cb = lsh_buckets(corpus, dim, n_planes, seed, id_col, vec_col).withColumnRenamed(id_col, "qb")
    # norms hoisted below the bucket join (same bit-equal rewrite as
    # cosine_pairs): per-candidate work is then one dot, not three
    q = queries.select(
        F.col(id_col).alias("qa"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("__na"),
    ).join(qb, "qa")
    c = corpus.select(
        F.col(id_col).alias("qb"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    ).join(cb, "qb")
    pairs = (
        q.join(c, on="bucket")
        .where(F.col("qa") != F.col("qb"))
        .select(
            "qa",
            "qb",
            (_dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))).alias("sim"),
        )
    )
    w = Window.partitionBy("qa").orderBy(F.col("sim").desc(), F.col("qb").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qa", "qb", F.round("sim", 4).alias("sim"), "rank")
    )


#: codebooks at or under this K are folded into one literal JVM
#: projection; larger ones switch to a broadcast join + window (a
#: literal expression tree over ~5e4 centroids would not compile)
FOLD_MAX_K = 1024


def _codebook_rows(
    corpus: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic FIXED-K codebook seeding: the K corpus vectors
    with the smallest md5(id) — a hash-ranked sample, so (a) the
    codebook size is K regardless of corpus rows (1e3 or 1e9), (b)
    membership is reproducible with no RNG state, and (c) the oracle
    restates it as ``ORDER BY md5(cast(id AS varchar)) LIMIT K``
    (md5-hex of the decimal string is engine-identical).

    Plan shape: TakeOrdered (per-partition top-K + driver merge of K
    rows per partition) — never a full sort shuffle, and the driver
    holds exactly K vectors. Replaces the earlier every-Nth-vector
    rule whose K grew linearly with the corpus."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    return sorted((int(r[0]), [float(x) for x in r[1]]) for r in rows)


def assign_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[tuple[int, list[float]]],
    out: str = "cid",
) -> DataFrame:
    """``df`` plus a centroid-id column: argmax_c dot(v, c) over a
    driver-side codebook (callers pre-normalize for cosine), tie ->
    min cid.

    K <= FOLD_MAX_K: ONE folded JVM projection — no shuffle, no
    K-times row blowup. Above that, a broadcast nested-loop join
    scores all (row, centroid) pairs executor-side and a
    ``groupBy(id).agg(max_by(...))`` keeps each row's best: the
    argmax is a *declarative aggregate*, so partial aggregation
    collapses the N×K scored rows back to N on the map side — only
    one winner candidate per row per map partition ever crosses the
    exchange. (The previous ``Window.partitionBy(id)`` shape shuffled
    the full N×K scored stream, which at the 5e4-centroid regime this
    path exists for is a 50 000× shuffle amplification.)"""
    if len(cents) <= FOLD_MAX_K:
        return df.withColumn(out, _fold_assignment(F.col(vec_col), cents)["cid"])
    cdf = df.sparkSession.createDataFrame(
        [(cid, v) for cid, v in cents], "__cid long, __cv array<double>"
    )
    scored = df.join(F.broadcast(cdf)).withColumn(
        "__s", _dot(F.col(vec_col), F.col("__cv"))
    )
    carry = [c for c in df.columns if c != id_col]
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in carry], F.col("__cid").alias(out)),
            # (__s, -__cid) is unique per scored row, so the argmax is
            # deterministic: sim desc, then cid asc — the fold's tie-break
            F.struct(F.col("__s"), (-F.col("__cid")).alias("__ncid")),
        ).alias("__best")
    )
    return best.select(
        *[
            F.col(id_col) if c == id_col else F.col(f"__best.{c}").alias(c)
            for c in df.columns
        ],
        F.col(f"__best.{out}").alias(out),
    )


def hybrid_rerank(
    docs: DataFrame,
    embs: DataFrame,
    query_terms: list[str],
    n_candidates: int = 50,
    prf_k: int = 3,
    k: int = 10,
    alpha: float = 0.5,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+dense retrieval with Rocchio pseudo-relevance
    feedback: BM25 selects ``n_candidates`` lexical candidates, the
    element-wise MEAN embedding of the top ``prf_k`` of them becomes
    the dense query vector (classic PRF — no external query embedding
    needed), and candidates re-rank by
    ``alpha * bm25/max_bm25 + (1-alpha) * cosine(query_vec, emb)``.

    Determinism contract (engine-portable hashing): BM25 scores are
    pre-rounded (6dp) by :func:`~lakefs_spark.operators.text.bm25_topk`;
    the PRF vector rounds to 6dp BEFORE the dot product (same trick as
    prototypicality's centroids); the blended score rounds to 4dp and
    ties break on doc id.

    Candidates without an embedding row drop from the rerank (inner
    join, same as the oracle); embeddings are assumed uniform-dimension
    like every other operator in this module (zip_with null-pads ragged
    vectors). Raises ``ValueError`` when the PRF candidates have no
    embeddings or a zero query vector — silent NULL scores would
    otherwise masquerade as a ranking.

    Scale shape: BM25 is O(hits) and runs ONCE — its ≤``n_candidates``
    result rows are collected and re-created locally, so the PRF
    aggregation, max-score and rerank never re-execute the BM25
    lineage; the query vector and its norm are driver-side constants
    folded into ONE rerank projection over the candidate join — no
    shuffle beyond BM25's own aggregations and one candidate-sized
    equi-join with the embeddings table.
    """
    import math

    from lakefs_spark.operators.text import bm25_topk

    bdf = bm25_topk(docs, query_terms, id_col=doc_id_col, k=n_candidates)
    cand_rows = bdf.collect()  # <= n_candidates tiny rows, ONE execution
    if not cand_rows:
        return docs.sparkSession.createDataFrame(
            [], "rank long, doc_id long, bm25 double, cosine double, final double"
        )
    spark = docs.sparkSession
    cand = spark.createDataFrame(cand_rows, bdf.schema)
    mx = max(float(r["score"]) for r in cand_rows) or 1.0
    prf_ids = [r["doc_id"] for r in cand_rows if r["rank"] <= prf_k]

    evec = embs.select(F.col(vec_id_col), F.col(vec_col))
    prf_rows = (
        evec.where(F.col(vec_id_col).isin(prf_ids))
        .select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .orderBy("i")
        .collect()
    )
    # dim-sized driver constant. Python round() is banker's rounding
    # (half-to-even) but Spark F.round and the DuckDB oracle both round
    # half AWAY from zero — an exact half-tie at the 6th decimal would
    # diverge Spark vs oracle. Match them with ROUND_HALF_UP.
    qvec = [_round_half_up(r["m"], 6) for r in prf_rows]
    nq = math.sqrt(sum(v * v for v in qvec))
    if not qvec or nq == 0.0:
        raise ValueError(
            "hybrid_rerank: PRF candidates have no embeddings (or a zero "
            "query vector) — cannot build the dense query; rerank would "
            "silently be NULL-scored"
        )
    q_col = _lit_double_array(qvec)
    joined = cand.join(evec, cand[doc_id_col] == evec[vec_id_col]).select(
        cand[doc_id_col].alias("doc_id"), "score", vec_col
    )
    cos = _dot(F.col(vec_col), q_col) / (_norm(F.col(vec_col)) * F.lit(nq))
    scored = joined.select(
        "doc_id",
        F.col("score").alias("bm25"),
        F.round(cos, 6).alias("cosine"),
        F.round(
            F.lit(alpha) * F.col("score") / F.lit(mx) + F.lit(1.0 - alpha) * cos, 4
        ).alias("final"),
    )
    top = scored.orderBy(F.col("final").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("final").desc(), F.col("doc_id"))  # k rows only
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id", "bm25", "cosine", "final",
    )


def _normalize_codebook(cent_rows: list[tuple[int, list[float]]]) -> list[tuple[int, list[float]]]:
    import math

    cents = []
    for cid, vec in cent_rows:
        n = math.sqrt(sum(x * x for x in vec)) or 1.0
        cents.append((cid, [x / n for x in vec]))
    return cents


def _fold_assignment(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """argmax_c dot(vec, c) over a unit-normalized driver-side codebook,
    folded into ONE JVM projection (no shuffle, no K-times row blowup);
    (sim desc, cid asc) tie-break. Returns a struct (cid, s)."""
    # one parsed expression instead of K*(dim+1) py4j literal calls —
    # identical literal tree, see _lit_double_array
    cent_arr = F.expr(
        "array("
        + ",".join(
            f"named_struct('cid',{int(cid)}L,'cv',"
            + "array(" + ",".join(_sql_d(x) for x in v) + "))"
            for cid, v in cents
        )
        + ")"
    )
    # ONE dot per centroid: higher-order lambdas are interpreted (no
    # codegen CSE), so a when(dot > acc.s, struct(dot, ...)) shape
    # evaluates the O(dim) fold twice per centroid — score once into
    # (s, -cid) structs, then array_max picks (s desc, cid asc)
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            _dot(vec, c["cv"]).alias("s"), (-c["cid"]).alias("ncid")
        ),
    )
    best = F.array_max(scored)
    return F.struct((-best["ncid"]).alias("cid"), best["s"].alias("s"))


def kmeans_codebook(
    corpus: DataFrame,
    n_centroids: int = 256,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Spherical k-means training for the IVF codebook: deterministic
    FIXED-K init (hash-ranked sample — see ``_codebook_rows``), then
    ``iters`` Lloyd steps — assign each vector to its max-cosine
    centroid (the same assignment ivf_topk uses at query time),
    recompute each centroid as the element-wise mean of its members.

    Scale shape: per iteration ONE scan of the corpus (shuffle-free
    folded assignment for K <= FOLD_MAX_K, broadcast join + window
    above) + ONE groupBy(cid) with 64 avg aggregates (map-side
    partial); the codebook is K vectors on the driver REGARDLESS of
    corpus rows. Empty clusters keep their previous centroid
    (deterministic).
    """
    cents = _codebook_rows(corpus, n_centroids, id_col, vec_col)
    corp = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vb"))
    # the element-wise means ride ONE parsed expression (an array of the
    # same avg() aggregates the per-column form used) instead of `dim`
    # separately built Columns: building 64 avg Columns costs ~dim*5
    # py4j round trips PER ITERATION (~0.4 s measured), the parse costs
    # one (guide §5 — driver time; same trick as _lit_double_array)
    mean_expr = F.expr(
        "array(" + ",".join(f"avg(cast(vb[{j}] as double))" for j in range(dim)) + ")"
    ).alias("m")
    for _ in range(iters):
        assigned = assign_centroids(
            corp, "vid", "vb", _normalize_codebook(cents), out="cid"
        ).select("cid", "vb")
        new_rows = {
            int(r["cid"]): [float(x) for x in r["m"]]
            for r in assigned.groupBy("cid").agg(mean_expr).collect()
        }
        cents = [(cid, new_rows.get(cid, vec)) for cid, vec in cents]
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 256,
    nprobe: int = 3,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse codebook -> inverted lists -> probe top
    centroids -> exact rerank inside the probed lists. Returns the
    (qa, qb) top-k membership set per query.

    Codebook: FIXED-K hash-ranked sample (``_codebook_rows``) — a
    deterministic stand-in for a trained k-means codebook (training
    is kmeans_codebook's job; the IVF *mechanics* — assignment,
    inverted lists, probe, in-list rerank — are identical and are
    what must scale).

    Scale shape (the reason IVF beats brute force at 100 TB):
    - codebook is K driver-side vectors REGARDLESS of corpus rows;
      corpus assignment is a single folded JVM projection for
      K <= FOLD_MAX_K (argmax_c dot(v, c_hat) == argmax cosine — NO
      shuffle, no K-times row blowup), a broadcast join + window
      above (see ``assign_centroids``).
    - queries (small side) probe their ``nprobe`` nearest centroids
      via a broadcast join; candidates come from an equi-join on
      centroid id — never an all-pairs cross join.
    """
    cent_rows = _codebook_rows(corpus, n_centroids, id_col, vec_col)
    cents = _normalize_codebook(cent_rows)
    # query/corpus/centroid norms hoisted into per-row projections
    # below the joins (bit-equal rewrite, see cosine_pairs): the coarse
    # probe then pays one dot per (query, centroid) and the rerank one
    # dot per candidate, instead of three aggregate passes each
    corp = corpus.select(
        F.col(id_col).alias("qb"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    )
    assign = assign_centroids(corp, "qb", "vb", cents, out="cid")

    centdf = queries.sparkSession.createDataFrame(
        [(cid, v) for cid, v in cent_rows], "cid long, cv array<double>"
    ).withColumn("__nc", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("qa"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    qsims = q.join(F.broadcast(centdf)).select(
        "qa",
        "cid",
        "va",
        "__na",
        (_dot(F.col("va"), F.col("cv")) / (F.col("__na") * F.col("__nc"))).alias("sim"),
    )
    wq = Window.partitionBy("qa").orderBy(F.col("sim").desc(), F.col("cid").asc())
    probes = (
        qsims.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("qa", "va", "__na", "cid")
    )
    cand = probes.join(assign, "cid").where(F.col("qa") != F.col("qb"))
    sims = cand.select(
        "qa",
        "qb",
        (_dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))).alias("sim"),
    )
    wk = Window.partitionBy("qa").orderBy(F.col("sim").desc(), F.col("qb").asc())
    return (
        sims.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("qa", "qb")
    )


def label_centroids(df: DataFrame, vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label centroid of an embedding column: mean per dimension.

    The building block for IVF codebook seeding, class prototypes, and
    drift monitoring. Shape: posexplode to (label, dim, x) then ONE
    hash aggregation — map-side partial sums collapse each partition
    to |labels| x dim rows, so the shuffle is tiny regardless of row
    count. No Python; no per-vector UDF.
    """
    return (
        df.select(F.col(label_col).cast("long").alias("label"),
                  F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("c"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            F.round("c", 6).alias("centroid"),
            F.col("n").cast("long").alias("n_vectors"),
        )
    )


def prototypicality(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Data-pruning metric (SSL-prototypes / SemDeDup family): cosine
    similarity of every vector to its OWN label's centroid, plus the
    within-label rank by that score. Curation drops the tail (least
    prototypical = likely noise/mislabeled) or the head (most
    prototypical = redundant near-duplicates of the class mode),
    depending on the pruning strategy.

    Shape: the centroid aggregation collapses map-side to
    |labels| x dim rows (see label_centroids), joins back onto the
    exploded vector stream as the tiny side of an equi-join, and ONE
    per-vector aggregation forms dot and norms. The only per-label
    sort is the rank window — inherent to the ranking semantics.
    Centroids are rounded to 6 dp BEFORE the dot product and the rank
    orders by the rounded score with an id tiebreak, so the output
    (including ranks) is bit-stable across engines and partitionings.
    """
    cents = label_centroids(df, vec_col, label_col).select(
        "label", "dim", F.col("centroid").alias("c")
    )
    dims = df.select(
        F.col(id_col),
        F.col(label_col).cast("long").alias("label"),
        F.posexplode(vec_col).alias("dim", "x"),
    ).select(id_col, "label", F.col("dim").cast("long").alias("dim"), F.col("x").cast("double").alias("x"))
    agg = (
        dims.join(cents, ["label", "dim"])
        .groupBy(id_col, "label")
        .agg(
            F.sum(F.col("x") * F.col("c")).alias("dot"),
            F.sum(F.col("x") * F.col("x")).alias("n1"),
            F.sum(F.col("c") * F.col("c")).alias("n2"),
        )
    )
    scored = agg.select(
        F.col(id_col).cast("long").alias(id_col),
        "label",
        F.round(
            F.col("dot") / F.nullif(F.sqrt("n1") * F.sqrt("n2"), F.lit(0.0)), 6
        ).alias("proto_cos"),
    )
    w = Window.partitionBy("label").orderBy(F.col("proto_cos").desc(), F.col(id_col))
    return scored.withColumn("proto_rank", F.row_number().over(w).cast("long"))


# -- product quantization ---------------------------------------------------


def pq_codebooks(
    corpus: DataFrame,
    n_sub: int = 4,
    dim: int = 64,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows: list[tuple[int, list[float]]] | None = None,
) -> dict[int, list[tuple[int, list[float]]]]:
    """Per-subspace PQ codebooks (Jegou et al., "Product Quantization
    for Nearest Neighbor Search"): the dim axis is split into ``n_sub``
    contiguous subspaces; each subspace gets its own codebook. Init is
    the engine's deterministic FIXED-K rule (the hash-ranked sample's
    subvectors — the same seeding kmeans_codebook/ivf_topk use), so
    both engines derive identical codebooks with no RNG. K is a
    parameter (PQ codes are conventionally bytes, so K <= 256 is the
    useful regime) and never scales with corpus rows."""
    if n_centroids > FOLD_MAX_K:
        raise ValueError(
            f"PQ codebooks are literal-folded per subspace; K={n_centroids} "
            f"exceeds FOLD_MAX_K={FOLD_MAX_K} (PQ codes are bytes — use K <= 256)"
        )
    if dim % n_sub:
        raise ValueError(
            f"dim ({dim}) must be divisible by n_sub ({n_sub}) — a remainder "
            "would silently drop the trailing dimensions from every code"
        )
    d0 = dim // n_sub
    # ``rows`` lets a caller that already collected the seeding sample
    # (same corpus, same K) reuse it — _codebook_rows is a Spark job
    # (TakeOrdered + collect), and pq_topk/ivfpq_topk were paying it
    # twice per call for bit-identical results
    if rows is None:
        rows = _codebook_rows(corpus, n_centroids, id_col, vec_col)
    return {
        m: [(cid, vec[m * d0 : (m + 1) * d0]) for cid, vec in rows] for m in range(n_sub)
    }


def _fold_l2_assignment(subvec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """argmin_c ||v - c||^2 == argmax_c dot(v,c) - ||c||^2/2, folded
    into ONE JVM projection; ties -> min cid. ||c||^2/2 is a
    Python-computed literal (sequential sum, the same add order the
    oracle's SQL sum uses)."""
    # one parsed expression instead of K*(dim+2) py4j literal calls —
    # identical literal tree, see _lit_double_array
    cent_arr = F.expr(
        "array("
        + ",".join(
            f"named_struct('cid',{int(cid)}L,'cv',"
            + "array(" + ",".join(_sql_d(x) for x in v) + "),"
            + f"'h',{_sql_d(sum(x * x for x in v) / 2.0)})"
            for cid, v in cents
        )
        + ")"
    )
    # same single-evaluation shape as _fold_assignment
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            (_dot(subvec, c["cv"]) - c["h"]).alias("s"), (-c["cid"]).alias("ncid")
        ),
    )
    best = F.array_max(scored)
    return F.struct((-best["ncid"]).alias("cid"), best["s"].alias("s"))


def pq_codes(
    corpus: DataFrame,
    n_sub: int = 4,
    dim: int = 64,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: dict[int, list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """PQ encoding: one (id, m, code) row per vector and subspace.

    Scale shape: ONE shuffle-free scan — per row, n_sub folded argmin
    projections over the broadcast codebooks (K*n_sub literals), then a
    posexplode to long form. A 64-dim vector compresses to n_sub bytes
    of codes; at 1e9 vectors the codes table is ~4 GB vs 256 GB of
    float32 — the whole point of PQ at 100 TB."""
    # ``books`` lets pq_topk/ivfpq_topk hand down the codebooks they
    # already derived from the same corpus/K — skipping a second
    # bit-identical _codebook_rows Spark job (TakeOrdered + collect)
    if books is None:
        books = pq_codebooks(corpus, n_sub, dim, n_centroids, id_col, vec_col)
    d0 = dim // n_sub
    per_m = F.array(
        *[
            _fold_l2_assignment(
                F.slice(F.col(vec_col), m * d0 + 1, d0), books[m]
            )["cid"]
            for m in range(n_sub)
        ]
    )
    return corpus.select(
        F.col(id_col).cast("long").alias(id_col), F.posexplode(per_m).alias("m", "code")
    ).select(id_col, F.col("m").cast("long").alias("m"), "code")


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_sub: int = 4,
    dim: int = 64,
    n_centroids: int = 256,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC approximate top-k: per query, a distance table to every
    (subspace, centroid) is computed driver-side (K*n_sub*|Q| scalars),
    broadcast as map literals, and each corpus vector's score is the
    FIXED-ORDER sum of its n_sub table lookups — so both engines add
    the same doubles in the same order (bitwise-stable ranking).

    Scale shape: the corpus side never leaves the executors and reads
    only the codes projection (one scan, no shuffle before the
    per-query top-k); query count and codebook size bound the broadcast.
    This is the ADC search loop of an IVFPQ index, minus the coarse
    IVF routing already shown in ivf_topk."""
    books = pq_codebooks(corpus, n_sub, dim, n_centroids, id_col, vec_col)
    d0 = dim // n_sub
    qrows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in queries.select(id_col, vec_col).collect()
    )
    # distance tables: t[qa][m][cid] = dot(q_m, c_m) - ||c_m||^2/2
    # (monotone in -||q_m - c_m||^2; the dropped ||q_m||^2 is constant
    # per (qa, m) so the argsort is unchanged)
    tables: dict[int, list] = {}
    for qa, qv in qrows:
        per_sub = []
        for m in range(n_sub):
            qsub = qv[m * d0 : (m + 1) * d0]
            ent = {}
            for cid, cv in books[m]:
                s = 0.0
                for a, b in zip(qsub, cv):
                    s += a * b
                ent[cid] = s - sum(x * x for x in cv) / 2.0
            per_sub.append(ent)
        tables[qa] = per_sub

    # wide codes computed DIRECTLY as n_sub folded projections — the
    # previous shape materialized pq_codes' long form (posexplode) and
    # pivoted it back to wide, paying two Exchanges + four aggregates
    # for a round-trip that recreates exactly this projection; the
    # folded argmin per subspace is deterministic, so the wide rows are
    # identical to the pivot of pq_codes (one (id, m) row per vector)
    wide = corpus.select(
        F.col(id_col).cast("long").alias(id_col),
        *[
            _fold_l2_assignment(F.slice(F.col(vec_col), m * d0 + 1, d0), books[m])[
                "cid"
            ].alias(str(m))
            for m in range(n_sub)
        ],
    )
    # the whole per-query score array is ONE parsed SQL expression —
    # fixed-order sum of the n_sub map lookups per query, exactly the
    # Column tree the per-query loop built, minus thousands of py4j
    # round-trips of driver-side plan construction
    score_structs = []
    for qa, per_sub in tables.items():
        terms = " + ".join(
            "map("
            + ",".join(f"{int(cid)}L,{_sql_d(s)}" for cid, s in sorted(per_sub[m].items()))
            + f")[`{m}`]"
            for m in range(n_sub)
        )
        score_structs.append(f"named_struct('qa',{int(qa)}L,'score',{terms})")
    scored = (
        wide.select(
            F.col(id_col).alias("qb"),
            F.explode(F.expr("array(" + ",".join(score_structs) + ")")).alias("qs"),
        )
        .select("qb", F.col("qs.qa").alias("qa"), F.col("qs.score").alias("score"))
        .where(F.col("qa") != F.col("qb"))
    )
    wk = Window.partitionBy("qa").orderBy(F.col("score").desc(), F.col("qb").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("qa", "qb")
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 256,
    nprobe: int = 3,
    n_sub: int = 4,
    dim: int = 64,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ search: coarse IVF routing + PQ/ADC scoring inside the
    probed inverted lists — the production ANN path (IVF narrows the
    candidate set, PQ makes per-candidate scoring a table lookup).
    This is the no-residual variant (codes quantize the raw vectors,
    not the centroid residuals), which keeps the codebooks shared
    across lists and the oracle exactly restateable.

    Scale shape: the corpus side is ONE shuffle-free projection
    emitting (coarse list id, n_sub PQ codes) per vector — 5 folded
    argmax/argmin over broadcast codebooks; query routing and ADC
    tables are driver-side (K*n_sub*|Q| scalars) and reach executors
    as map literals. Scoring touches only rows whose list id is
    probed, and each score is a fixed-order sum of n_sub lookups —
    identical float behavior on both engines."""
    import math

    cent_rows = _codebook_rows(corpus, n_centroids, id_col, vec_col)
    cents_norm = _normalize_codebook(cent_rows)
    # the PQ codebooks slice the SAME hash-ranked sample the coarse
    # codebook just collected — reuse it instead of re-running the job
    books = pq_codebooks(
        corpus, n_sub, dim, n_centroids, id_col, vec_col, rows=cent_rows
    )
    d0 = dim // n_sub

    corp = corpus.select(F.col(id_col).alias("qb"), F.col(vec_col).alias("vb"))
    enc_cols = [_fold_assignment(F.col("vb"), cents_norm)["cid"].alias("ccid")]
    for m in range(n_sub):
        enc_cols.append(
            _fold_l2_assignment(F.slice(F.col("vb"), m * d0 + 1, d0), books[m])["cid"].alias(
                f"code{m}"
            )
        )
    enc = corp.select("qb", *enc_cols)

    qrows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in queries.select(id_col, vec_col).collect()
    )
    score_structs = []
    for qa, qv in qrows:
        # coarse probe: top-nprobe centroids by cosine (tie -> min cid),
        # sequential float ops matching the oracle's SQL sums
        sims = []
        for cid, cv in cent_rows:
            ab = aa = bb = 0.0
            for a, b in zip(qv, cv):
                ab += a * b
                aa += a * a
                bb += b * b
            sims.append((-(ab / (math.sqrt(aa) * math.sqrt(bb))), cid))
        probe_cids = [cid for _, cid in sorted(sims)[:nprobe]]
        # ADC tables per subspace — the whole per-query scoring
        # expression (probe gate + fixed-order sum of n_sub map
        # lookups) is ONE parsed SQL string: same CASE/NULL semantics
        # and float order as the Column-by-Column build, without its
        # per-scalar py4j round-trips
        term_strs = []
        for m in range(n_sub):
            qsub = qv[m * d0 : (m + 1) * d0]
            ent = {}
            for cid, cv in books[m]:
                s = 0.0
                for a, b in zip(qsub, cv):
                    s += a * b
                ent[cid] = s - sum(x * x for x in cv) / 2.0
            term_strs.append(
                "map("
                + ",".join(f"{int(cid)}L,{_sql_d(s)}" for cid, s in sorted(ent.items()))
                + f")[code{m}]"
            )
        probe_list = ",".join(f"{int(c)}L" for c in probe_cids)
        score = (
            f"CASE WHEN ccid IN ({probe_list}) THEN "
            + " + ".join(term_strs)
            + " END"
        )
        score_structs.append(f"named_struct('qa',{int(qa)}L,'score',{score})")

    scored = (
        enc.select(
            "qb", F.explode(F.expr("array(" + ",".join(score_structs) + ")")).alias("qs")
        )
        .select("qb", F.col("qs.qa").alias("qa"), F.col("qs.score").alias("score"))
        .where(F.col("score").isNotNull() & (F.col("qa") != F.col("qb")))
    )
    wk = Window.partitionBy("qa").orderBy(F.col("score").desc(), F.col("qb").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("qa", "qb")
    )
