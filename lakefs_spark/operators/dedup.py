"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators beyond the reference's surface
(lakeFS deduplicates *storage* by content address — pkg/ident/ — which
is exactly the "exact dedup" here generalized to row content).

Scale notes (the whole point of these shapes):
- exact dedup: one hash-shuffle on the digest; map-side partial agg
  keeps it near-linear. 100 TB -> digest is 32 bytes/row, shuffle is
  tiny relative to input.
- MinHash LSH: candidate generation is (band_id, band_hash) equi-join —
  a shuffle on short keys, never an O(n^2) cross join. Bucket skew
  (stop-shingle buckets) is capped by AQE skew-join splitting; the
  verify step re-checks exact Jaccard only on candidates.
- SimHash: 64-bit signature from per-token hashes; near-dup = same
  signature band; pure projection + one groupBy.

All hot-path hashing uses JVM-side xxhash64/md5 — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts: (text_hash, rep_id, n_dups).

    ``rep_id`` = min id per group — the row to keep.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative row per exact-duplicate group."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with JVM functions: split -> transform over a sequence of
    start offsets -> slice+concat -> explode distinct.
    """
    toks = F.split(F.col(text_col), " ")
    count = F.size(toks) - F.lit(n - 1)
    # a doc with < n tokens has ZERO shingles: sequence(1, 0) would
    # descend ([1, 0]) and slice(toks, 0, n) throws — guard to empty
    grams = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
        .where(F.col("shingle") != "")
    )


def distinct_shingle_count(text_col: str = "text", n: int = 3):
    """Per-ROW count of the document's distinct non-empty word n-gram
    shingles — exactly ``shingles(df).groupBy(id).count()`` for that
    document, as a pure projection: no explode, no exchange, no join
    back (guide §2.4 "remove shuffles outright"). Callers that only
    need the per-doc shingle COUNT (denominators in contamination /
    repetition signals) use this instead of re-exploding the corpus.

    NB: a doc with zero shingles yields 0 here but yields NO row from
    the exploded groupBy — callers replicating an aggregation must
    filter ``> 0`` to keep the row set identical.
    """
    toks = F.split(F.col(text_col), " ")
    count = F.size(toks) - F.lit(n - 1)
    grams = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.size(F.array_remove(F.array_distinct(grams), ""))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard >= threshold: (id_a, id_b, jaccard).

    Shuffle-on-shingle join; for candidate *generation* at scale use
    :func:`minhash_bands` first and verify only candidates with this.
    """
    sh = shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _base_hash(col) -> "F.Column":
    """60-bit md5-derived base hash, reduced to 30 bits (hashfam.py —
    one string hash per row; the k-fold family is arithmetic on it)."""
    from lakefs_spark.functions.hashfam import X_MOD

    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"), F.lit(X_MOD)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signature per doc: (id, sig array<long> of len num_hashes).

    hash_i(shingle) = (a_i * base(shingle) + b_i) mod 2^31-1 over ONE
    md5-derived base hash (functions/hashfam.py) — k multiply-adds per
    shingle instead of k string hashes, all JVM-side, one groupBy; and
    the family is engine-portable, so an independent SQL oracle can
    recompute signatures exactly.
    """
    from lakefs_spark.functions.hashfam import MERSENNE31, affine_constants

    consts = affine_constants(num_hashes)
    sh = shingles(df, text_col, id_col, n)
    hashed = sh.select(
        F.col(id_col), _base_hash(F.col("shingle")).alias("x")
    ).select(
        F.col(id_col),
        F.array(
            *[
                F.pmod(F.lit(a) * F.col("x") + F.lit(b), F.lit(MERSENNE31))
                for a, b in consts
            ]
        ).alias("hs"),
    )
    agg = hashed.groupBy(id_col).agg(
        F.array(*[F.min(F.col("hs")[i]) for i in range(num_hashes)]).alias("sig")
    )
    return agg


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """LSH banding: (id, band_id, band_hash). Docs sharing any band
    bucket are near-dup candidates."""
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    # ONE projection + posexplode — a bands-way union would embed the
    # whole signature-aggregation plan once per band
    band_arr = _band_hash_array(num_hashes, bands)
    return sig.select(
        F.col(id_col), F.posexplode(band_arr).alias("band_id", "band_hash")
    ).select(F.col(id_col), F.col("band_id").cast("int").alias("band_id"), "band_hash")


def _band_hash_array(num_hashes: int, bands: int, sig_col: str = "sig"):
    """The per-doc array of band hashes over a ``sig`` column — md5 of
    the comma-joined band slice, exactly as minhash_bands explodes it."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.md5(
                F.array_join(
                    F.transform(
                        F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            )
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs from LSH buckets: (id_a, id_b).

    The band table is locally checkpointed before the self-join: a
    self-join evaluates its input subtree once per side, so without the
    materialization the whole shingle->signature pipeline (the
    expensive part) runs twice per call (guide §1.2). The checkpoint is
    executor-distributed and intra-invocation — it is the in-query
    analog of the persisted band index a production deployment keeps
    (see incremental_minhash_candidates' docstring).
    """
    bandsdf = minhash_bands(df, text_col, id_col, n, num_hashes, bands).localCheckpoint()
    a = bandsdf.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    b = bandsdf.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of per-token hash bits.

    (id, simhash long). Near-dups have small Hamming distance; pair
    them by exact-matching high-order bands of the signature.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")
    # 64 bits from the md5 hex digits (4 bits per digit) — one string
    # hash per token, engine-portable (hashfam.py rationale), so the
    # SQL oracle reconstructs identical signatures.
    #
    # Shape notes (round 11, guide §5 driver time + §1.2 per-task):
    # the previous form built ~16 conv() digit Columns plus 64 sum()
    # Columns plus a 64-arm sig chain through py4j (~1000 round trips,
    # ~1.3 s of pure driver time per call) and ran 16 conv()s per token
    # row. The same digits now come from TWO conv()s over 8-hex-char
    # words (digit j is bits [4*(7-j%8) .. +3] of its word — identical
    # integer values), the 64 ±1 sums ride ONE parsed array expression,
    # and the sign->bit fold is one parsed projection. Bit 63 uses
    # shiftleft(1L, 63) == -(2^63), the exact literal the old chain
    # added. Signatures are integer arithmetic — values identical.
    assert bits <= 64, "simhash signature is at most 64 bits (16 md5 hex digits)"
    n_digits = (bits + 3) // 4
    n_words = (n_digits + 7) // 8
    word_len = [min(8, n_digits - 8 * w) for w in range(n_words)]
    hx = tok.select(F.col(id_col), F.md5("tok").alias("hx"))
    words = hx.select(
        F.col(id_col),
        *[
            F.expr(
                f"cast(conv(substring(hx, {8 * w + 1}, {word_len[w]}), 16, 10) as bigint)"
            ).alias(f"__w{w}")
            for w in range(n_words)
        ],
    )

    def _bit(i: int) -> str:
        j, k = i // 4, i % 4  # hex digit index, bit inside the digit
        w = j // 8
        shift = 4 * (word_len[w] - 1 - (j - 8 * w)) + k
        return f"(shiftright(__w{w}, {shift}) & 1) = 1"

    sums = words.groupBy(id_col).agg(
        F.expr(
            "array("
            + ",".join(f"sum(case when {_bit(i)} then 1 else -1 end)" for i in range(bits))
            + ")"
        ).alias("__b")
    )
    sig = " + ".join(
        f"(case when __b[{i}] > 0 then shiftleft(cast(1 as bigint), {i}) "
        "else cast(0 as bigint) end)"
        for i in range(bits)
    )
    return sums.select(F.col(id_col), F.expr(sig).alias("simhash"))


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over candidate near-dup pairs:
    (member, rep) where rep = min id in the component — the keep-one
    decision step after candidate generation + verification.

    Size-adaptive, the same way Spark picks broadcast joins: a probe
    takes up to ``driver_threshold + 1`` edges; at or under the
    threshold the component labels come from a driver-side union-find
    over the collected edge list (near-dup edge lists are candidate
    pairs, already a tiny fraction of the corpus — one job instead of
    3 per propagation round). Past it, distributed min-label
    propagation: each round every node takes the min of its own and
    its neighbors' labels (one equi-join + one min-agg per round);
    converged when no label changes. The fixpoint (component minimum)
    is unique, so both paths produce identical output —
    tests/test_pipeline.py asserts the agreement.

    Near-dup components are shallow (diameter ~ a few hops), so rounds
    stay small; for adversarially long chains at 100 TB swap in the
    large-star/small-star variant (alternating conditional stars halve
    diameter per round) — same join shape.
    """
    # persist the edge list before probing: candidate generation is the
    # expensive upstream plan, and on the distributed path it would
    # otherwise run twice (size probe + symmetrized union)
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).persist()
    # size probe as a COUNT (a long to the driver), not a collect —
    # the distributed path must never materialize a million edge rows
    # driver-side just to discover it is the distributed path. The
    # edges are only collected once the driver path is chosen, and the
    # persist above makes that second job a cache read.
    n_edges = e.limit(driver_threshold + 1).count()
    if n_edges <= driver_threshold:
        probe = e.collect()
        e.unpersist()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in probe:
            u, v = r["u"], r["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        rows = sorted((int(node), int(find(node))) for node in parent)
        return pairs.sparkSession.createDataFrame(rows, "member long, rep long")
    # persist the symmetrized edge list: every propagation round joins
    # against it, and its plan embeds the (expensive) candidate
    # generation — without the cache each round would recompute it
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).persist()
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(neigh, labels["node"] == neigh["u"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .persist()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    out = (
        labels.select(F.col("node").alias("member"), F.col("label").alias("rep"))
        # materialize BEFORE dropping the caches: the caller's first
        # action would otherwise replay the full multi-round
        # propagation (with the expensive candidate plan embedded per
        # round) completely uncached
        .localCheckpoint()
    )
    labels.unpersist()
    und.unpersist()
    e.unpersist()
    return out


def simhash_near_dups(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    bands: int = 4,
    max_hamming: int = 8,
) -> DataFrame:
    """Near-duplicate pairs from SimHash signatures: candidates share at
    least one of ``bands`` equal-width signature bands, then exact
    Hamming distance <= ``max_hamming`` verifies the pair.

    Recall contract (pigeonhole): a colliding band is GUARANTEED only
    for pairs with fewer than ``bands`` differing bits — pairs with
    Hamming distance in [bands, max_hamming] are found only when their
    flipped bits happen to leave some band untouched. Raise ``bands``
    toward ``max_hamming + 1`` for guaranteed recall (at quadratically
    more candidate collisions).

    Scale shape: the (band, band_val) equi-join replaces the all-pairs
    comparison — the same banding trick as MinHash LSH but over one
    64-bit signature, so the candidate table is tiny. Band extraction
    is fill-independent ((sig >> s) & mask strips arithmetic-shift fill
    bits), so the SQL oracle reproduces it on two's-complement BIGINTs.
    """
    if not (2 <= bands <= 32 and 64 % bands == 0):
        # bands=1 would need a 64-bit all-ones literal (overflows the
        # int64 lit); non-divisors would silently drop the top bits
        raise ValueError(f"bands must divide 64 and be in [2, 32], got {bands}")
    width = 64 // bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.shiftright(F.col(sig_col), i * width).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ]
    )
    # the banded signature table feeds both sides of the candidate
    # self-join; without materialization the upstream signature
    # aggregation (the expensive part) is evaluated once per side
    # (guide §1.2 — same intra-invocation checkpoint as
    # minhash_candidates)
    b = sigs.select(
        F.col(id_col), F.col(sig_col), F.posexplode(band_arr).alias("band", "band_val")
    ).localCheckpoint()
    x, y = b.alias("x"), b.alias("y")
    cand = (
        x.join(y, ["band", "band_val"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.col(f"x.{sig_col}").alias("sig_a"),
            F.col(f"y.{sig_col}").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select(
        "id_a", "id_b", ham.cast("long").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def minhash_jaccard_estimate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Per candidate pair, the MinHash Jaccard ESTIMATE (fraction of
    equal signature components) next to the EXACT n-gram Jaccard — the
    calibration readout that decides num_hashes/bands before scaling an
    LSH dedup out (estimate error ~ 1/sqrt(num_hashes)).

    Scale shape: signatures and candidates come from the banded
    equi-join path (never all-pairs); the exact verify joins shingles
    only for documents that appear in some candidate pair (semi-join
    pushdown), so the expensive exact computation is bounded by the
    candidate set — the same verify-on-candidates positioning
    ngram_jaccard_pairs documents.
    """
    # one signature pipeline for BOTH the banding and the estimate: the
    # signature rides through the band explode, so the candidate
    # self-join carries (id, sig) pairs and the estimate is a pure
    # projection over the joined row — the previous shape re-embedded
    # the whole shingle->signature plan four times (sa, sb, and once
    # per band-join side inside minhash_candidates). The candidate
    # frame is locally checkpointed (intra-invocation, executor-side,
    # same rationale as minhash_candidates) because three downstream
    # consumers (estimate, the id semi-join, the final join base) would
    # each re-evaluate the band self-join.
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    banded = sig.select(
        F.col(id_col),
        F.col("sig"),
        F.posexplode(_band_hash_array(num_hashes, bands)).alias("band_id", "band_hash"),
    ).select(
        F.col(id_col), F.col("sig"), F.col("band_id").cast("int").alias("band_id"), "band_hash"
    )
    ba = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band_id", "band_hash"
    )
    bb = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band_id", "band_hash"
    )
    # sig is a pure function of the id, so distinct over (ids, sigs)
    # yields exactly the distinct (id_a, id_b) candidate set
    cand = (
        ba.join(bb, on=["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .localCheckpoint()
    )
    est = cand.select(
        "id_a",
        "id_b",
        (
            F.size(
                F.filter(
                    F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                    lambda v: v,
                )
            )
            / F.lit(float(num_hashes))
        ).alias("est_jaccard"),
    )
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = shingles(df, text_col, id_col, n).join(cand_ids, id_col, "semi")
    # per-doc shingle-set size as a pure projection (identical to
    # sh.groupBy(id).count() — see distinct_shingle_count; the inner
    # joins below restrict it to candidate docs, all of which have
    # >= 1 shingle by construction)
    sizes = df.select(
        F.col(id_col), distinct_shingle_count(text_col, n).cast("long").alias("n_sh")
    ).where(F.col("n_sh") > 0)
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    szs_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    szs_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        est.join(inter, ["id_a", "id_b"], "left")
        .join(szs_a, "id_a")
        .join(szs_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.round(
                F.coalesce("n_inter", F.lit(0))
                / (F.col("n_a") + F.col("n_b") - F.coalesce("n_inter", F.lit(0))).cast(
                    "double"
                ),
                6,
            ).alias("exact_jaccard"),
        )
    )


def token_overlap_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted token overlap for candidate pairs: per (id_a, id_b),
    ``overlap`` = sum over shared tokens of min(tf_a, tf_b) and
    ``containment`` = overlap / min(n_tokens_a, n_tokens_b) — the
    multiset-containment signal corpus dedup uses where Jaccard
    under-scores near-subset documents (quotes, boilerplate wrappers).

    All integer arithmetic until the final division, so the result is
    bitwise identical regardless of join/aggregation order on any
    engine. Scale shape: token frequencies are one hash aggregation
    (map-side combine collapses repeats); the pair scoring joins the
    inverted (id, token, tf) lists only for documents that appear in
    ``pairs`` (semi-join pushdown) and shuffles on token like every
    verify-on-candidates step here.
    """
    # the candidate-pair frame is consumed by three join sites (the id
    # semi-join, the overlap aggregation, and the final left-join base)
    # and its plan usually embeds the expensive LSH candidate
    # generation — materialize it once, intra-invocation (guide §1.2)
    pairs = pairs.localCheckpoint()
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    toks = (
        df.join(ids, id_col, "semi")
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    # per-doc token count as a pure projection — identical to
    # toks.groupBy(id).count() (same non-empty-token rule); docs in a
    # candidate pair always have >= 1 token, so the > 0 filter keeps
    # the joinable row set identical to the aggregated one
    lens = df.select(
        F.col(id_col),
        F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).cast(
            "long"
        ).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    ta = tf.select(F.col(id_col).alias("id_a"), "tok", F.col("tf").alias("tf_a"))
    tb = tf.select(F.col(id_col).alias("id_b"), "tok", F.col("tf").alias("tf_b"))
    ov = (
        pairs.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("tf_a", "tf_b")).alias("overlap"))
    )
    la = lens.select(F.col(id_col).alias("id_a"), F.col("n_tokens").alias("n_a"))
    lb = lens.select(F.col(id_col).alias("id_b"), F.col("n_tokens").alias("n_b"))
    return (
        pairs.join(ov, ["id_a", "id_b"], "left")
        .join(la, "id_a")
        .join(lb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            F.round(
                F.coalesce("overlap", F.lit(0))
                / F.least("n_a", "n_b").cast("double"),
                6,
            ).alias("containment"),
        )
    )


def duplicated_window_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring duplicate spans at token granularity — the
    ExactSubstr rule of Lee et al., *Deduplicating Training Data Makes
    Language Models Better* (2021), re-expressed relationally: every
    length-``n`` token window whose exact text occurs ``min_count``+
    times in the corpus (any document, any position — same-doc repeats
    count) marks its tokens duplicated, and overlapping or touching
    duplicated windows merge into maximal per-document spans.

    Returns one row per maximal span: ``(doc_id, start_tok, end_tok,
    span_tokens)`` with token positions 0-based, ``end_tok``
    exclusive. A downstream cleaner can cut exactly these spans; the
    suffix-array step of the paper is unnecessary because fixed-n
    windows + island-merging recover the same maximal duplicated runs
    for any duplicated substring of length >= n.

    Scale shape (100 TB): window texts never leave the executors
    un-aggregated — duplication is ONE window-function shuffle
    partitioned by the window text (short: n tokens), and span
    merging is the classic gaps-and-islands fold, ONE more shuffle on
    (doc, pos). No cartesian product, no Python in the row path. At
    extreme corpus sizes, swap the partition key for
    ``xxhash64(wtext)`` to shuffle 8 bytes instead of text — kept
    textual here so the semantics stay exactly oracle-checkable
    (hash-collision-free).
    """
    win_expr = (
        f"case when size(toks) >= {int(n)} then "
        f"transform(sequence(0, size(toks) - {int(n)}), "
        f"i -> struct(i as pos, array_join(slice(toks, i + 1, {int(n)}), ' ') as wtext)) "
        f"else cast(array() as array<struct<pos:int,wtext:string>>) end"
    )
    wins = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("toks"),
        )
        .select("doc_id", F.explode(F.expr(win_expr)).alias("w"))
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.wtext").alias("wtext"))
    )
    dup = (
        wins.withColumn("n_occ", F.count(F.lit(1)).over(Window.partitionBy("wtext")))
        .where(F.col("n_occ") >= min_count)
        .select("doc_id", "pos")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    runs = dup.withColumn(
        "new_run",
        F.when(F.col("pos") - F.lag("pos").over(wdoc) <= n, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "run_id",
        F.sum("new_run").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            (F.max("pos") + F.lit(n)).cast("long").alias("end_tok"),
        )
        .select(
            "doc_id",
            "start_tok",
            "end_tok",
            (F.col("end_tok") - F.col("start_tok")).alias("span_tokens"),
        )
    )


def substring_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document roll-up of :func:`duplicated_window_spans`:
    ``(doc_id, n_spans, dup_tokens, total_tokens, dup_ratio)`` for
    EVERY document (span-free docs report zeros) — the corpus-funnel
    signal deciding which docs an exact-substring pass would cut and
    by how much. Spans are disjoint maximal islands, so summing their
    lengths is the exact duplicated-token count, never double-counted.
    One extra broadcast-join-back onto the (doc_id, total) projection.
    """
    spans = duplicated_window_spans(df, text_col, id_col, n, min_count)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("total_tokens"),
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        "total_tokens",
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("total_tokens").cast("double"), 6
        ).alias("dup_ratio"),
    )


def cut_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """The ExactSubstr cleaning ACTION: remove every token covered by a
    duplicated span (:func:`duplicated_window_spans`) and reassemble
    the document — what Lee et al. 2021 actually do to the corpus once
    spans are known. Returns every document: ``(doc_id, clean_text,
    n_kept, n_removed)`` (span-free docs come back verbatim).

    Scale shape: spans collapse to one array per affected doc (few
    spans each — they are maximal and disjoint), join back BROADCAST-
    or hash-joined on doc_id, and the cut itself is a JVM
    filter/exists over (token, position) structs — no per-token join,
    no Python. Disjointness of spans makes ``n_removed`` exact.
    """
    spans = duplicated_window_spans(df, text_col, id_col, n, min_count)
    span_arr = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("spans")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    joined = base.join(span_arr, "doc_id", "left")
    kept = F.expr(
        "case when spans is null then toks else "
        "transform(filter("
        "  transform(toks, (t, i) -> struct(t as t, i as i)),"
        "  p -> not exists(spans, s -> p.i >= s.start_tok and p.i < s.end_tok)"
        "), x -> x.t) end"
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def incremental_minhash_candidates(
    df: DataFrame,
    new_ids: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Dedup-on-commit: LSH candidate pairs where at least one side is
    a NEW document (``new_ids``: one column of ids) — the versioning ×
    dedup integration. A commit's near-dups are found by probing the
    corpus band index with only the new docs' bands; old×old pairs are
    never generated.

    Scale shape (100 TB): at gate scale bands are computed in-query,
    but the probe side is semi-joined to ``new_ids`` FIRST, so the
    equi-join is (new bands) × (all bands) — a 1% commit streams 1% of
    the band volume through the shuffle. In production the right side
    is the persisted band index of the previous snapshot (itself a
    content-addressed table this engine versions), making the whole
    pass O(new). Pairs canonicalize (least, greatest) + distinct, so
    the result is exactly the all-pairs candidate set restricted to
    pairs touching a new doc.
    """
    # the band table feeds BOTH join sides (probe + index) — checkpoint
    # it once so the shingle->signature pipeline is not evaluated twice
    # (the production analog is the persisted band index, see below)
    bandsdf = minhash_bands(df, text_col, id_col, n, num_hashes, bands).localCheckpoint()
    newb = bandsdf.join(new_ids.select(F.col(new_ids.columns[0]).alias(id_col)), id_col, "semi")
    a = newb.select(F.col(id_col).alias("na"), "band_id", "band_hash")
    b = bandsdf.select(F.col(id_col).alias("nb"), "band_id", "band_hash")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .where(F.col("na") != F.col("nb"))
        .select(
            F.least("na", "nb").alias("id_a"),
            F.greatest("na", "nb").alias("id_b"),
        )
        .distinct()
    )
