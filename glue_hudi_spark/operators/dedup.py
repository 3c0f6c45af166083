"""Deduplication operators for training-data pipelines.

Four tiers, cheapest → most recall, all deterministic and engine-portable
(md5-based hashing so a SQL oracle reproduces every value):

* ``exact_dedup``          — hash-groupBy on a normalized content hash.
* ``ngram_jaccard_pairs``  — n-gram shingle Jaccard similarity over
                             candidate pairs (bucketed to avoid O(n²)).
* ``minhash_lsh_pairs``    — MinHash signatures + banded LSH bucket join.
* ``simhash``              — 32-bit SimHash content signature per document.

Scale design (the point of each choice):

* No Python UDFs — everything is array/higher-order-function expressions
  that stay in whole-stage codegen.
* MinHash signatures are computed per-row with ``transform``+``array_min``
  over the shingle array — **zero shuffles** until the band bucket join.
* Candidate generation always goes through a bucket equi-join (LSH bands or
  (lang, length-band) blocking), never a cross join: at 100 TB a cross join
  is not a plan, it's an outage.
* Pair outputs are canonicalized (id_a < id_b) and distinct-ed so downstream
  connected-components / keep-one logic is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------- exact


def normalized_text(col="text"):
    """Lowercase, collapse whitespace — the canonical form for exact dedup."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per distinct normalized-content hash.

    One hash-aggregate (map-side partial min, then one shuffle on the
    content hash). Returns (content_hash, keep_id, dup_count).
    """
    return (
        df.select(
            F.md5(normalized_text(text_col)).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# ------------------------------------------------------------- shingles


def word_shingles(col="text", n: int = 3):
    """n-gram word shingles as an array column — computed with
    ``transform`` over an index sequence: no explode, no shuffle."""
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    k = F.size(words) - F.lit(n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    block_cols: list[str] | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ threshold.

    ``candidates`` (the 100 TB entry point): an (id_a, id_b) pair
    DataFrame — typically ``minhash_lsh_pairs(..., verify_threshold=None)``
    — whose pairs are verified with exact Jaccard. Candidate volume is
    governed by the LSH collision curve, never by block population.

    ``candidates=None`` falls back to blocking on ``block_cols`` plus an
    exact shingle-count band (near-dups have near-equal length), keeping
    the self-join an equi-join rather than a cross join. That is fine on
    bounded corpora and as a verify stage, but the within-block cost is
    O(B²): a popular (lang, length) block at corpus scale holds millions
    of docs — route through LSH candidates there (round-2 verdict).

    Jaccard is |A∩B| / |A∪B| on *distinct* shingle sets, computed with
    array_intersect/array_union (JVM-side).
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, n)).alias("sh"),
        *[F.col(c) for c in (block_cols or []) if candidates is None],
    )
    # |A∪B| = |A| + |B| − |A∩B| on the already-distinct shingle arrays:
    # same integer, but skips array_union's second per-pair hash-set
    # build + union-array allocation (the verify join's other half)
    inter_n = F.size(F.array_intersect("sh_a", "sh_b"))
    inter = inter_n.cast("double")
    union = (F.size("sh_a") + F.size("sh_b") - inter_n).cast("double")
    if candidates is not None:
        sa = shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
        sb = shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
        pairs = candidates.select("id_a", "id_b").join(sa, on="id_a").join(sb, on="id_b")
        return (
            pairs.withColumn("jaccard", F.round(inter / union, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    shingled = shingled.withColumn("n_sh", F.size("sh"))
    block = [*(block_cols or []), "len_band"]
    shingled = shingled.withColumn("len_band", F.floor(F.col("n_sh") / 20))
    a = shingled.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), *block
    )
    b = shingled.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), *block
    )
    pairs = a.join(b, on=block).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .distinct()
    )


# -------------------------------------------------------------- minhash


def minhash_hash_expr(s, j: int):
    """The j-th member of the portable MinHash family: 32 bits carved out
    of md5(shingle || ':' || j//4) — one md5 yields four independent 32-bit
    hashes (hex chars 1-8, 9-16, 17-24, 25-32), so a 16-hash signature
    costs 4 md5 calls per shingle instead of 16. Lexicographic min over
    8-hex-char strings is a valid min-hash; DuckDB reproduces it with the
    identical substr(md5(...)) expression."""
    salt, chunk = divmod(j, 4)
    return F.substring(F.md5(F.concat(s, F.lit(f":{salt}"))), 1 + 8 * chunk, 8)


def minhash_signature_from_shingles(sh, num_hashes: int = 16):
    """All ``num_hashes`` signature minima in ONE fold over the shingle
    array: per shingle compute num_hashes/4 md5s, carve each into four
    8-hex-char hashes, and `least` them into the accumulator. The shingle
    expression is referenced exactly once (Catalyst does no CSE across
    repeated higher-order-function arguments — 16 separate array_min
    passes recompute their input 16×)."""
    salts = num_hashes // 4
    init = F.array_repeat(F.lit("~"), num_hashes)  # '~' > any hex char

    def hashes_of(s):
        return F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(salts - 1)),
                lambda salt: F.transform(
                    F.sequence(F.lit(0), F.lit(3)),
                    lambda c: F.md5(
                        F.concat(s, F.lit(":"), salt.cast("string"))
                    ).substr(F.lit(1) + c * 8, F.lit(8)),
                ),
            )
        )

    return F.aggregate(
        sh, init, lambda acc, s: F.zip_with(acc, hashes_of(s), lambda a, b: F.least(a, b))
    )


def minhash_signature(col="text", n: int = 3, num_hashes: int = 16):
    """MinHash signature as an array<string> of length ``num_hashes``.

    Signature element j = min over the document's shingles of the j-th
    family hash (see ``minhash_hash_expr``). Engine-portable and computed
    per-row: a single array fold, zero shuffles.
    """
    return minhash_signature_from_shingles(
        F.array_distinct(word_shingles(col, n)), num_hashes
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    verify_threshold: float | None = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    ``num_hashes`` minhashes split into ``bands`` bands of r = H/b rows; a
    pair collides if any band's concatenated signature matches. Collision
    probability ≈ 1-(1-s^r)^b — with 16/8 (r=2) the curve is permissive, so
    an optional verify stage re-checks candidates with true shingle Jaccard
    (``verify_threshold``; None skips verification → raw candidates).

    Plan shape at scale: per-row signature (no shuffle) → explode to
    (band, band_hash) — ``bands``× row amplification of *small* id+hash
    rows (shingle arrays are NOT carried through the shuffle) → equi-join
    on (band, band_hash) → distinct id pairs → shingles joined back only
    for the surviving candidates' verification.

    ``materialize`` (verify path only): the shingled projection must be
    cached (it feeds both the signature pass and the verify join-back);
    with ``materialize=True`` the small survivor-pair output is local-
    checkpointed eagerly and the O(corpus) shingle cache is released
    before returning — repeated calls in a long session leak nothing.
    ``materialize=False`` returns the fully lazy plan and leaves the
    persist to the caller (used by plan-shape tests; call
    ``.unpersist()`` yourself or accept the cache until session end).
    """
    r = num_hashes // bands
    n_salts = (num_hashes + 3) // 4
    # fan out BEFORE the expensive per-row hashing: a small corpus arriving
    # as few parquet files (one 10 MB file = one task) would hash on a
    # single core. The repartition shuffles only raw (id, text) rows and
    # costs far less than the md5 work it parallelizes; at corpus scale
    # the scan already has >= cores partitions and this is a no-op.
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, n)).alias("sh"),
    ).withColumn(
        # per-shingle md5 digests, ONE per salt: every family member is an
        # 8-hex-char slice of one of these, so the num_hashes array_min
        # passes below never re-hash (Catalyst does no CSE across lambda
        # args — recomputing md5 inside each pass measured 2.5× slower).
        # When un-persisted, SimplifyExtractValueOps collapses hx[salt]
        # back to the direct md5 call, so the lazy path loses nothing.
        "hx",
        F.transform(
            F.col("sh"),
            lambda s: F.array(
                *[F.md5(F.concat(s, F.lit(f":{k}"))) for k in range(n_salts)]
            ),
        ),
    )
    if verify_threshold is not None:
        # one persist feeds the signature pass (hx), the verify join-back
        # (sh), and keeps the regex shingle split single-scan
        shingled = shingled.persist()

    def _min_j(j: int):
        salt, chunk = divmod(j, 4)
        return F.array_min(
            F.transform(
                F.col("hx"), lambda h: F.substring(h[salt], 1 + 8 * chunk, 8)
            )
        )

    sig = shingled.select(
        "id", F.array(*[_min_j(j) for j in range(num_hashes)]).alias("mh")
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws("|", *[F.col("mh")[b * r + i] for i in range(r)]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "band_hash")
    b = banded.select(F.col("id").alias("id_b"), "band", "band_hash")
    cand = (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    sa = shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = cand.join(sa, on="id_a").join(sb, on="id_b")
    # |A∪B| arithmetically from the distinct arrays — one hash-set pass
    # (the intersect) per pair instead of two (see ngram_jaccard_pairs)
    inter_n = F.size(F.array_intersect("sh_a", "sh_b"))
    inter = inter_n.cast("double")
    union = (F.size("sh_a") + F.size("sh_b") - inter_n).cast("double")
    out = (
        verified.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if materialize:
        # survivor pairs are tiny relative to the corpus: checkpoint them,
        # then release the big shingle cache (a bare persist here leaks in
        # the CacheManager until session end — round-2 ADVICE finding)
        out = out.localCheckpoint(eager=True)
        shingled.unpersist()
    return out


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    rare_per_doc: int = 3,
    max_df: int = 50,
    materialize: bool = True,
) -> DataFrame:
    """ASYMMETRIC near-duplicate pairs by n-gram shingle CONTAINMENT:
    |A∩B| / min(|A|, |B|) ≥ threshold (Broder's containment measure).

    Catches the doc-inside-doc case symmetric Jaccard structurally
    misses — a 100-shingle article fully quoted inside a 1000-shingle
    page has Jaccard 0.1 but containment 1.0 (boilerplate wrappers,
    quote farms, re-publishes with added chrome — the duplication mode
    MinHash-LSH pipelines leave behind). Returns (id_small, id_big,
    containment) with ``id_small`` the CONTAINED (smaller shingle set)
    side — the natural drop candidate; composes with
    ``resolve_clusters``/``drop_near_duplicates`` like any pair source.

    Candidates come from RARE-SHINGLE blocking, not MinHash (whose LSH
    collision curve tracks Jaccard, so it structurally under-recalls
    exactly the pairs this function exists for): each doc emits its
    ``rare_per_doc`` globally rarest shingles (document frequency ≤
    ``max_df``; ties by shingle text, so the pick is deterministic),
    and a candidate pair is (doc, ANY doc containing one of its rare
    shingles) — rare side joined against the FULL exploded shingle
    postings, not rare-vs-rare: a container's own rarest shingles are
    its unique chrome (df=1), never the shared quote, so rare-vs-rare
    would structurally miss the one-sided case this exists for. A
    contained doc's shingles ALL appear in its container, so its rare
    picks (df ≥ 2 by containment) collide with the container's
    postings — candidate recall ≈ 1-(1-c)^r, ~1 at the c ≥ 0.9 this
    targets. Scale shape: one groupBy(shingle) for document frequency,
    one shuffle to join df back, a per-doc top-r (map-side
    combinable), and a candidate equi-join bounded by Σ df(g) over
    rare picks ≤ r × N × max_df — never block-population-squared;
    exact verification joins only the candidates.

    ``materialize``: the shingled projection feeds FOUR plan legs (the
    df-count groupBy, the rare-pick join, and both verify sides);
    un-persisted, Catalyst re-runs the regex shingle split once per leg
    (measured: 4 near-equal heavy jobs at sf0.1 — the dominant term).
    True (default) persists it for the call, eagerly checkpoints the
    tiny survivor-pair output, and releases the cache before returning —
    the same single-scan discipline as ``minhash_lsh_pairs``. False
    returns the fully lazy plan (plan-shape tests; the caller owns any
    caching).
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, n)).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    if materialize:
        shingled = shingled.persist()
    ex = shingled.select("id", F.explode("sh").alias("g"))
    dfreq = (ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
             .filter(F.col("df") <= max_df))
    # per-doc r rarest shingles: (df, g) ascending — the same
    # (ORDER BY df, g) the SQL oracle replays, so picks are identical
    pick = F.struct(F.col("df"), F.col("g"))
    rare = (
        ex.join(dfreq, on="g")
        .groupBy("id")
        .agg(F.slice(F.sort_array(F.collect_list(pick)), 1,
                     rare_per_doc).alias("_picks"))
        .select("id", F.explode("_picks").alias("_p"))
        .select("id", F.col("_p.g").alias("g"))
    )
    pairs = (
        rare.select(F.col("id").alias("_ra"), "g")
        .join(ex.select(F.col("id").alias("_xb"), "g"), on="g")
        .filter(F.col("_ra") != F.col("_xb"))
        .select(F.least("_ra", "_xb").alias("id_a"),
                F.greatest("_ra", "_xb").alias("id_b"))
        .distinct()
    )
    sa = shingled.select(F.col("id").alias("id_a"),
                         F.col("sh").alias("sh_a"),
                         F.col("n_sh").alias("n_a"))
    sb = shingled.select(F.col("id").alias("id_b"),
                         F.col("sh").alias("sh_b"),
                         F.col("n_sh").alias("n_b"))
    verified = (
        pairs.join(sa, on="id_a").join(sb, on="id_b")
        .withColumn(
            "containment",
            F.round(F.size(F.array_intersect("sh_a", "sh_b"))
                    .cast("double")
                    / F.least("n_a", "n_b").cast("double"), 6))
        .filter(F.col("containment") >= threshold)
    )
    small_first = F.col("n_a") <= F.col("n_b")
    out = verified.select(
        F.when(small_first, F.col("id_a")).otherwise(F.col("id_b"))
        .alias("id_small"),
        F.when(small_first, F.col("id_b")).otherwise(F.col("id_a"))
        .alias("id_big"),
        "containment",
    )
    if materialize:
        # survivor pairs are tiny relative to the corpus: checkpoint them,
        # then release the shingle cache (same lifecycle as
        # minhash_lsh_pairs — a bare persist would leak until session end)
        out = out.localCheckpoint(eager=True)
        shingled.unpersist()
    return out


# ------------------------------------------------- embedding near-dup


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    m: int = 4,
    n_bands: int = 1,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Candidates are blocked on the deterministic sign-bit bucket (see
    ``operators.similarity.signbit_bucket``): near-dup vectors mostly share
    coordinate signs, so the equi-join on bucket prunes ~2^m× of the pair
    space — and keeps the plan a shuffle join instead of a cross join.
    Output: (id_a, id_b, sim) with id_a < id_b, sim rounded to 6 dp.

    **Choosing m and n_bands (the 100 TB knobs).** Within-bucket comparison
    is quadratic in bucket size ≈ n/2^m, so m must GROW with the corpus:
    ``m ≈ log2(n / target_bucket_rows)`` (see ``auto_signbit_m``). Each
    extra sign bit splits true pairs whose vectors disagree in that
    coordinate's sign — measured on planted 1%-noise duplicates, single-band
    recall at m=8 is ~0.87. ``n_bands > 1`` is the standard OR-construction
    repair: band b buckets on coordinates [b·m, (b+1)·m), candidate sets
    are unioned, and a true pair is missed only if EVERY band splits it —
    2 bands restore recall 1.0 on the same fixture
    (``tests/test_extensions.py::test_embedding_pairs_recall_m8``).
    Within-band cost is unchanged; candidate generation is ~n_bands×.
    Requires vec dims ≥ m·n_bands. All-band precision stays exact: every
    candidate is verified with true cosine before output.
    """
    from glue_hudi_spark.operators.similarity import _dot, _norm, signbit_bucket

    # norms are computed ONCE PER ROW below the join (the projection stays
    # under the Join in the optimized plan), not once per pair inside the
    # cosine — the per-pair work is a single dot-product fold. Arithmetic
    # is identical (same ops, same order), so oracle hashes are unchanged.
    def _sim(joined):
        return F.round(
            _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
        )

    keyed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("nv", _norm(F.col("v")))
    if n_bands <= 1:
        # single band: carry vectors straight through the bucket join (one
        # join, no distinct) — candidate sets can't overlap across bands
        bucketed = keyed.withColumn("bucket", signbit_bucket("v", m))
        a = bucketed.select(
            F.col("id").alias("id_a"), F.col("v").alias("v_a"),
            F.col("nv").alias("n_a"), "bucket",
        )
        b = bucketed.select(
            F.col("id").alias("id_b"), F.col("v").alias("v_b"),
            F.col("nv").alias("n_b"), "bucket",
        )
        j = a.join(b, on="bucket").filter(F.col("id_a") < F.col("id_b"))
        return (
            j.withColumn("sim", _sim(j))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim")
        )
    banded = keyed.select(
        "id",
        F.posexplode(
            F.array(*[signbit_bucket("v", m, offset=b * m) for b in range(n_bands)])
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = keyed.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nv").alias("n_a")
    )
    vb = keyed.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nv").alias("n_b")
    )
    j = cand.join(va, on="id_a").join(vb, on="id_b")
    return (
        j.withColumn("sim", _sim(j))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    iters: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means partition the
    embedding space, then EXACT cosine verification within each learned
    cluster only (Abbas et al. 2023's recipe — semantic duplicates land in
    the same k-means cell, so the pair space shrinks from O(n²) to
    Σ|cell|²).

    Differences from ``embedding_cosine_pairs``: the blocking key is a
    LEARNED partition (k-means cell), not a data-independent sign-bit
    bucket — it adapts to the corpus's actual density, which is what makes
    the method "semantic". Training cost is corpus-size-independent
    (``kmeans_centroids``: zero-shuffle literal argmax assignment + one
    narrow groupBy per iteration); assignment is a scan-stage projection;
    the within-cell self-join is an equi-join on cell, shuffle-partitioned
    and AQE-skew-split — never a cross join.

    At 100 TB, ``n_centroids`` is the knob: within-cell comparison is
    quadratic in cell size ≈ n/k, so k grows with the corpus exactly as
    SemDeDup runs it (tens of thousands of clusters for web-scale); above
    ``similarity.INLINE_CENTROID_MAX`` assignment switches to the
    broadcast-join path automatically.

    Output: (id_a, id_b, sim) with id_a < id_b, cosine rounded to 6 dp,
    sim ≥ threshold. Deterministic end-to-end (seeded init, exact-decimal
    means, ties to the lowest cell), so a SQL oracle can replay training.
    """
    from glue_hudi_spark.operators.similarity import (
        INLINE_CENTROID_MAX,
        _assign_by_join,
        _dot,
        _nearest_cell_expr,
        _norm,
        kmeans_centroids,
    )

    cents = kmeans_centroids(
        df, n_centroids=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
    )
    keyed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if len(cents) > INLINE_CENTROID_MAX:
        assigned = _assign_by_join(keyed, cents)
    else:
        assigned = keyed.withColumn("cell", _nearest_cell_expr(cents, F.col("v")))
    assigned = assigned.withColumn("nv", _norm(F.col("v")))
    a = assigned.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"),
        F.col("nv").alias("n_a"), "cell",
    )
    b = assigned.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"),
        F.col("nv").alias("n_b"), "cell",
    )
    j = a.join(b, on="cell").filter(F.col("id_a") < F.col("id_b"))
    return (
        j.withColumn(
            "sim",
            F.round(_dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# ------------------------------------------------- cluster resolution


def resolve_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    broadcast_max_nodes: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-dup pairs → (member_id, cluster_id,
    keep_id), the step every fuzzy-dedup tier needs before rows can be
    dropped (A~B and B~C must resolve to ONE survivor of {A,B,C}).

    Algorithm: distributed min-label propagation with path-halving.
    Every node starts labeled with its own id; each round a node takes the
    minimum of (its label, its neighbors' labels, its label's label — the
    pointer-jump that turns O(diameter) rounds into O(log diameter) on
    chain-shaped clusters). At fixpoint every member carries the minimum
    id of its component — so ``cluster_id`` doubles as ``keep_id``
    (keep-the-smallest-id policy, same tie-break as ``exact_dedup``).

    Scale shape: the edge list is materialized ONCE (localCheckpoint —
    iterations must not re-run the candidate-generation pipeline feeding
    it), then every round is two joins + one groupBy on the label table,
    whose size is |nodes-in-any-pair| — tiny next to the corpus. Label
    tables are checkpointed per round to truncate lineage (the standard
    Spark iterative-algorithm pattern; all driver-side state is a single
    per-round changed-row count). Each round is ONE Spark job: the
    checkpoint is lazy and the convergence count's action materializes
    it (an eager checkpoint + isEmpty probe was 2-4 jobs/round — take-1
    escalates over the empty filter result on the converged round).
    Superseded label tables and the edge list are unpersisted as soon
    as the next round's checkpoint holds — without that, every round of
    every call leaks a MEMORY_AND_DISK table until the ContextCleaner's
    periodic GC (default 30 min).

    Join strategy is picked DELIBERATELY from a measured size, not left
    to the planner: checkpointed frames carry no statistics, so every
    per-round join would default to sort-merge — ~7 exchanges/round
    that AQE schedules as ~14 tiny stage-jobs (measured 64 jobs/4.5 s
    for a 330-pair input, pure scheduling). One count of the node table
    (known and CONSTANT across rounds) decides: at or below
    ``broadcast_max_nodes`` (default 1M rows ≈ tens of MB built) the
    label/neighbor/hop sides broadcast and each round's only exchange
    is the message groupBy; above it, the sort-merge shape — the one
    that scales — is kept unchanged. Deterministic: fixpoint is
    independent of iteration order/count (and of join strategy), so a
    SQL oracle can replay it with a recursive transitive closure.

    Raises ``RuntimeError`` if not converged after ``max_iters`` rounds
    (with path-halving that needs a component diameter > 2^max_iters —
    pathological input, not a tuning problem).
    """
    from glue_hudi_spark.checkpoints import release_checkpoint

    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    sym = fwd.union(rev).distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_ckpt = labels  # released once its successor round holds
    # |nodes| never changes across rounds: one metadata-sized count on
    # the just-checkpointed init table decides the round join strategy
    small = labels.count() <= broadcast_max_nodes

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    def _propagate(lbl: DataFrame) -> DataFrame:
        """One min-label round over (id, old, label): neighbor minimum +
        label-of-label pointer jump (path halving). ``old`` rides along
        untouched so a multi-round batch can still prove convergence."""
        neigh = (
            sym.join(
                _b(lbl.select(F.col("id").alias("dst"),
                              F.col("label").alias("nl"))),
                on="dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("min_nl"))
            .withColumnRenamed("src", "id")
        )
        hop = lbl.select(
            F.col("id").alias("label"), F.col("label").alias("ll")
        )
        return (
            lbl.join(_b(neigh), on="id", how="left")
            .join(_b(hop), on="label", how="left")
            .select(
                "id",
                "old",
                F.least(
                    F.col("label"),
                    F.coalesce("min_nl", "label"),
                    F.coalesce("ll", "label"),
                ).alias("label"),
            )
        )

    # TWO propagation rounds per action: each action carries ~0.5 s of
    # driver planning + scheduling regardless of data size (measured
    # round 13), so chain-heavy graphs pay O(log diameter) of it.
    # Batching is fixpoint-safe — labels are monotone non-increasing and
    # the fixpoint is round-count independent — and convergence stays
    # exact: ``old`` is the label BEFORE the batch, so count(label<old)
    # is 0 iff NEITHER round changed anything. A converged graph's
    # confirm pass runs one redundant propagation over the (tiny,
    # checkpoint-backed) label table; a diameter-2^k chain halves its
    # actions.
    rounds_done = 0
    while rounds_done < max_iters:
        cur = labels.select(
            "id", F.col("label").alias("old"), "label")
        stepped = _propagate(cur)
        steps = 1
        if rounds_done + 2 <= max_iters:
            stepped = _propagate(stepped)
            steps = 2
        nxt = stepped.localCheckpoint(eager=False)
        # the count's action materializes the LAZY checkpoint in the
        # same job it probes — one job per batch, and a full count of
        # the (tiny, now-cached) label table instead of isEmpty's
        # escalating take-1 sweep on the converged round
        converged = nxt.filter(F.col("label") < F.col("old")).count() == 0
        release_checkpoint(prev_ckpt)
        prev_ckpt = nxt
        labels = nxt.select("id", "label")
        rounds_done += steps
        if converged:
            break
    else:
        raise RuntimeError(
            f"resolve_clusters did not converge in {max_iters} rounds"
        )
    release_checkpoint(sym)
    return labels.select(
        F.col("id").alias("member_id"),
        F.col("label").alias("cluster_id"),
        F.col("label").alias("keep_id"),
    )


def keep_best_in_clusters(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Re-elect each cluster's keeper by QUALITY instead of min-id:
    (member_id, cluster_id, keep_id) with keep_id = the member with the
    highest ``score_col`` (ties → smaller id; NULL scores last) — the
    FineWeb/Gopher keep-best-representative policy: dedup must not
    delete the cleanest copy just because a dirtier one has a smaller
    id. The window runs over the MEMBERS table (|docs-in-any-pair|
    rows), never the corpus; the per-cluster partition is a duplicate
    cluster's membership — small by construction."""
    from pyspark.sql import Window

    scored = clusters.select("member_id", "cluster_id").join(
        df.select(F.col(id_col).alias("member_id"),
                  F.col(score_col).alias("_s")),
        on="member_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_s").desc_nulls_last(), F.col("member_id").asc())
    keep = (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("cluster_id", F.col("member_id").alias("keep_id")))
    return (scored.select("member_id", "cluster_id")
            .join(keep, on="cluster_id")
            .select("member_id", "cluster_id", "keep_id"))


def drop_near_duplicates(
    df: DataFrame, clusters: DataFrame, id_col: str = "doc_id",
    score_col: str | None = None,
) -> DataFrame:
    """Keep-one enforcement: remove every cluster member except its keeper.

    ``clusters`` is ``resolve_clusters`` output. One left-anti join on the
    id column; the loser set is |members| - |clusters| rows — let AQE pick
    broadcast vs shuffle by its actual size (at 100 TB a heavy-dup corpus
    makes it too big to broadcast blindly).

    ``score_col``: keep the highest-scoring member per cluster instead of
    the smallest id (see ``keep_best_in_clusters``).
    """
    if score_col is not None:
        clusters = keep_best_in_clusters(df, clusters, id_col, score_col)
    losers = clusters.filter(F.col("member_id") != F.col("keep_id")).select(
        F.col("member_id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


# -------------------------------------------------------------- simhash


def simhash(col="text", bits: int = 32):
    """SimHash signature (bigint) from the document's distinct tokens.

    bit_i = sign of Σ_tokens (±1 depending on bit i of md5(token)) — a
    32-bit locality-sensitive content hash; near-identical documents differ
    in few bits (compare with hamming distance via xor + bit_count).
    Portable: both engines parse the first 8 md5 hex chars as an integer.
    """
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(col))), r"\s+"))
    # one md5 per token, then a single array-fold accumulating all bit votes
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
    )
    zeros = F.array_repeat(F.lit(0).cast("bigint"), bits)
    # bit i of hv == (hv DIV 2^i) % 2 — hv < 2^32 so double pow is exact
    bit = lambda hv, i: (  # noqa: E731
        F.floor(hv / F.pow(F.lit(2.0), i.cast("double"))).cast("bigint") % 2
    )
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, hv: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda i: F.when(bit(hv, i) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("bigint"),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, i: F.when(
                v > 0, F.pow(F.lit(2.0), i.cast("double")).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )


# ------------------------------------------------------------ line dedup


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level line deduplication (the C4/RefinedWeb cleanup step):
    a line whose trimmed form appears in >= ``min_count`` DISTINCT
    documents is kept only in its keeper document (min id) and removed
    from every other; rarer lines pass through untouched. Documents are
    reassembled in original line order; documents left with zero lines
    drop out.

    Returns (id, text, n_lines, n_removed).

    Scale shape: posexplode (map-side) -> one aggregate keyed on the
    md5 of the trimmed line (fixed-width shuffle key, never the line
    bytes) -> equi-join back on that hash -> one groupBy(id) to
    reassemble. Two shuffles total, both on hash keys; no window over
    the corpus, no driver-side state — the same plan at 100 TB, where
    line frequency skew ("Subscribe to our newsletter") is absorbed by
    the aggregate's map-side partial counts.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_ld_pos", "_ld_line"),
    ).withColumn("_ld_h", F.md5(F.trim(F.col("_ld_line"))))
    stats = lines.groupBy("_ld_h").agg(
        F.countDistinct(id_col).alias("_ld_docs"),
        F.min(id_col).alias("_ld_keeper"),
    )
    kept = lines.join(stats, "_ld_h").filter(
        (F.col("_ld_docs") < F.lit(min_count))
        | (F.col(id_col) == F.col("_ld_keeper"))
    )
    orig = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).alias("_ld_orig"),
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_ld_pos", "_ld_line"))
                    ),
                    lambda s: s["_ld_line"],
                ),
                "\n",
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .join(orig, id_col)
        .select(
            id_col,
            text_col,
            "n_lines",
            (F.col("_ld_orig") - F.col("n_lines")).alias("n_removed"),
        )
    )


def boilerplate_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate fraction: the share of a document's lines
    whose trimmed form appears in ≥ ``min_docs`` DISTINCT documents
    ("Subscribe to our newsletter", nav bars, cookie banners). The signal
    quality filters threshold on before line_dedup surgically removes the
    lines themselves.

    Returns (id, n_lines, n_boiler, boiler_frac round-6).

    Scale shape mirrors ``line_dedup``: posexplode → one aggregate keyed
    on the line-hash md5 (fixed-width shuffle key) → equi-join back →
    one groupBy(id). Line-frequency skew lands in the aggregate's
    map-side partial counts, never on a single reducer.
    """
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("_bp_line"),
    ).withColumn("_bp_h", F.md5(F.trim(F.col("_bp_line"))))
    stats = lines.groupBy("_bp_h").agg(
        F.countDistinct(id_col).alias("_bp_docs")
    )
    return (
        lines.join(stats, "_bp_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("_bp_docs") >= F.lit(min_docs), 1).otherwise(0)
            ).alias("n_boiler"),
        )
        .select(
            id_col,
            "n_lines",
            "n_boiler",
            F.round(
                F.col("n_boiler").cast("double") / F.col("n_lines"), 6
            ).alias("boiler_frac"),
        )
    )


# ----------------------------------------------------- incremental dedup


#: Bloom bucket modulus shared by the pre-filter paths (see
#: ``operators/dedup_index._BLOOM_BUCKETS`` for the design record):
#: false-positive rate ≈ distinct_small_side / 2^26.
_BLOOM_BUCKETS = 1 << 26


def bloom_bucket_prefilter(
    big: DataFrame,
    big_col: str,
    small: DataFrame,
    small_col: str,
    max_buckets: int = 1_000_000,
) -> DataFrame | None:
    """Single-hash Bloom pre-filter expressed as a broadcast LEFT SEMI
    join: the small side's values map to ``pmod(xxhash64(v), 2^26)``
    buckets (materialized executor-side, distinct — batch-sized), and
    the big side streams against the broadcast LongHashedRelation of
    that bucket set. The SAME bucket expression on both sides means a
    big-side value equal to a small-side value always survives — false
    negatives are impossible; false positives (~|small|/2^26 of the big
    side) only pass extra rows to whatever exact join follows, so
    correctness is never in the pre-filter's hands.

    Returns the filtered big side, or None when the small side exceeds
    ``max_buckets`` distinct buckets — force-broadcasting an unbounded
    set is how drivers die, so oversized callers keep their plain plan.

    Never a plan literal: shipping the bucket set as an ``F.lit``
    bitstring was measured at 36 MiB task binaries and a >20× stall
    (Catalyst duplicates large literals across expression copies)."""
    buckets = (
        small.select(F.pmod(F.xxhash64(small_col), F.lit(_BLOOM_BUCKETS))
                     .alias("__ghs_bb__"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if buckets.limit(max_buckets + 1).count() > max_buckets:
        return None
    return big.join(
        F.broadcast(buckets),
        on=F.pmod(F.xxhash64(big_col), F.lit(_BLOOM_BUCKETS))
        == F.col("__ghs_bb__"),
        how="left_semi",
    )


def incremental_exact(
    batch: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_max_buckets: int = 0,
) -> DataFrame:
    """Arrival-time dedup for a continuously-ingested corpus: keep only
    the batch rows whose normalized content hash is absent from the
    already-ingested corpus, then collapse in-batch duplicates to the
    min-id representative.

    Scale shape: the corpus side reduces to a DISTINCT hash projection
    (one narrow column through the shuffle — never the text bytes), the
    batch anti-joins it on the hash (AQE broadcasts when the batch is the
    small side, which at ingestion time it always is... but the join is
    written side-agnostically so a backfill-sized batch still plans as a
    shuffle join), and the in-batch keep-one is the same one-aggregate
    pattern as ``exact_dedup``.

    ``bloom_max_buckets`` (opt-in, e.g. 1_000_000): the left_anti's
    RIGHT side cannot broadcast, so every distinct corpus hash shuffles
    per batch — at a 100-TB corpus that shuffle, not the scan, is the
    per-batch bill. The knob pre-filters the corpus hash projection
    with :func:`bloom_bucket_prefilter` against the batch's bucket set
    (identical verdicts — the exact anti-join still runs), cutting the
    corpus-side shuffle to O(batch + false positives). Batches wider
    than the cap keep the plain plan. The corpus TEXT scan is intrinsic
    either way; the persisted ``DedupIndex`` is the path that removes
    it.
    """
    bh = batch.withColumn("_ghs_h", F.md5(normalized_text(text_col)))
    seen_src = existing.select(
        F.md5(normalized_text(text_col)).alias("_ghs_h")
    )
    if bloom_max_buckets > 0:
        filtered = bloom_bucket_prefilter(
            seen_src, "_ghs_h", bh.select("_ghs_h"), "_ghs_h",
            max_buckets=bloom_max_buckets)
        if filtered is not None:
            seen_src = filtered
    seen = seen_src.distinct()
    # fresh is referenced by BOTH the keep-one aggregate and the final
    # semi-join. Deliberately NOT checkpointed (round 14): each
    # re-derivation is a column-pruned scan + md5 + an anti-join whose
    # corpus side AQE runtime-broadcasts — map-side cheap, nothing wide
    # shuffles — while a lazy checkpoint materializes the FULL-WIDTH
    # novel rows (text included) through executor storage. Measured
    # 1.4x SLOWER with the checkpoint at a 300x corpus (36.3 s vs
    # 25.5 s, tools/ab_sharing_bigsf.py), and at backfill batch sizes
    # the store is corpus-scale.
    fresh = bh.join(seen, "_ghs_h", "left_anti")
    keep = fresh.groupBy("_ghs_h").agg(F.min(id_col).alias(id_col))
    return (
        fresh.join(keep, ["_ghs_h", id_col], "left_semi")
        .drop("_ghs_h")
    )
