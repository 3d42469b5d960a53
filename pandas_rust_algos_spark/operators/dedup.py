"""Deduplication operators for training-data pipelines.

Five families, all shuffle-conscious and driver-loop-free:

- exact:        hash-groupBy on (normalized) content — one shuffle.
- minhash LSH:  shingle → 32 minhashes → 8 bands → bucket self-join.
                Candidate generation never compares all pairs: only
                docs sharing a band bucket meet, so cost tracks true
                near-duplicate density, the property that makes
                MinHash the standard at web scale.
- simhash:      64-bit weighted token-hash sign fingerprint; near-dup
                candidates via 16-bit chunk banding + hamming check.
- n-gram jaccard: exact set similarity on blocked pairs (engine-
                portable — no hash functions — hence oracle-checkable).
- embedding cosine: near-dup pairs over a vector column, blocked to
                keep the pair space linear-ish.

Everything is built-in expressions (xxhash64, higher-order array
functions, joins); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandas_rust_algos_spark import cachelife

__all__ = [
    "normalize_text",
    "dedup_exact",
    "dedup_soft_weights",
    "shingles",
    "minhash_signatures",
    "minhash_candidates",
    "minhash_near_dupes",
    "simhash",
    "simhash_near_dupes",
    "ngram_jaccard_pairs",
    "jaccard_prefix_pairs",
    "embedding_near_dupes",
    "dup_clusters",
    "keep_canonical",
    "duplicated_spans",
    "strip_duplicated_spans",
    "sql_duplicated_spans",
    "sql_strip_duplicated_spans",
]


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace,
    strip punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[.,!?;:]", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def dedup_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    normalized: bool = True,
) -> DataFrame:
    """Exact dedup: one row per distinct content with the smallest id as
    representative and the duplicate count. Single hash shuffle on the
    content digest (group on md5, not the full text, so 100 KB docs
    shuffle 32-byte keys)."""
    content = normalize_text(text_col) if normalized else F.col(text_col)
    return (
        df.select(F.md5(content).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-grams (array) — computed via sequence +
    substring, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
            lambda i: F.substring(c, i, k),
        )
    )


def _mh_hash(i: int, col, hash_mode: str):
    """Per-permutation shingle hash. ``fast`` = xxhash64 (the 100 TB
    default — cheapest JVM hash). ``portable`` = md5-prefix→60-bit int,
    byte-identical in any engine with md5 (the shard_assign recipe) —
    slower, but it makes the WHOLE minhash pipeline replayable by a
    SQL oracle."""
    if hash_mode == "fast":
        return F.xxhash64(F.lit(i), col)
    if hash_mode == "portable":
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(i)), col)), 1, 15),
            16, 10,
        ).cast("long")
    raise ValueError(f"hash_mode must be fast|portable, got {hash_mode!r}")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    num_hashes: int = 32,
    hash_mode: str = "fast",
) -> DataFrame:
    """Per-doc minhash signature: sig[i] = min over shingles of
    hash_i(shingle). One explode + one groupBy with num_hashes
    aggregate mins — a single pass, map-side combined."""
    sh = df.select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("shingle")
    )
    mins = [
        F.min(_mh_hash(i, F.col("shingle"), hash_mode)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agged = sh.groupBy(id_col).agg(*mins)
    return agged.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def _band_bucket_expr(i: int, rows_per_band: int, hash_mode: str) -> Column:
    """Bucket key for band ``i`` over the ``sig`` column: hash of the
    band's signature slice (xxhash64 fast path, md5-prefix portable
    path — the same split as :func:`_mh_hash`). Shared by the fused
    near-dup pipeline and the persisted signature store."""
    cols = [F.col("sig")[i * rows_per_band + r]
            for r in range(rows_per_band)]
    if hash_mode == "portable":
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    ":", F.lit(str(i)),
                    *[c.cast("string") for c in cols])), 1, 15),
            16, 10,
        ).cast("long")
    return F.xxhash64(F.lit(i), *cols)


def minhash_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    *,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a
    candidate pair. Bucket key = hash of the band slice; self-join on
    (band, bucket) with id< id ordering; distinct."""
    b = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.xxhash64(
                        F.lit(i),
                        *[F.col("sig")[i * rows_per_band + r]
                          for r in range(rows_per_band)],
                    ).alias("bucket"),
                )
                for i in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    left = b.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = b.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_mode: str = "fast",
    max_bucket: int | None = None,
) -> DataFrame:
    """End-to-end MinHash near-dup detection: signatures → LSH band
    buckets → estimated jaccard (fraction of agreeing minhashes)
    filtered at ``threshold``. ``hash_mode="portable"`` swaps xxhash64
    for the md5-prefix hash, making every stage SQL-replayable (see
    :func:`_mh_hash`) at some per-shingle hashing cost.

    ``max_bucket`` is the WHALE-BUCKET guard (r7 VERDICT next-#6):
    the band self-join is quadratic in a bucket's size, so at 100 TB
    one boilerplate bucket (millions of near-identical docs — cookie
    banners, licence headers) is a straggler task that dwarfs the
    stage. Buckets larger than ``max_bucket`` skip all-pairs and
    instead link CONSECUTIVE members in id order (a representative
    chain: n−1 pairs instead of n(n−1)/2). The chain preserves the
    connected-component closure that ``dup_clusters`` resolves —
    every whale-bucket member stays reachable from every other —
    while bounding any bucket's pair count linearly; what it gives up
    is per-pair completeness INSIDE whale buckets (chain neighbors
    whose estimate dips below ``threshold`` can split a component —
    immaterial for true boilerplate whales, whose members agree on
    nearly every minhash). ``None`` disables the guard (exact LSH
    semantics; the oracled portable gate). The production default
    wires 1000: all-pairs for every realistic near-dupe cluster,
    chains only for degenerate whales.

    **Setting ``max_bucket`` makes construction EAGER** (r8 ADVICE,
    documented rather than deferred after measuring the alternatives
    — see SCALE.md r9): the builder runs ONE narrow counting job over
    the persisted band table to materialize the whale key set before
    the plan is returned, so bucket sizes can prune the plan itself —
    zero whales (the overwhelmingly common case) means the returned
    plan IS the exact unguarded plan reading the shared cache. The
    fully-lazy alternative (broadcast anti/semi probes against the
    count aggregate) measured +0.9 s WORSE at sf0.1 because Catalyst
    re-instantiates the aggregate subplan per probe — the count runs
    2–3× with no exchange reuse. Pass ``max_bucket=None`` for a pure
    lazy plan-builder (explain-only callers, conditional pipelines).

    Fused plan: the signature array (num_hashes longs, ~256 B/doc)
    rides THROUGH the band explode into the bucket self-join, so the
    matched pair carries both signatures and the estimate is computed
    in place — no re-join of the signature table per side. With the
    guard on, the EXPLODED BAND TABLE is persisted (id + sig + band +
    bucket; bands× the signature store, still tiny next to the
    corpus): the whale count populates the cache and both self-join
    sides reread it with zero re-explode, so the guard's marginal
    cost is only the narrow count itself. Unguarded, the signature
    table is persisted instead (it feeds both self-join sides and
    Catalyst does not materialize common subplans: without it the
    whole shingle+hash pipeline runs twice). The estimate filter runs
    BEFORE the dedup shuffle so only above-threshold pairs shuffle
    twice. The whale chain adds NO exchange: the per-bucket lead
    window shares the (band, bucket) partitioning of the semi probe.
    Cost still tracks true near-duplicate density — only docs sharing
    a band bucket ever meet."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col, k=k, num_hashes=num_hashes,
        hash_mode=hash_mode,
    )
    if max_bucket is None:
        # referenced by both self-join sides of the returned plan →
        # tracked for deferred release by the materializing caller
        sigs = cachelife.track(sigs.persist())

    b = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    _band_bucket_expr(i, rows_per_band, hash_mode)
                    .alias("bucket"))
                for i in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.bucket")
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda x: x,
            )
        ).cast("double")
        / num_hashes
    )
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
        # The guard must cost ~nothing when no whale exists (the
        # overwhelmingly common case). Designs measured and rejected
        # (SCALE.md r8–r9): window-count annotate and wide-row count
        # join — ~2× the gate (sorts/shuffles the wide sig rows);
        # fully-lazy broadcast anti/semi against the count aggregate —
        # +0.9 s, because Catalyst re-instantiates the aggregate
        # subplan per probe (no exchange reuse across the three
        # references) so the count runs 2–3×. What survives: ONE
        # narrow counting job over the PERSISTED exploded band table
        # materializes the whale key set up front; the pair-join
        # sides then reread that same cache with zero re-explode, so
        # the guard's marginal cost is only the narrow count itself.
        # Each key represents > max_bucket docs, so the set holds
        # ≤ docs·bands/max_bucket rows — the limit(cap+1)-guarded
        # collect is metadata-sized by construction (1e9 docs × 8
        # bands ÷ 1000 tops out in the low millions only if the
        # ENTIRE corpus is whales; the fallback below keeps even that
        # case distributed). Zero whales → the EXACT unguarded plan
        # runs over the cache; few whales → the key set rides the
        # anti/semi probes as an explicit broadcast; a key set too
        # big to collect → plain joins, AQE decides. NOTE this makes
        # the builder EAGER when max_bucket is set: constructing the
        # DataFrame runs the signature pipeline once to size buckets
        # (documented in the docstring; pass max_bucket=None for a
        # pure lazy plan).
        b = cachelife.track(b.persist())
        whales_df = (
            b.select("band", "bucket")
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .where(F.col("__bn") > max_bucket)
            .select("band", "bucket")
        )
        _cap = 100_000
        wk = whales_df.limit(_cap + 1).collect()
        if not wk:
            small, whale = b, None
        else:
            if len(wk) <= _cap:
                whales = F.broadcast(b.sparkSession.createDataFrame(
                    [(r["band"], r["bucket"]) for r in wk],
                    "band int, bucket long"))
            else:
                whales = whales_df
            small = b.join(whales, ["band", "bucket"], "left_anti")
            wchain = Window.partitionBy("band", "bucket") \
                .orderBy(id_col)
            whale = (
                b.join(whales, ["band", "bucket"], "left_semi")
                .select(
                    F.col(id_col).alias("id_a"),
                    F.col("sig").alias("sig_a"),
                    F.lead(id_col).over(wchain).alias("id_b"),
                    F.lead("sig").over(wchain).alias("sig_b"),
                )
                .where(F.col("id_b").isNotNull())
            )
    else:
        small, whale = b, None
    left = small.select(F.col(id_col).alias("id_a"),
                        F.col("sig").alias("sig_a"), "band", "bucket")
    right = small.select(F.col(id_col).alias("id_b"),
                         F.col("sig").alias("sig_b"), "band", "bucket")
    pairs = (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
    )
    if whale is not None:
        pairs = pairs.unionByName(
            whale.select("id_a", "id_b", "sig_a", "sig_b"))
    return (
        pairs.select("id_a", "id_b", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    bits: int = 64,
    hash_mode: str = "fast",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit j of the fingerprint
    is the sign of Σ_tokens (±1 depending on bit j of xxhash64(token)).

    Computed as one explode + 64 conditional-sum aggregates (single
    pass); fingerprint assembled with shiftleft/bitwise-or — all
    JVM-side integer ops.
    """
    from pandas_rust_algos_spark.operators.text import tokens

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    if hash_mode == "fast":
        h = F.xxhash64("tok")
    elif hash_mode == "portable":
        # md5-prefix 60-bit int: byte-identical in any md5-capable
        # engine, so the fingerprint is SQL-replayable. Only 60 hash
        # bits exist (15 hex chars), so bits > 60 would silently
        # produce dead fingerprint bits (the sign of a constant -1
        # sum) — refuse rather than degrade.
        if bits > 60:
            raise ValueError(
                f"hash_mode='portable' yields 60 usable hash bits; "
                f"bits={bits} > 60 would produce dead fingerprint bits")
        h = F.conv(
            F.substring(F.md5(F.col("tok")), 1, 15), 16, 10
        ).cast("long")
    else:
        raise ValueError(f"hash_mode must be fast|portable, got {hash_mode!r}")
    sums = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agged = tok.groupBy(id_col).agg(*sums)
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long"))
        )
    return agged.select(id_col, fp.alias("simhash"))


def simhash_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.
    Candidates via 16-bit chunk banding (pigeonhole: distance ≤ 3 ⇒ at
    least one of 4 chunks identical), verified with bit_count(xor)."""
    # persist: fingerprints feed both join sides (one long per doc);
    # tracked — the cache rides the returned plan
    fps = cachelife.track(simhash(df, id_col, text_col).persist())
    chunks = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftright("simhash", i * 16)
                    .bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("cb"),
    ).select(id_col, "simhash", "cb.chunk", "cb.val")
    left = chunks.select(F.col(id_col).alias("id_a"),
                         F.col("simhash").alias("fp_a"), "chunk", "val")
    right = chunks.select(F.col(id_col).alias("id_b"),
                          F.col("simhash").alias("fp_b"), "chunk", "val")
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        left.join(right, ["chunk", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    *,
    k: int = 5,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key.

    gram-join candidate generation: pairs meet once per shared gram,
    aggregated to intersection counts — never a full cross join. Engine-
    portable (no hash functions), hence DuckDB-oracle-checkable.
    """
    grams = df.select(
        F.col(id_col), F.col(block_col).alias("blk"),
        F.explode(shingles(text_col, k)).alias("g"),
    )
    # persist: the gram table feeds sizes + both sides of the pair join;
    # unlike signatures it scales with total shingles, so spilling to
    # disk (persist default) matters at large corpora. Tracked — the
    # cache rides the returned plan.
    grams = cachelife.track(grams.persist())
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    ga = grams.select(F.col(id_col).alias("id_a"), "blk", "g")
    gb = grams.select(F.col(id_col).alias("id_b"), "blk", "g")
    inter = (
        ga.join(gb, ["blk", "g"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    )
    return (
        inter.join(na, "id_a").join(nb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    *,
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PPJoin-style PREFIX FILTERING
    (Xiao et al., WWW'08 — public) — the scale path for HIGH
    thresholds, where :func:`ngram_jaccard_pairs`'s gram join drowns:
    there, every pair sharing ANY gram becomes a candidate, so one
    corpus-common shingle mates everything with everything. Here grams
    get a global total order by (document frequency, gram) — rarest
    first — and each doc exposes only its first
    ``n - ceil(t*n) + 1`` grams as join keys. The prefix lemma: if
    ``J(a,b) >= t`` then ``|a∩b| >= ceil(t*max(n_a,n_b))``, and the
    globally-smallest shared gram has at most ``n_x - |a∩b|``
    predecessors inside each doc — so it falls in BOTH prefixes, and
    no qualifying pair is missed. At ``t=0.8`` the join key space per
    doc shrinks ~5x and the candidate pair space ~quadratically.
    Two further PPJoin prunes run INSIDE the pair join, before any
    pair materializes: the length filter (``J >= t`` forces
    ``t*n_a <= n_b <= n_a/t``) and the positional filter (a prefix
    gram matched at positions ``(pos_a, pos_b)`` caps the possible
    overlap at ``min(n_a-pos_a, n_b-pos_b)+1``, which must reach the
    equivalent-overlap bound ``ceil(t/(1+t)*(n_a+n_b))``). Candidates
    are then verified EXACTLY (sorted gram arrays,
    ``array_intersect``), so the result equals the brute-force pair
    set — which is what makes this optimization fully oracle-able.

    Scale shape: document-frequency agg + one frequency join (both on
    the gram key, exchange reused), one per-doc rank window, the
    prefix-only pair join, and an id-keyed verify join against the
    collected gram arrays (array size = doc shingle count — bounded by
    doc length, not corpus size). No cross join, no driver state.
    Selectivity caveat, measured: the filter's power scales with gram
    DIVERSITY — on the synthetic fixture corpus (2k distinct 5-grams
    across 1M instances at sf0.1, avg df≈500, i.e. close to the
    adversarial case) prefixes + positional filter still cut the pair
    space ~5x, and the cut grows with gram diversity; on genuinely
    low-diversity corpora prefer :func:`minhash_near_dupes`."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0,1], got {threshold}")
    grams = cachelife.track(df.select(
        F.col(id_col), F.col(block_col).alias("blk"),
        F.explode(shingles(text_col, k)).alias("g"),
    ).persist())
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("dfg"))
    w = Window.partitionBy(id_col).orderBy("dfg", "g")
    ranked = (
        grams.join(dfreq, "g")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, id_col)
    )
    prefix = ranked.where(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    ).select(id_col, "blk", "g", "pos", "n")
    pa = prefix.select(F.col(id_col).alias("id_a"), "blk", "g",
                       F.col("pos").alias("pos_a"), F.col("n").alias("n_a"))
    pb = prefix.select(F.col(id_col).alias("id_b"), "blk", "g",
                       F.col("pos").alias("pos_b"), F.col("n").alias("n_b"))
    t = F.lit(threshold)
    min_overlap = F.ceil(t / (t + 1) * (F.col("n_a") + F.col("n_b")))
    cand = (
        pa.join(pb, ["blk", "g"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J >= t bounds the size ratio
            & (F.col("n_b") >= F.ceil(t * F.col("n_a")))
            & (F.col("n_a") >= F.ceil(t * F.col("n_b")))
            # positional filter: grams after the matched one cap overlap
            & (F.least(F.col("n_a") - F.col("pos_a"),
                       F.col("n_b") - F.col("pos_b")) + 1 >= min_overlap)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sets = grams.groupBy(id_col).agg(
        F.sort_array(F.collect_list("g")).alias("gs"),
        F.count(F.lit(1)).alias("n"),
    )
    sa = sets.select(F.col(id_col).alias("id_a"),
                     F.col("gs").alias("gs_a"), F.col("n").alias("n_a"))
    sb = sets.select(F.col(id_col).alias("id_b"),
                     F.col("gs").alias("gs_b"), F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("gs_a", "gs_b"))
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    *,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked (e.g. by cluster label)
    so the pair space stays ~linear. Cosine is a zip_with/aggregate
    expression — JVM-side, no UDF."""
    from pandas_rust_algos_spark.operators.similarity import cosine

    base = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(0).alias("blk")] ),
    )
    a = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("v_a"), "blk")
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("v_b"), "blk")
    sim = cosine(F.col("v_a"), F.col("v_b"))
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def dup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup *pairs* into duplicate *clusters* (connected
    components): ``(doc_id, cluster_id)`` where cluster_id is the
    smallest doc id reachable through the pair graph. Isolated docs get
    their own id — the output covers every row of ``all_ids``, so
    "keep one per cluster" is a single groupBy(min) away.

    Algorithm: hash-min label propagation. Each round every node takes
    the min of its own label and its neighbors' labels — one shuffle
    join + aggregate per round, converging in O(component diameter)
    rounds (near-dup clusters are shallow; chains longer than ~20 hops
    mean the threshold is wrong, hence ``max_iter``). Per round the
    frontier is ``localCheckpoint``ed: iterative plans otherwise grow
    lineage linearly and re-execute the whole history each round (on a
    cluster prefer reliable ``checkpoint`` to HDFS/S3 so a lost
    executor doesn't recompute from scratch). The convergence test is
    a distributed count of changed labels — no driver-side data.

    The per-round plan is label-join-aggregate, i.e. the simple CC
    formulation; the alternating large-star/small-star variant
    (Kiveris et al., "Connected Components in MapReduce") halves round
    count on web-scale graphs and slots into the same loop shape.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = all_ids.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()
    try:
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("label").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    ).alias("label"),
                    (F.col("nmin") < F.col("label")).alias("changed"),
                )
                .localCheckpoint()
            )
            n_changed = new_labels.where(F.col("changed")).count()
            labels = new_labels.drop("changed")
            if n_changed == 0:
                break
        return labels.select(
            F.col("node").alias(id_col), F.col("label").alias("cluster_id")
        )
    finally:
        edges.unpersist()


def keep_canonical(
    docs: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """End-to-end dedup filter: keep exactly one representative per
    duplicate cluster — the smallest doc id, i.e. the rows where
    :func:`dup_clusters` labeled a node with its own id.

    One semi-join on the id key (broadcast when the representative set
    is small, shuffle otherwise — Catalyst/AQE picks). This is the op
    a 100 TB pipeline actually runs after near-dup detection: the pair
    list and cluster map are metadata-scale relative to the corpus, so
    the corpus is touched exactly once more, by a join that prunes to
    the id column on the build side."""
    reps = clusters.where(F.col(cluster_col) == F.col(id_col)).select(id_col)
    return docs.join(reps, id_col, "leftsemi")


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    min_run: int = 2,
) -> DataFrame:
    """Substring-level exact dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", public): detect
    VERBATIM token spans shared across documents — boilerplate,
    licenses, templated headers — that document-level near-dup misses
    because the surrounding text differs.

    Shingled-window fingerprints, the standard distributed
    approximation of the paper's suffix-array pass: every k-token
    window of every document is hashed (md5-prefix 60-bit — the
    engine's portable recipe, so a SQL oracle replays it exactly); a
    window is *duplicated* iff its hash occurs in >= 2 DISTINCT
    documents; and a run of r CONSECUTIVE duplicated window positions
    within a document witnesses a shared span of ``k + r - 1`` tokens.
    Returns one row per document::

        (id, n_windows, n_dup_windows, max_run, dup_span_tokens,
         flagged)

    where ``dup_span_tokens = max_run + k - 1`` (0 when clean) and
    ``flagged = max_run >= min_run`` — i.e. a shared span of at least
    ``k + min_run - 1`` tokens.

    Scale shape: two shuffles, both ∝ corpus token count — (1) windows
    shuffle on their hash for the distinct-document count, with the
    duplicated-hash set reused in place by a left-semi join on the
    same key (one exchange feeds both), and (2) the surviving
    (document, position) rows shuffle on the document id for the
    gaps-and-islands run analysis. Documents shorter than k tokens
    have zero windows and report clean. No Python, no all-pairs, no
    driver state; at 100 TB the window rows are the same volume the
    inverted-index/TF-IDF paths already shuffle.

    Reference scope: no text surface exists in the reference
    (SURVEY §2.3) — driver-brief training-pipeline extension.
    """
    if k < 1 or min_run < 1:
        raise ValueError(f"k/min_run must be >= 1, got {k}/{min_run}")
    marked = _mark_islands(
        _flag_cross_doc(_window_rows(df, id_col, text_col, k), id_col),
        id_col)
    g2 = _island_stats(marked, id_col)
    mr = F.coalesce(F.col("mr"), F.lit(0)).cast("long")
    return (
        df.select(id_col).join(g2, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("nw"), F.lit(0)).cast("long")
            .alias("n_windows"),
            F.coalesce(F.col("nd"), F.lit(0)).cast("long")
            .alias("n_dup_windows"),
            mr.alias("max_run"),
            F.when(mr > 0, mr + (k - 1)).otherwise(F.lit(0))
            .cast("long").alias("dup_span_tokens"),
            (mr >= min_run).alias("flagged"),
        )
    )


def _window_rows(df: DataFrame, id_col: str, text_col: str,
                 k: int) -> DataFrame:
    """``(id, pos, h)`` — one row per k-token window position with its
    md5-prefix 60-bit hash (hash of the space-joined window text, the
    same portable recipe the oracles replay), computed ONCE for every
    downstream consumer.

    Construction is deliberately FLAT, not array-algebra: tokens
    posexplode once, and each window string is ``concat_ws`` over
    ``lead()``×k in a single doc-keyed sort window — whole-stage-
    codegen row expressions end to end. The obvious
    ``transform(sequence, i -> concat_ws(slice(toks, i, k)))`` form
    allocates a fresh k-element array per window inside the lambda
    interpreter and measured **15× slower** at sf1 (29 s → 2 s for
    2.5M windows); the one extra doc-keyed exchange this form costs
    is noise next to that. A window exists only where all k tokens
    do (``lead(k-1)`` non-NULL), so short docs yield zero rows —
    exactly the array form's semantics."""
    from pandas_rust_algos_spark.operators.text import tokens

    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(w) for j in range(1, k)]
    gram = F.when(
        F.lead("tok", k - 1).over(w).isNotNull() if k > 1
        else F.col("tok").isNotNull(),
        F.concat_ws(" ", *parts),
    )
    return (
        toks.select(F.col(id_col), F.col("pos"), gram.alias("gram"))
        .where(F.col("gram").isNotNull())
        .select(
            id_col, "pos",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long").alias("h"),
        )
    )


def _flag_cross_doc(wins: DataFrame, id_col: str) -> DataFrame:
    """Add ``__flag`` = "this window's hash occurs in >= 2 DISTINCT
    documents" — in place, via dense_rank + max over the hash
    partition (ONE sort-shuffle on h; no self-semi-join, which would
    recompute the whole window pipeline as its probe side)."""
    wh_rank = Window.partitionBy("h").orderBy(id_col)
    wh = Window.partitionBy("h")
    return (
        wins.withColumn("__dr", F.dense_rank().over(wh_rank))
        .withColumn("__flag", F.max("__dr").over(wh) >= 2)
        .drop("__dr")
    )


def _mark_islands(flagged: DataFrame, id_col: str) -> DataFrame:
    """Add ``__isl`` — a per-doc island id constant across CONSECUTIVE
    flagged positions, NULL on unflagged rows (one doc-keyed
    sort-shuffle): ``pos - running_count_of_flagged`` is the classic
    gaps-and-islands key restricted to the flagged subsequence."""
    wd = Window.partitionBy(id_col).orderBy("pos")
    cf = F.sum(F.when(F.col("__flag"), 1).otherwise(0)).over(wd)
    return flagged.withColumn(
        "__isl", F.when(F.col("__flag"), F.col("pos") - cf))


def _island_stats(marked: DataFrame, id_col: str) -> DataFrame:
    """Fold marked windows to per-doc ``(id, nw, nd, mr)`` — total
    windows, flagged windows, longest flagged run. The (id, __isl)
    pre-aggregation reuses the doc hash partitioning the island window
    just established (id is a subset of the grouping key), so no new
    exchange is introduced."""
    g1 = marked.groupBy(id_col, "__isl").agg(
        F.count(F.lit(1)).alias("cnt"))
    run = F.when(F.col("__isl").isNotNull(), F.col("cnt"))
    return g1.groupBy(id_col).agg(
        F.sum("cnt").alias("nw"),
        F.sum(run).alias("nd"),
        F.max(run).alias("mr"),
    )


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    min_run: int = 2,
) -> DataFrame:
    """The REMOVAL action of substring-level dedup (Lee et al. 2022's
    ExactSubstr deduplication): delete, from every document, the
    token spans that :func:`duplicated_spans` flags — runs of at
    least ``min_run`` consecutive cross-document duplicated k-token
    windows, i.e. verbatim shared spans of ≥ ``k + min_run - 1``
    tokens (boilerplate, licenses, templated headers). Returns::

        (id, clean_text, n_tokens, n_removed)

    with ``clean_text`` the surviving tokens re-joined by single
    spaces in original order (the engine's whitespace-token spec —
    inter-token whitespace is not preserved, matching every other
    token-level op here). Like the paper's tool, spans are removed
    from ALL documents containing them, not all-but-one; combine with
    document-level dedup when a canonical copy should survive.

    Scale shape: the detection shuffles are :func:`duplicated_spans`'
    (hash, then doc); the removal adds only a broadcast-sized join of
    per-doc interval lists (a qualifying-run interval is ≥ k + 1
    tokens, so there are at most n_tokens/(k+1) intervals per doc)
    and a higher-order array filter over the token array — no
    Python, no explode of the corpus tokens."""
    from pandas_rust_algos_spark.operators.text import tokens

    if k < 1 or min_run < 1:
        raise ValueError(f"k/min_run must be >= 1, got {k}/{min_run}")
    marked = _mark_islands(
        _flag_cross_doc(_window_rows(df, id_col, text_col, k), id_col),
        id_col)
    # qualifying runs -> covered token intervals [s, e] (0-based,
    # inclusive): a run of r windows starting at window position s
    # covers tokens s .. s + r + k - 2
    cov = (
        marked.where(F.col("__isl").isNotNull())
        .groupBy(id_col, "__isl")
        .agg(F.count(F.lit(1)).alias("run"), F.min("pos").alias("s"))
        .where(F.col("run") >= min_run)
        .groupBy(id_col)
        .agg(F.collect_list(
            F.struct(F.col("s"),
                     (F.col("s") + F.col("run") + (k - 2)).alias("e"))
        ).alias("__ivs"))
    )
    # NULL text -> empty token array, so n_tokens reports 0 (F.size of
    # a NULL array would report -1 under Spark's default sizeOfNull),
    # matching the SQL twin's COALESCE(tk, []).
    toks = F.coalesce(tokens(text_col), F.array().cast("array<string>"))
    ivs = F.coalesce(
        F.col("__ivs"),
        F.array().cast("array<struct<s:int,e:long>>"),
    )
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            ivs, lambda iv: (iv["s"] <= i) & (i <= iv["e"])),
    )
    return (
        df.join(cov, id_col, "left")
        .select(
            id_col,
            F.concat_ws(" ", kept).alias("clean_text"),
            F.size(toks).cast("long").alias("n_tokens"),
            (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
        )
    )


def sql_duplicated_spans(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    min_run: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicated_spans`: same tokenizer spec,
    same md5-prefix window hash, same distinct-document duplication
    rule, same gaps-and-islands run algebra."""
    from pandas_rust_algos_spark.operators.text import sql_token_ngrams

    grams = sql_token_ngrams(text_col, k)
    # COALESCE to an empty list so a NULL text reports n_windows = 0
    # exactly like the Spark side (posexplode of a NULL array yields no
    # rows, and the left-join coalesces the counts to 0).
    return f"""
    WITH base AS (
      SELECT {id_col}, COALESCE({grams}, []) AS g FROM {table}
    ), tot AS (
      SELECT {id_col}, CAST(LEN(g) AS BIGINT) AS n_windows FROM base
    ), wins AS (
      SELECT {id_col}, i - 1 AS pos,
             CAST('0x' || SUBSTR(md5(g[i]), 1, 15) AS BIGINT) AS h
      FROM base, UNNEST(RANGE(1, LEN(g) + 1)) AS t(i)
    ), dup AS (
      SELECT h FROM wins GROUP BY h
      HAVING COUNT(DISTINCT {id_col}) >= 2
    ), fl AS (
      SELECT w.{id_col}, w.pos FROM wins w JOIN dup d USING (h)
    ), il AS (
      SELECT {id_col},
             pos - ROW_NUMBER() OVER (PARTITION BY {id_col}
                                      ORDER BY pos) AS isl
      FROM fl
    ), rl AS (
      SELECT {id_col}, isl, COUNT(*) AS run FROM il GROUP BY 1, 2
    ), agg AS (
      SELECT {id_col}, SUM(run) AS nd, MAX(run) AS mr
      FROM rl GROUP BY 1
    )
    SELECT t.{id_col}, t.n_windows,
           CAST(COALESCE(a.nd, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(a.mr, 0) AS BIGINT) AS max_run,
           CAST(CASE WHEN COALESCE(a.mr, 0) > 0
                     THEN a.mr + {k - 1} ELSE 0 END AS BIGINT)
             AS dup_span_tokens,
           COALESCE(a.mr, 0) >= {min_run} AS flagged
    FROM tot t LEFT JOIN agg a USING ({id_col})
    """


def sql_strip_duplicated_spans(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    min_run: int = 2,
) -> str:
    """DuckDB twin of :func:`strip_duplicated_spans`: same windows,
    same hash, same qualifying-run intervals, same token-coverage
    filter, same single-space re-join."""
    from pandas_rust_algos_spark.operators.text import sql_token_ngrams

    grams = sql_token_ngrams(text_col, k)
    toks = (f"LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_col}), '\\s+'), "
            "x -> x <> '')")
    # COALESCE both arrays to empty lists so a NULL text reports
    # n_tokens = 0 / n_removed = 0 exactly like the Spark side.
    return f"""
    WITH base AS (
      SELECT {id_col}, COALESCE({grams}, []) AS g,
             COALESCE({toks}, []) AS tk FROM {table}
    ), wins AS (
      SELECT {id_col}, i - 1 AS pos,
             CAST('0x' || SUBSTR(md5(g[i]), 1, 15) AS BIGINT) AS h
      FROM base, UNNEST(RANGE(1, LEN(g) + 1)) AS t(i)
    ), dup AS (
      SELECT h FROM wins GROUP BY h
      HAVING COUNT(DISTINCT {id_col}) >= 2
    ), fl AS (
      SELECT w.{id_col}, w.pos FROM wins w JOIN dup d USING (h)
    ), il AS (
      SELECT {id_col}, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY {id_col}
                                      ORDER BY pos) AS isl
      FROM fl
    ), cov AS (
      SELECT {id_col}, MIN(pos) AS s,
             MIN(pos) + COUNT(*) + {k - 2} AS e
      FROM il GROUP BY {id_col}, isl
      HAVING COUNT(*) >= {min_run}
    ), tok AS (
      SELECT {id_col}, i - 1 AS ti, tk[i] AS t
      FROM base, UNNEST(RANGE(1, LEN(tk) + 1)) AS u(i)
    ), kept AS (
      SELECT tok.{id_col},
             STRING_AGG(tok.t, ' ' ORDER BY tok.ti) AS clean_text,
             COUNT(*) AS n_kept
      FROM tok
      WHERE NOT EXISTS (
        SELECT 1 FROM cov c
        WHERE c.{id_col} = tok.{id_col}
          AND tok.ti BETWEEN c.s AND c.e)
      GROUP BY 1
    )
    SELECT b.{id_col},
           COALESCE(kept.clean_text, '') AS clean_text,
           CAST(LEN(b.tk) AS BIGINT) AS n_tokens,
           CAST(LEN(b.tk) - COALESCE(kept.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM base b LEFT JOIN kept USING ({id_col})
    """


def dedup_soft_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    normalized: bool = True,
) -> DataFrame:
    """SOFT dedup: instead of dropping duplicates, weight every
    document ``1/n_copies`` of its exact-content cluster — the
    down-weighting recipe (used e.g. where dropping all-but-one copy
    loses legitimate republication signal): summing ``weight`` over
    any slice counts unique contents, and a sampler drawing ∝ weight
    sees each content once in expectation. Output per input row:
    ``(id_col, content_hash, n_copies, weight, is_rep)`` with
    ``is_rep`` marking the min-id representative (so a hard-dedup
    filter is the same frame WHERE is_rep).

    Scale shape: the per-content count and min-id come from a
    ``groupBy(content_hash).agg(...)`` joined back to the narrow
    (id, 32-byte digest) projection — NOT a window over
    ``partitionBy(content_hash)``. A window count is not map-side
    combinable: every copy of one content must colocate in a single
    sort partition, so a boilerplate whale (empty docs, error pages —
    the same pathology the MinHash whale-bucket guard insures
    against) funnels all its copies through one task at 100 TB. The
    groupBy form partial-aggregates each partition's copies down to
    one (hash, count, min) row before the shuffle, so a whale costs
    one row per upstream partition; the join back is digest-keyed and
    AQE handles any residual skew. Document text never shuffles (the
    :func:`dedup_exact` scale shape applied to a transform — same
    narrow-bounds recipe as ``group_winsorize`` /
    ``group_robust_zscore``)."""
    content = normalize_text(text_col) if normalized else F.col(text_col)
    narrow = df.select(F.col(id_col), F.md5(content).alias("content_hash"))
    stats = narrow.groupBy("content_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min(id_col).alias("__rep_id"),
    )
    return narrow.join(stats, "content_hash").select(
        id_col, "content_hash", "n_copies",
        (F.lit(1.0) / F.col("n_copies")).alias("weight"),
        (F.col(id_col) == F.col("__rep_id")).alias("is_rep"),
    )
