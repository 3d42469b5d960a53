"""Dataset splitting and document chunking — training-data-pipeline
primitives (driver-brief extension; the reference has no I/O or text
surface, SURVEY §2.3).

**Deterministic hash split.** Train/val/test membership must be a pure
function of a stable key — never `rand()` (changes per run, per retry,
per partition recomputation: Spark may re-execute a task after a
fetch failure, and a non-deterministic split silently leaks rows
across sets). The standard recipe: hash the key with a salt, threshold
the hash. Implemented engine-portably with md5 — the hex string is
identical in every engine, so the split is reproducible outside Spark
(the DuckDB oracle runs the same expression verbatim). Lexicographic
compare of the 32-hex-char digest against a 6-hex-digit threshold
prefix equals numeric compare of the first 24 bits, giving an exact
membership fraction of ``floor(frac·16⁶)/16⁶`` with no float math.

**Chunking.** Pretraining/RAG pipelines split long documents into
overlapping windows. Expressed as pure column algebra — a generated
start-offset sequence, ``posexplode``, ``substring`` — so Catalyst
keeps it JVM-side and whole-stage-codegen'd; row counts grow by
len/step per doc, which the shuffle-free narrow plan absorbs (no
Python, no UDF, no collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandas_rust_algos_spark import cachelife

__all__ = [
    "split_threshold_hex",
    "train_val_split",
    "chunk_documents",
    "stratified_sample",
    "domain_mix_sample",
    "token_budget_sample",
    "priority_sample",
    "sql_priority_sample",
    "kfold_assign",
    "sql_kfold_assign",
    "priority_sample_stratified",
    "sql_priority_sample_stratified",
]


def split_threshold_hex(frac: float) -> str:
    """6-hex-digit threshold prefix with exact membership fraction
    ``floor(frac·16⁶)/16⁶``."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0,1], got {frac}")
    t = int(frac * 16 ** 6)
    if t >= 16 ** 6:
        return "g"  # sorts above every hex digest → all rows match
    return format(t, "06x")


def train_val_split(
    df: DataFrame,
    key_col: str,
    *,
    val_frac: float = 0.1,
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Label every row 'val' or 'train' as a pure function of
    (key, salt): md5(key || ':' || salt) under the threshold prefix →
    'val'. Deterministic across runs, engines, partitionings and task
    retries; rotating ``salt`` produces an independent split (e.g. for
    cross-validation folds)."""
    h = F.md5(
        F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt))
        .cast("binary")
    )
    thr = split_threshold_hex(val_frac)
    return df.withColumn(
        out_col, F.when(h < thr, F.lit("val")).otherwise(F.lit("train"))
    )


def sql_train_val_split(key_expr: str, val_frac: float, salt: str = "v1") -> str:
    """The DuckDB twin of :func:`train_val_split`'s split expression —
    byte-identical md5 input, same threshold string."""
    thr = split_threshold_hex(val_frac)
    return (
        f"CASE WHEN md5(CAST({key_expr} AS VARCHAR) || ':' || '{salt}')"
        f" < '{thr}' THEN 'val' ELSE 'train' END"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    *,
    chunk_size: int,
    overlap: int = 0,
    keep_cols: list[str] | None = None,
    out_idx: str = "chunk_idx",
    out_chunk: str = "chunk",
) -> DataFrame:
    """Split ``text_col`` into overlapping fixed-size character windows
    (start offsets 0, step, 2·step, … with ``step = chunk_size -
    overlap``; the last chunk may be shorter; an empty document yields
    one empty chunk so no row is silently dropped). Token-window
    chunking rides the same plumbing with token-boundary offsets."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got "
                         f"overlap={overlap} chunk_size={chunk_size}")
    step = chunk_size - overlap
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(t) - 1, F.lit(0)), F.lit(step)
    )
    keep = keep_cols or [c for c in df.columns if c != text_col]
    return df.select(
        *keep, t.alias("__text"),
        F.posexplode(starts).alias(out_idx, "__start"),
    ).select(
        *keep, out_idx,
        F.col("__text").substr(F.col("__start") + 1,
                               F.lit(chunk_size)).alias(out_chunk),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fracs: dict[str, float],
    *,
    default_frac: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the mixture-rebalancing
    step of a training-data pipeline (e.g. keep 100% of low-resource
    languages, 5% of crawl boilerplate). Unlike ``df.sampleBy`` (seeded
    pseudo-random per partition → changes under repartitioning and task
    retries), membership is the same salted-md5 threshold as
    :func:`train_val_split`, so the sample is a pure row property:
    stable across runs, engines, and partitionings, and two samples
    with the same salt are nested (frac 0.05 ⊂ frac 0.10 per stratum).
    """
    h = F.md5(
        F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt))
        .cast("binary")
    )
    thr = F.lit(split_threshold_hex(default_frac))
    for stratum, frac in fracs.items():
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(split_threshold_hex(frac))).otherwise(thr)
    return df.where(h < thr)


def _norm_weights(weights: dict[str, float]) -> dict[str, float]:
    total = sum(weights.values())
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative with a positive "
                         f"sum, got {weights}")
    return {d: w / total for d, w in weights.items()}


def domain_mix_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    weights: dict[str, float],
    *,
    salt: str = "mix-v1",
) -> DataFrame:
    """Rebalance a corpus to a target domain mixture by deterministic
    downsampling — the "data mixing" step of a pretraining pipeline
    (e.g. web 60% / code 25% / books 15%).

    The output is the largest corpus achievable from the input by
    *downsampling only* whose domain proportions match ``weights``:
    with observed counts c_d and normalized weights w_d, the total is
    T = min_d(c_d / w_d) and each domain keeps ≈ w_d·T rows. Domains
    absent from ``weights`` are dropped.

    Membership is the same salted-md5 row property as
    :func:`train_val_split` — stable across runs, engines,
    partitionings and task retries, and nested under rising fractions.
    The per-domain acceptance thresholds are *computed in the plan*
    (one small count aggregate, broadcast back) — never ``.collect()``
    into literals, so the whole thing stays one distributed job and
    recomputes consistently if a stage is retried.
    """
    wn = _norm_weights(weights)
    spark = df.sparkSession
    wdf = F.broadcast(spark.createDataFrame(
        [(d, w) for d, w in wn.items()], f"{domain_col} string, __w double"))

    counts = (
        df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__c"))
        .join(wdf, domain_col)  # inner: unweighted domains drop here
    )
    # T = min_d(c_d / w_d); one-row aggregate broadcast-joined back in
    total = counts.agg(
        F.min(F.col("__c").cast("double") / F.col("__w")).alias("__t"))
    frac = F.least(
        F.lit(1.0),
        (F.col("__w") * F.col("__t")) / F.col("__c").cast("double"),
    )
    tint = F.floor(frac * F.lit(16 ** 6)).cast("long")
    thresholds = (
        counts.crossJoin(F.broadcast(total))
        .select(
            domain_col,
            F.when(tint >= 16 ** 6, F.lit("g"))
            .otherwise(F.format_string("%06x", tint)).alias("__thr"),
        )
    )
    h = F.md5(
        F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt))
        .cast("binary")
    )
    return (
        df.join(F.broadcast(thresholds), domain_col)
        .where(h < F.col("__thr"))
        .drop("__thr")
    )


def sql_domain_mix_sample(
    from_table: str,
    domain_expr: str,
    key_expr: str,
    weights: dict[str, float],
    *,
    salt: str = "mix-v1",
) -> str:
    """DuckDB twin of :func:`domain_mix_sample`: same normalized-weight
    literals (full-precision repr), same c/w → T → frac → floor-hex
    arithmetic, same md5 threshold compare — returns a SELECT of the
    kept rows."""
    wn = _norm_weights(weights)
    wvals = ", ".join(f"('{d}', {w!r})" for d, w in wn.items())
    return f"""
    WITH __w(domain, w) AS (VALUES {wvals}),
    __c AS (
      SELECT {domain_expr} AS domain, COUNT(*) AS c
      FROM {from_table} GROUP BY 1
    ),
    __cw AS (SELECT domain, c, w FROM __c JOIN __w USING (domain)),
    __t AS (SELECT MIN(CAST(c AS DOUBLE) / w) AS t FROM __cw),
    __thr AS (
      SELECT domain,
             CASE WHEN CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
                        (w * t) / CAST(c AS DOUBLE)) * 16777216) AS BIGINT)
                    >= 16777216
                  THEN 'g'
                  ELSE printf('%06x',
                        CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
                             (w * t) / CAST(c AS DOUBLE)) * 16777216)
                             AS BIGINT))
             END AS thr
      FROM __cw CROSS JOIN __t
    )
    SELECT s.* FROM {from_table} s
    JOIN __thr ON {domain_expr} = __thr.domain
    WHERE md5(CAST({key_expr} AS VARCHAR) || ':' || '{salt}') < thr
    """


def sql_stratified_sample(
    strata_expr: str,
    key_expr: str,
    fracs: dict[str, float],
    *,
    default_frac: float = 0.0,
    salt: str = "sample-v1",
) -> str:
    """DuckDB twin of :func:`stratified_sample`'s keep-predicate."""
    arms = " ".join(
        f"WHEN '{s}' THEN '{split_threshold_hex(f)}'"
        for s, f in fracs.items()
    )
    return (
        f"md5(CAST({key_expr} AS VARCHAR) || ':' || '{salt}') < "
        f"(CASE {strata_expr} {arms} "
        f"ELSE '{split_threshold_hex(default_frac)}' END)"
    )


def token_budget_sample(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    key_col: str,
    *,
    budget: int,
    salt: str = "budget-v1",
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Fill a per-domain token budget: within each domain, admit
    documents in a deterministic pseudo-random order (salted md5 of
    the key) until the running token total reaches ``budget`` — the
    "sample N tokens per source" step of assembling a pretraining mix,
    where the budget is in tokens, not documents, so long docs crowd
    out fewer short ones.

    A document is admitted iff the budget was not yet exhausted when
    its turn came (``cum - own < budget``) — the first over-budget doc
    is therefore kept (budgets are targets, not hard caps; truncating
    mid-document is the chunker's job, not the sampler's).

    One shuffle keyed by domain for the ordered window; admission
    order is a pure function of (key, salt) — stable across runs,
    engines, partitionings, and task retries, and the sample is
    *prefix-nested*: raising the budget only ever ADDS documents,
    which is what incremental mix rebuilds need. Skew note: the
    per-domain sort is the cost; at whale-domain scale pre-filter with
    :func:`stratified_sample` to an over-estimate first, then
    budget-trim the survivors.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    h = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    )
    w = (
        Window.partitionBy(domain_col)
        .orderBy(h, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn(cum_col, cum)
        .where(F.col(cum_col) - F.col(token_col) < budget)
    )


def sql_token_budget_sample(
    domain_expr: str,
    token_expr: str,
    key_expr: str,
    *,
    budget: int,
    salt: str = "budget-v1",
) -> str:
    """DuckDB twin of :func:`token_budget_sample`: a full SELECT over
    table ``t`` (aliasing columns verbatim) with the same md5
    admission order and running-sum cutoff. The windowed SUM is cast
    to BIGINT — DuckDB widens windowed integer sums to HUGEINT, which
    would break schema parity."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || ':{salt}')"
    return f"""
    SELECT *, CAST(SUM({token_expr}) OVER (
                PARTITION BY {domain_expr}
                ORDER BY {h}, {key_expr}
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM t
    QUALIFY cum_tokens - ({token_expr}) < {budget}
    """


def stratified_top_n(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n: int,
    *,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic EXACT-size per-stratum sampling: keep the ``n``
    rows with the smallest salted-md5 hash in every stratum — the
    fixed-budget companion to :func:`stratified_sample`'s
    fraction-based form (eval-set carving, per-domain quota caps,
    "exactly 10k docs per language" requests, where a fraction
    over/undershoots on small strata).

    The hash order is a pure row property, so the selection is stable
    across runs, engines, partitionings, and retries, and samples are
    NESTED under a growing budget (top 1k ⊂ top 10k per stratum with
    the same salt) — the property that lets a pipeline enlarge a
    sample without resampling what it already processed. Strata with
    ≤ n rows keep everything.

    Precondition: ``key_col`` must be UNIQUE within each stratum —
    duplicate keys produce identical ``(hash, key)`` sort tuples, so
    ``row_number`` breaks the tie arbitrarily and membership is no
    longer partitioning-independent. NULL keys are hashed as the empty
    string and ordered NULLS FIRST on both engines, so they select
    deterministically too (a NULL key and an ``''`` key collide —
    covered by the same uniqueness precondition).

    Scale shape: one rank window per stratum key (sort-shuffle —
    rows stream through the rank, nothing buffers); never a global
    sort, never a driver collect."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = F.md5(
        F.concat_ws(
            ":",
            F.coalesce(F.col(key_col).cast("string"), F.lit("")),
            F.lit(salt),
        ).cast("binary")
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("__h").asc(), F.col(key_col).asc_nulls_first())
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__h", "__rn")
    )


def sql_stratified_top_n(
    table: str,
    strata_col: str,
    key_col: str,
    n: int,
    *,
    salt: str = "sample-v1",
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`stratified_top_n` (same hash — NULL keys
    coalesce to '' — same rank, same NULLS FIRST tie key). The default
    ``cols='*'`` excludes the helper ``__rn`` so the projection matches
    the Spark twin, which drops its helper columns."""
    h = (f"md5(COALESCE(CAST({key_col} AS VARCHAR), '') "
         f"|| ':' || '{salt}')")
    proj = "* EXCLUDE (__rn)" if cols.strip() == "*" else cols
    return f"""
    SELECT {proj} FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY {strata_col}
        ORDER BY {h}, {key_col} NULLS FIRST) AS __rn
      FROM {table}
    ) WHERE __rn <= {n}
    """


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "ps-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via **priority sampling**
    (Duffield, Lund & Thorup, JACM'07): every row draws a deterministic
    uniform ``u ∈ (0,1]`` from its salted md5, its *priority* is
    ``w/u``, and the sample is the top-``k`` priorities. Inclusion
    probability tracks weight (heavy rows are near-certain members),
    and the returned ``est_weight = max(w, τ)`` — with τ the (k+1)-th
    priority — is the scheme's unbiased subset-sum estimator: summing
    ``est_weight`` over any predicate's sampled rows estimates that
    predicate's true weight sum with near-optimal variance. The
    training-data use: sample documents ∝ quality/length weights for
    mixture audits without materializing the mixture.

    Output: ``(key_col, weight, priority, rank, est_weight)``, ranks
    1..k by (priority DESC, key).

    Determinism + portability: ``u = (h+1)/2^52`` where ``h`` is the
    13-hex-digit md5 prefix — h+1 ≤ 2^52 is exactly representable and
    the divisor is a power of two, so ``u`` is EXACT; ``w/u`` is then
    one IEEE division both engines round identically (registry rule 2).
    Same md5(key ':' salt) recipe as :func:`train_val_split`, so the
    sample is stable across runs, engines, partitionings and retries.

    Scale shape (100 TB): the top-(k+1) is ``orderBy().limit()`` —
    Spark's TakeOrderedAndProject keeps a k+1-size heap per partition
    and merges heaps on the driver; no total sort, no shuffle of the
    corpus. τ joins back as a broadcast one-row aggregate. The only
    full-corpus work is the narrow hash projection.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(key_col).cast("string"), F.lit(salt)
                ).cast("binary")
            ),
            1, 13,
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(16 ** 13))
    w = F.col(weight_col).cast("double")
    scored = df.select(
        F.col(key_col), w.alias("weight"), (w / u).alias("priority")
    )
    # the (k+1)-row TakeOrdered result feeds BOTH the τ aggregate and
    # the kept-rows branch of one final plan — Catalyst computes an
    # uncached subtree once per reference, which would re-run the
    # full corpus scan twice; persisting k+1 rows (lazy, populated by
    # whichever branch runs first) keeps the corpus pass single.
    # The returned plan references the cache lazily, so it is tracked
    # for deferred release by the materializing caller.
    top = cachelife.track(scored.orderBy(
        F.col("priority").desc(), F.col(key_col)
    ).limit(k + 1).persist())
    wnd = Window.orderBy(F.col("priority").desc(), F.col(key_col))
    ranked = top.withColumn(
        "rank", F.row_number().over(wnd).cast("long"))
    tau = ranked.where(F.col("rank") == k + 1).agg(
        F.max("priority").alias("__tau"))
    return (
        ranked.where(F.col("rank") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            key_col, "weight", "priority", "rank",
            F.greatest(
                F.col("weight"), F.coalesce(F.col("__tau"), F.lit(0.0))
            ).alias("est_weight"),
        )
    )


def sql_priority_sample(
    table: str,
    key_expr: str,
    weight_expr: str,
    k: int,
    *,
    salt: str = "ps-v1",
    key_name: str | None = None,
) -> str:
    """DuckDB twin of :func:`priority_sample` — same md5 input, same
    exact ``(h+1)/2^52`` uniform, same single division, same
    (priority DESC, key) order and τ estimator.

    The key column is emitted ``AS {key_name}``, defaulting to
    ``key_expr`` — when ``key_expr`` is an expression rather than a
    bare column name, pass ``key_name`` so the output alias stays a
    valid identifier."""
    key_name = key_name or key_expr
    h = (f"CAST('0x' || SUBSTR(md5(CAST({key_expr} AS VARCHAR) "
         f"|| ':' || '{salt}'), 1, 13) AS BIGINT)")
    pri = (f"CAST({weight_expr} AS DOUBLE) / "
           f"(CAST({h} + 1 AS DOUBLE) / CAST({float(16 ** 13)!r} AS DOUBLE))")
    return f"""
    WITH scored AS (
      SELECT {key_expr} AS key,
             CAST({weight_expr} AS DOUBLE) AS weight,
             {pri} AS priority
      FROM {table}
    ), top AS (
      SELECT key, weight, priority,
             CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, key)
                  AS BIGINT) AS rank
      FROM scored ORDER BY priority DESC, key LIMIT {k + 1}
    ), tau AS (
      SELECT MAX(CASE WHEN rank = {k + 1} THEN priority END) AS t
      FROM top
    )
    SELECT key AS {key_name}, weight, priority, rank,
           GREATEST(weight, COALESCE(t, CAST(0.0 AS DOUBLE)))
             AS est_weight
    FROM top CROSS JOIN tau WHERE rank <= {k}
    """


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int,
    *,
    salt: str = "fold-v1",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: fold = md5₅₂(key ':' salt)
    mod k — every row tagged 0..k-1 as a pure function of (key, salt),
    so folds are reproducible across runs, engines, partitionings and
    task retries, and ``where(fold != i)`` / ``where(fold == i)`` give
    train/validation for round i with no coordination. Rotating
    ``salt`` yields an independent fold system (repeated CV). Folds
    are balanced to within the hash's uniformity (exactly equal-size
    folds would require a global sort — the wrong trade at corpus
    scale, same reasoning as :func:`train_val_split`'s threshold
    membership)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(key_col).cast("string"), F.lit(salt)
                ).cast("binary")
            ),
            1, 13,
        ),
        16, 10,
    ).cast("long")
    return df.withColumn(out_col, (h % k).cast("int"))


def sql_kfold_assign(
    key_expr: str,
    k: int,
    *,
    salt: str = "fold-v1",
) -> str:
    """DuckDB twin of the :func:`kfold_assign` fold expression."""
    return (f"CAST(CAST('0x' || SUBSTR(md5(CAST({key_expr} AS VARCHAR) "
            f"|| ':' || '{salt}'), 1, 13) AS BIGINT) % {k} AS INTEGER)")


def priority_sample_stratified(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "ps-v1",
) -> DataFrame:
    """:func:`priority_sample` per stratum in ONE pass: top-``k``
    priorities within every ``strata_col`` group (e.g. k docs per
    language ∝ quality weight), with the per-stratum τ estimator.
    The global TakeOrdered becomes a window rank keyed by stratum —
    one shuffle of the narrow (stratum, key, weight, priority)
    projection however many strata there are, instead of one job per
    stratum. Same exact uniform and same estimator contract as the
    global sampler; output adds ``strata_col``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(key_col).cast("string"), F.lit(salt)
                ).cast("binary")
            ),
            1, 13,
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(16 ** 13))
    w = F.col(weight_col).cast("double")
    scored = df.select(
        F.col(strata_col), F.col(key_col), w.alias("weight"),
        (w / u).alias("priority"),
    )
    wnd = Window.partitionBy(strata_col).orderBy(
        F.col("priority").desc(), F.col(key_col))
    ranked = scored.withColumn(
        "rank", F.row_number().over(wnd).cast("long")
    ).where(F.col("rank") <= k + 1)
    tau = ranked.where(F.col("rank") == k + 1).groupBy(strata_col).agg(
        F.max("priority").alias("__tau"))
    tkeys = tau.select(
        F.col(strata_col).alias("__ts"), "__tau")
    return (
        ranked.where(F.col("rank") <= k)
        .join(F.broadcast(tkeys),
              ranked[strata_col].eqNullSafe(tkeys["__ts"]), "left")
        .select(
            strata_col, key_col, "weight", "priority", "rank",
            F.greatest(
                F.col("weight"), F.coalesce(F.col("__tau"), F.lit(0.0))
            ).alias("est_weight"),
        )
    )


def sql_priority_sample_stratified(
    table: str,
    strata_expr: str,
    key_expr: str,
    weight_expr: str,
    k: int,
    *,
    salt: str = "ps-v1",
    strata_name: str | None = None,
    key_name: str | None = None,
) -> str:
    """DuckDB twin of :func:`priority_sample_stratified`.

    Output aliases default to the input expressions — pass
    ``strata_name`` / ``key_name`` when ``strata_expr`` /
    ``key_expr`` are expressions rather than bare column names, so
    the emitted ``AS`` aliases stay valid identifiers."""
    strata_name = strata_name or strata_expr
    key_name = key_name or key_expr
    h = (f"CAST('0x' || SUBSTR(md5(CAST({key_expr} AS VARCHAR) "
         f"|| ':' || '{salt}'), 1, 13) AS BIGINT)")
    pri = (f"CAST({weight_expr} AS DOUBLE) / "
           f"(CAST({h} + 1 AS DOUBLE) / CAST({float(16 ** 13)!r} AS DOUBLE))")
    return f"""
    WITH scored AS (
      SELECT {strata_expr} AS s, {key_expr} AS key,
             CAST({weight_expr} AS DOUBLE) AS weight,
             {pri} AS priority
      FROM {table}
    ), ranked AS (
      SELECT s, key, weight, priority,
             CAST(ROW_NUMBER() OVER (PARTITION BY s
                                     ORDER BY priority DESC, key)
                  AS BIGINT) AS rank
      FROM scored QUALIFY rank <= {k + 1}
    ), tau AS (
      SELECT s, MAX(CASE WHEN rank = {k + 1} THEN priority END) AS t
      FROM ranked GROUP BY 1
    )
    SELECT r.s AS {strata_name}, r.key AS {key_name}, r.weight,
           r.priority, r.rank,
           GREATEST(r.weight, COALESCE(t, CAST(0.0 AS DOUBLE)))
             AS est_weight
    FROM ranked r LEFT JOIN tau ON r.s IS NOT DISTINCT FROM tau.s
    WHERE r.rank <= {k}
    """
