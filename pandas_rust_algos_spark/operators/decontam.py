"""Benchmark decontamination — flag training documents that share
token n-grams with an evaluation/benchmark set.

The standard published recipe (GPT-3 appx. C / PaLM / Llama data
cards): build the set of length-N token n-grams over the benchmark
corpus, then mark any training document containing one. The reference
repo has no text surface (SURVEY §2.3); this is driver-brief
training-data-pipeline surface.

Scale shape (the part that matters at 100 TB):

- The benchmark side is eval sets — thousands of documents, millions
  of grams at most. Its distinct gram set **broadcasts**; the corpus
  side never shuffles for the probe.
- The corpus side explodes to *distinct* grams per document
  (``array_distinct`` before explode bounds the blow-up at unique
  grams, and repeated grams can't double-count hits), inner-joins the
  broadcast gram set, and aggregates hit counts back per document with
  map-side partial aggregation — one narrow pass over the corpus plus
  one small shuffle of (doc_id, hits).
- ``hashed=True`` probes on ``xxhash64(gram)`` instead of the gram
  string: 8-byte probe keys instead of ~50-byte strings (the broadcast
  table and the join both shrink ~6×). A 64-bit collision marks a
  clean document contaminated with p ≈ n_bench_grams·2⁻⁶⁴ — harmless
  for a filter that errs toward dropping; the default stays unhashed
  because that form is engine-portable (the DuckDB oracle runs the
  same logic verbatim — gate ``decontaminate``).

Both the Spark expression and the oracle SQL derive from the same
token/gram spec as :mod:`operators.text` (whitespace tokens,
empty-normalized), so the gate's hash compare proves the gram algebra,
not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.text import (
    sql_token_ngrams as _sql_grams,
    token_ngrams as _grams,
)

__all__ = ["token_ngrams", "decontaminate", "decontaminate_semantic",
           "sql_decontaminate_semantic", "sql_token_ngrams",
           "decontaminate_spans", "sql_decontaminate_spans",
           "bloom_decontaminate", "sql_bloom_decontaminate",
           "write_bloom_store", "append_bloom_store",
           "bloom_store_decontaminate", "bloom_probe_rowwise"]


def token_ngrams(col: Column | str, n: int) -> Column:
    """DISTINCT space-joined token ``n``-grams (set semantics — dedup/
    decontam care about presence, not multiplicity). Shares the gram
    spec with :func:`operators.text.token_ngrams`."""
    return F.array_distinct(_grams(col, n))


def sql_token_ngrams(expr: str, n: int) -> str:
    """DuckDB twin of :func:`token_ngrams`."""
    return f"LIST_DISTINCT({_sql_grams(expr, n)})"


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Per-corpus-document contamination report against ``benchmark``:
    ``(id_col, n_grams, n_hits, contaminated)`` where ``n_hits`` counts
    the document's distinct ``n``-grams that appear anywhere in the
    benchmark and ``contaminated = n_hits >= min_hits``.

    Filter usage: ``report.where(~F.col('contaminated'))`` joined back
    (or semi-joined) selects the clean corpus. The report form is kept
    (rather than returning the filtered corpus) so pipelines can audit
    contamination rates per source/language before dropping data.
    """
    grams = token_ngrams(text_col, n)
    # null-safe: a gramless doc's NULL placeholder (explode_outer) must
    # not hash to a probe-able constant
    probe = (
        F.when(F.col("gram").isNotNull(), F.xxhash64(F.col("gram")))
        if hashed else F.col("gram")
    )

    bench_grams = (
        benchmark.select(F.explode(token_ngrams(text_col, n)).alias("gram"))
        .select(probe.alias("bg"))
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col), F.explode_outer(grams).alias("gram")
    ).select(id_col, F.col("gram"), probe.alias("pg"))

    hits = (
        doc_grams.join(
            F.broadcast(bench_grams), F.col("pg") == F.col("bg"), "left"
        )
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("bg").alias("n_hits"),
        )
    )
    return hits.select(
        id_col,
        "n_grams",
        "n_hits",
        (F.col("n_hits") >= min_hits).alias("contaminated"),
    )


def decontaminate_semantic(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """SEMANTIC decontamination — the embedding tier of the decontam
    family (gram-level ``decontaminate``, span-level
    ``decontaminate_spans``, and now paraphrase-level): flag corpus
    rows whose embedding is close (cosine ≥ ``threshold``) to ANY
    benchmark embedding — the published recipe for catching
    reworded/translated benchmark leakage that exact n-gram overlap
    misses (e.g. the Llama-3 / GPT-4 data-card "fuzzy" decontamination
    passes).

    Returns one row per corpus row:
    ``(id, max_cosine, nearest_bench_id, contaminated)``.

    Determinism: cosine over MICRO-UNIT QUANTIZED vectors (the
    ``semantic_dedup`` recipe) — the dot is an exact integer below
    2^53, so the raw cosine and the argmax tie-break
    (cosine DESC, bench id ASC) are bit-identical cross-engine with
    no rounding bucket. Zero-norm vectors never match.

    Scale shape: the benchmark side is eval sets — metadata-sized by
    definition (same asymmetry as gram decontam); it collects ONCE to
    an id-sorted matrix that ships inside the Arrow task closure, and
    the corpus side is a single ``mapInPandas`` pass computing the
    exact-BLAS score block ``C @ B.T`` per batch (every micro-unit
    product/partial sum < 2^53 ⇒ the float64 matmul IS the integer
    Gram block — the ``semantic_dedup`` lesson applied at authoring
    time: a per-pair lambda fold here measured ~10× slower at 10×
    data). The corpus never shuffles; output is one row per corpus
    row. At extreme |bench|, bucket by an IVF cell first
    (``ann_portable``)."""
    import numpy as np
    import pandas as pd

    from pandas_rust_algos_spark.operators.kmeans import (
        _quantize,
        check_exact_blas,
    )

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    c = corpus.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), _quantize(F.col(vec_col)).alias("v"))
    brows = sorted(
        (r[0], list(r[1]))
        for r in bench.where(F.col(vec_col).isNotNull()).select(
            F.col(bench_id_col), _quantize(F.col(vec_col))).collect()
    )
    if not brows:
        return c.select(
            id_col,
            F.lit(-2.0).alias("max_cosine"),
            F.lit(None).cast("long").alias("nearest_bench_id"),
            F.lit(False).alias("contaminated"),
        )
    bids = np.array([bid for bid, _ in brows], dtype=np.int64)
    B = np.array([bv for _, bv in brows], dtype=np.float64)
    bdim = B.shape[1]
    bmax = float(np.abs(B).max(initial=0.0))
    check_exact_blas(bmax, bdim, "decontaminate_semantic benchmark")
    nb = np.sqrt((B * B).sum(axis=1))
    bench_ok = nb > 0

    def _score(batches):
        for pdf in batches:
            M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            check_exact_blas(
                max(float(np.abs(M).max(initial=0.0)), bmax), bdim,
                "decontaminate_semantic corpus batch")
            nv = np.sqrt((M * M).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (M @ B.T) / np.outer(nv, nb)
            # zero-norm rows/benchmarks never match (oracle's guard)
            cos = np.where(np.isfinite(cos), cos, -2.0)
            cos[:, ~bench_ok] = -2.0
            cos[nv == 0, :] = -2.0
            # bids ascend, np.argmax returns the FIRST max — the
            # (cos DESC, bench id ASC) tie rule for free
            best = np.argmax(cos, axis=1)
            mx = cos[np.arange(len(M)), best]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "max_cosine": mx,
                "nearest_bench_id": bids[best],
                "contaminated": mx >= threshold,
            })

    out_schema = (
        "{} {}, max_cosine double, nearest_bench_id long, "
        "contaminated boolean"
    ).format(id_col, dict(c.dtypes)[id_col])
    return c.mapInPandas(_score, out_schema)


def sql_decontaminate_semantic(
    corpus_sql: str,
    bench_sql: str,
    *,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    threshold: float = 0.95,
) -> str:
    """DuckDB twin of :func:`decontaminate_semantic` — same quantized
    exact-integer cosine, same (cos DESC, bench id ASC) argmax. The
    final select LEFT JOINs from the corpus so an EMPTY benchmark
    yields every corpus row with ``max_cosine=-2.0 / contaminated=
    false`` exactly like the Spark branch (a bare CROSS JOIN would
    return zero rows on that edge — r7 ADVICE item)."""
    from pandas_rust_algos_spark.operators.kmeans import sql_quantize

    cq = sql_quantize(vec_col)
    return f"""
    WITH c AS (
      SELECT {id_col}, v, SQRT(LIST_DOT_PRODUCT(v, v)) AS nv
      FROM (SELECT {id_col}, {cq}::DOUBLE[] AS v FROM {corpus_sql}
            WHERE {vec_col} IS NOT NULL)
    ), b AS (
      SELECT bid, bv, SQRT(LIST_DOT_PRODUCT(bv, bv)) AS nb
      FROM (SELECT {bench_id_col} AS bid, {cq}::DOUBLE[] AS bv
            FROM {bench_sql} WHERE {vec_col} IS NOT NULL)
    ), s AS (
      SELECT c.{id_col}, b.bid,
             CASE WHEN c.nv > 0 AND b.nb > 0
                  THEN LIST_DOT_PRODUCT(c.v, b.bv) / (c.nv * b.nb)
                  ELSE -2.0 END AS cos
      FROM c CROSS JOIN b
    ), agg AS (
      SELECT {id_col}, cos AS max_cosine, bid AS nearest_bench_id
      FROM (
        SELECT {id_col}, cos, bid,
               ROW_NUMBER() OVER (PARTITION BY {id_col}
                                  ORDER BY cos DESC, bid) AS rn
        FROM s
      ) WHERE rn = 1
    )
    SELECT c.{id_col},
           COALESCE(a.max_cosine, -2.0) AS max_cosine,
           a.nearest_bench_id,
           COALESCE(a.max_cosine, -2.0) >= {threshold} AS contaminated
    FROM c LEFT JOIN agg a ON c.{id_col} = a.{id_col}
    """


def decontaminate_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_run: int = 1,
) -> DataFrame:
    """SUBSTRING-level decontamination (the Lee et al. window machinery
    pointed across two corpora): flag corpus documents sharing
    VERBATIM k-token spans with the benchmark — the check actually run
    before training on eval sets, stricter in kind than the distinct-
    gram overlap count of :func:`decontaminate` (grams count set
    overlap anywhere in the doc; spans demand consecutive-window runs,
    and report WHERE the leakage sits via run lengths). Returns one
    row per corpus document::

        (id, n_windows, n_contaminated, max_run, contaminated)

    with ``n_contaminated`` the count of window positions whose k-token
    text occurs anywhere in the benchmark, ``max_run`` the longest
    consecutive such run (a run of r = a shared span of k + r - 1
    tokens), and ``contaminated = max_run >= min_run`` (default 1:
    any shared k-token window flags — the aggressive posture
    decontamination defaults to).

    Scale shape: benchmark windows reduce to a DISTINCT hash set
    (benchmarks are metadata-sized next to a 100 TB corpus, so the
    semi-join build side broadcasts); corpus windows shuffle once on
    the hash for the probe and once on the doc id for the run
    analysis — the same two shuffles as ``duplicated_spans``."""
    from pandas_rust_algos_spark.operators.dedup import (
        _island_stats,
        _mark_islands,
        _window_rows,
    )

    if k < 1 or min_run < 1:
        raise ValueError(f"k/min_run must be >= 1, got {k}/{min_run}")
    bench_h = (
        _window_rows(benchmark, id_col, text_col, k)
        .select("h").distinct().withColumn("__bm", F.lit(True))
    )
    # flag in place via a broadcast LEFT join (benchmarks are
    # metadata-sized): the corpus window pipeline is evaluated ONCE —
    # a semi-join probe would re-derive it as a second subtree
    marked = _mark_islands(
        _window_rows(corpus, id_col, text_col, k)
        .join(F.broadcast(bench_h), "h", "left")
        .withColumn("__flag", F.col("__bm").isNotNull())
        .drop("__bm"),
        id_col)
    g2 = _island_stats(marked, id_col)
    mr = F.coalesce(F.col("mr"), F.lit(0)).cast("long")
    return (
        corpus.select(id_col).join(g2, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("nw"), F.lit(0)).cast("long")
            .alias("n_windows"),
            F.coalesce(F.col("nd"), F.lit(0)).cast("long")
            .alias("n_contaminated"),
            mr.alias("max_run"),
            (mr >= min_run).alias("contaminated"),
        )
    )


def sql_decontaminate_spans(
    corpus_sql: str,
    benchmark_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_run: int = 1,
) -> str:
    """DuckDB twin of :func:`decontaminate_spans` over two table
    expressions (same windows, hash, run algebra)."""
    from pandas_rust_algos_spark.operators.text import sql_token_ngrams

    grams = sql_token_ngrams(text_col, k)
    return f"""
    WITH cbase AS (
      SELECT {id_col}, {grams} AS g FROM {corpus_sql}
    ), tot AS (
      SELECT {id_col}, CAST(LEN(g) AS BIGINT) AS n_windows FROM cbase
    ), cwins AS (
      SELECT {id_col}, i - 1 AS pos,
             CAST('0x' || SUBSTR(md5(g[i]), 1, 15) AS BIGINT) AS h
      FROM cbase, UNNEST(RANGE(1, LEN(g) + 1)) AS t(i)
    ), bbase AS (
      SELECT {grams} AS g FROM {benchmark_sql}
    ), bh AS (
      SELECT DISTINCT
             CAST('0x' || SUBSTR(md5(g[i]), 1, 15) AS BIGINT) AS h
      FROM bbase, UNNEST(RANGE(1, LEN(g) + 1)) AS t(i)
    ), fl AS (
      SELECT w.{id_col}, w.pos FROM cwins w JOIN bh USING (h)
    ), il AS (
      SELECT {id_col}, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY {id_col}
                                      ORDER BY pos) AS isl
      FROM fl
    ), rl AS (
      SELECT {id_col}, isl, COUNT(*) AS run FROM il GROUP BY 1, 2
    ), agg AS (
      SELECT {id_col}, SUM(run) AS nc, MAX(run) AS mr
      FROM rl GROUP BY 1
    )
    SELECT t.{id_col}, t.n_windows,
           CAST(COALESCE(a.nc, 0) AS BIGINT) AS n_contaminated,
           CAST(COALESCE(a.mr, 0) AS BIGINT) AS max_run,
           COALESCE(a.mr, 0) >= {min_run} AS contaminated
    FROM tot t LEFT JOIN agg a USING ({id_col})
    """


def _bloom_pos(gram_col, i: int, m_bits: int):
    """Bloom position ``i`` for a gram: the engine's portable
    52-bit md5-prefix hash of ``'i:gram'``, mod ``m_bits``. Identical
    in any engine with md5 (shared recipe with datasplit/frequency)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(i)), gram_col)), 1, 13),
        16, 10,
    ).cast("long")
    return h % m_bits


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    min_hits: int = 1,
) -> DataFrame:
    """:func:`decontaminate` with the benchmark gram set compressed
    into a **Bloom filter**: same per-document report shape
    ``(id_col, n_grams, n_flagged, contaminated)``, but the probe side
    ships a bitmap of ``m_bits`` bits (``m_bits/32`` bigint words, 8 KiB
    at the default 2¹⁶) instead of the gram strings themselves.

    Why it exists at 100 TB: exact ``decontaminate`` broadcasts the
    benchmark's distinct grams — correct while eval sets are small, but
    a *union of many benchmarks* (the production case: every eval suite
    you ever ran) grows that broadcast linearly. The Bloom bitmap is
    constant-size however many grams feed it, at the price of false
    positives (never negatives): ``n_flagged`` over-counts by the FP
    rate ≈ (1−e^(−k·g/m))^k, so the report is a conservative screen —
    docs it clears are definitely clean; flagged docs re-check against
    the exact gram set (now filtered to a tiny candidate corpus).

    Bitmap construction is pure column algebra, portable across
    engines: position ``i`` of a gram is the md5-prefix hash of
    ``'i:gram'`` mod ``m_bits``; word = pos >> 5, bit = pos & 31
    (32-bit words in bigint columns — no sign games), words BIT_OR'd
    into the ≤``m_bits/32``-row bloom table that broadcasts to the
    probe join. A gram is *flagged* iff all ``n_hashes`` bits are set
    (BOOL_AND over its positions). Gramless documents report
    ``n_grams = 0`` (explode_outer keeps them; their NULL placeholder
    is never hashed — a NULL gram must not probe the constant
    ``'i:'`` position).
    """
    bloom = _bloom_words(benchmark, text_col, n, m_bits, n_hashes)
    # the probe is the shared single-aggregation rowwise shape (one
    # data-sized shuffle; the old exploded two-level plan — a per-gram
    # BOOL_AND below the per-document groupBy — shuffled the exploded
    # gram stream twice and is gate-proven identical in output)
    return bloom_probe_rowwise(
        corpus, bloom, id_col=id_col, text_col=text_col, n=n,
        m_bits=m_bits, n_hashes=n_hashes, min_hits=min_hits)


def sql_bloom_decontaminate(
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_where: str = "doc_id % 10 = 0",
    corpus_where: str = "doc_id % 10 <> 0",
    table: str = "documents",
    n: int = 5,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    min_hits: int = 1,
) -> str:
    """DuckDB twin of :func:`bloom_decontaminate` — same md5 positions,
    same 32-bit-word BIT_OR bitmap, same BOOL_AND flag rule, so the
    flagged counts (false positives included) hash-match bit-exactly."""
    idx = ", ".join(str(i) for i in range(n_hashes))
    pos = (f"CAST('0x' || SUBSTR(md5(CAST(i AS VARCHAR) || ':' || gram),"
           f" 1, 13) AS BIGINT) % {m_bits}")
    mask = "(CAST(1 AS BIGINT) << CAST((pos % 32) AS INTEGER))"
    return f"""
    WITH ii AS (SELECT UNNEST([{idx}]) AS i),
    bg AS (
      SELECT DISTINCT UNNEST({sql_token_ngrams(text_col, n)}) AS gram
      FROM {table} WHERE {bench_where}
    ), bpos AS (
      SELECT {pos} AS pos FROM bg CROSS JOIN ii
    ), bloom AS (
      SELECT pos >> 5 AS word, BIT_OR({mask}) AS bits
      FROM bpos GROUP BY 1
    ), cg AS (
      SELECT {id_col},
             {sql_token_ngrams(text_col, n)} AS grams
      FROM {table} WHERE {corpus_where}
    ), ex AS (
      SELECT {id_col},
             UNNEST(CASE WHEN LEN(grams) = 0
                         THEN [CAST(NULL AS VARCHAR)] ELSE grams END)
               AS gram
      FROM cg
    ), probe AS (
      SELECT {id_col}, gram, {pos} AS pos
      FROM ex CROSS JOIN ii WHERE gram IS NOT NULL
      UNION ALL
      SELECT {id_col}, gram, CAST(NULL AS BIGINT) AS pos
      FROM ex WHERE gram IS NULL
    ), j AS (
      SELECT {id_col}, gram,
             COALESCE((bits & {mask}) = {mask}, FALSE) AS hit
      FROM probe LEFT JOIN bloom ON (pos >> 5) = word
    ), gf AS (
      SELECT {id_col}, gram, BOOL_AND(hit) AS flagged
      FROM j GROUP BY 1, 2
    )
    SELECT {id_col},
           CAST(COUNT(gram) AS BIGINT) AS n_grams,
           CAST(COUNT(CASE WHEN gram IS NOT NULL AND flagged
                           THEN 1 END) AS BIGINT) AS n_flagged,
           COUNT(CASE WHEN gram IS NOT NULL AND flagged THEN 1 END)
             >= {min_hits} AS contaminated
    FROM gf GROUP BY 1
    """


# ------------------------------------------------- persisted bloom store


def _bloom_words(bench: DataFrame, text_col: str, n: int,
                 m_bits: int, n_hashes: int) -> DataFrame:
    """(word, bits) bitmap rows for a benchmark frame — the shared
    builder for the one-shot screen and the persisted store."""
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
    return (
        bench.select(F.explode(token_ngrams(text_col, n)).alias("gram"))
        .distinct()
        .select(F.explode(F.array(*[
            _bloom_pos(F.col("gram"), i, m_bits) for i in range(n_hashes)
        ])).alias("pos"))
        .select(F.shiftright(F.col("pos"), 5).alias("word"),
                mask.alias("m"))
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def write_bloom_store(
    bench: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> dict:
    """Persist the decontamination screen: the Bloom bitmap words as a
    tiny parquet (≤ ``m_bits/32`` rows) plus frozen parameters in
    ``meta.json`` — the sketch-store maintenance shape (same recipe as
    the minhash signature store / IVF index): eval suites arrive over
    time, the screen is maintained incrementally, and the corpus-side
    probe never re-reads any benchmark text."""
    import json
    import os

    words = _bloom_words(bench, text_col, n, m_bits, n_hashes)
    os.makedirs(path, exist_ok=True)
    words.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "words.parquet"))
    meta = {"text_col": text_col, "n": n, "m_bits": m_bits,
            "n_hashes": n_hashes}
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def append_bloom_store(
    spark,
    path: str,
    more_bench: DataFrame,
) -> dict:
    """Fold another benchmark into the stored screen under the FROZEN
    parameters. Bitmap union is a per-word BIT_OR — idempotent, so
    re-ingesting a suite is harmless (unlike id-keyed stores). The
    stored table is metadata-sized (≤ ``m_bits/32`` rows), so the
    merge collects it and rewrites in place — no
    read-and-overwrite-the-same-parquet hazard."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    wp = os.path.join(path, "words.parquet")
    old = spark.read.parquet(wp).collect()
    new = _bloom_words(more_bench, meta["text_col"], meta["n"],
                       meta["m_bits"], meta["n_hashes"]).collect()
    merged: dict[int, int] = {}
    for r in list(old) + list(new):
        merged[r["word"]] = merged.get(r["word"], 0) | r["bits"]
    from pandas_rust_algos_spark.session import local_df

    local_df(
        spark, sorted(merged.items()), "word bigint, bits bigint"
    ).coalesce(1).write.mode("overwrite").parquet(wp)
    return meta


def bloom_store_decontaminate(
    spark,
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    min_hits: int = 1,
) -> DataFrame:
    """Probe ``corpus`` against a persisted screen — identical
    semantics to :func:`bloom_decontaminate` with the bitmap read from
    the store instead of rebuilt, so appends ≡ rebuild-from-union is a
    testable (and oracled) equivalence."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    bloom = spark.read.parquet(os.path.join(path, "words.parquet"))
    # shared single-aggregation probe (see bloom_decontaminate)
    return bloom_probe_rowwise(
        corpus, bloom, id_col=id_col, text_col=meta["text_col"],
        n=meta["n"], m_bits=meta["m_bits"],
        n_hashes=meta["n_hashes"], min_hits=min_hits)


def bloom_probe_rowwise(
    df: DataFrame,
    bloom: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    min_hits: int = 1,
) -> DataFrame:
    """:func:`bloom_decontaminate`'s probe restructured to a SINGLE
    aggregation level so it runs as a Structured Streaming plan (the
    screen-at-ingest shape): instead of exploding a gram's
    ``n_hashes`` positions into rows (which needs a per-gram BOOL_AND
    aggregation *below* the per-document one — two levels, illegal in
    streaming), each position becomes a COLUMN and the bitmap is
    left-joined once per position (broadcast — the bitmap is ≤
    ``m_bits/32`` rows), making "all bits set" a row-level AND.
    One ``groupBy(id)`` then counts grams and flagged grams —
    streaming-legal, and identical output to the exploded batch plan
    (grams are already distinct per document, so ``count(gram)`` needs
    no streaming-unsupported countDistinct).

    Works on batch frames too — the gate equality batch ≡ stream ≡
    DuckDB rests on exactly that."""
    grams = token_ngrams(text_col, n)
    dg = df.select(F.col(id_col), F.explode_outer(grams).alias("gram"))
    out = dg
    hit_cols = []
    for i in range(n_hashes):
        pos = F.when(F.col("gram").isNotNull(),
                     _bloom_pos(F.col("gram"), i, m_bits))
        b = bloom.select(F.col("word").alias(f"__w{i}"),
                         F.col("bits").alias(f"__b{i}"))
        out = out.withColumn(f"__p{i}", pos).join(
            F.broadcast(b),
            F.shiftright(F.col(f"__p{i}"), 5) == F.col(f"__w{i}"),
            "left",
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 32 AS INT))")
        hit_cols.append(F.coalesce(
            F.col(f"__b{i}").bitwiseAND(mask) == mask, F.lit(False)))
    flagged = hit_cols[0]
    for h in hit_cols[1:]:
        flagged = flagged & h
    out = out.withColumn("__flagged", flagged)
    return out.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.count(F.when(F.col("gram").isNotNull()
                       & F.col("__flagged"), 1)).alias("n_flagged"),
    ).select(
        id_col, "n_grams", "n_flagged",
        (F.col("n_flagged") >= min_hits).alias("contaminated"),
    )
