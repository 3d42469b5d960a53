"""Persistent IVF ANN index: build once, query many.

``similarity.ivf_topk`` retrains its coarse quantizer on every call —
right for a one-shot query, wrong for the production shape where an
embedding corpus is indexed nightly and served thousands of probes.
This module persists the IVF layout to storage:

    {path}/meta.json                 n_cells, dims, columns, seed
    {path}/centroids.parquet         (cell, centroid) — KiB-sized
    {path}/cells/cell=<i>/*.parquet  vectors, PARTITIONED BY cell

The partition layout IS the index: a query probes its ``n_probe``
nearest centroids (driver-side math over the KiB centroid table) and
the scan reads ONLY those ``cell=<i>/`` directories — real storage
partition pruning, so query I/O is ~``n_probe/n_cells`` of the corpus
regardless of corpus size, with zero rows filtered after read. The
pruning is asserted by test via ``inputFiles()``.

Build cost: one bounded k-means (sampled training, as in
``ivf_topk``), one assignment map (centroids are a plan literal —
no shuffle), one ``partitionBy(cell)`` write (the single intended
shuffle; it IS the index layout). Rebuilds with the same seed are
deterministic, so two clusters indexing the same corpus agree.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from pandas_rust_algos_spark import cachelife
from pandas_rust_algos_spark.session import local_df
from pandas_rust_algos_spark.operators.similarity import (
    _as_double,
    _lit_matrix,
    cosine,
    dot,
    norm,
)

__all__ = ["append_ivf_index", "build_ivf_index", "ivf_index_query",
           "stream_append_ivf_index",
           "build_ivfpq_index_fixed", "ivfpq_index_query_fixed"]


def _nearest_cells(cmatrix, vcol, n: int):
    """Top-n cell ids by dot score as a pure expression (matrix is one
    plan literal; struct-sort with cell-id tiebreak) — same formulation
    as similarity.ivf_topk's."""
    scored = F.transform(
        cmatrix,
        lambda c, i: F.struct((-dot(vcol, c)).alias("negd"),
                              i.alias("cell")),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, n),
        lambda s: s.getField("cell"),
    )


def build_ivf_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    train_fraction: float = 0.25,
    max_train_rows: int = 100_000,
    write_partitions: int | None = None,
) -> dict:
    """Train, assign, and persist; returns the meta dict."""
    from pandas_rust_algos_spark.operators.similarity import (
        _collect_vecs,
        _kmeans_local,
    )

    cand = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))

    # ONE collect job over the bounded sample, then in-driver seeded
    # k-means++/Lloyd (similarity._kmeans_local: the MLlib fit it
    # replaces ran ~25 scheduler-bound jobs over a KiB sample; the
    # sample is O(1) in corpus size by construction, so in-process
    # training is the FAISS-shaped scale answer). Unit normalization
    # happens inside the trainer (directional cells, as before).
    vs = _collect_vecs(
        cand.sample(fraction=min(1.0, train_fraction), seed=seed)
        .limit(max_train_rows).select("v")
    )
    if len(vs) < n_cells * 10:
        vs = _collect_vecs(cand.limit(max_train_rows).select("v"))
    centers = _kmeans_local(vs, k=n_cells, seed=seed, normalize=True)

    spark = df.sparkSession
    os.makedirs(path, exist_ok=True)
    local_df(
        spark, [(i, c) for i, c in enumerate(centers)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "centroids.parquet"))

    cmatrix = _lit_matrix(centers)
    assigned = cand.select(
        F.col(id_col).alias("id"),
        F.col("v"),
        _nearest_cells(cmatrix, F.col("v"), 1)[0].alias("cell"),
    )
    # Cluster rows by cell BEFORE the partitioned write (guide §6/§8):
    # an un-clustered partitionBy fans every scan task out across all
    # cells — measured 440 files for a 16-cell gate build (scan_tasks ×
    # n_cells), and every probe pays the per-file open cost forever
    # after. One payload shuffle at build time is the worked-example
    # trade: the index is written once, probed many times.
    # ``write_partitions`` sizes the shuffle (≥ n_cells ⇒ ~1 file per
    # cell locally; at real scale pass ≈ corpus_bytes / 512 MB so big
    # cells split into several near-target files).
    n_write = write_partitions or n_cells
    assigned.repartition(n_write, "cell") \
        .write.mode("overwrite").partitionBy("cell") \
        .parquet(os.path.join(path, "cells"))

    meta = {"n_cells": n_cells, "seed": seed, "id_col": id_col,
            "vec_col": vec_col, "dims": len(centers[0])}
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def append_ivf_index(df: DataFrame, path: str) -> dict:
    """Incrementally index new vectors: assign them to the EXISTING
    coarse quantizer (nearest persisted centroid — no retrain) and
    append into the ``cell=`` partition layout. This is standard IVF
    maintenance (FAISS ``add`` after ``train``): queries through the
    index see old and new vectors uniformly, and the partition-pruning
    contract is untouched because appends can only land in existing
    cells. The trade-off is the usual one — centroids are frozen, so
    if the embedding distribution drifts the new vectors crowd a few
    cells and partial-probe recall decays; rebuild on a schedule (the
    build is one k-means + one partitioned write) to re-balance.

    Scale shape: the centroid matrix rides the assignment projection
    as a plan literal / broadcast row (``_lit_matrix`` switches at the
    same size threshold as ``similarity``), so the append is a single
    narrow pass over the new vectors plus the ``partitionBy(cell)``
    write — no shuffle of the existing corpus, no driver data."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    spark = df.sparkSession
    centers = (
        spark.read.parquet(os.path.join(path, "centroids.parquet"))
        .orderBy("cell").collect()
    )
    cmatrix = _lit_matrix([r["centroid"] for r in centers])
    cand = df.select(
        F.col(meta["id_col"]),
        _as_double(F.col(meta["vec_col"])).alias("v"),
    )
    assigned = cand.select(
        F.col(meta["id_col"]).alias("id"),
        F.col("v"),
        _nearest_cells(cmatrix, F.col("v"), 1)[0].alias("cell"),
    )
    # same cell-clustering as the build write (guide §6): without it
    # every append multiplies the store's file count by its scan-task
    # count × n_cells
    assigned.repartition(meta["n_cells"], "cell") \
        .write.mode("append").partitionBy("cell") \
        .parquet(os.path.join(path, "cells"))
    return meta


def _read_cells(spark: SparkSession, path: str) -> DataFrame:
    """All indexed vectors ``(id, v, cell)``: the batch-written
    ``cells`` layout plus (when present) the streaming-ingested
    ``cells_stream`` batch-id partitions, with the lineage column
    dropped so both surfaces read as ONE table. Every query goes
    through here, so streamed vectors serve probes exactly like
    batch-appended ones; ``cell`` is a partition column in BOTH
    layouts, so the probed-cell filter still prunes at file-listing
    time (asserted via inputFiles in tests/test_ann_index.py)."""
    cells = spark.read.parquet(os.path.join(path, "cells"))
    stream_path = os.path.join(path, "cells_stream")
    if os.path.isdir(stream_path):
        streamed = spark.read.parquet(stream_path).drop("batch_id")
        cells = cells.unionByName(streamed)
    return cells


def stream_append_ivf_index(
    path: str,
    stream_vecs: DataFrame,
    *,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming ingest for the persisted IVF index — the
    ``minhash_store.stream_ingest_minhash_store`` recipe applied to
    the LAST persisted maintenance surface that lacked a
    screen-at-ingest twin: embedding vectors arrive as a stream, each
    micro-batch is assigned to the FROZEN coarse quantizer (the
    ``append_ivf_index`` contract — centroids read once at stream
    start, no retrain) and lands in
    ``cells_stream/batch_id=<id>/cell=<i>/`` via dynamic partition
    overwrite, so the at-least-once foreachBatch contract yields
    effectively-once indexed vectors: a replayed batch rewrites its
    own ``batch_id`` partitions byte-for-byte. Cell assignment is a
    pure function of (vector, frozen centroids), so a drained
    stream's index state is IDENTICAL to a batch
    :func:`append_ivf_index` of the same vectors — which is what the
    gate's brute-force oracle proves at all-cells probe.

    Idempotence contract — PER CHECKPOINT (the signature-store rule):
    a FRESH checkpoint maps files to different batch ids and dynamic
    overwrite leaves stale partitions in place; re-ingesting from
    scratch requires deleting ``cells_stream`` (and the old
    checkpoint) first. Id uniqueness is caller-owned (write-only fast
    path — the batch ``append_ivf_index`` has no id check either;
    IVF stores are multiset by design).

    Per micro-batch cost: one narrow assignment pass over the batch
    (centroid matrix rides as a plan literal) plus the partitioned
    write — the existing corpus never shuffles, the store is never
    read. Returns the StreamingQuery (caller owns awaitTermination).
    """
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    centers = [
        list(r["centroid"])
        for r in stream_vecs.sparkSession.read.parquet(
            os.path.join(path, "centroids.parquet"))
        .orderBy("cell").collect()
    ]
    ingest_path = os.path.join(path, "cells_stream")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cmatrix = _lit_matrix(centers)
        assigned = batch_df.select(
            F.col(meta["id_col"]).alias("id"),
            _as_double(F.col(meta["vec_col"])).alias("v"),
        ).select(
            "id", "v",
            _nearest_cells(cmatrix, F.col("v"), 1)[0].alias("cell"),
        )
        # per-writer option, NOT a session-global conf toggle: this
        # module coexists with ThreadPoolExecutor-concurrent Spark jobs
        # (similarity.py), and a set/restore on the shared session could
        # flip a concurrent static-mode overwrite to dynamic mid-write
        # (ADVICE r11)
        (
            assigned.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "cell")
            .parquet(ingest_path)
        )

    writer = (
        stream_vecs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivf_index_query(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k cosine neighbors per query against a persisted index.
    Returns ``(query_id_col, id, sim, rank)``.

    The probe set is resolved DRIVER-side from the KiB centroid table
    (one tiny collect — metadata, not data), so the cell filter is a
    plan literal and Spark prunes ``cell=`` partitions at file-listing
    time: the corpus scan opens only the probed directories.
    """
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if not 1 <= n_probe <= meta["n_cells"]:
        raise ValueError(
            f"n_probe must be in [1, {meta['n_cells']}], got {n_probe}")
    centers = (
        spark.read.parquet(os.path.join(path, "centroids.parquet"))
        .orderBy("cell").collect()
    )
    cmatrix = _lit_matrix([r["centroid"] for r in centers])

    # persisted for the probed-cell collect below AND the broadcast
    # scoring join in the returned plan → tracked for deferred release
    probes = cachelife.track(queries.select(
        F.col(query_id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn(
        "cell", F.explode(_nearest_cells(cmatrix, F.col("qv"), n_probe))
    ).persist())
    probed_cells = sorted(
        {r["cell"] for r in probes.select("cell").distinct().collect()}
    )

    cells = _read_cells(spark, path).where(
        F.col("cell").isin(probed_cells))
    sim = F.round(cosine(F.col("qv"), F.col("v")), round_digits)
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .where(F.col("qid") != F.col("id"))
        .select(F.col("qid").alias(query_id_col), "id", sim.alias("sim"))
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("id"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= k)


def build_ivfpq_index_fixed(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    m: int = 4,
    k_codes: int = 8,
    iters: int = 2,
    dims: int | None = None,
) -> dict:
    """Persist a COMPOSED IVF+PQ index in portable fixed-point mode —
    the disk-backed shape of ``ann_portable.ivfpq_topk_fixed``:

        {path}/meta.json               n_cells, m, k_codes, dims, ...
        {path}/centroids.parquet       coarse (cell, c) integer rows
        {path}/books.parquet           (j, code, c) residual sub-books
        {path}/codes/cell=<i>/*.parquet  (id, codes) — m smallints/row

    The stored table is the CODE table, not the vectors: at 768-dim
    float32 corpora the codes directory is ~700× smaller than the
    embedding store, and it is partitioned by coarse cell so a query
    reads only its probed ``cell=`` directories (true storage
    partition pruning, the ``build_ivf_index`` contract applied to
    codes). Because every quantity is on the integer micro-unit grid
    (fixed-point Lloyd coarse cells, residual sub-codebooks, exact
    BIGINT ADC), a query through the persisted index is BIT-IDENTICAL
    to the in-memory composed op — and to its DuckDB oracle — so the
    storage layout, cell routing, and ADC math are all value-provable.

    Build cost: the ``ivfpq_topk_fixed`` training passes (coarse
    driver-coordinated Lloyd, residuals checkpointed once, m residual
    sub-book trainings) plus one ``partitionBy(cell)`` write of the
    m-int code rows — the single intended shuffle; it IS the index."""
    from pandas_rust_algos_spark.operators.ann_portable import (
        _argmin_cell,
        _lit_lmatrix,
        _train_centroids_fast,
        _train_centroids_multi,
    )
    from pandas_rust_algos_spark.operators.kmeans import _quantize
    from pandas_rust_algos_spark.operators.similarity import probe_dims

    if dims is None:
        dims = probe_dims(df, vec_col)
    if dims == 0 or dims % m != 0:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sub = dims // m
    pts = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), _quantize(F.col(vec_col)).alias("v"))
    coarse = _train_centroids_fast(pts, id_col, k=n_cells, iters=iters)
    cmatrix = _lit_lmatrix(coarse)
    asg = (
        pts.withColumn("cell", _argmin_cell(F.col("v"), cmatrix))
        .withColumn(
            "r",
            F.zip_with("v", F.element_at(cmatrix, F.col("cell") + 1),
                       lambda a, b: a - b))
        .localCheckpoint(eager=True)
    )

    # m residual sub-books in LOCKSTEP (one seed job + one combined
    # partial-sum job per iteration; bit-identical per book)
    books = _train_centroids_multi(
        asg.select(id_col, F.col("r").alias("v")), id_col,
        k=k_codes, iters=iters,
        specs=[(j * sub + 1, sub, f":{j}") for j in range(m)])
    bmats = [_lit_lmatrix(b) for b in books]

    spark = df.sparkSession
    os.makedirs(path, exist_ok=True)
    local_df(
        spark, [(i, c) for i, c in enumerate(coarse)],
        "cell int, c array<long>",
    ).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "centroids.parquet"))
    local_df(
        spark,
        [(j, i, c) for j, b in enumerate(books) for i, c in enumerate(b)],
        "j int, code int, c array<long>",
    ).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "books.parquet"))

    coded = asg.select(
        F.col(id_col).alias("id"),
        F.array(*[
            _argmin_cell(F.slice("r", j * sub + 1, sub), bmats[j])
            .cast("int")
            for j in range(m)
        ]).alias("codes"),
        "cell",
    )
    # cell-clustered write, as in build_ivf_index (guide §6): one code
    # file per cell instead of scan_tasks × n_cells tiny files
    coded.repartition(n_cells, "cell") \
        .write.mode("overwrite").partitionBy("cell") \
        .parquet(os.path.join(path, "codes"))

    meta = {"n_cells": n_cells, "m": m, "k_codes": k_codes,
            "iters": iters, "dims": dims, "id_col": id_col,
            "vec_col": vec_col, "mode": "fixed"}
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ivfpq_index_query_fixed(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    n_probe: int = 3,
    k: int = 5,
    rerank_k: int | None = None,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Top-k by residual ADC through a persisted fixed-point IVF+PQ
    index; returns ``(query_id_col, id, approx_dist_sq, rank)`` —
    bit-identical to ``ann_portable.ivfpq_topk_fixed`` with the same
    parameters (and to its DuckDB oracle).

    With ``rerank_k`` (≥ k), the ADC top-``rerank_k`` shortlist per
    query re-scores on EXACT integer distances against ``vectors``
    (the raw embedding table — required, since the index stores only
    codes) and the output becomes ``(query_id_col, id, dist_sq,
    rank)``, matching ``ivfpq_topk_fixed(rerank_k=...)`` bit-exactly.
    The exact pass joins |queries|·rerank_k shortlist rows back to
    the vector store — a pointwise sub-scan of the big table, never
    a second full pass.

    The probe set resolves DRIVER-side from the KiB centroid table,
    so the codes scan opens only the probed ``cell=`` directories;
    centroids and sub-books ride the scoring plan as literals. I/O
    per query batch is ~``n_probe/n_cells`` of an already-~700×-
    compressed code table."""
    from pandas_rust_algos_spark.operators.ann_portable import (
        _dist_sq,
        _lit_lmatrix,
        _top_cells,
    )
    from pandas_rust_algos_spark.operators.kmeans import _quantize

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if not 1 <= n_probe <= meta["n_cells"]:
        raise ValueError(
            f"n_probe must be in [1, {meta['n_cells']}], got {n_probe}")
    if rerank_k is not None:
        if rerank_k < k:
            raise ValueError(f"rerank_k ({rerank_k}) must be >= k ({k})")
        if vectors is None:
            raise ValueError(
                "rerank_k needs the raw vector table (vectors=...): "
                "the persisted index stores only PQ codes")
    m, dims = meta["m"], meta["dims"]
    sub = dims // m
    coarse = sorted(
        (r["cell"], list(r["c"])) for r in spark.read.parquet(
            os.path.join(path, "centroids.parquet")).collect())
    cmatrix = _lit_lmatrix([c for _, c in coarse])
    brows = spark.read.parquet(os.path.join(path, "books.parquet")) \
        .collect()
    books = {}
    for r in brows:
        books.setdefault(r["j"], {})[r["code"]] = list(r["c"])
    bmats = [
        _lit_lmatrix([books[j][i] for i in sorted(books[j])])
        for j in range(m)
    ]

    probes = (
        queries.where(F.col(vec_col).isNotNull())
        .select(
            F.col(query_id_col).alias("__qid"),
            _quantize(F.col(vec_col)).alias("qv"),
        )
        .withColumn(
            "cell", F.explode(_top_cells(F.col("qv"), cmatrix, n_probe)))
        .withColumn(
            "qr",
            F.zip_with("qv", F.element_at(cmatrix, F.col("cell") + 1),
                       lambda a, b: a - b))
        .persist()
    )
    try:
        probed = sorted(
            {r["cell"] for r in probes.select("cell").distinct().collect()})
    finally:
        # release the cached plan once the probed-cell set is known —
        # a query entry point must not leak session-lifetime cache
        # (r8 ADVICE); the scoring join below recomputes probes from
        # the metadata-sized query batch at execution, which is
        # cheaper than pinning a cache entry per call
        probes.unpersist()
    codes = (
        spark.read.parquet(os.path.join(path, "codes"))
        .where(F.col("cell").isin(probed))
    )
    approx = None
    for j in range(m):
        dj = _dist_sq(
            F.slice("qr", j * sub + 1, sub),
            F.element_at(bmats[j], F.element_at("codes", j + 1) + 1),
        )
        approx = dj if approx is None else approx + dj
    scored = (
        codes.join(F.broadcast(probes), "cell")
        .where(F.col("__qid") != F.col("id"))
        .select(
            F.col("__qid").alias(query_id_col),
            "id",
            approx.alias("approx_dist_sq"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy("approx_dist_sq", "id")
    ranked = scored.withColumn(
        "rank", F.row_number().over(w).cast("long"))
    if rerank_k is None:
        return ranked.where(F.col("rank") <= k)
    short = ranked.where(F.col("rank") <= rerank_k) \
        .select(query_id_col, "id")
    cvec = vectors.where(F.col(meta["vec_col"]).isNotNull()).select(
        F.col(meta["id_col"]).alias("id"),
        _quantize(F.col(meta["vec_col"])).alias("__cv"),
    )
    qvec = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(query_id_col).alias("__rqid"),
        _quantize(F.col(vec_col)).alias("__qv"),
    )
    exact = (
        short.join(cvec, "id")
        .join(F.broadcast(qvec), F.col(query_id_col) == F.col("__rqid"))
        .select(
            query_id_col, "id",
            _dist_sq(F.col("__qv"), F.col("__cv")).alias("dist_sq"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy("dist_sq", "id")
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
    )
