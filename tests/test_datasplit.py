"""Split/chunk operator properties: determinism, exact partition of the
keyspace, fraction accuracy, and lossless chunk reassembly."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandas_rust_algos_spark.operators import datasplit as ds
from pandas_rust_algos_spark.sources import load_table


def test_split_is_deterministic_partition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = ds.train_val_split(docs, "doc_id", val_frac=0.25, salt="s1")
    b = ds.train_val_split(docs, "doc_id", val_frac=0.25, salt="s1")
    # pure function of (key, salt): two evaluations agree row-for-row
    joined = a.join(b.withColumnRenamed("split", "split_b"), "doc_id")
    assert joined.where(F.col("split") != F.col("split_b")).count() == 0
    # every row labeled, labels limited to the two classes
    counts = dict(a.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val"}
    assert sum(counts.values()) == docs.count()


def test_split_fraction_and_salt_independence(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    out = ds.train_val_split(docs, "doc_id", val_frac=0.2, salt="s1")
    val = out.where(F.col("split") == "val").count()
    assert 0.1 * n < val < 0.3 * n  # 24-bit threshold, ~binomial noise
    # a different salt reshuffles membership (not identical, not disjoint)
    other = ds.train_val_split(docs, "doc_id", val_frac=0.2, salt="s2") \
        .where(F.col("split") == "val").select("doc_id")
    overlap = out.where(F.col("split") == "val").select("doc_id") \
        .join(other, "doc_id").count()
    assert 0 < overlap < val


def test_split_edge_fractions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    all_train = ds.train_val_split(docs, "doc_id", val_frac=0.0)
    assert all_train.where(F.col("split") == "val").count() == 0
    all_val = ds.train_val_split(docs, "doc_id", val_frac=1.0)
    assert all_val.where(F.col("split") == "val").count() == n


def test_chunks_reassemble_to_original(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    step = 150  # chunk 200, overlap 50
    out = ds.chunk_documents(docs, "text", chunk_size=200, overlap=50,
                             keep_cols=["doc_id"])
    # drop each chunk's overlap tail (keep first `step` chars, except the
    # last chunk which keeps everything) and concatenate in index order
    w = F.max("chunk_idx").over(Window.partitionBy("doc_id"))
    rebuilt = (
        out.withColumn("last_idx", w)
        .withColumn("piece", F.when(F.col("chunk_idx") < F.col("last_idx"),
                                    F.col("chunk").substr(1, step))
                    .otherwise(F.col("chunk")))
        .groupBy("doc_id")
        .agg(F.concat_ws(
            "", F.array_sort(F.collect_list(F.struct("chunk_idx", "piece")))
            .getField("piece")).alias("rebuilt"))
    )
    cmp = docs.join(rebuilt, "doc_id")
    assert cmp.where(F.col("text") != F.col("rebuilt")).count() == 0
    assert cmp.count() == docs.count()


def test_chunk_bounds_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, "xy")], ["doc_id", "text"])
    out = ds.chunk_documents(df, "text", chunk_size=4, overlap=1,
                             keep_cols=["doc_id"]).collect()
    got = {(r["doc_id"], r["chunk_idx"]): r["chunk"] for r in out}
    # starts 0,3,6,9 for len 10: windows abcd/defg/ghij/j
    assert got[(1, 0)] == "abcd" and got[(1, 1)] == "defg"
    assert got[(1, 2)] == "ghij" and got[(1, 3)] == "j"
    assert got[(2, 0)] == ""  # empty doc → one empty chunk, row kept
    assert got[(3, 0)] == "xy"
    assert len(got) == 6


# -------------------------------------------------------- sequence packing


def test_packing_invariants(spark, sf_dir):
    from pandas_rust_algos_spark.operators.packing import pack_sequences
    from pandas_rust_algos_spark.operators.text import token_count

    budget = 512
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n"))
    packed = pack_sequences(docs, "n", budget=budget, order_col="doc_id")

    # exactly-once: every doc lands in exactly one pack
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()

    stats = packed.groupBy("pack_id").agg(
        F.sum("n").alias("total"), F.count("*").alias("k"),
        F.min("pack_pos").alias("pmin"), F.max("pack_pos").alias("pmax"),
    ).collect()
    for r in stats:
        # budget respected unless a single oversized doc owns the pack
        assert r["total"] <= budget or r["k"] == 1, r
        # positions are contiguous 0..k-1
        assert (r["pmin"], r["pmax"]) == (0, r["k"] - 1), r


def test_packing_is_reasonably_tight(spark):
    from pandas_rust_algos_spark.operators.packing import pack_sequences

    # 400 items of size ≤ budget/2 → greedy next-fit guarantees every
    # closed pack is > half full; overall fill must beat 50% even with
    # per-shard tails
    rows = [(i, 40 + (i * 37) % 60) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "n"]).repartition(4)
    packed = pack_sequences(df, "n", budget=256, order_col="id")
    agg = packed.groupBy("pack_id").agg(F.sum("n").alias("t")).collect()
    fill = sum(r["t"] for r in agg) / (256.0 * len(agg))
    assert fill > 0.5, fill


def test_packing_sharded_matches_sequential_replay(spark):
    """shard_col mode: pack assignment must equal a single-threaded
    replay of the greedy fold per shard value — the determinism
    contract the recursive-CTE driver oracle relies on."""
    from pandas_rust_algos_spark.operators.packing import pack_sequences

    rows = [(i, i % 3, 30 + (i * 53) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "shard", "n"]).repartition(7)
    got = {
        r["id"]: (r["pack_id"], r["pack_pos"])
        for r in pack_sequences(df, "n", budget=128, order_col="id",
                                shard_col="shard").collect()
    }

    want = {}
    state = {}
    for i, shard, n in sorted(rows, key=lambda t: (t[1], t[0])):
        pack_idx, fill, pos, started = state.get(shard, (0, 0, 0, False))
        if started and fill + n > 128:
            pack_idx, fill, pos = pack_idx + 1, 0, 0
        want[i] = (f"{shard}-{pack_idx}", pos)
        state[shard] = (pack_idx, fill + n, pos + 1, True)
    assert got == want
    # re-run on a different partitioning: identical assignment
    again = {
        r["id"]: (r["pack_id"], r["pack_pos"])
        for r in pack_sequences(df.repartition(2), "n", budget=128,
                                order_col="id", shard_col="shard").collect()
    }
    assert again == want


def test_stratified_top_n_exact_and_nested(spark):
    """Fixed-budget sampling: exactly n per stratum (everything when
    the stratum is smaller), nested under growing budgets, stable
    under repartitioning."""
    from pandas_rust_algos_spark.operators.datasplit import (
        stratified_top_n,
    )

    rows = [(i, "big") for i in range(50)] + \
           [(i + 100, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    got = stratified_top_n(df, "lang", "doc_id", 10).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["big"]) == 10
    assert len(by["small"]) == 3  # smaller than the budget: keep all

    # nested: top-5 is a subset of top-10 per stratum
    small = stratified_top_n(df, "lang", "doc_id", 5).collect()
    sel5 = {r["doc_id"] for r in small}
    sel10 = by["big"] | by["small"]
    assert sel5 <= sel10 and len(sel5) == 8  # 5 big + 3 small

    # partitioning-invariant
    again = {r["doc_id"] for r in
             stratified_top_n(df.repartition(7), "lang",
                              "doc_id", 10).collect()}
    assert again == sel10

    import pytest as _pytest
    with _pytest.raises(ValueError):
        stratified_top_n(df, "lang", "doc_id", 0)


def test_stratified_top_n_null_keys_and_rn_exclusion(spark):
    """NULL keys hash as '' and order NULLS FIRST on both engines
    (ADVICE r6), and the SQL twin's default projection excludes the
    helper __rn column."""
    import duckdb
    import pandas as pd

    from pandas_rust_algos_spark.operators.datasplit import (
        sql_stratified_top_n,
        stratified_top_n,
    )

    rows = [(f"k{i}", "a") for i in range(20)] + [(None, "a"),
                                                  ("k100", "b"),
                                                  (None, "b")]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    got = stratified_top_n(df, "lang", "doc_id", 5)
    assert set(got.columns) == {"doc_id", "lang"}  # helpers dropped
    sel = {(r["doc_id"], r["lang"]) for r in got.collect()}
    assert len([x for x in sel if x[1] == "a"]) == 5
    assert len([x for x in sel if x[1] == "b"]) == 2  # keeps all

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "lang"]))
    sql = sql_stratified_top_n("t", "lang", "doc_id", 5)
    ora = con.execute(sql).fetchdf()
    assert set(ora.columns) == {"doc_id", "lang"}  # no __rn leak
    osel = {(None if pd.isna(r.doc_id) else r.doc_id, r.lang)
            for r in ora.itertuples()}
    assert sel == osel
    con.close()

    # partitioning-invariant with NULL keys present
    again = {(r["doc_id"], r["lang"]) for r in
             stratified_top_n(df.repartition(5), "lang",
                              "doc_id", 5).collect()}
    assert again == sel


def test_kfold_assign_covers_and_balances(spark):
    from pandas_rust_algos_spark.operators.datasplit import kfold_assign
    from pyspark.sql import functions as F

    df = spark.range(1000).select(F.col("id").alias("k"))
    out = kfold_assign(df, "k", 5, salt="t")
    counts = {r["fold"]: r["n"] for r in
              out.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert sum(counts.values()) == 1000
    # md5 uniformity: folds within a loose band of n/k
    assert all(120 <= c <= 280 for c in counts.values()), counts


def test_kfold_assign_deterministic_and_salt_rotates(spark):
    from pandas_rust_algos_spark.operators.datasplit import kfold_assign
    from pyspark.sql import functions as F

    df = spark.range(300).select(F.col("id").alias("k"))
    a = {r["k"]: r["fold"] for r in kfold_assign(df, "k", 4).collect()}
    b = {r["k"]: r["fold"] for r in
         kfold_assign(df.repartition(7), "k", 4).collect()}
    assert a == b
    c = {r["k"]: r["fold"] for r in
         kfold_assign(df, "k", 4, salt="other").collect()}
    assert a != c  # independent fold system


def test_kfold_assign_rejects_bad_k(spark):
    import pytest
    from pandas_rust_algos_spark.operators.datasplit import kfold_assign
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        kfold_assign(df, "k", 1)
