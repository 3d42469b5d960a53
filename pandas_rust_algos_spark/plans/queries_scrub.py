"""Gate queries for the scrubbing / corpus-statistics operators
(driver-brief extension, SURVEY §2.3): PII detection+redaction,
URL/domain frequency, Gopher-rule quality filtering, deterministic
output sharding, TF-IDF top terms, inverted index, end-to-end
dedup-keep-canonical, per-domain token-budget sampling, int8
embedding quantization, whole-table profiling, bigram LM statistics,
and incremental materialized-view maintenance.

The synthetic documents fixture is digit- and URL-free word soup, so
the PII/URL gates *inject* deterministic patterns by pure column
algebra — the SAME expression evaluates in Spark and in the DuckDB
oracle, so the detection targets are bit-identical on both sides and
the hash compare exercises the real extraction/redaction machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators import datasplit as ds
from pandas_rust_algos_spark.operators import dedup as dd
from pandas_rust_algos_spark.operators import profile as pf
from pandas_rust_algos_spark.operators import scrub as sc
from pandas_rust_algos_spark.operators import text as tx
from pandas_rust_algos_spark.operators import tfidf as ti
from pandas_rust_algos_spark.operators import vectorops as vo
from pandas_rust_algos_spark.operators.similarity import _as_double, dot
from pandas_rust_algos_spark.plans.registry import register
from pandas_rust_algos_spark.session import tune
from pandas_rust_algos_spark.sources import load_table, spread


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return spread(load_table(spark, sf_dir, "documents"))


# ------------------------------------------------------- injected text

# Spark and SQL twins of the SAME augmentation: email for doc_id%3,
# phone for %5, IPv4 for %7, a source-derived URL for %2, a second
# fixed-domain URL for %6. Pure functions of (doc_id, source, text).


def _aug_col() -> F.Column:
    d = F.col("doc_id")
    email = F.when(
        d % 3 == 0,
        F.concat(
            F.lit(" contact user"), d.cast("string"), F.lit("@"),
            F.col("source"), F.lit(".net"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 5 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((d % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 7 == 0,
        F.concat(
            F.lit(" host 10."), (d % 256).cast("string"),
            F.lit(".0."), (d % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    url = F.when(
        d % 2 == 0,
        F.concat(
            F.lit(" see https://"), F.col("source"),
            F.lit(".example.com/doc/"), d.cast("string"),
        ),
    ).otherwise(F.lit(""))
    url2 = F.when(d % 6 == 0, F.lit(" and https://mirror.example.org/x")).otherwise(
        F.lit("")
    )
    return F.concat(F.col("text"), email, phone, ip, url, url2)


_AUG_SQL = """
    text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
            || '@' || source || '.net' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
            || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
            || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN ' see https://' || source
            || '.example.com/doc/' || CAST(doc_id AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 6 = 0 THEN ' and https://mirror.example.org/x'
            ELSE '' END
"""

_PII_COUNT_SQL = sc.sql_pii_counts("t")


@register(
    "pii_scrub",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           CAST({_PII_COUNT_SQL['n_email']} AS BIGINT) AS n_email,
           CAST({_PII_COUNT_SQL['n_phone']} AS BIGINT) AS n_phone,
           CAST({_PII_COUNT_SQL['n_ipv4']} AS BIGINT) AS n_ipv4,
           {sc.sql_pii_redact('t')} AS redacted
    FROM aug
    """,
)
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over injected emails/phones/IPs — narrow
    regex expression DAG, zero shuffle, hash-checked down to the
    redacted text itself."""
    d = _docs(spark, sf_dir).select("doc_id", _aug_col().alias("t"))
    out = sc.pii_scrub(d, "t")
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        "redacted",
    )


@register(
    "url_domains",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t FROM documents),
    u AS (
      SELECT doc_id, UNNEST({sc.sql_url_domain('t')}) AS domain FROM aug
    ), per_doc AS (
      SELECT domain, doc_id, COUNT(*) AS n_in_doc FROM u GROUP BY 1, 2
    )
    SELECT domain, CAST(SUM(n_in_doc) AS BIGINT) AS n_mentions,
           COUNT(*) AS n_docs
    FROM per_doc GROUP BY domain
    """,
)
def url_domains_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain frequency over injected URLs — explode + one shuffle on
    the low-cardinality domain key."""
    d = _docs(spark, sf_dir).select("doc_id", _aug_col().alias("t"))
    return sc.url_domains(d, "t")


_STOPS = (("the", 5), ("a", 3), ("of", 4), ("to", 4), ("and", 5))
_STOP_SQL = " + ".join(
    f"(LENGTH(' ' || LOWER(text) || ' ') - "
    f"LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' {w} ', ''))) / {n}"
    for w, n in _STOPS
)


@register(
    "quality_filter",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                 x -> x <> '')) AS n_tokens,
             LENGTH(text) AS n_chars,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS spaces,
             LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS hashes,
             LENGTH(text) - LENGTH(REPLACE(text, '…', '')) AS ellipses,
             CAST({_STOP_SQL} AS BIGINT) AS stop_hits
      FROM documents
    ), f AS (
      SELECT doc_id,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             CASE WHEN n_tokens > 0
                  THEN CAST(n_chars - spaces AS DOUBLE) / n_tokens END AS mw,
             CASE WHEN n_tokens > 0
                  THEN CAST(hashes + ellipses AS DOUBLE) / n_tokens
                  ELSE CAST(0 AS DOUBLE) END AS sym,
             stop_hits
      FROM b
    )
    SELECT doc_id, n_tokens,
           ROUND(mw, 6) AS mean_word_len,
           stop_hits AS stopword_hits,
           CAST(n_tokens >= 20 AND n_tokens <= 100000 AS INT) AS flag_len,
           CAST(mw IS NOT NULL AND mw >= CAST(3.0 AS DOUBLE)
                AND mw <= CAST(10.0 AS DOUBLE) AS INT) AS flag_word_len,
           CAST(sym < CAST(0.1 AS DOUBLE) AS INT) AS flag_symbol,
           CAST(stop_hits >= 2 AS INT) AS flag_stopword,
           CAST(n_tokens >= 20 AND n_tokens <= 100000
                AND mw IS NOT NULL AND mw >= CAST(3.0 AS DOUBLE)
                AND mw <= CAST(10.0 AS DOUBLE)
                AND sym < CAST(0.1 AS DOUBLE)
                AND stop_hits >= 2 AS INT) AS keep
    FROM f
    """,
)
def quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality flags (Rae et al. 2021 §A1.1 thresholds) —
    narrow per-row expression DAG, the cheapest highest-rejection
    stage a 100 TB pipeline runs first."""
    out = sc.quality_filter(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_tokens",
        F.col("mean_word_len"),
        "stopword_hits",
        F.col("flag_len").cast("int").alias("flag_len"),
        F.col("flag_word_len").cast("int").alias("flag_word_len"),
        F.col("flag_symbol").cast("int").alias("flag_symbol"),
        F.col("flag_stopword").cast("int").alias("flag_stopword"),
        F.col("keep").cast("int").alias("keep"),
    )


@register(
    "shard_assign",
    oracle=f"""
    SELECT {sc.sql_shard_assign('doc_id', n_shards=8, salt='gate')} AS shard,
           COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents GROUP BY shard
    """,
)
def shard_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 output sharding — shard membership is a pure
    function of (key, salt), identical in DuckDB, so the exact
    assignment (not just the counts) is what the hash verifies."""
    d = sc.shard_assign(_docs(spark, sf_dir), "doc_id", n_shards=8, salt="gate")
    return d.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "tfidf_topterms",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                    x -> x <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), d AS (
      SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM tf
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    s AS (
      SELECT doc_id, term, tf, df,
             ROUND(tf * LN((n_docs + CAST(1.0 AS DOUBLE))
                           / (df + CAST(1.0 AS DOUBLE))), 6) AS score
      FROM d CROSS JOIN n
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM s
    )
    SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 3
    """,
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — explode, two keyed windows,
    broadcast one-row corpus count; ranking on the ROUNDED score so
    last-ulp ln() differences can't reorder engines."""
    out = ti.tfidf_topk(_docs(spark, sf_dir), k=3)
    return out.select(
        "doc_id", "term", "tf", "df", "score",
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id,
               UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                      x -> x <> '')) AS term
        FROM documents
      )
    )
    SELECT term, COUNT(*) AS df,
           STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM tok GROUP BY term
    """,
)
def inverted_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact posting lists per term — map-side distinct, one shuffle
    on the term key, sorted comma-joined ids (deterministic string)."""
    return ti.inverted_index(_docs(spark, sf_dir))


@register(
    "dedup_keep_canonical",
    oracle="""
    WITH RECURSIVE g AS (
      SELECT DISTINCT doc_id, lang,
             UNNEST(LIST_TRANSFORM(
               RANGE(1, GREATEST(LENGTH(text) - 4, 1) + 1),
               i -> SUBSTR(text, CAST(i AS INT), 5))) AS g
      FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM g a JOIN g b ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), clusters AS (
      SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
    WHERE c.cluster_id = d.doc_id
    """,
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The op a pipeline actually runs after near-dup detection: the
    corpus filtered to one representative per jaccard-0.2 cluster —
    pair generation, label propagation, then ONE semi-join back
    against the corpus. The oracle recomputes the same survivors via
    the recursive transitive closure."""
    d = _docs(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(d, threshold=0.2)
    clusters = dd.dup_clusters(pairs, d.select("doc_id"))
    return dd.keep_canonical(d, clusters).select("doc_id", "lang", "n_chars")


# ------------------------------------------------- budget / vector ops


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return spread(load_table(spark, sf_dir, "embeddings"))


_TBS_INNER = "SELECT doc_id, source, {tok} AS n_tokens FROM documents".format(
    tok=tx.sql_token_count("text")
)


@register(
    "token_budget_sample",
    oracle=f"""
    WITH t AS ({_TBS_INNER})
    {ds.sql_token_budget_sample('source', 'n_tokens', 'doc_id',
                                budget=2000, salt='gate')}
    """,
)
def token_budget_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 2000-token budget fill in salted-md5 admission order
    — the exact admitted set (not just its size) is the oracle, since
    admission is a pure function of (doc_id, salt) and the running sum
    is integer-exact on both engines."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "source", tx.token_count("text").alias("n_tokens")
    )
    return ds.token_budget_sample(
        d, "source", "n_tokens", "doc_id", budget=2000, salt="gate"
    )


@register(
    "embedding_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), a AS (
      SELECT vec_id, v,
             LIST_AGGREGATE(LIST_TRANSFORM(v, x -> ABS(x)), 'max') AS absmax
      FROM e
    )
    SELECT vec_id,
           CAST(LEN(v) AS BIGINT) AS dim,
           absmax,
           ROUND(SQRT(LIST_DOT_PRODUCT(v, v)), 6) AS l2_norm,
           ARRAY_TO_STRING(LIST_TRANSFORM(v, x ->
             CAST(COALESCE(CAST(FLOOR(x * CAST(127.0 AS DOUBLE)
                    / (CASE WHEN absmax > 0 THEN absmax END)
                    + CAST(0.5 AS DOUBLE)) AS INT), 0) AS VARCHAR)), ',')
             AS q_str
    FROM a
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 absmax quantization of the embedding column, hash-checked
    element-for-element (the quantized vector serialized as a string
    so the compare is representation-stable across engines), plus the
    round-6 L2 norm."""
    e = _emb(spark, sf_dir)
    q = vo.quantize_int8(e, "embedding")
    v = _as_double(F.col("embedding"))
    return q.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        "absmax",
        F.round(F.sqrt(dot(v, v)), 6).alias("l2_norm"),
        F.concat_ws(
            ",", F.transform(F.col("q"), lambda x: x.cast("string"))
        ).alias("q_str"),
    )


# ------------------------------------------------------------ profiling


_PROF_COLS = (
    ("l_orderkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_returnflag", "str"),
    ("l_shipdate", "ts"),
)


def _prof_arm(c: str, kind: str) -> str:
    if kind == "num":
        lo, hi = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        slo = shi = "CAST(NULL AS VARCHAR)"
    elif kind == "str":
        lo = hi = "CAST(NULL AS DOUBLE)"
        slo, shi = f"MIN({c})", f"MAX({c})"
    else:  # temporal, ISO-serialized
        lo = hi = "CAST(NULL AS DOUBLE)"
        slo, shi = f"CAST(MIN({c}) AS VARCHAR)", f"CAST(MAX({c}) AS VARCHAR)"
    return f"""
    SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
           COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           {lo} AS min_num, {hi} AS max_num,
           {slo} AS min_str, {shi} AS max_str
    FROM lineitem"""


@register(
    "profile_lineitem",
    oracle="\nUNION ALL\n".join(_prof_arm(c, k) for c, k in _PROF_COLS),
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass whole-table profile of six lineitem columns — null
    rates, exact distinct counts, typed min/max — one scan, one
    aggregate, long-form explode of the single result row."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return pf.profile_table(li, [c for c, _ in _PROF_COLS])


# ----------------------------------------------------- bigram LM stats


@register(
    "bigram_lm",
    oracle=f"""
    WITH g AS (
      SELECT UNNEST({tx.sql_token_ngrams('text', 2)}) AS gram FROM documents
    ), b AS (
      SELECT STRING_SPLIT(gram, ' ')[1] AS w1,
             STRING_SPLIT(gram, ' ')[2] AS w2
      FROM g
    ), c AS (
      SELECT w1, w2, COUNT(*) AS c FROM b GROUP BY w1, w2
    ), t AS (
      SELECT *, CAST(SUM(c) OVER (PARTITION BY w1) AS BIGINT) AS total_w1
      FROM c
    ), v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM b)
    SELECT w1, w2, c, total_w1,
           ROUND(LN((c + CAST(1.0 AS DOUBLE))
                    / (total_w1 + vocab)), 6) AS logp
    FROM t CROSS JOIN v
    """,
)
def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model table with add-1 smoothing:
    ``logp = ln((c(w1,w2)+1) / (c(w1·)+V))`` — the count-based LM
    behind classic perplexity-style quality filters.

    Token bigrams explode with multiplicity (the same JVM-side n-gram
    algebra as decontamination), partial-aggregate map-side, shuffle
    once on (w1,w2); the w1 marginal is a window over the aggregated
    rows (second, w1-keyed shuffle) and the vocabulary size joins as a
    broadcast one-row aggregate. Zipf-head w1 keys skew the window
    stage — state is O(1)/key, so skew costs time, not memory."""
    d = _docs(spark, sf_dir)
    grams = d.select(
        F.explode(tx.token_ngrams("text", 2)).alias("gram")
    ).select(
        F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    from pyspark.sql import Window as W

    c = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    t = c.withColumn(
        "total_w1", F.sum("c").over(W.partitionBy("w1"))
    )
    v = grams.agg(F.count_distinct(F.col("w2")).alias("vocab"))
    return t.crossJoin(F.broadcast(v)).select(
        "w1", "w2", "c", "total_w1",
        F.round(
            F.ln((F.col("c") + F.lit(1.0)) / (F.col("total_w1") + F.col("vocab"))),
            6,
        ).alias("logp"),
    )


@register(
    "doc_lm_score",
    oracle=f"""
    WITH tg AS (
      SELECT UNNEST({tx.sql_token_ngrams('text', 2)}) AS gram
      FROM documents WHERE doc_id % 2 = 0
    ), tb AS (
      SELECT STRING_SPLIT(gram, ' ')[1] AS w1,
             STRING_SPLIT(gram, ' ')[2] AS w2
      FROM tg
    ), c AS (
      SELECT w1, w2, COUNT(*) AS c FROM tb GROUP BY w1, w2
    ), m AS (
      SELECT w1, COUNT(*) AS total_w1 FROM tb GROUP BY w1
    ), v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM tb),
    dg AS (
      SELECT doc_id, UNNEST({tx.sql_token_ngrams('text', 2)}) AS gram
      FROM documents
    ), db AS (
      SELECT doc_id,
             STRING_SPLIT(gram, ' ')[1] AS w1,
             STRING_SPLIT(gram, ' ')[2] AS w2
      FROM dg
    ), k AS (
      SELECT doc_id, w1, w2, COUNT(*) AS k FROM db GROUP BY doc_id, w1, w2
    ), s AS (
      SELECT k.doc_id, k.k,
             -- scale-then-ROUND leaves an integral double, which casts
             -- to BIGINT identically on both engines (DuckDB rounds
             -- fractional doubles on cast where Spark truncates)
             CAST(ROUND(LN((COALESCE(c.c, 0) + CAST(1.0 AS DOUBLE))
                           / (COALESCE(m.total_w1, 0) + v.vocab))
                  * 1e6, 0) AS BIGINT) AS micro
      FROM k
      LEFT JOIN c ON k.w1 = c.w1 AND k.w2 = c.w2
      LEFT JOIN m ON k.w1 = m.w1
      CROSS JOIN v
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_bigrams,
           CAST(SUM(k * micro) AS BIGINT) AS score_micro,
           CAST(SUM(k * micro) AS DOUBLE) / 1e6 / SUM(k) AS avg_logp
    FROM s GROUP BY doc_id
    """,
)
def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering: every document scored by its
    mean bigram log-probability under an add-1-smoothed LM trained on
    HALF the corpus (``doc_id % 2 = 0``) — so held-out docs genuinely
    hit all three smoothing branches (seen bigram / unseen bigram
    under a seen history / unseen history word), which one COALESCE
    formula covers: ``ln((c+1)/(total_w1+V))`` with absent counts as
    zero.

    Plan: the train half is bigram-exploded ONCE into the persisted
    count table ``c`` (distinct-bigram cardinality); the w1 marginals
    and the vocabulary both derive from ``c`` (``total_w1 = Σc`` over
    the history, ``V = count_distinct(w2)`` over seen pairs — the
    identical values, since every instance lands in some counted
    pair), so neither pays a second corpus explode. Doc bigrams
    pre-aggregate per (doc, w1, w2) before the LM join, so the join
    input is bounded by distinct bigrams per doc, not token count;
    vocabulary joins as a broadcast 1-row agg. Per-bigram log-probs quantize to integer
    micro-units (scale, ROUND to an integral double, THEN cast — a
    bare double-to-long cast is engine-ambiguous: DuckDB rounds
    fractional doubles where Spark truncates) and accumulate exactly,
    so the per-doc score is partitioning- and engine-invariant — a full value-hash oracle over the whole
    filter, the quality signal CCNet/Gopher pipelines gate corpora
    on."""
    d = _docs(spark, sf_dir)

    def bigrams(frame, *cols):
        return frame.select(
            *cols, F.explode(tx.token_ngrams("text", 2)).alias("gram")
        ).select(
            *cols,
            F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("w2"),
        )

    from pyspark import StorageLevel

    from pandas_rust_algos_spark import cachelife

    tb = bigrams(d.where(F.col("doc_id") % 2 == 0))
    # the bigram counts feed marginals, vocab AND the scoring join in
    # the returned plan → tracked for deferred release
    c = cachelife.track(tb.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    ).persist(StorageLevel.MEMORY_AND_DISK))
    marg = c.groupBy("w1").agg(F.sum("c").alias("total_w1"))
    v = c.agg(F.count_distinct(F.col("w2")).alias("vocab"))

    k = bigrams(d, "doc_id").groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("k"))
    logp = F.ln(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("total_w1"), F.lit(0)) + F.col("vocab")))
    scored = (
        k.join(c, ["w1", "w2"], "left")
        .join(marg, ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select("doc_id", "k",
                F.round(logp * F.lit(1e6), 0).cast("long").alias("micro"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("micro")).alias("score_micro"),
        (F.sum(F.col("k") * F.col("micro")).cast("double") / F.lit(1e6)
         / F.sum("k")).alias("avg_logp"),
    )


# ------------------------------------------- incremental view maintenance


@register(
    "matview_incremental",
    oracle="""
    WITH base AS (
      -- engine-portable unique surrogate id: the fixture's natural key
      -- (orderkey, linenumber) is NOT unique, but adding the payload is;
      -- 15 md5 hex chars -> 60-bit int, same recipe as shard_assign
      SELECT CAST('0x' || SUBSTR(md5(
               CAST(l_orderkey AS VARCHAR) || ':' ||
               CAST(l_linenumber AS VARCHAR) || ':' ||
               CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
               || ':' || l_returnflag), 1, 15) AS BIGINT) AS id,
             l_returnflag AS grp, l_extendedprice AS v
      FROM lineitem
    ), upd AS (
      SELECT id, grp || 'x' AS grp, v + 0.5 AS v FROM base WHERE id % 7 = 0
    ), merged AS (
      SELECT b.id, COALESCE(u.grp, b.grp) AS grp, COALESCE(u.v, b.v) AS v
      FROM base b LEFT JOIN upd u ON b.id = u.id
      UNION ALL
      SELECT id + 2305843009213693952, 'Z', v FROM base WHERE id % 11 = 0
    ), final AS (
      SELECT * FROM merged WHERE id % 5 <> 0
    )
    SELECT grp, COUNT(*) AS n,
           -- registry rule 1: DuckDB SUM(BIGINT) widens to HUGEINT,
           -- which the driver hashes as float64, not int64
           CAST(SUM(CAST(FLOOR(v * 1e6) AS BIGINT)) AS BIGINT) AS v_sum_micro
    FROM final GROUP BY grp
    """,
)
def matview_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized aggregate, gate-proved:
    build a versioned table from lineitem, refresh the SUM/COUNT view,
    then MERGE (updates that move rows between groups + inserts) and
    DELETE on the base table and refresh again — each refresh applies
    only the change feed. The oracle computes the same final state
    declaratively; matching hashes prove delta maintenance ==
    full recompute, bit-exactly (fixed-point sums).

    At 100 TB the refresh cost tracks change volume, not table size —
    see sources/matview.py for why only COUNT/SUM self-maintain."""
    import tempfile

    from pandas_rust_algos_spark.sources.matview import MaterializedSumView
    from pandas_rust_algos_spark.sources.table_format import VersionedTable

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    sid = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.floor(F.col("l_extendedprice") * 100).cast("long")
                    .cast("string"),
                    F.col("l_returnflag"),
                )
            ),
            1, 15,
        ),
        16, 10,
    ).cast("bigint")
    base = li.select(
        sid.alias("id"),
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("v"),
    )
    root = tempfile.mkdtemp(prefix="matview_gate_")
    tbl = VersionedTable(spark, root + "/base", key_cols=["id"])
    tbl.create(base)
    view = MaterializedSumView(tbl, root + "/view", ["grp"], ["v"])
    view.refresh()
    updates = base.where(F.col("id") % 7 == 0).select(
        "id",
        F.concat(F.col("grp"), F.lit("x")).alias("grp"),
        (F.col("v") + 0.5).alias("v"),
    )
    inserts = base.where(F.col("id") % 11 == 0).select(
        (F.col("id") + 2_305_843_009_213_693_952).alias("id"),
        F.lit("Z").alias("grp"),
        F.col("v").alias("v"),
    )
    tbl.merge(updates.unionByName(inserts))
    view.refresh()
    tbl.delete(F.col("id") % 5 == 0)
    view.refresh()
    return view.read().select("grp", "n", "v_sum_micro")


@register(
    "bpe_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST({tx.sql_bpe_token_count('text')} AS BIGINT) AS n_bpe,
           CAST({tx.sql_token_count('text')} AS BIGINT) AS n_ws,
           CAST(LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(text,
             '{tx.BPE_PATTERN.replace("'", "''")}'))) AS BIGINT)
             AS n_distinct_bpe
    FROM documents
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish (BPE-style regex) token counting next to the
    whitespace count — the budget unit training pipelines meter; the
    regex subset is Java↔RE2-identical so the oracle runs the same
    pattern. Narrow per-row DAG, zero shuffle."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        tx.bpe_token_count("text").alias("n_bpe"),
        tx.token_count("text").alias("n_ws"),
        F.size(F.array_distinct(tx.bpe_tokens("text"))).cast("long")
        .alias("n_distinct_bpe"),
    )


@register(
    "pii_mask",
    oracle=f"""
    WITH aug AS (SELECT doc_id, source, {_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           {sc.sql_mask_column('source', salt='gate')} AS source,
           {sc.sql_mask_column('t', salt='gate', keep_last=4)} AS t
    FROM aug
    """,
)
def pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic governance masking (``scrub.mask_columns``):
    SHA-256 tokenization that PRESERVES equality (masked columns stay
    join/group-able) plus a format-preserving last-4 tail on the text
    column. Hash-checked down to the token strings — the
    cross-engine-determinism claim is the whole point of salted SHA
    over random pseudonyms."""
    d = _docs(spark, sf_dir).select("doc_id", "source", _aug_col().alias("t"))
    out = sc.mask_columns(d, ["source"], salt="gate")
    out = sc.mask_columns(out, ["t"], salt="gate", keep_last=4)
    return out


_BM25_TERMS = ["spark", "join", "window"]


@register(
    "bm25_topk",
    oracle=f"""
    WITH sc AS ({ti.sql_bm25_score(_BM25_TERMS)}),
    top AS (
      SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10
    )
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
    FROM top
    """,
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (top-10 docs for a 3-term query) — the
    ranked-retrieval twin of ``tfidf_topterms``. Per-term scores sum in
    exact fixed point so cross-term addition order can't flip ranks,
    corpus stats ride one broadcast row, df one broadcast join, and
    the top-k is a TakeOrdered (never a total sort); the DuckDB oracle
    replays the identical expression tree
    (``operators/tfidf.sql_bm25_score``). Reference: no retrieval
    surface exists (SURVEY §2.3) — driver-brief text-analysis
    extension."""
    return ti.bm25_topk(_docs(spark, sf_dir), _BM25_TERMS, k=10)


@register(
    "bpe_learn_merges",
    oracle=__import__(
        "pandas_rust_algos_spark.operators.bpe", fromlist=["sql_bpe_merges"]
    ).sql_bpe_merges(4),
)
def bpe_learn_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, value-proven end-to-end
    (``operators/bpe.py``): the first 4 merge rules learned over the
    corpus — weighted pair counts over the vocabulary, deterministic
    tie-break, leftmost-non-overlapping merges via wrapped-symbol
    string replace — must hash-match a DuckDB replay of the identical
    algorithm (chained CTEs, same encoding, same replace semantics).
    The corpus is scanned ONCE (word counts); every merge step is
    vocabulary-sized with a broadcast 1-row winning pair and zero
    driver collects."""
    from pandas_rust_algos_spark.operators.bpe import bpe_learn_merges

    return bpe_learn_merges(_docs(spark, sf_dir), n_merges=4)


@register(
    "wordpiece_learn",
    oracle=__import__(
        "pandas_rust_algos_spark.operators.bpe",
        fromlist=["sql_wordpiece_merges"],
    ).sql_wordpiece_merges(3),
)
def wordpiece_learn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style tokenizer training (``operators/bpe.py:
    wordpiece_learn_merges``) — the likelihood-gain companion to
    ``bpe_learn_merges``: each step's winner maximizes
    ``count(ab)/(count(a)·count(b))`` over the weighted vocabulary
    instead of the raw pair count (the BERT trainer's greedy rule).
    The DuckDB oracle unrolls the same chained CTEs plus per-step
    unigram counts and the identical double score tree, so the learned
    rules AND scores hash-match bit-exactly. Same scale shape as BPE:
    one corpus scan, vocabulary-sized steps, zero collects."""
    from pandas_rust_algos_spark.operators.bpe import (
        wordpiece_learn_merges,
    )

    return wordpiece_learn_merges(_docs(spark, sf_dir), n_merges=3)


@register(
    "unigram_lm_learn",
    oracle=__import__(
        "pandas_rust_algos_spark.operators.unigram",
        fromlist=["sql_unigram_lm_learn"],
    ).sql_unigram_lm_learn(max_piece_len=3, seed_size=60, iters=2,
                           prune_per_step=8),
)
def unigram_lm_learn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer training
    (``operators/unigram.py``) — completes the trainer family (BPE,
    WordPiece, unigram; r7 VERDICT next-#5): seed the candidate vocab
    from weighted substring counts, then hard-EM iterations — exact
    integer Viterbi segmentation of the distinct words under
    micro-unit piece costs, least-used pruning, add-1-smoothed cost
    re-estimation (the one ln per piece evaluated in CPython on the
    driver, the dsir recipe). The DuckDB oracle replays seeding, the
    same list_reduce Viterbi DP, prune ranks, and LN cost trees —
    pieces AND counts AND costs hash-match bit-exactly. One corpus
    scan; everything after is vocabulary-sized."""
    from pandas_rust_algos_spark.operators.unigram import (
        unigram_lm_learn,
    )

    return unigram_lm_learn(_docs(spark, sf_dir), max_piece_len=3,
                            seed_size=60, iters=2, prune_per_step=8)


@register(
    "unigram_encode_counts",
    oracle=__import__(
        "pandas_rust_algos_spark.operators.unigram",
        fromlist=["sql_unigram_encode_counts"],
    ).sql_unigram_encode_counts(max_piece_len=3, seed_size=60, iters=2,
                                prune_per_step=8),
)
def unigram_encode_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram tokenizer ENCODING (``operators/unigram.py``) — the
    companion to ``unigram_lm_learn``, mirroring the
    ``bpe_encode_tokens`` surface: train the vocabulary, then
    Viterbi-segment every word of every document under the final
    costs (unknown substrings pay the BIG sentinel — the UNK
    fallback), returning per-doc ``(doc_id, n_words, n_chars,
    n_tokens)``. The oracle replays training AND encoding, so the
    per-document token counts hash-match bit-exactly. One corpus word
    explode; the DP runs over distinct words only."""
    from pandas_rust_algos_spark.operators.unigram import (
        unigram_encode_counts,
    )

    return unigram_encode_counts(_docs(spark, sf_dir), max_piece_len=3,
                                 seed_size=60, iters=2,
                                 prune_per_step=8)


@register(
    "bpe_encode_tokens",
    oracle=__import__(
        "pandas_rust_algos_spark.operators.bpe",
        fromlist=["sql_bpe_encode_counts"],
    ).sql_bpe_encode_counts(4),
)
def bpe_encode_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer ENCODING, value-proven end-to-end
    (``operators/bpe.bpe_encode_counts``): learn 4 merge rules, apply
    them to every word in rank order (sequential application equals
    the min-rank priority loop because a rule's output token only
    appears in later rules), and report per-document
    ``(n_words, n_chars, n_tokens)``. The merge fold runs over the
    DISTINCT vocabulary with the rule list as ONE broadcast row inside
    a single ``F.aggregate`` lambda — plan size is O(1) in the rule
    count, corpus exploded once, one join back to word instances. The
    DuckDB oracle replays learning AND encoding with the identical
    wrapped-symbol replace semantics."""
    from pandas_rust_algos_spark.operators.bpe import bpe_encode_counts

    return bpe_encode_counts(_docs(spark, sf_dir), n_merges=4)


@register(
    "bpe_token_freqs",
    oracle=__import__(
        "pandas_rust_algos_spark.operators.bpe",
        fromlist=["sql_bpe_token_freqs"],
    ).sql_bpe_token_freqs(4, k=20),
)
def bpe_token_freqs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-BPE corpus token-frequency top-20
    (``operators/bpe.bpe_token_freqs``) — proves the IDENTITY of the
    formed tokens (which subwords exist and how often), the sharpest
    check on merge application. Symbol explode is weighted
    vocabulary-sized (never per word instance); the top-k is a
    TakeOrdered with a total (count DESC, token) tie-break so the
    ranking hashes identically on both engines."""
    from pandas_rust_algos_spark.operators.bpe import bpe_token_freqs

    return bpe_token_freqs(_docs(spark, sf_dir), n_merges=4, k=20)
