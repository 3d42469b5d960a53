"""Distributed BPE merge training — learn byte-pair-encoding merge
rules over a corpus (the training step of a GPT-2-style tokenizer;
driver-brief text-analysis extension, SURVEY §2.3 — the reference has
no text surface).

Algorithm (Sennrich et al. 2016, public): pre-tokenize to words, count
word frequencies once, then repeatedly (1) count adjacent symbol pairs
across the weighted vocabulary, (2) pick the most frequent pair, and
(3) merge its occurrences leftmost-non-overlapping in every word.

Scale shape (100 TB): the corpus is touched ONCE (the word-frequency
aggregation — one shuffle, map-side combined — materialized by ONE
eager localCheckpoint of the encoded vocabulary). Every merge step
then runs over the VOCABULARY (words × weights), which is orders of
magnitude smaller; per step: one vocab-sized pair aggregation ending
in a 1-ROW TakeOrdered collect (the winning pair — metadata-sized by
construction, the kmeans-centroid convention), after which the merge
is a LITERAL string replace over the checkpointed vocab. The r12
restructuring replaced per-step eager checkpoints + broadcast
crossJoins with the literal chain: step k's state is k narrow
replaces over the one in-memory vocab, so nothing vocabulary-sized is
ever re-materialized and the final rule table is a driver-built
LocalTableScan (``session.local_df``).

Determinism (the gate contract): symbols are wrapped as
``\\x02 sym \\x03`` and concatenated, so a merge is a plain (non-regex)
string ``replace`` of ``\\x02a\\x03\\x02b\\x03`` with ``\\x02ab\\x03`` —
both Spark and DuckDB replace leftmost-non-overlapping occurrences,
which IS the BPE merge convention, and a pattern can only match at a
true symbol boundary (symbol text never contains the wrappers). Ties
on the pair count break (count DESC, left, right) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.text import tokens

__all__ = ["bpe_learn_merges", "sql_bpe_merges",
           "wordpiece_learn_merges", "sql_wordpiece_merges"]

_A = "\x02"
_B = "\x03"


def _encode(word):
    """word → ``␂c␃`` per character, concatenated."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.concat(F.lit(_A), F.substr(word, i, F.lit(1)),
                               F.lit(_B)),
        ),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )


def _symbols(s):
    return F.split(F.expr(f"substring({s}, 2, length({s})-2)"), _B + _A)


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_loop(
    words: DataFrame,
    n_merges: int,
    *,
    ranking: str = "count",
    n_states: int | None = None,
):
    """Driver-paced merge trainer shared by the BPE and WordPiece
    learners and the encode surfaces. ONE eager localCheckpoint
    materializes the encoded vocabulary (the only corpus-derived
    state); each step then runs one vocab-sized pair aggregation whose
    1-row winner is collected (metadata-sized), and the merge is
    applied as a LITERAL plain-string replace — step k's state is k
    narrow replaces over the in-memory vocab, no per-step
    re-materialization, no broadcast builds.

    Returns ``(rules, state)``: the collected winner Rows (< n_merges
    only if some step has no adjacent pair left, mirroring the lazy
    formulation where an empty winner emptied every later step) and
    the vocab state ``(w, n, s)`` with ``min(len(rules), n_states)``
    merges applied (learning needs ``n_merges - 1`` — the last winner
    is never applied; encoding needs all ``n_merges``)."""
    if n_states is None:
        n_states = n_merges - 1
    state = words.select(
        "w", "n", _encode(F.col("w")).alias("s")
    ).localCheckpoint(eager=True)
    rules = []
    for step in range(1, n_merges + 1):
        syms = _symbols("s")
        pairs = (
            state.select(
                "n",
                F.explode(
                    F.arrays_zip(
                        F.slice(syms, 1, F.size(syms) - 1).alias("a"),
                        F.slice(syms, 2, F.size(syms) - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("merge_left"),
                     F.col("p.b").alias("merge_right"))
            .agg(F.sum("n").alias("pair_count"))
        )
        if ranking == "wordpiece":
            unigrams = (
                state.select("n", F.explode(syms).alias("sym"))
                .groupBy("sym").agg(F.sum("n").alias("c_sym"))
            )
            ua = unigrams.select(F.col("sym").alias("merge_left"),
                                 F.col("c_sym").alias("c_a"))
            ub = unigrams.select(F.col("sym").alias("merge_right"),
                                 F.col("c_sym").alias("c_b"))
            score = F.col("pair_count").cast("double") / (
                F.col("c_a").cast("double") * F.col("c_b").cast("double"))
            best = (
                pairs.join(ua, "merge_left").join(ub, "merge_right")
                .select("merge_left", "merge_right", "pair_count",
                        score.alias("score"))
                .orderBy(F.col("score").desc(),
                         "merge_left", "merge_right")
                .limit(1).collect()
            )
        else:
            best = pairs.orderBy(
                F.col("pair_count").desc(), "merge_left", "merge_right"
            ).limit(1).collect()
        if not best:
            break
        r = best[0]
        rules.append(r)
        if step <= n_states:
            pat = _A + r["merge_left"] + _B + _A + r["merge_right"] + _B
            rep = _A + r["merge_left"] + r["merge_right"] + _B
            state = state.select(
                "w", "n",
                F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s"))
    return rules, state


def bpe_learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 3,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over ``docs``.

    Returns one row per learned rule: ``(step, merge_left,
    merge_right, pair_count)`` — the pair merged at each step and its
    weighted frequency at the time it won."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    from pandas_rust_algos_spark.session import local_df

    rules, _ = _merge_loop(_word_counts(docs, text_col), n_merges)
    return local_df(
        docs.sparkSession,
        [(step, r["merge_left"], r["merge_right"], r["pair_count"])
         for step, r in enumerate(rules, start=1)],
        "step BIGINT, merge_left STRING, merge_right STRING, "
        "pair_count BIGINT",
    )


def wordpiece_learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 3,
) -> DataFrame:
    """WordPiece-style merge training (Schuster & Nakajima 2012; the
    BERT tokenizer's trainer, public): identical mechanics to
    :func:`bpe_learn_merges` except the WINNER of each step maximizes
    the likelihood-gain score ``count(ab) / (count(a)·count(b))``
    instead of the raw pair count — merging high-score pairs first
    prefers pairs that co-occur far more than their unigram
    frequencies predict.

    Returns ``(step, merge_left, merge_right, pair_count, score)``
    with the score rounded to 6 (registry rule 4); the RANKING uses
    the unrounded double, which is deterministic cross-engine because
    both engines evaluate the identical expression tree over exact
    integer counts (registry rule 2; the unigram product is computed
    in double so petabyte-scale counts cannot overflow BIGINT).
    Ties break (score DESC, left, right).

    Scale shape: exactly BPE's — the corpus is touched once for word
    counts; per step one vocab-sized pair aggregation PLUS one
    vocab-sized unigram-symbol aggregation (the score's denominator),
    two broadcast-sized joins of the pair table to the unigram
    counts, then the 1-row winner collects (metadata-sized) and the
    merge applies as a literal replace (see :func:`_merge_loop`).
    The RANKING uses the unrounded double; the returned ``score``
    rounds to 6 in Spark (registry rule 4), applied to the collected
    literal so the rounding semantics stay the engine's."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    from pandas_rust_algos_spark.session import local_df

    rules, _ = _merge_loop(
        _word_counts(docs, text_col), n_merges, ranking="wordpiece")
    out = local_df(
        docs.sparkSession,
        [(step, r["merge_left"], r["merge_right"], r["pair_count"],
          r["score"])
         for step, r in enumerate(rules, start=1)],
        "step BIGINT, merge_left STRING, merge_right STRING, "
        "pair_count BIGINT, score DOUBLE",
    )
    return out.withColumn("score", F.round("score", 6))


def _sql_chain(
    n_merges: int,
    text_expr: str,
    table: str,
    *,
    n_states: int | None = None,
    ranking: str = "count",
) -> str:
    """Shared CTE prefix for the SQL twins: word counts ``w``, the
    wrapped-symbol encodings ``s0``, and per merge step ``k`` the pair
    counts ``p{k}``, the winning rule ``best{k}``, and (for
    ``k <= n_states``) the post-merge vocabulary state ``s{k}``.
    Learning needs ``n_states = n_merges - 1`` (the last winner is
    never applied); encoding needs all ``n_merges`` states.
    ``ranking='wordpiece'`` inserts per-step unigram-count and score
    CTEs and picks the likelihood-gain winner instead of the raw-count
    one (the :func:`wordpiece_learn_merges` twin)."""
    if n_states is None:
        n_states = n_merges - 1
    ab = "chr(2)"
    eb = "chr(3)"
    parts = [f"""
    WITH w AS (
      SELECT word AS w, COUNT(*) AS n FROM (
        SELECT UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_expr}),
               '\\s+'), x -> x <> '')) AS word
        FROM {table}
      ) GROUP BY 1
    ),
    s0 AS (
      SELECT w, n, {ab} || array_to_string(
        list_transform(range(1, length(w)+1),
                       i -> substr(w, CAST(i AS INTEGER), 1)),
        {eb}||{ab}) || {eb} AS s
      FROM w
    )"""]
    for k in range(1, n_merges + 1):
        prev = f"s{k - 1}"
        parts.append(f""",
    u{k} AS (
      SELECT n, string_split(substr(s, 2, length(s)-2), {eb}||{ab}) AS syms
      FROM {prev}
    ),
    p{k} AS (
      SELECT syms[CAST(i AS INTEGER)] AS merge_left,
             syms[CAST(i AS INTEGER)+1] AS merge_right,
             CAST(SUM(n) AS BIGINT) AS pair_count
      FROM u{k}, UNNEST(range(1, len(syms))) AS z(i)
      GROUP BY 1, 2
    )""")
        if ranking == "wordpiece":
            parts.append(f""",
    o{k} AS (
      SELECT sym, CAST(SUM(n) AS BIGINT) AS c_sym
      FROM (SELECT n, UNNEST(syms) AS sym FROM u{k})
      GROUP BY 1
    ),
    sc{k} AS (
      SELECT p.merge_left, p.merge_right, p.pair_count,
             CAST(p.pair_count AS DOUBLE) /
               (CAST(a.c_sym AS DOUBLE) * CAST(b.c_sym AS DOUBLE))
               AS score
      FROM p{k} p
      JOIN o{k} a ON a.sym = p.merge_left
      JOIN o{k} b ON b.sym = p.merge_right
    ),
    best{k} AS (
      SELECT * FROM sc{k}
      ORDER BY score DESC, merge_left, merge_right LIMIT 1
    )""")
        else:
            parts.append(f""",
    best{k} AS (
      SELECT * FROM p{k}
      ORDER BY pair_count DESC, merge_left, merge_right LIMIT 1
    )""")
        if k <= n_states:
            parts.append(f""",
    s{k} AS (
      SELECT w, n, replace(s,
        {ab}||(SELECT merge_left FROM best{k})||{eb}
          ||{ab}||(SELECT merge_right FROM best{k})||{eb},
        {ab}||(SELECT merge_left FROM best{k})
          ||(SELECT merge_right FROM best{k})||{eb}) AS s
      FROM {prev}
    )""")
    return "".join(parts)


def sql_bpe_merges(
    n_merges: int = 3,
    *,
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bpe_learn_merges`: the same word counts,
    wrapped-symbol encoding, weighted pair counts, tie-break, and
    plain-replace merges, unrolled as chained CTEs."""
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS step, merge_left, merge_right, "
        f"pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    ]
    return (_sql_chain(n_merges, text_expr, table)
            + "\n" + "\nUNION ALL\n".join(selects))


def sql_wordpiece_merges(
    n_merges: int = 3,
    *,
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`wordpiece_learn_merges`: the same word
    counts, encodings, pair AND unigram counts, likelihood-gain score
    (the identical double expression tree), tie-break, and merges."""
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS step, merge_left, merge_right, "
        f"pair_count, ROUND(score, 6) AS score FROM best{k}"
        for k in range(1, n_merges + 1)
    ]
    return (_sql_chain(n_merges, text_expr, table, ranking="wordpiece")
            + "\n" + "\nUNION ALL\n".join(selects))


def _encoded_vocab(docs: DataFrame, text_col: str, n_merges: int):
    """(per-doc word instances, vocabulary with fully-merged symbol
    state) — the shared core of the two encode surfaces.

    Scale shape: the corpus is word-exploded ONCE for the vocabulary
    (materialized by :func:`_merge_loop`'s single checkpoint) and once
    for per-doc instances; learning and encoding now SHARE the merged
    vocabulary state — the loop runs with ``n_states = n_merges``
    (every learned rule applied, in rank order, as a literal replace),
    so the encode side is the final state itself: no re-learning
    subtree, no rule-fold over a second distinct-vocab scan. Encoded
    widths then join back to word instances on the word key (AQE picks
    broadcast when the vocab is small enough)."""
    _, state = _merge_loop(
        _word_counts(docs, text_col), n_merges, n_states=n_merges)
    words = docs.select("doc_id", F.explode(tokens(text_col)).alias("w"))
    return words, state.select("w", "s")


def bpe_encode_counts(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 4,
) -> DataFrame:
    """BPE tokenizer ENCODING: learn ``n_merges`` rules over the
    corpus, apply them to every word (leftmost-non-overlapping, in
    rank order — sequential application in merge order is equivalent
    to the min-rank priority loop because a rule's output token can
    only appear in later-learned rules), and return per-document
    ``(doc_id, n_words, n_chars, n_tokens)``. ``n_chars`` is the
    pre-merge token count (one symbol per character), so
    ``n_chars - n_tokens`` is exactly the number of merge applications
    the document absorbed."""
    words, enc = _encoded_vocab(docs, text_col, n_merges)
    widths = enc.select(
        "w",
        F.size(_symbols("s")).cast("long").alias("n_tok"),
    )
    return (
        words.join(widths, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def bpe_token_freqs(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 4,
    k: int = 20,
) -> DataFrame:
    """Corpus token-frequency table AFTER BPE encoding: the top ``k``
    tokens by total occurrence count (ties break on the token text),
    ranked. Proves the IDENTITY of the formed tokens, not just their
    widths — the sharpest oracle for merge application. The symbol
    explode runs over the vocabulary weighted by word frequency, never
    over raw word instances; the top-k is a TakeOrdered."""
    words, enc = _encoded_vocab(docs, text_col, n_merges)
    uses = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_uses"))
    toks = (
        enc.join(uses, "w")
        .select(F.explode(_symbols("s")).alias("token"), "n_uses")
        .groupBy("token")
        .agg(F.sum("n_uses").alias("n_occurrences"))
    )
    ranked = toks.orderBy(
        F.col("n_occurrences").desc(), "token"
    ).limit(k)
    return ranked.select(
        F.row_number().over(
            Window.orderBy(F.col("n_occurrences").desc(), "token")
        ).cast("long").alias("rank"),
        "token",
        "n_occurrences",
    )


def _sql_encoded_vocab(n_merges: int, text_expr: str, table: str) -> str:
    """CTE prefix ending in ``venc(w, n_tok)`` (fully-merged token
    width per word) and ``dw(doc_id, word)`` (per-doc instances)."""
    eb_ab = "chr(3)||chr(2)"
    return _sql_chain(n_merges, text_expr, table, n_states=n_merges) + f""",
    venc AS (
      SELECT w,
             CAST(len(string_split(substr(s, 2, length(s)-2), {eb_ab}))
                  AS BIGINT) AS n_tok,
             substr(s, 2, length(s)-2) AS body
      FROM s{n_merges}
    ),
    dw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id,
               UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_expr}),
                      '\\s+'), x -> x <> '')) AS word
        FROM {table}
      )
    )"""


def sql_bpe_encode_counts(
    n_merges: int = 4,
    *,
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bpe_encode_counts`: the same learned
    rules (chained CTEs), the same ordered plain-replace fold over the
    vocabulary, joined back to per-doc word instances."""
    return _sql_encoded_vocab(n_merges, text_expr, table) + """
    SELECT dw.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(length(dw.word)) AS BIGINT) AS n_chars,
           CAST(SUM(venc.n_tok) AS BIGINT) AS n_tokens
    FROM dw JOIN venc ON dw.word = venc.w
    GROUP BY dw.doc_id
    """


def sql_bpe_token_freqs(
    n_merges: int = 4,
    *,
    k: int = 20,
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bpe_token_freqs`."""
    eb_ab = "chr(3)||chr(2)"
    return _sql_encoded_vocab(n_merges, text_expr, table) + f""",
    uses AS (
      SELECT word AS w, COUNT(*) AS n_uses FROM dw GROUP BY 1
    ),
    tok AS (
      SELECT t.token, CAST(SUM(uses.n_uses) AS BIGINT) AS n_occurrences
      FROM venc
      JOIN uses ON venc.w = uses.w,
      UNNEST(string_split(venc.body, {eb_ab})) AS t(token)
      GROUP BY 1
    ),
    top AS (
      SELECT * FROM tok
      ORDER BY n_occurrences DESC, token LIMIT {k}
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token)
                AS BIGINT) AS rank,
           token, n_occurrences
    FROM top
    """
