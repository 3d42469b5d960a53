"""Unigram-LM (SentencePiece-style) tokenizer training — the third
trainer of the tokenizer family (BPE ``bpe.bpe_learn_merges``,
WordPiece ``bpe.wordpiece_learn_merges``), completing r7 VERDICT
next-#5.

Algorithm (Kudo 2018, "Subword Regularization", public — the
SentencePiece unigram trainer, in its deterministic hard-EM form):

1. **Seed** a candidate vocabulary: every single character of the
   corpus words (mandatory, never pruned — segmentation stays
   feasible) plus the ``seed_size`` most frequent multi-character
   substrings up to ``max_piece_len`` (weighted by word frequency,
   ties on the piece text).
2. **Hard-EM iterations** (Viterbi-EM — the deterministic counterpart
   of the paper's expected-count E-step): segment every distinct word
   by VITERBI under the current piece costs (dynamic program over the
   word, exact integer cost sums), count piece usage weighted by word
   frequency, PRUNE the ``prune_per_step`` least-used multi-character
   pieces (the paper's prune step, with least-Viterbi-use standing in
   for least likelihood loss), and re-estimate costs from the counts
   (the M-step): ``cost(p) = floor(−ln((c_p + 1) / (T + V)) · 1e6)``
   — add-1-smoothed negative log-likelihood on the integer MICRO-unit
   grid.

Determinism (the gate contract):

- the Viterbi DP compares exact BIGINT cost sums; ties break on the
  segmentation string (binary comparison both engines), so the best
  segmentation is partitioning- and engine-independent;
- costs are integers derived from integer counts; the one ``ln`` per
  piece is evaluated in CPython on the driver (the ``dsir`` recipe —
  JVM ``Math.log`` is only 1-ulp semi-monotonic, while CPython and
  DuckDB both call the host libm on identical double arguments), and
  the oracle's ``LN`` reproduces the same bits;
- pruning ranks (viterbi_count ASC, piece ASC) among multi-char
  pieces — a pure function of the counts.

Scale shape: the corpus is touched ONCE (the word-frequency
aggregation — one map-side-combined shuffle). Everything after runs
over the DISTINCT VOCABULARY: seeding explodes each distinct word
into ≤ len·max_piece_len substrings; each E-step is one narrow
projection computing the per-word DP (state is a length-L array —
bounded by ``max_word_len``) plus one vocab-sized count aggregation.
The trainer state (pieces, counts, costs — ≤ seed_size + alphabet
rows) is METADATA: it rides each E-step as one map literal below 16k
pieces and as a single broadcast row above (the IVF centroid-matrix
switch, ``_with_cost_map``), and returns to the driver as one
vocab-sized collect per iteration, exactly the
centroids-as-metadata pattern of the fixed-point k-means family.
Words longer than ``max_word_len`` are excluded from training on
both engines (SentencePiece's own ``max_sentencepiece_length``-style
junk guard); the encode surface caps its DP at
``encode_max_word_len`` instead (over-length junk counts UNK chunks
directly — see :func:`unigram_encode_counts`).

Reference scope: no text surface exists in the reference (SURVEY
§2.3) — driver-brief training-pipeline extension.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.text import tokens

__all__ = ["unigram_lm_learn", "unigram_encode_counts",
           "sql_unigram_lm_learn", "sql_unigram_encode_counts"]

# out-of-vocab (UNK) cost sentinel. Two bounds pick its size: it must
# DOMINATE any real path (a real piece costs ≤ −ln(1/(T+V))·1e6 ≈ 4e7
# even at petabyte counts, so a word of up to ~4e5 chars of real
# pieces stays under 2^44 — one UNK piece always loses to any real
# segmentation), and L/2 of them must SUM without int64 overflow (an
# all-UNK word may accumulate one sentinel per 2 chars, safe to
# ~5e5-char words; 2^62 overflowed at 2 pieces under ANSI mode).
# Half-megabyte single "words" are beyond any tokenizer-trainer input.
_BIG = 1 << 44
_SEP = "\x02"

# Above this many pieces, the trained cost map stops riding the plan
# as a create_map literal (2·V Literal nodes per E-step — at a
# 32k-piece production vocab that bloats the serialized plan and the
# codegen constant pool, the same failure mode the IVF centroid
# matrix hits at production dims) and switches to ONE broadcast row
# cross-joined onto the word table: the expression tree stays O(1)
# and the pieces move as broadcast data, not plan text. Mirrors
# similarity._CENTROID_LITERAL_MAX (r8 VERDICT next-#3).
_COSTMAP_LITERAL_MAX = 16_384


def _with_cost_map(df: DataFrame, costs: dict[str, int]) -> tuple[DataFrame, Column]:
    """Attach the piece→cost map to ``df``: as a ``create_map`` plan
    literal below :data:`_COSTMAP_LITERAL_MAX` pieces, else as a
    single broadcast row (``__costmap`` map column). Returns the
    (possibly cross-joined) frame and the map column; the Viterbi DP
    is indifferent to which form it gets."""
    items = sorted(costs.items())
    if len(items) > _COSTMAP_LITERAL_MAX:
        from pyspark.sql.types import (
            LongType, MapType, StringType, StructField, StructType,
        )

        cm_df = df.sparkSession.createDataFrame(
            [({p: int(c) for p, c in items},)],
            StructType([StructField(
                "__costmap", MapType(StringType(), LongType()))]),
        )
        return df.crossJoin(F.broadcast(cm_df)), F.col("__costmap")
    return df, F.create_map(
        *[F.lit(x) for p, c in items for x in (p, c)])


def _viterbi_best(wcol: Column, cost_map: Column, ml: int) -> Column:
    """struct<c: long, s: string> — the exact-integer Viterbi optimum
    for ``wcol`` under ``cost_map`` (piece → cost), considering pieces
    up to ``ml`` chars. ``s`` is ``␂piece`` concatenated; ties on the
    cost break on the segmentation string (binary compare, identical
    in DuckDB). The DP folds positions 1..len(w), growing an array of
    per-prefix best structs — O(len·ml) lookups per word, evaluated
    over the DISTINCT vocabulary only."""
    init = F.array(F.struct(
        F.lit(0).cast("long").alias("c"), F.lit("").alias("s")))

    def step(acc, i):
        cands = F.transform(
            F.sequence(F.lit(1), F.least(F.lit(ml), i)),
            lambda l: F.struct(
                (F.element_at(acc, (i - l + 1).cast("int"))
                 .getField("c")
                 + F.coalesce(
                     F.element_at(cost_map, F.substr(wcol, i - l + 1, l)),
                     F.lit(_BIG).cast("long"))).alias("c"),
                F.concat(
                    F.element_at(acc, (i - l + 1).cast("int"))
                    .getField("s"),
                    F.lit(_SEP),
                    F.substr(wcol, i - l + 1, l)).alias("s"),
            ),
        )
        return F.concat(acc, F.array(F.array_min(cands)))

    state = F.aggregate(F.sequence(F.lit(1), F.length(wcol)), init, step)
    return F.element_at(state, (F.length(wcol) + 1).cast("int"))


def _cost(c: int, t: int, v: int) -> int:
    """floor(−ln((c+1)/(T+V)) · 1e6) — CPython libm over integers."""
    return math.floor(-math.log((c + 1) / (t + v)) * 1e6)


def _train(
    docs: DataFrame,
    text_col: str,
    *,
    max_piece_len: int,
    seed_size: int,
    iters: int,
    prune_per_step: int,
    max_word_len: int,
) -> tuple[dict[str, int], dict[str, int]]:
    """The driver-coordinated trainer core shared by the learn and
    encode surfaces: returns ``(final_counts, final_costs)`` — both
    vocabulary-sized metadata dicts."""
    if max_piece_len < 2:
        raise ValueError("max_piece_len must be >= 2")
    if iters < 1 or prune_per_step < 0 or seed_size < 1:
        raise ValueError(
            f"bad params iters={iters} prune_per_step={prune_per_step} "
            f"seed_size={seed_size}")
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.length("w") <= max_word_len)
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        # reused by seeding + every E-step: truncate lineage once
        .localCheckpoint(eager=True)
    )

    # --- seed: single chars (all) + top multi-char substrings -------
    subs = (
        words.select(
            "n",
            F.explode(
                F.flatten(F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(F.lit(max_piece_len),
                                    F.length("w") - i + 1)),
                        lambda l: F.substr(F.col("w"), i, l),
                    ),
                ))
            ).alias("piece"),
        )
        .groupBy("piece").agg(F.sum("n").alias("c"))
    )
    chars = subs.where(F.length("piece") == 1)
    multis = (
        subs.where(F.length("piece") >= 2)
        .orderBy(F.col("c").desc(), "piece").limit(seed_size)
    )
    vocab = {r["piece"]: r["c"]
             for r in chars.unionByName(multis).collect()}
    t = sum(vocab.values())
    v = len(vocab)
    costs = {p: _cost(c, t, v) for p, c in vocab.items()}

    # --- hard-EM iterations -----------------------------------------
    cnts: dict[str, int] = {}
    for _ in range(iters):
        src, cost_map = _with_cost_map(words, costs)
        seg = src.select(
            "n",
            _viterbi_best(F.col("w"), cost_map, max_piece_len)
            .getField("s").alias("s"),
        )
        used = (
            seg.select(
                "n",
                F.explode(
                    F.slice(F.split("s", _SEP), 2,
                            F.size(F.split("s", _SEP)) - 1)
                ).alias("piece"),
            )
            .groupBy("piece").agg(F.sum("n").alias("cnt"))
            .collect()
        )
        e_cnt = {r["piece"]: r["cnt"] for r in used}
        cnts = {p: e_cnt.get(p, 0) for p in costs}
        # prune the least-used multi-char pieces (count ASC, piece ASC)
        multi = sorted(
            (p for p in cnts if len(p) >= 2),
            key=lambda p: (cnts[p], p))
        for p in multi[:prune_per_step]:
            del cnts[p]
        t = sum(cnts.values())
        v = len(cnts)
        costs = {p: _cost(c, t, v) for p, c in cnts.items()}
    return cnts, costs


def unigram_lm_learn(
    docs: DataFrame,
    text_col: str = "text",
    *,
    max_piece_len: int = 3,
    seed_size: int = 60,
    iters: int = 2,
    prune_per_step: int = 8,
    max_word_len: int = 64,
) -> DataFrame:
    """Train a unigram-LM subword vocabulary over ``docs``; returns
    one row per surviving piece: ``(piece, viterbi_count, cost)`` —
    the piece's weighted usage count in the final E-step's Viterbi
    segmentation and its re-estimated micro-unit cost. See the module
    docstring for the algorithm and determinism contract."""
    cnts, costs = _train(
        docs, text_col, max_piece_len=max_piece_len,
        seed_size=seed_size, iters=iters,
        prune_per_step=prune_per_step, max_word_len=max_word_len)
    rows = sorted((p, int(cnts[p]), int(costs[p])) for p in costs)
    return docs.sparkSession.createDataFrame(
        rows, schema="piece string, viterbi_count long, cost long")


def unigram_encode_counts(
    docs: DataFrame,
    text_col: str = "text",
    *,
    id_col: str = "doc_id",
    max_piece_len: int = 3,
    seed_size: int = 60,
    iters: int = 2,
    prune_per_step: int = 8,
    max_word_len: int = 64,
    encode_max_word_len: int = 256,
) -> DataFrame:
    """Unigram tokenizer ENCODING — the companion surface to
    :func:`unigram_lm_learn` (the ``bpe_encode_counts`` shape): train
    the vocabulary, Viterbi-segment every word under the final costs,
    and return per-document ``(id, n_words, n_chars, n_tokens)``.
    ``n_chars − n_tokens`` is the subword compression the document
    absorbed.

    Unlike training, encoding covers EVERY word (documents must be
    fully countable): substrings absent from the vocabulary cost the
    BIG sentinel, so an all-unknown word deterministically segments
    into the fewest such pieces — the UNK fallback, identical in the
    oracle. Words longer than ``encode_max_word_len`` skip the DP and
    count ``ceil(len / max_piece_len)`` tokens directly — the cost
    the all-UNK path would charge — identically on both engines (r8
    ADVICE): without the bound a single multi-megabyte whitespace-
    free junk token (base64, minified JS) drives the DP's grown
    per-prefix state to O(L²) and can overflow the int64 cost sum
    under ANSI mode (~L/2 BIG sentinels of 2^44 past ~1e6 chars).
    At the default bound the worst DP path sums 256·2^44 < 2^53 —
    comfortably inside int64.

    Scale shape: the corpus is word-exploded once; the Viterbi DP runs
    over the DISTINCT vocabulary with the trained costs riding as one
    map literal below 16k pieces and as a single broadcast row above
    (:func:`_with_cost_map`), and widths join back to word instances
    on the word key (AQE broadcasts small vocabularies)."""
    _, costs = _train(
        docs, text_col, max_piece_len=max_piece_len,
        seed_size=seed_size, iters=iters,
        prune_per_step=prune_per_step, max_word_len=max_word_len)
    inst = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    src, cost_map = _with_cost_map(inst.select("w").distinct(), costs)
    ml = max_piece_len
    n_tok = F.when(
        F.length("w") > encode_max_word_len,
        F.floor((F.length("w") + ml - 1) / F.lit(ml)).cast("long"),
    ).otherwise(
        (F.size(F.split(
            _viterbi_best(F.col("w"), cost_map, ml)
            .getField("s"), _SEP)) - 1).cast("long"))
    widths = src.select("w", n_tok.alias("n_tok"))
    return (
        inst.join(widths, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def _sql_viterbi(w: str, m: str, ml: int) -> str:
    """DuckDB twin of :func:`_viterbi_best` — the same grown-array DP
    via ``list_reduce`` (2-arg form: the initial accumulator rides as
    a prepended first element; position ``i`` rides in each element's
    ``c`` field), the same BIG out-of-vocab sentinel, the same
    (cost, segmentation-string) tie rule."""
    at = f"CAST(x[1].c - l + 1 AS INTEGER)"
    piece = f"substr({w}, {at}, CAST(l AS INTEGER))"
    return f"""list_reduce(
      list_prepend(
        [struct_pack(c := CAST(0 AS BIGINT), s := '')],
        list_transform(range(1, length({w}) + 1),
          i -> [struct_pack(c := CAST(i AS BIGINT), s := '')])
      ),
      (acc, x) -> list_append(acc,
        list_sort(
          list_transform(range(1, least({ml}, x[1].c) + 1),
            l -> struct_pack(
              c := acc[{at}].c
                   + COALESCE({m}[{piece}][1],
                              CAST({_BIG} AS BIGINT)),
              s := acc[{at}].s || chr(2) || {piece}))
        )[1])
    )[CAST(length({w}) + 1 AS INTEGER)]"""


def _sql_train_parts(
    *,
    text_expr: str,
    table: str,
    max_piece_len: int,
    seed_size: int,
    iters: int,
    prune_per_step: int,
    max_word_len: int,
) -> tuple[list[str], str]:
    """The trainer CTE chain shared by the learn and encode twins:
    returns ``(parts, final_k)`` where ``final_k`` holds
    ``(piece, cnt, cost)``."""
    ml = max_piece_len
    parts = [f"""
    WITH w AS (
      SELECT word AS w, COUNT(*) AS n FROM (
        SELECT UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_expr}),
               '\\s+'), x -> x <> '')) AS word
        FROM {table}
      ) WHERE length(word) <= {max_word_len} GROUP BY 1
    ),
    subs AS (
      SELECT substr(w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece,
             CAST(SUM(n) AS BIGINT) AS c
      FROM w,
           UNNEST(range(1, length(w) + 1)) AS zi(i),
           UNNEST(range(1, {ml} + 1)) AS zl(l)
      WHERE i + l <= length(w) + 1
      GROUP BY 1
    ),
    v0 AS (
      SELECT piece, c FROM subs WHERE length(piece) = 1
      UNION ALL
      SELECT piece, c FROM (
        SELECT piece, c, ROW_NUMBER() OVER (ORDER BY c DESC, piece) AS rn
        FROM subs WHERE length(piece) >= 2
      ) WHERE rn <= {seed_size}
    ),
    k0 AS (
      SELECT piece,
             CAST(FLOOR(-LN(CAST(c + 1 AS DOUBLE)
                            / CAST(t + v AS DOUBLE)) * 1e6)
                  AS BIGINT) AS cost
      FROM v0 CROSS JOIN (SELECT SUM(c) AS t, COUNT(*) AS v FROM v0)
    )"""]
    prev_v, prev_k = "v0", "k0"
    for k in range(1, iters + 1):
        vit = _sql_viterbi("w.w", "mm.m", ml)
        parts.append(f""",
    m{k} AS (SELECT MAP(LIST(piece), LIST(cost)) AS m FROM {prev_k}),
    e{k} AS (
      SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        SELECT w.n, UNNEST(string_split(({vit}).s, chr(2))[2:]) AS piece
        FROM w CROSS JOIN m{k} mm
      ) GROUP BY 1
    ),
    f{k} AS (
      SELECT v.piece, COALESCE(e.cnt, 0) AS cnt, length(v.piece) AS pl
      FROM {prev_v} v LEFT JOIN e{k} e USING (piece)
    ),
    v{k} AS (
      SELECT piece, cnt AS c FROM (
        SELECT piece, cnt, pl,
               ROW_NUMBER() OVER (
                 PARTITION BY CASE WHEN pl >= 2 THEN 1 ELSE 0 END
                 ORDER BY cnt, piece) AS rn
        FROM f{k}
      ) WHERE pl = 1 OR rn > {prune_per_step}
    ),
    k{k} AS (
      SELECT piece, c AS cnt,
             CAST(FLOOR(-LN(CAST(c + 1 AS DOUBLE)
                            / CAST(t + v AS DOUBLE)) * 1e6)
                  AS BIGINT) AS cost
      FROM v{k} CROSS JOIN (SELECT SUM(c) AS t, COUNT(*) AS v FROM v{k})
    )""")
        prev_v, prev_k = f"v{k}", f"k{k}"
    return parts, prev_k


def sql_unigram_lm_learn(
    *,
    text_expr: str = "text",
    table: str = "documents",
    max_piece_len: int = 3,
    seed_size: int = 60,
    iters: int = 2,
    prune_per_step: int = 8,
    max_word_len: int = 64,
) -> str:
    """DuckDB twin of :func:`unigram_lm_learn`: the same word counts,
    substring seeding, smoothed micro-unit costs (``LN`` over the
    same integer ratios — identical libm bits to the driver's
    CPython), Viterbi DP, prune ranks, and re-estimation, unrolled as
    chained CTEs with one (cost, map, E-count, prune) block per
    iteration."""
    parts, final_k = _sql_train_parts(
        text_expr=text_expr, table=table, max_piece_len=max_piece_len,
        seed_size=seed_size, iters=iters,
        prune_per_step=prune_per_step, max_word_len=max_word_len)
    parts.append(f"""
    SELECT piece, cnt AS viterbi_count, cost
    FROM {final_k}
    ORDER BY piece""")
    return "".join(parts)


def sql_unigram_encode_counts(
    *,
    text_expr: str = "text",
    table: str = "documents",
    id_col: str = "doc_id",
    max_piece_len: int = 3,
    seed_size: int = 60,
    iters: int = 2,
    prune_per_step: int = 8,
    max_word_len: int = 64,
    encode_max_word_len: int = 256,
) -> str:
    """DuckDB twin of :func:`unigram_encode_counts`: the trainer CTE
    chain, then every word Viterbi-segmented under the final cost map
    (over-length words count ``ceil(len / max_piece_len)`` UNK tokens
    directly, the same guard as the Spark side), widths joined back
    to the per-doc word instances."""
    parts, final_k = _sql_train_parts(
        text_expr=text_expr, table=table, max_piece_len=max_piece_len,
        seed_size=seed_size, iters=iters,
        prune_per_step=prune_per_step, max_word_len=max_word_len)
    vit = _sql_viterbi("vw.w", "mm.m", max_piece_len)
    ml = max_piece_len
    parts.append(f""",
    mf AS (SELECT MAP(LIST(piece), LIST(cost)) AS m FROM {final_k}),
    dw AS (
      SELECT {id_col}, word AS w FROM (
        SELECT {id_col},
               UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_expr}),
                      '\\s+'), x -> x <> '')) AS word
        FROM {table}
      )
    ),
    vw AS (SELECT DISTINCT w FROM dw),
    widths AS (
      SELECT vw.w,
             CASE WHEN length(vw.w) > {encode_max_word_len}
                  THEN CAST(FLOOR((length(vw.w) + {ml} - 1)
                                  / {ml}) AS BIGINT)
                  ELSE CAST(len(string_split(({vit}).s, chr(2))) - 1
                            AS BIGINT)
             END AS n_tok
      FROM vw CROSS JOIN mf mm
    )
    SELECT dw.{id_col},
           COUNT(*) AS n_words,
           CAST(SUM(length(dw.w)) AS BIGINT) AS n_chars,
           CAST(SUM(widths.n_tok) AS BIGINT) AS n_tokens
    FROM dw JOIN widths ON dw.w = widths.w
    GROUP BY dw.{id_col}""")
    return "".join(parts)
