"""Text analysis operators for training-data pipelines.

All hot-path expressions are built-in column functions (JVM-side,
whole-stage codegen) — no Python UDFs: at 100 TB, a row-at-a-time
Python UDF on a documents table is the difference between hours and
weeks. Language ID and quality scoring are pure expression DAGs;
fingerprinting uses higher-order array functions.

Where a gate query needs a DuckDB oracle, the helpers here generate the
Spark expression and the SQL from the *same spec* so both sides compute
identical logic (see LANG_STOPWORDS / sql_* twins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "token_ngrams",
    "quality_features",
    "repetition_signals",
    "lang_id",
    "fingerprint",
    "LANG_STOPWORDS",
    "sql_token_count",
    "sql_token_ngrams",
    "sql_lang_scores",
]

# shared spec: a tiny per-language stopword panel for n-gram-free
# heuristic language ID (counts of " word "-bounded hits).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "nicht"),
    "fr": ("le", "et", "les"),
    "es": ("el", "que", "de"),
    "zh": ("的", "是", "了"),
}

_MOD = 1_000_000_007


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty-token normalization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    # long, not int: aligns with BIGINT counts from SQL oracles
    return F.size(tokens(col)).cast("long")


def sql_token_count(expr: str) -> str:
    """DuckDB twin of :func:`token_count`."""
    return (
        f"LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM({expr}), '\\s+'),"
        " x -> x <> ''))"
    )


def token_ngrams(col: Column | str, n: int) -> Column:
    """All space-joined token ``n``-grams in document order (repeats
    kept — repetition analysis needs multiplicity; take
    ``F.array_distinct`` for set semantics, as dedup/decontam do). A
    document with fewer than ``n`` tokens has no grams (empty array).
    Pure higher-order-function algebra — JVM-side, no UDF."""
    toks = tokens(col)
    # guard: F.sequence(1, 0) counts DOWN ([1, 0]) — a doc shorter than
    # n tokens must yield an empty index array, not index 0
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def sql_token_ngrams(expr: str, n: int) -> str:
    """DuckDB twin of :func:`token_ngrams` (same tokenizer spec;
    LIST_SLICE is 1-based inclusive)."""
    toks = (f"LIST_FILTER(STRING_SPLIT_REGEX(TRIM({expr}), '\\s+'), "
            "x -> x <> '')")
    return (
        f"LIST_TRANSFORM(RANGE(1, GREATEST(LEN({toks}) - {n - 1}, 0) + 1), "
        f"i -> ARRAY_TO_STRING(LIST_SLICE({toks}, i, i + {n - 1}), ' '))"
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 2,
) -> DataFrame:
    """Gopher-style intra-document repetition signals per document:
    ``dup_ngram_frac`` (fraction of n-gram slots occupied by a repeat
    of an earlier gram) and ``top_ngram_frac`` (share of the most
    frequent single n-gram) — the published rules drop documents above
    thresholds on exactly these (Rae et al. 2021 §A1.1).

    Scale shape: multiplicity counting is explode → two map-side-
    combined aggregations keyed by (doc, gram) then (doc). That is
    deliberate — the tempting UDF-free alternative (per-row
    ``aggregate`` over distinct grams counting matches) is O(grams²)
    *per document*, which dies on a 10k-token document; the explode
    form is linear and the (doc, gram) shuffle key is naturally
    well-distributed. Documents shorter than ``n`` tokens report NULL
    fractions (no gram slots), not 0 — "no signal" ≠ "no repetition".
    """
    grams = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.explode_outer(token_ngrams(text_col, n)).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "n_tokens", "gram").agg(
        F.count("gram").alias("c")
    )
    sig = per_gram.groupBy(id_col, "n_tokens").agg(
        F.sum("c").alias("n_ngrams"),
        F.count(F.when(F.col("gram").isNotNull(), 1)).alias("n_distinct"),
        F.max("c").alias("top_count"),
    )
    nonzero = F.col("n_ngrams") > 0
    return sig.select(
        id_col,
        "n_tokens",
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.when(
            nonzero,
            (F.col("n_ngrams") - F.col("n_distinct")).cast("double")
            / F.col("n_ngrams"),
        ).alias("dup_ngram_frac"),
        F.when(
            nonzero, F.col("top_count").cast("double") / F.col("n_ngrams")
        ).alias("top_ngram_frac"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scores: lengths, token stats, punct/digit/space
    ratios, mean token length. Pure column expressions; ratios are
    double divisions of exact ints (deterministic cross-engine)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens(t)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = n_chars - F.length(F.regexp_replace(t, r" ", ""))
    mean_tok = F.when(
        n_tokens > 0,
        (n_chars - spaces).cast("double") / n_tokens,
    )
    safe = F.when(n_chars > 0, n_chars).otherwise(F.lit(1))
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (punct.cast("double") / safe).alias("punct_ratio"),
        (digits.cast("double") / safe).alias("digit_ratio"),
        (spaces.cast("double") / safe).alias("space_ratio"),
        mean_tok.alias("mean_token_len"),
    )


def _stopword_hits(text: Column, word: str) -> Column:
    """Count of whole-word occurrences via non-overlapping replace
    arithmetic — chosen over regexp counts because replace() semantics
    are identical across engines."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))
    ) / len(needle)


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword-hit scores from the shared spec."""
    t = F.lower(F.col(text_col))
    return {
        lang: sum(_stopword_hits(t, w) for w in words).cast("long")
        for lang, words in LANG_STOPWORDS.items()
    }


def sql_lang_scores(expr: str = "text") -> dict[str, str]:
    """DuckDB twin of :func:`lang_scores` (same replace arithmetic)."""
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        terms = []
        for w in words:
            needle = f" {w} "
            terms.append(
                f"(LENGTH(' ' || LOWER({expr}) || ' ') - "
                f"LENGTH(REPLACE(' ' || LOWER({expr}) || ' ', '{needle}', '')))"
                f" / {len(needle)}"
            )
        out[lang] = "CAST(" + " + ".join(terms) + " AS BIGINT)"
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax stopword score (ties broken by the
    spec's key order); 'und' (undetermined) when all scores are 0."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(scores)):  # earlier keys win ties
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    cols = [F.col("doc_id")]
    cols += [scores[lang].alias(f"score_{lang}") for lang in scores]
    cols.append(pred.alias("lang_pred"))
    return df.select(*cols)


def fingerprint(col: Column | str, mod: int = _MOD) -> Column:
    """Order-sensitive polynomial rolling hash over characters
    (doc fingerprinting): fold(codepoints, acc*31 + cp mod p).
    Higher-order array functions keep it JVM-side; exact integer
    arithmetic makes it engine-portable (DuckDB twin uses list_reduce).
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda x: x != "")
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % mod,
    )


def sql_fingerprint(expr: str, mod: int = _MOD) -> str:
    """DuckDB twin of :func:`fingerprint`."""
    return (
        f"COALESCE(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        f"LIST_TRANSFORM(LIST_FILTER(STRING_SPLIT_REGEX({expr}, ''), "
        f"x -> x <> ''), ch -> CAST(ORD(ch) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {mod}), 0)"
    )


# GPT-2-style pre-tokenizer, restricted to the regex subset whose
# semantics are identical between Java regex (Spark) and RE2 (DuckDB):
# contractions, optionally-space-prefixed letter runs, digit runs,
# punctuation runs. No lookahead (RE2 has none) — trailing-space
# handling therefore differs from the exact GPT-2 pattern, which is
# fine for *counting* (budgets, stats), the use here.
BPE_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization (see :data:`BPE_PATTERN`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count — the budget unit a training pipeline
    actually meters (whitespace counts under-estimate punctuation-
    heavy text)."""
    return F.size(bpe_tokens(col)).cast("long")


def sql_bpe_token_count(expr: str) -> str:
    """DuckDB twin of :func:`bpe_token_count` (identical RE2-safe
    pattern)."""
    esc = BPE_PATTERN.replace("'", "''")
    return f"LEN(REGEXP_EXTRACT_ALL({expr}, '{esc}'))"
