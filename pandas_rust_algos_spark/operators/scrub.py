"""PII scrubbing, URL/domain analysis, quality filtering, and output
sharding — training-data-pipeline primitives (driver-brief extension;
the reference has no text surface, SURVEY §2.3).

Everything here is a pure built-in expression DAG — regexp_count /
regexp_extract_all / regexp_replace / lpad / conv — so the hot path
stays inside whole-stage codegen with zero Python workers. Each Spark
function has a ``sql_*`` twin emitting the equivalent DuckDB
expression, and the regex subset used is deliberately restricted to
syntax whose semantics are identical between Java's regex engine
(Spark) and RE2 (DuckDB): character classes, ``\\b``, ``\\d``, bounded
repetition, a single capture group. No backreferences, no lookaround.

Scale shape
-----------
* :func:`pii_scrub` and :func:`quality_filter` are narrow (per-row)
  maps — no shuffle at all; on 100 TB they run at scan speed and the
  only cost is the regex automaton per row.
* :func:`url_domains` shuffles once on the (low-cardinality) domain
  key after a map-side explode+combine.
* :func:`shard_assign` is a narrow map (hash arithmetic per row); the
  subsequent write is ``repartition(n_shards, shard)`` — one shuffle
  that IS the intended data movement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "pii_scrub",
    "sql_pii_counts",
    "sql_pii_redact",
    "url_domains",
    "sql_url_domain",
    "quality_filter",
    "shard_assign",
    "sql_shard_assign",
    "mask_columns",
    "sql_mask_column",
]

# Ordered: redaction applies patterns in this sequence on both engines.
# Patterns are disjoint by construction (emails end in letters, phones
# are dash-separated digits, IPs are dot-separated digits), so the
# sequence is order-insensitive in effect but fixed for determinism.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)

_URL_RE = r"https?://[^\s]+"
_DOMAIN_RE = r"^https?://([^/]+)"


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    *,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
    out_col: str = "redacted",
) -> DataFrame:
    """Per-row PII detection + redaction: appends one ``n_<name>``
    match-count column per pattern and a fully redacted text column.

    Narrow plan — a regex automaton per row, no shuffle, no Python.
    At 100 TB this is the cheapest shape possible: it fuses into the
    scan's codegen stage and the counts aggregate map-side if the
    caller groups them later."""
    t = F.col(text_col)
    out = df
    for name, pat, _ in patterns:
        out = out.withColumn(f"n_{name}", F.regexp_count(t, F.lit(pat)))
    red = t
    for _, pat, repl in patterns:
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)


def sql_pii_counts(expr: str) -> dict[str, str]:
    """DuckDB twins of the per-pattern match counts."""
    return {
        f"n_{name}": f"LEN(REGEXP_EXTRACT_ALL({expr}, '{pat}'))"
        for name, pat, _ in PII_PATTERNS
    }


def sql_pii_redact(expr: str) -> str:
    """DuckDB twin of the sequential redaction (RE2 needs the explicit
    'g' flag; Spark's regexp_replace is global by default)."""
    red = expr
    for _, pat, repl in PII_PATTERNS:
        red = f"REGEXP_REPLACE({red}, '{pat}', '{repl}', 'g')"
    return red


def url_domains(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain frequency table: extract every URL, parse its host, count
    mentions and distinct documents per domain.

    Map-side explode + partial aggregation, then ONE shuffle keyed by
    domain (low cardinality vs rows — the natural reduce key). The
    distinct-doc count rides the same shuffle via a two-level group
    rather than a count(distinct) expansion."""
    urls = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(_URL_RE), 0)).alias(
            "url"
        ),
    ).select(id_col, F.regexp_extract("url", _DOMAIN_RE, 1).alias("domain"))
    per_doc = urls.groupBy("domain", id_col).agg(
        F.count(F.lit(1)).alias("n_in_doc")
    )
    return per_doc.groupBy("domain").agg(
        F.sum("n_in_doc").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def sql_url_domain(expr: str) -> str:
    """DuckDB: exploded domain per URL occurrence (pair with UNNEST)."""
    return (
        f"LIST_TRANSFORM(REGEXP_EXTRACT_ALL({expr}, '{_URL_RE}'), "
        f"u -> REGEXP_EXTRACT(u, '{_DOMAIN_RE}', 1))"
    )


# Gopher-style quality rules (Rae et al. 2021, §A1.1): published
# thresholds on token count, mean word length, symbol ratio, and
# stopword evidence. Thresholds are parameters so corpora can retune.
def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_word: float = 3.0,
    max_mean_word: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Rule-based document filter: per-rule boolean flags plus the
    conjunction ``keep``. Narrow per-row expression DAG (one pass over
    the text per signal) — shuffle-free; filters before any expensive
    downstream stage, which is exactly where a 100 TB pipeline wants
    its cheapest, highest-rejection operator."""
    t = F.col(text_col)
    toks = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(t)
    spaces = n_chars - F.length(F.replace(t, F.lit(" "), F.lit("")))
    mean_word = F.when(
        n_tokens > 0, (n_chars - spaces).cast("double") / n_tokens
    )
    # symbols-to-word: '#' and '…' per Gopher; count via replace math
    hashes = n_chars - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipses = n_chars - F.length(F.replace(t, F.lit("…"), F.lit("")))
    symbol_ratio = F.when(
        n_tokens > 0, (hashes + ellipses).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = None
    for w in ("the", "a", "of", "to", "and"):
        needle = f" {w} "
        hits = (
            F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))
        ) / len(needle)
        stop_hits = hits if stop_hits is None else stop_hits + hits
    stop_hits = stop_hits.cast("long")

    flag_len = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    flag_word = (
        mean_word.isNotNull()
        & (mean_word >= min_mean_word)
        & (mean_word <= max_mean_word)
    )
    flag_sym = symbol_ratio < max_symbol_ratio
    flag_stop = stop_hits >= min_stopword_hits
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.round(mean_word, 6).alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        flag_len.alias("flag_len"),
        flag_word.alias("flag_word_len"),
        flag_sym.alias("flag_symbol"),
        flag_stop.alias("flag_stopword"),
        (flag_len & flag_word & flag_sym & flag_stop).alias("keep"),
    )


def shard_assign(
    df: DataFrame,
    key_col: str,
    *,
    n_shards: int = 8,
    salt: str = "shard-v1",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic output sharding: ``md5(key:salt)``'s first 60 bits
    mod n_shards. A pure function of (key, salt) — reproducible across
    runs, engines, partitionings, and task retries, unlike anything
    built on ``rand()`` or Spark's partition-dependent hash.

    Narrow map; the caller's ``df.repartition(n_shards, out_col)``
    before the write is then the ONLY shuffle, and it is the intended
    one (it IS the shard layout). 15 hex chars = 60 bits keeps the
    conv() result well inside a signed 64-bit int, so the modulus
    never sees an overflow-wrapped negative."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    v = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    return df.withColumn(out_col, (v % n_shards).cast("int"))


def sql_shard_assign(key_expr: str, *, n_shards: int = 8, salt: str = "shard-v1") -> str:
    """DuckDB twin: identical md5 input, hex-prefix cast, modulus."""
    return (
        f"CAST(CAST('0x' || SUBSTR(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'), "
        f"1, 15) AS BIGINT) % {n_shards} AS INT)"
    )


def mask_columns(
    df: DataFrame,
    cols: Sequence[str],
    *,
    salt: str = "mask-v1",
    keep_last: int = 0,
) -> DataFrame:
    """Governance masking: replace each named column with a
    deterministic SHA-256 token of ``value:salt`` — equal values mask
    to equal tokens (joins and GROUP BYs on the masked column still
    work, the property that makes tokenization usable in analytics),
    while the salt blocks rainbow-table reversal of low-entropy
    domains. ``keep_last > 0`` appends a format-preserving tail
    (``…last_k_chars``) for human disambiguation à la "card ending
    1234". NULL stays NULL.

    Narrow per-row expression DAG (one hash per cell) — zero shuffle,
    scan-speed at any scale, and the token is a pure row property:
    identical across engines, partitionings, and runs, so masked
    datasets produced by different jobs remain joinable."""
    out = df
    for c in cols:
        v = F.col(c).cast("string")
        token = F.sha2(F.concat(v, F.lit(":" + salt)), 256)
        if keep_last > 0:
            token = F.concat(
                token, F.lit("…"),
                F.substring(v, -keep_last, keep_last),
            )
        out = out.withColumn(c, F.when(v.isNotNull(), token))
    return out


def sql_mask_column(expr: str, *, salt: str = "mask-v1",
                    keep_last: int = 0) -> str:
    """DuckDB twin of :func:`mask_columns` for one column."""
    v = f"CAST({expr} AS VARCHAR)"
    token = f"sha256({v} || ':{salt}')"
    if keep_last > 0:
        token = (f"{token} || '…' || "
                 f"SUBSTR({v}, -{keep_last}, {keep_last})")
    return f"CASE WHEN {v} IS NOT NULL THEN {token} END"
