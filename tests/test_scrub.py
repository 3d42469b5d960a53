"""Semantics tests for the scrub/tfidf family: PII detection +
redaction on crafted strings, Gopher-rule quality flags on documents
engineered to trip each rule, deterministic sharding invariants, and
TF-IDF / inverted-index math on a corpus small enough to verify by
hand."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators import dedup as dd
from pandas_rust_algos_spark.operators import scrub as sc
from pandas_rust_algos_spark.operators import tfidf as ti


# ------------------------------------------------------------------ PII


@pytest.fixture(scope="module")
def pii_docs(spark):
    data = [
        (1, "reach me at jane.doe+spam@mail.example.org thanks"),
        (2, "call 555-123-4567 or 555-000-9999 today"),
        (3, "server at 192.168.1.10 and backup 10.0.0.1"),
        (4, "mixed bob@x.io then 555-111-2222 then 172.16.0.254 done"),
        (5, "nothing sensitive here at all"),
        (6, "not-a-phone 55-123-4567 and not-an-ip 999.999 stay"),
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


def test_pii_counts(spark, pii_docs):
    out = {r["doc_id"]: r for r in sc.pii_scrub(pii_docs).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 0, 0)
    assert out[2]["n_phone"] == 2
    assert out[3]["n_ipv4"] == 2
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (1, 1, 1)
    assert (out[5]["n_email"], out[5]["n_phone"], out[5]["n_ipv4"]) == (0, 0, 0)
    # word-boundary guards: 2-digit prefix and malformed ip don't match
    assert (out[6]["n_phone"], out[6]["n_ipv4"]) == (0, 0)


def test_pii_redaction_replaces_every_match(spark, pii_docs):
    out = {r["doc_id"]: r["redacted"] for r in sc.pii_scrub(pii_docs).collect()}
    assert out[1] == "reach me at <EMAIL> thanks"
    assert out[2] == "call <PHONE> or <PHONE> today"
    assert out[3] == "server at <IP> and backup <IP>"
    assert out[4] == "mixed <EMAIL> then <PHONE> then <IP> done"
    assert out[5] == "nothing sensitive here at all"


def test_url_domains_counts_mentions_and_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "see https://a.example.com/x and https://a.example.com/y"),
            (2, "also https://a.example.com/z plus http://b.example.org/"),
            (3, "plain text, no links"),
        ],
        "doc_id long, text string",
    )
    out = {r["domain"]: r for r in sc.url_domains(docs).collect()}
    assert out["a.example.com"]["n_mentions"] == 3
    assert out["a.example.com"]["n_docs"] == 2
    assert out["b.example.org"]["n_mentions"] == 1
    assert set(out) == {"a.example.com", "b.example.org"}


# -------------------------------------------------------------- quality


def test_quality_filter_each_rule_trips(spark):
    good = ("the cat and the dog ran to the house of the baker and "
            "then the pair sat by the door of the barn to rest a while "
            "and the sun set over the quiet field beyond")
    docs = spark.createDataFrame(
        [
            (1, good),                                    # passes all
            (2, "too short to keep"),                     # trips length
            (3, " ".join(["hippopotomonstrosesquippedaliophobia"] * 30)
                + " the a of to and"),                    # trips word len
            (4, good + " " + " ".join(["#"] * 50)),       # trips symbols…
            (5, " ".join(["zq"] * 40)),                   # trips stopwords+wordlen
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in sc.quality_filter(docs).collect()}
    assert out[1]["keep"] is True
    assert out[2]["flag_len"] is False and out[2]["keep"] is False
    assert out[3]["flag_word_len"] is False and out[3]["keep"] is False
    assert out[4]["flag_symbol"] is False and out[4]["keep"] is False
    assert out[5]["flag_stopword"] is False and out[5]["keep"] is False


# ------------------------------------------------------------- sharding


def test_shard_assign_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"]: r["shard"] for r in sc.shard_assign(df, "k", n_shards=8).collect()}
    b = {
        r["k"]: r["shard"]
        for r in sc.shard_assign(
            df.repartition(13), "k", n_shards=8
        ).collect()
    }
    assert a == b  # partitioning-independent
    counts = [0] * 8
    for s in a.values():
        counts[s] += 1
    assert min(counts) > 2000 / 8 * 0.7  # roughly uniform
    # different salt -> different assignment (overwhelmingly)
    c = {
        r["k"]: r["shard"]
        for r in sc.shard_assign(df, "k", n_shards=8, salt="other").collect()
    }
    assert sum(1 for k in a if a[k] != c[k]) > 1000


def test_shard_assign_validates(spark):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="n_shards"):
        sc.shard_assign(df, "k", n_shards=0)


# ---------------------------------------------------------------- tfidf


@pytest.fixture(scope="module")
def mini_corpus(spark):
    data = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


def test_tfidf_scores_by_hand(spark, mini_corpus):
    out = ti.tfidf_topk(mini_corpus, k=10)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    # apple: tf=2 in doc1, df=1, N=3 -> 2*ln(4/2)
    r = rows[(1, "apple")]
    assert r["tf"] == 2 and r["df"] == 1
    assert r["score"] == round(2 * math.log(4 / 2), 6)
    assert r["rank"] == 1  # highest score in doc 1
    # banana appears in 2 docs -> lower idf
    assert rows[(1, "banana")]["df"] == 2
    assert rows[(1, "banana")]["score"] == round(1 * math.log(4 / 3), 6)


def test_tfidf_topk_truncates(spark, mini_corpus):
    out = ti.tfidf_topk(mini_corpus, k=1).collect()
    per_doc = {r["doc_id"]: r for r in out}
    assert len(out) == 3
    assert per_doc[3]["term"] == "cherry"


def test_inverted_index_postings(spark, mini_corpus):
    out = {r["term"]: r for r in ti.inverted_index(mini_corpus).collect()}
    assert out["banana"]["postings"] == "1,2"
    assert out["banana"]["df"] == 2
    assert out["cherry"]["postings"] == "2,3"
    assert out["durian"]["postings"] == "3"


def test_inverted_index_caps_postings_df_exact(spark, mini_corpus):
    out = {
        r["term"]: r
        for r in ti.inverted_index(mini_corpus, max_postings=1).collect()
    }
    assert out["banana"]["postings"] == "1"
    assert out["banana"]["df"] == 2  # df unaffected by the cap


# ------------------------------------------------------- keep_canonical


def test_keep_canonical_one_rep_per_cluster(spark):
    base = ("the quick brown fox jumps over the lazy dog while rain "
            "in spain falls mainly on the plain tonight")
    docs = spark.createDataFrame(
        [
            (1, base, "en"),
            (2, base, "en"),
            (3, base.replace("lazy", "sleepy"), "en"),
            (4, "entirely different text about tensor contractions "
                "and index gymnastics in curved spacetime", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.2)
    clusters = dd.dup_clusters(pairs, docs.select("doc_id"))
    kept = sorted(
        r["doc_id"] for r in dd.keep_canonical(docs, clusters).collect()
    )
    assert kept == [1, 4]


# ----------------------------------------------------------------- BPE


def test_bpe_merges_match_reference_trainer(spark):
    """The distributed BPE trainer learns the same merge sequence as
    an independent plain-Python reference implementation (Sennrich et
    al.'s algorithm: weighted pair counts over the vocab, most
    frequent pair wins, leftmost-non-overlapping merge)."""
    from collections import Counter

    from pandas_rust_algos_spark.operators.bpe import bpe_learn_merges

    corpus = ["low low low lower lower newest newest newest",
              "newest newest newest wider wider wider new new"]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")

    # independent reference
    vocab = Counter(" ".join(corpus).split())
    symbols = {w: list(w) for w in vocab}
    expected = []
    for _ in range(5):
        pairs = Counter()
        for w, n in vocab.items():
            seq = symbols[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((a, b, cnt))
        for w in symbols:
            seq, out, i = symbols[w], [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            symbols[w] = out

    got = sorted(bpe_learn_merges(docs, n_merges=5).collect(),
                 key=lambda r: r["step"])
    assert [(r["merge_left"], r["merge_right"], r["pair_count"])
            for r in got] == expected
    with pytest.raises(ValueError):
        bpe_learn_merges(docs, n_merges=0)


def test_bpe_encode_counts_match_reference_encoder(spark):
    """The distributed encoder reproduces a plain-Python greedy BPE
    encode (merges applied in rank order, leftmost-non-overlapping)
    for every document, and n_chars - n_tokens equals the number of
    merge applications absorbed."""
    from collections import Counter

    from pandas_rust_algos_spark.operators.bpe import (
        bpe_encode_counts,
        bpe_token_freqs,
    )

    corpus = ["low low low lower lower newest newest newest",
              "newest newest newest wider wider wider new new"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")

    # reference: learn 5 merges, then encode each word
    vocab = Counter(" ".join(corpus).split())
    symbols = {w: list(w) for w in vocab}
    merges = []
    for _ in range(5):
        pairs = Counter()
        for w, n in vocab.items():
            seq = symbols[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        (a, b), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w in symbols:
            seq, out, i = symbols[w], [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            symbols[w] = out

    got = {r["doc_id"]: r for r in
           bpe_encode_counts(docs, n_merges=5).collect()}
    freqs = Counter()
    for i, t in enumerate(corpus):
        words = t.split()
        n_tok = sum(len(symbols[w]) for w in words)
        assert got[i]["n_words"] == len(words)
        assert got[i]["n_chars"] == sum(len(w) for w in words)
        assert got[i]["n_tokens"] == n_tok
        for w in words:
            for s in symbols[w]:
                freqs[s] += 1

    top = bpe_token_freqs(docs, n_merges=5, k=4).collect()
    expected_top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert [(r["token"], r["n_occurrences"]) for r in top] == expected_top
    assert [r["rank"] for r in top] == [1, 2, 3, 4]


def test_decontaminate_spans_planted(spark):
    """Substring decontamination: corpus docs embedding a verbatim
    benchmark span are flagged with the right run length; gram-level
    overlap below k consecutive tokens does not flag; benchmark-only
    and clean docs report zero."""
    from pandas_rust_algos_spark.operators.decontam import (
        decontaminate_spans,
    )

    bench_span = "what is the capital of france paris obviously"  # 8 toks
    bench = spark.createDataFrame(
        [(100, "quiz question " + bench_span + " end of item")],
        "doc_id long, text string")
    corpus = spark.createDataFrame([
        # embeds the full 8-token span -> 5 consecutive k=4 windows
        (1, "intro words here " + bench_span + " trailing text"),
        # shares only scattered tokens, no 4-token window
        (2, "paris is a capital and france is a country obviously"),
        (3, "completely unrelated document about gardening tips"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           decontaminate_spans(corpus, bench, k=4, min_run=1).collect()}
    assert got[1]["contaminated"] is True
    assert got[1]["max_run"] == 5           # 8-token span, k=4
    assert got[1]["n_contaminated"] == 5
    assert got[2]["contaminated"] is False
    assert got[3]["n_contaminated"] == 0
    # min_run raises the bar: a single shared window no longer flags
    strict = {r["doc_id"]: r for r in
              decontaminate_spans(corpus, bench, k=4,
                                  min_run=6).collect()}
    assert strict[1]["contaminated"] is False

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decontaminate_spans(corpus, bench, k=0)


def test_wordpiece_merges_match_reference_trainer(spark):
    """The WordPiece trainer learns the same merge sequence as an
    independent plain-Python implementation of the likelihood-gain
    rule count(ab)/(count(a)*count(b)) with (score desc, pair) ties."""
    from collections import Counter

    from pandas_rust_algos_spark.operators.bpe import (
        wordpiece_learn_merges,
    )

    corpus = ["low low low lower lower newest newest newest",
              "newest newest newest wider wider wider new new"]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")

    vocab = Counter(" ".join(corpus).split())
    symbols = {w: list(w) for w in vocab}
    expected = []
    for _ in range(4):
        pairs, unis = Counter(), Counter()
        for w, n in vocab.items():
            seq = symbols[w]
            for s in seq:
                unis[s] += n
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        (a, b), cnt = min(
            pairs.items(),
            key=lambda kv: (-(kv[1] / (unis[kv[0][0]] * unis[kv[0][1]])),
                            kv[0]))
        expected.append((a, b, cnt,
                         round(cnt / (unis[a] * unis[b]), 6)))
        for w in symbols:
            seq, out, i = symbols[w], [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            symbols[w] = out

    got = sorted(wordpiece_learn_merges(docs, n_merges=4).collect(),
                 key=lambda r: r["step"])
    assert [(r["merge_left"], r["merge_right"], r["pair_count"],
             r["score"]) for r in got] == expected
    # WordPiece must diverge from BPE's raw-count winner on this
    # corpus at some step — otherwise the test proves nothing
    from pandas_rust_algos_spark.operators.bpe import bpe_learn_merges
    bpe = [(r["merge_left"], r["merge_right"]) for r in sorted(
        bpe_learn_merges(docs, n_merges=4).collect(),
        key=lambda r: r["step"])]
    assert bpe != [(a, b) for a, b, _, _ in expected]
    with pytest.raises(ValueError):
        wordpiece_learn_merges(docs, n_merges=0)


def test_unigram_lm_learn_hand_checkable(spark):
    """Hand-derived trainer run: words abab×10 cd×5, max_piece_len 2,
    3 multi-char seeds, one hard-EM iteration pruning one piece.
    Seeding: chars a/b:20 c/d:5; multis ab:20 ba:10 cd:5 (T=85, V=7).
    Viterbi: 'abab'→ab|ab (2 pieces of equal-cost beats any 3+-piece
    split), 'cd'→cd (1 beats 2) ⇒ counts ab:20 cd:5, rest 0. Prune
    rank (cnt ASC, piece ASC) over multis drops 'ba'. Re-estimated
    costs use T=25, V=6."""
    import math

    from pandas_rust_algos_spark.operators.unigram import (
        unigram_lm_learn,
    )

    docs = spark.createDataFrame(
        [(i, "abab" if i < 10 else "cd") for i in range(15)],
        "doc_id long, text string")
    got = sorted(
        (r["piece"], r["viterbi_count"], r["cost"])
        for r in unigram_lm_learn(
            docs, max_piece_len=2, seed_size=3, iters=1,
            prune_per_step=1).collect()
    )

    def cost(c, t, v):
        return math.floor(-math.log((c + 1) / (t + v)) * 1e6)

    c0 = cost(0, 25, 6)
    assert got == sorted([
        ("a", 0, c0), ("b", 0, c0), ("c", 0, c0), ("d", 0, c0),
        ("ab", 20, cost(20, 25, 6)), ("cd", 5, cost(5, 25, 6)),
    ])

    with pytest.raises(ValueError):
        unigram_lm_learn(docs, max_piece_len=1)
    with pytest.raises(ValueError):
        unigram_lm_learn(docs, iters=0)


def test_unigram_lm_matches_duckdb_twin(spark):
    """Twin equality on an awkward corpus (repeats, shared prefixes,
    a max_word_len casualty) — pieces, counts, AND costs bit-match."""
    import duckdb
    import pandas as pd

    from pandas_rust_algos_spark.operators.unigram import (
        sql_unigram_lm_learn,
        unigram_lm_learn,
    )

    texts = [
        "the theme theater then the",
        "thesis the theme         the",
        "a aa aaa aaaa ab aab",
        "x" * 80 + " xy xy xyz",  # 80-char word excluded both sides
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = sorted(
        (r["piece"], r["viterbi_count"], r["cost"])
        for r in unigram_lm_learn(
            docs, max_piece_len=3, seed_size=10, iters=2,
            prune_per_step=3).collect()
    )
    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    want = sorted(
        (p, int(c), int(k)) for p, c, k in con.execute(
            sql_unigram_lm_learn(
                table="docs_t", max_piece_len=3, seed_size=10,
                iters=2, prune_per_step=3)).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0


def test_unigram_encode_counts(spark):
    """Encode surface: per-doc widths under the trained vocab — the
    hand-checkable corpus segments 'abab'→ab|ab (2 tokens, 4 chars)
    and 'cd'→cd (1 token); unknown-only words fall back to the
    fewest-BIG-pieces segmentation; twin equality vs DuckDB."""
    import duckdb
    import pandas as pd

    from pandas_rust_algos_spark.operators.unigram import (
        sql_unigram_encode_counts,
        unigram_encode_counts,
    )

    texts = ["abab" if i < 10 else "cd" for i in range(15)]
    # 'q' seeds as a single char; 'qq' (count 1) misses the 3-multi
    # seed cut, so it segments q|q on trained single-char costs
    texts.append("abab cd qq")
    # a char appearing ONLY in an over-max_word_len word is never
    # trained — that word encodes via the BIG-sentinel UNK fallback
    # (fewest unknown pieces, deterministic both engines)
    texts.append("z" * 70)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"])
           for r in unigram_encode_counts(
               docs, max_piece_len=2, seed_size=3, iters=1,
               prune_per_step=1).collect()}
    assert got[0] == (1, 4, 2)       # ab|ab
    assert got[14] == (1, 2, 1)      # cd
    # abab(2) + cd(1) + q|q(2)
    assert got[15] == (3, 8, 5)
    # 70 unknown chars -> 35 two-char BIG pieces (fewest pieces wins)
    assert got[16] == (1, 70, 35)

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    want = {int(i): (int(a), int(b), int(c)) for i, a, b, c in
            con.execute(sql_unigram_encode_counts(
                table="docs_t", max_piece_len=2, seed_size=3, iters=1,
                prune_per_step=1)).fetchall()}
    con.close()
    assert got == want


def test_unigram_costmap_broadcast_switch(spark, monkeypatch):
    """Above _COSTMAP_LITERAL_MAX pieces the trained cost map rides as
    ONE broadcast row instead of a create_map plan literal (the IVF
    centroid-matrix switch, r8 VERDICT next-#3). Forcing the switch
    low must leave trainer output bit-identical — the DP is
    indifferent to which form carries the map."""
    from pandas_rust_algos_spark.operators import unigram as ug

    docs = spark.createDataFrame(
        [(i, "abab" if i < 10 else "cd") for i in range(15)],
        "doc_id long, text string")

    def run():
        return sorted(
            (r["piece"], r["viterbi_count"], r["cost"])
            for r in ug.unigram_lm_learn(
                docs, max_piece_len=2, seed_size=3, iters=1,
                prune_per_step=1).collect())

    literal = run()
    monkeypatch.setattr(ug, "_COSTMAP_LITERAL_MAX", 2)
    assert run() == literal

    enc = {r["doc_id"]: r["n_tokens"] for r in ug.unigram_encode_counts(
        docs, max_piece_len=2, seed_size=3, iters=1,
        prune_per_step=1).collect()}
    assert enc[0] == 2 and enc[14] == 1  # ab|ab, cd — broadcast path


def test_with_cost_map_multi_thousand_piece_vocab(spark):
    """The switch at realistic production vocab width: a synthetic
    20k-piece cost map exceeds the 16,384-literal cap, so
    _with_cost_map must return the broadcast-row form, and the
    Viterbi DP must still pick the trained pieces through it."""
    from pandas_rust_algos_spark.operators import unigram as ug

    costs = {f"w{i:05d}": 1_000_000 + i for i in range(20_000)}
    costs.update({"ab": 10, "a": 500, "b": 500})
    words = spark.createDataFrame([("abab",), ("ba",)], "w string")
    src, cm = ug._with_cost_map(words, costs)
    assert "__costmap" in src.columns  # broadcast row, not plan literal
    got = {r["w"]: r["s"] for r in src.select(
        "w", ug._viterbi_best(F.col("w"), cm, 2)
        .getField("s").alias("s")).collect()}
    assert got["abab"] == "\x02ab\x02ab"
    assert got["ba"] == "\x02b\x02a"


def test_unigram_encode_max_word_len_guard(spark):
    """Words past encode_max_word_len skip the Viterbi DP and count
    ceil(len/max_piece_len) UNK tokens directly (r8 ADVICE: a single
    multi-megabyte junk token would otherwise grow O(L²) DP state and
    overflow the int64 cost sum). Both engines apply the same cap, so
    the twin still hash-matches; a 5,000-char word is instant."""
    import duckdb
    import pandas as pd

    from pandas_rust_algos_spark.operators.unigram import (
        sql_unigram_encode_counts,
        unigram_encode_counts,
    )

    texts = ["abab cd", "abab " + "z" * 5_000, "y" * 300]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"])
           for r in unigram_encode_counts(
               docs, max_piece_len=2, seed_size=3, iters=1,
               prune_per_step=1).collect()}
    # 5000-char junk word: ceil(5000/2) = 2500 direct UNK tokens
    assert got[1] == (2, 5_004, 2 + 2_500)
    # 300 > 256 default bound: ceil(300/2) = 150
    assert got[2] == (1, 300, 150)

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    want = {int(i): (int(a), int(b), int(c)) for i, a, b, c in
            con.execute(sql_unigram_encode_counts(
                table="docs_t", max_piece_len=2, seed_size=3, iters=1,
                prune_per_step=1)).fetchall()}
    con.close()
    assert got == want
