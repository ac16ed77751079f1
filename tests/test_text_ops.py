"""Unit tests with hand-computed answers for the text-analysis primitives
added for training-data curation: contamination detection and intra-document
repetition (the registry's x_decontaminate / x_doc_repetition queries are
additionally oracle-checked end-to-end in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streaming_spark.functions import text as T
from kafka_streaming_spark.functions.dedup import contamination_hits


def test_contamination_hits_known(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w v"), (3, "c d e a b")],
        ["doc_id", "text"],
    )
    heldout = spark.createDataFrame([("a b c d e",)], ["text"])
    out = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in contamination_hits(corpus, heldout, n=3).collect()
    }
    # doc 1 shares all three of its trigrams with the heldout text; doc 3
    # shares exactly one ("c d e"); doc 2 shares none and must be absent.
    assert out == {1: 3, 3: 1}


def test_contamination_ignores_case(spark):
    corpus = spark.createDataFrame([(1, "A B C")], ["doc_id", "text"])
    heldout = spark.createDataFrame([("a b c",)], ["text"])
    out = contamination_hits(corpus, heldout, n=3).collect()
    assert len(out) == 1 and out[0]["n_hit_ngrams"] == 1


def test_repetition_ratios_known(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a b a b a b")],
        ["doc_id", "text"],
    )
    dup_w, dup_t = T.repetition_ratios(F.col("text"))
    rows = {
        r["doc_id"]: (r["w"], r["t"])
        for r in df.select("doc_id", dup_w.alias("w"), dup_t.alias("t")).collect()
    }
    # doc 1: 4 words / 1 distinct -> 0.75; trigrams ["a a a","a a a"] -> 0.5
    assert rows[1] == (0.75, 0.5)
    # doc 2: all words and trigrams distinct -> no repetition
    assert rows[2] == (0.0, 0.0)
    # doc 3: 6 words / 2 distinct -> 2/3; trigrams a b a, b a b, a b a, b a b
    # -> 4 total / 2 distinct -> 0.5
    assert abs(rows[3][0] - 2 / 3) < 1e-12 and rows[3][1] == 0.5


def test_word_ngrams_shorter_than_n(spark):
    df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
    out = df.select(T.word_ngrams(F.col("text"), 5).alias("g")).collect()[0]["g"]
    # shorter-than-n docs yield one truncated n-gram (the full token join)
    assert out == ["only two"]


def test_chunk_documents_covers_all_tokens(spark):
    """Every token position is covered, chunk sizes are bounded by the
    window, overlap between consecutive chunks is chunk-stride, and the
    non-overlapped concatenation reconstructs the token stream."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(150))),  # 3 chunks, short tail
            (2, " ".join(f"w{i}" for i in range(64))),   # exactly one window
            (3, "single"),                                # sub-window doc
            (4, " ".join(f"w{i}" for i in range(49))),   # start lands at 48
        ],
        ["doc_id", "text"],
    )
    out = T.chunk_documents(docs, chunk_tokens=64, stride=48)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"]) for r in out.collect())
    )
    by_doc: dict[int, list] = {}
    for d, c, n, t in rows:
        by_doc.setdefault(d, []).append((c, n, t))
    assert [c for c, _, _ in by_doc[1]] == [0, 1, 2]
    assert [n for _, n, _ in by_doc[1]] == [64, 64, 150 - 96]
    assert by_doc[2] == [(0, 64, " ".join(f"w{i}" for i in range(64)))]
    assert by_doc[3] == [(0, 1, "single")]
    # doc 4: 49 tokens fit in chunk 0's window; no redundant tail chunk
    assert [(c, n) for c, n, _ in by_doc[4]] == [(0, 49)]
    # reconstruction: chunk k contributes tokens [k*stride, k*stride + n)
    toks = by_doc[1][0][2].split(" ") + [
        t for _, _, txt in by_doc[1][1:] for t in txt.split(" ")[64 - 48 :]
    ]
    assert toks == [f"w{i}" for i in range(150)]


def test_bigram_lm_scores_hand_computed(spark):
    """Add-one bigram LM against hand-computed counts: corpus a/b/c with
    V=3; p(a b)=(2+1)/(3+3), p(b a)=(1+1)/(2+3); integer micro-units;
    bigram-less docs emit no row."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "c")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score_micro"])
        for r in T.bigram_lm_scores(docs).collect()
    }
    assert out == {1: (2, (500000 + 400000) // 2), 2: (1, 500000)}


def test_bm25_ranking_semantics(spark):
    """BM25 orderings on a crafted corpus: a doc matching both query terms
    outranks single-term docs; among single-term docs the rarer term wins
    (idf); higher tf wins within the same term; non-matching docs absent."""
    docs = spark.createDataFrame(
        [
            (1, "hash join hash join extra words here"),
            (2, "hash hash hash hash filler filler filler"),
            (3, "join filler filler filler filler filler filler"),
            (4, "hash filler filler filler filler filler filler"),
            (5, "nothing relevant at all in this document"),
        ],
        ["doc_id", "text"],
    )
    out = T.bm25_topk(docs, [(0, "hash join")], k=10).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert 5 not in ranked
    assert ranked[0] == 1          # both terms
    assert ranked.index(3) < ranked.index(4)  # 'join' rarer than 'hash'
    assert ranked.index(2) < ranked.index(4)  # higher tf for same term


def test_dsir_weights_favor_target_distribution(spark):
    """Docs drawn from the target (en) vocabulary must outweigh docs from
    a disjoint vocabulary, and the weight table must cover every doc."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta", "en"),
            (2, "alpha beta beta gamma alpha", "en"),
            (3, "alpha gamma beta alpha", "xx"),      # target-like tokens
            (4, "zeta eta theta iota kappa", "xx"),   # disjoint tokens
        ],
        ["doc_id", "text", "lang"],
    )
    out = {
        r["doc_id"]: r["dsir_weight_micro"]
        for r in T.dsir_importance_weights(docs, F.col("lang") == "en").collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[3] > out[4]
    assert min(out[1], out[2]) > out[4]


def test_bpe_reference_encoder_hand_example():
    """GPT-2 merge-loop semantics on a hand-traced example."""
    ranks = {("a", "b"): 0, ("ab", "</w>"): 1, ("c", "ab"): 2}
    assert T.bpe_encode_word("ab", ranks) == ["ab</w>"]
    assert T.bpe_encode_word("cab", ranks) == ["c", "ab</w>"]  # rank 0+1 before 2
    assert T.bpe_encode_word("abab", ranks) == ["ab", "ab</w>"]
    assert T.bpe_encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_bpe_training_learns_frequent_pairs(spark):
    """On a corpus dominated by 'abab', the first learned merge must be
    (a, b), and training twice gives identical merges."""
    docs = spark.createDataFrame(
        [(i, "abab abab cd") for i in range(20)], ["doc_id", "text"]
    )
    merges = T.bpe_train(docs, vocab_words=100, num_merges=5)
    assert merges[0] == ("a", "b")
    assert merges == T.bpe_train(docs, vocab_words=100, num_merges=5)


def test_bpe_distributed_encode_matches_reference(spark):
    """The Arrow-batched distributed encoding must agree word-for-word
    with the driver-side reference encoder, and merges must compress."""
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    merges = T.bpe_train(docs, vocab_words=500, num_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_distinct_pieces"])
        for r in T.bpe_encode_counts(docs, merges).collect()
    }
    sample = docs.orderBy("doc_id").limit(20).collect()
    for row in sample:
        words = [w for w in row["text"].lower().split() if w]
        pieces = [p for w in words for p in T.bpe_encode_word(w, ranks)]
        assert got[row["doc_id"]] == (len(words), len(pieces), len(set(pieces)))
    # real merges must beat char-level segmentation on this corpus
    char_level = sum(len(w) + 1 for r in sample for w in r["text"].lower().split())
    bpe_level = sum(got[r["doc_id"]][1] for r in sample)
    assert bpe_level < char_level


def test_bpe_null_text_is_empty_doc(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, None)], ["doc_id", "text"])
    merges = T.bpe_train(docs, vocab_words=10, num_merges=2)
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in T.bpe_encode_counts(docs, merges).collect()}
    assert got[2] == (0, 0)


def test_compression_ratio_matches_zlib_and_orders_redundancy(spark):
    """Distributed ratios equal direct zlib byte-for-byte; repetitive text
    compresses to a smaller ratio than high-entropy text; null text is
    (0, 0, 0)."""
    import zlib

    rep = "spam " * 200
    import random
    rnd = random.Random(7)
    noise = "".join(chr(33 + rnd.randrange(90)) for _ in range(1000))
    docs = spark.createDataFrame(
        [(1, rep), (2, noise), (3, None)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["raw_bytes"], r["compressed_bytes"], r["ratio_micro"])
        for r in T.compression_ratios(docs).collect()
    }
    for i, text in ((1, rep), (2, noise)):
        b = text.encode()
        c = len(zlib.compress(b, 6))
        assert got[i] == (len(b), c, c * 1_000_000 // len(b))
    assert got[3] == (0, 0, 0)
    assert got[1][2] < got[2][2]
