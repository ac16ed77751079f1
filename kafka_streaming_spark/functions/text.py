"""Text-analysis column functions: tokenization, quality scoring, language
ID, document fingerprinting.

All deterministic Column expressions (no UDFs).  Cross-engine-checkable: each
has an ANSI-SQL equivalent registered in ``queries.py`` so DuckDB can verify
it on the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus for the polynomial rolling hash — fits comfortably in int64 while
#: hashing with multiplier 31 (max intermediate ≈ 31 * 1e9 + 255 < 2^63).
FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_MULT = 31

#: Tiny deterministic stopword marker sets for the language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "los", "que", "de"),
    "fr": ("le", "la", "les", "et", "des"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string → 1 empty token, matching the
    regexp-split semantics of both Spark and DuckDB; callers filter empties
    upstream if needed)."""
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


#: BPE-ish pre-tokenization pattern (GPT-2 style, lookahead-free so it runs
#: identically on Java regex (Spark) and RE2 (DuckDB)): contractions,
#: space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Approximate BPE token count: number of pre-tokenizer segments that
    are not pure whitespace.  The standard fast proxy for LLM token budgets
    at corpus scale (a real BPE merge pass needs the vocab; the pre-token
    split is the deterministic, vocab-free upper bound)."""
    all_segs = F.regexp_count(text, F.lit(BPE_PATTERN))
    ws_segs = F.regexp_count(text, F.lit(r"\s+"))
    return (all_segs - ws_segs).cast("int")


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters — a quality signal."""
    return F.length(F.regexp_replace(text, "[^A-Za-z]", "")) / F.length(text)


def space_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^ ]", "")) / F.length(text)


def avg_token_length(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"\s+", "")) / token_count(text)


def stopword_ratio(text: Column, markers: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    """Fraction of tokens that are stopword markers."""
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern)) / token_count(text)


def funnel_flags(text: Column, n_chars: Column) -> tuple[Column, Column, Column]:
    """Cumulative pass/fail flags for the standard corpus-filter funnel —
    length floor, then alphabetic density ≥ 0.55, then stopword density
    ≥ 0.02 — each stage ANDed with the previous (a doc counted at stage k
    passed stages 1..k, which is what a filtering report reads).

    Thresholds compare in EXACT integer arithmetic (``alpha*10000 >=
    len*5500`` instead of ``alpha/len >= 0.55``) so the decisions are
    bit-identical across engines — no float-division boundary risk."""
    alpha_len = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    char_len = F.length(text)
    stop_hits = F.regexp_count(
        F.lower(text), F.lit(r"\b(" + "|".join(LANG_MARKERS["en"]) + r")\b")
    )
    tok = token_count(text)
    c1 = n_chars >= F.lit(180)
    c2 = c1 & (alpha_len * 10000 >= char_len * 5500)
    c3 = c2 & (stop_hits * 100 >= tok * 2)
    return c1, c2, c3


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality score: alphabetic density weighted with
    stopword plausibility — a deterministic stand-in for trained quality
    classifiers in large-scale corpus filtering."""
    return alpha_ratio(text) * 0.5 + stopword_ratio(text) * 0.5


def lang_marker_hits(text: Column, lang: str) -> Column:
    pattern = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def lang_id(text: Column) -> Column:
    """N-gram/stopword-marker language guess: the language whose marker set
    hits most; ties broken by fixed language order; 'und' (undetermined)
    when nothing hits."""
    langs = list(LANG_MARKERS)
    hits = [lang_marker_hits(text, lg) for lg in langs]
    best = F.greatest(*hits)
    expr = F.lit("und")
    # Build reversed CASE chain so earlier languages win ties.
    for lg, h in reversed(list(zip(langs, hits))):
        expr = F.when((h == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


def bigrams(text: Column) -> Column:
    """Word bigrams (non-distinct, corpus-statistics form) → array<string>.
    Single-token documents yield an empty array."""
    toks = tokens(F.lower(text))
    # zip_with over two shifted slices instead of transform+element_at:
    # element_at walks the array per index (O(n^2) per doc, ~11x slower on
    # the sf0.1 corpus); the slice pair is a single linear pass.
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n_pairs),
        F.slice(toks, 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def word_ngrams(text: Column, n: int) -> Column:
    """All word n-grams in document order (non-distinct) → array<string>.
    Documents shorter than ``n`` tokens yield one truncated n-gram (their
    full token join), mirroring ``dedup.word_shingles``."""
    toks = tokens(F.lower(text))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def repetition_ratios(text: Column) -> tuple[Column, Column]:
    """(duplicate-word fraction, duplicate-trigram fraction) — the
    Gopher/C4-style intra-document repetition quality signals.  A document
    that repeats itself has distinct/total well below 1; both ratios are
    pure array expressions (one pass per doc, no shuffle, no UDF)."""
    toks = tokens(F.lower(text))
    tg = word_ngrams(text, 3)
    dup_words = F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks)
    dup_trigrams = F.lit(1.0) - F.size(F.array_distinct(tg)) / F.size(tg)
    return dup_words, dup_trigrams


#: PII-ish detection patterns — lookahead-free so they run identically on
#: Java regex (Spark) and RE2 (DuckDB).  Deterministic *detectors* for
#: corpus redaction triage (counting, not redacting: the redaction rewrite
#: is a regexp_replace with the same patterns).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"
PHONE_PATTERN = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(email, url, phone-like) match counts per document."""
    return (
        F.regexp_count(text, F.lit(EMAIL_PATTERN)),
        F.regexp_count(text, F.lit(URL_PATTERN)),
        F.regexp_count(text, F.lit(PHONE_PATTERN)),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash over the
    character codes, mod 1e9+7 — the classic Rabin-Karp shape, expressed as
    a Catalyst ``aggregate`` over ``split(text, '')`` so it runs JVM-side.
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_MULT + F.ascii(c)) % FINGERPRINT_MOD,
    )


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
):
    """Split documents into overlapping token-window chunks — the standard
    context-window preparation step for a training-data pipeline (chunk
    size = model window, stride < chunk for overlap so no boundary context
    is lost).

    Emits one row per (doc, chunk): ``(id_col, chunk_id, n_chunk_tokens,
    chunk_text)``.  Chunk starts are ``0, stride, 2*stride, …`` while the
    chunk still contributes at least one not-yet-covered token (start ≤
    n_tokens − overlap − 1, overlap = chunk − stride), so every token
    belongs to ≥1 chunk, the tail chunk may be short, and no chunk is
    fully contained in its predecessor.

    100 TB shape: pure map-side — tokenize, generate the start offsets with
    ``sequence``, ``explode``, ``slice`` — no shuffle, no UDF; output rows
    stream straight to the sink partition-local.  (At ~64-token chunks the
    row-count amplification is bounded by ``ceil(n/stride)`` per doc;
    ``spread`` first so the explode fan-out lands on all cores.)
    """
    from pyspark.sql import functions as F

    from kafka_streaming_spark.ops.partitioning import spread

    toks = tokens(F.lower(F.col(text_col)))
    return (
        spread(df)
        .select(F.col(id_col), toks.alias("__t"))
        .select(
            id_col,
            "__t",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.size("__t") - (chunk_tokens - stride) - 1, F.lit(0)
                    ),
                    F.lit(stride),
                )
            ).alias("__s"),
        )
        .select(
            id_col,
            (F.col("__s") / stride).cast("long").alias("chunk_id"),
            F.size(F.slice("__t", F.col("__s") + 1, chunk_tokens))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("__t", F.col("__s") + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
        )
    )


def bigram_lm_scores(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Add-one-smoothed bigram language-model scoring — the KenLM-style
    corpus-quality signal every large filtering pipeline runs: fit bigram /
    unigram counts over the corpus itself, then score each document by its
    mean smoothed bigram probability ``p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V)``.

    Probabilities are held in EXACT integer micro-units — ``p_micro =
    (1_000_000 * (cb+1)) DIV (cw+V)`` — and the per-document mean is an
    integer division of integer sums, so the result is bit-identical across
    engines, partitionings, and row orders (no float log/exp in either
    engine's path).

    100 TB shape: two explode+count shuffles build the model (bigram and
    unigram count tables, partial-aggregated map-side); scoring joins the
    doc-bigram stream to the bigram counts on the bigram key (the count
    table is co-partitioned by the same key it was just aggregated on) and
    to the unigram counts on the leading word; the single-row vocabulary
    size is broadcast.  Head-bigram skew in the scoring join is AQE's
    skew-join case.  Output: one row per document with ≥1 bigram —
    ``(id, n_bigrams, lm_score_micro)``.
    """
    from kafka_streaming_spark.ops.partitioning import spread

    toks = spread(df).select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__t")
    )
    uni = toks.select(F.explode("__t").alias("__w"))
    ucnt = uni.groupBy("__w").agg(F.count(F.lit(1)).alias("__cw"))
    vocab = ucnt.agg(F.count(F.lit(1)).alias("__v"))
    n_pairs = F.greatest(F.size("__t") - 1, F.lit(0))
    bg = toks.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("__t", 1, n_pairs),
                F.slice("__t", 2, n_pairs),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("__bigram"),
    )
    bcnt = bg.groupBy("__bigram").agg(F.count(F.lit(1)).alias("__cb"))
    scored = (
        bg.join(bcnt, "__bigram")
        .join(ucnt, F.split(F.col("__bigram"), " ").getItem(0) == F.col("__w"))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.expr("(1000000 * (__cb + 1)) DIV (__cw + __v)").alias("__p_micro"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("__p_micro").alias("__sp"))
        .select(
            F.col(id_col),
            F.col("n_bigrams"),
            F.expr("__sp DIV n_bigrams").alias("lm_score_micro"),
        )
    )


def compression_ratios(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
):
    """zlib compression ratio per document — the Gopher-style redundancy
    signal (highly repetitive or templated text compresses far below
    natural prose; near-random strings don't compress at all).

    ``ratio_micro = compressed_bytes * 1e6 DIV raw_bytes`` as exact
    integers; zlib output is deterministic for a fixed level, so results
    are stable across runs/partitions (pinned against direct ``zlib`` in
    pytest).  Python is required (no Catalyst DEFLATE), so this runs
    Arrow-batched in ``mapInPandas`` — the documented boundary, never a
    row-at-a-time UDF.  Output: ``(id, raw_bytes, compressed_bytes,
    ratio_micro)``; null/empty text yields zero bytes and ratio 0.
    """
    import pandas as pd
    import zlib

    from pyspark.sql.types import LongType, StructField, StructType

    from kafka_streaming_spark.ops.partitioning import spread

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("raw_bytes", LongType()),
            StructField("compressed_bytes", LongType()),
            StructField("ratio_micro", LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, raw, comp, ratio = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                b = text.encode("utf-8") if isinstance(text, str) else b""
                c = len(zlib.compress(b, level)) if b else 0
                ids.append(i)
                raw.append(len(b))
                comp.append(c)
                ratio.append((c * 1_000_000) // len(b) if b else 0)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "raw_bytes": raw,
                    "compressed_bytes": comp,
                    "ratio_micro": ratio,
                }
            )

    return spread(df).select(id_col, text_col).mapInPandas(run, out_schema)


def compression_invariants(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
):
    """Oracle-checkable witness for the zlib path of
    :func:`compression_ratios` — same distributed ``mapInPandas`` zlib
    execution, but the OUTPUT is restricted to columns a SQL oracle can
    reproduce exactly:

    - ``raw_bytes``: exact UTF-8 byte length (DuckDB ``strlen``);
    - ``header_ok``: compressed stream starts with the zlib magic 0x78;
    - ``roundtrip_ok``: ``zlib.decompress(zlib.compress(b)) == b``;
    - ``bounded_ok``: ``0 < compressed <= raw + 64`` (DEFLATE worst case
      is raw + 5 bytes/16 KB block + 6 byte wrapper).

    The three flags are deterministically 1 whenever zlib behaves, so the
    oracle emits literal 1s and the driver's value-hash check passes iff
    the distributed compression actually ran correctly on every row.  The
    full ratio output (engine-specific) stays on :func:`compression_ratios`
    and its byte-for-byte pytest pin."""
    import pandas as pd
    import zlib

    from pyspark.sql.types import LongType, StructField, StructType

    from kafka_streaming_spark.ops.partitioning import spread

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("raw_bytes", LongType()),
            StructField("header_ok", LongType()),
            StructField("roundtrip_ok", LongType()),
            StructField("bounded_ok", LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, raw, hdr, rt, bnd = [], [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                b = text.encode("utf-8") if isinstance(text, str) else b""
                ids.append(i)
                raw.append(len(b))
                if not b:
                    # empty doc: nothing to compress — flags vacuously true
                    hdr.append(1)
                    rt.append(1)
                    bnd.append(1)
                    continue
                c = zlib.compress(b, level)
                hdr.append(int(c[:1] == b"\x78"))
                rt.append(int(zlib.decompress(c) == b))
                bnd.append(int(0 < len(c) <= len(b) + 64))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "raw_bytes": raw,
                    "header_ok": hdr,
                    "roundtrip_ok": rt,
                    "bounded_ok": bnd,
                }
            )

    return spread(df).select(id_col, text_col).mapInPandas(run, out_schema)


def bpe_train(
    df,
    text_col: str = "text",
    vocab_words: int = 2000,
    num_merges: int = 50,
) -> list[tuple[str, str]]:
    """Train a byte-pair-encoding merge list on the corpus (the
    sentencepiece/GPT-2 training algorithm at toy scale): words become
    char sequences + ``</w>``, and ``num_merges`` times the most frequent
    adjacent symbol pair merges into one symbol.

    The frequency table is a BOUNDED driver collect — the top
    ``vocab_words`` words by (count desc, word asc), the standard
    "train on the head of the Zipf curve" shortcut (the tail barely moves
    pair counts).  Ties in pair frequency break lexicographically, so
    training is deterministic for a given corpus.  At 100 TB the same
    collect stays bounded (it's a top-k, not a full vocabulary pull);
    only ``vocab_words`` rows ever reach the driver.
    """
    from pyspark.sql import functions as F

    rows = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(vocab_words)
        .collect()
    )
    freqs: dict[tuple[str, ...], int] = {
        tuple(r["w"]) + ("</w>",): r["c"] for r in rows if r["w"]
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in freqs.items():
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # deterministic: max count, ties to the lexicographically SMALLEST pair
        best_pair, best_count = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_count < 2:
            break
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_freqs: dict[tuple[str, ...], int] = {}
        for seq, c in freqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best_pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_freqs[tuple(out)] = new_freqs.get(tuple(out), 0) + c
        freqs = new_freqs
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encoder for ONE word: repeatedly merge the
    lowest-rank adjacent pair (exact GPT-2 ``get_pairs``/merge loop
    semantics).  Driver/test-side helper; the distributed path batches
    this in Arrow with per-batch word caching."""
    seq: list[str] = list(word) + ["</w>"]
    while len(seq) > 1:
        pairs = {(seq[i], seq[i + 1]): i for i in range(len(seq) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                out.append(seq[i] + seq[i + 1])
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def bpe_encode_counts(
    df,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Distributed BPE encoding with a TRAINED merge list: per document,
    the real BPE token count and the distinct-piece count.

    Scale shape: the merge list travels by closure (a few KB — the same
    mechanism a production tokenizer's vocab would use, or a broadcast
    variable beyond ~MBs); encoding runs in ``mapInPandas`` over Arrow
    record batches with a per-batch word→pieces memo, so each DISTINCT
    word in a batch is encoded once regardless of its frequency (Zipf
    makes this ≈free for natural text).  Python is unavoidable here —
    BPE's merge loop is iterative per word — which is exactly the
    Arrow-batched boundary the engine reserves for such cases; there is
    deliberately no row-at-a-time UDF.

    Output: ``(id, n_words, n_bpe_tokens, n_distinct_pieces)``.
    """
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from kafka_streaming_spark.ops.partitioning import spread

    ranks = {p: i for i, p in enumerate(merges)}
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("n_words", LongType()),
            StructField("n_bpe_tokens", LongType()),
            StructField("n_distinct_pieces", LongType()),
        ]
    )

    def encode_batches(batches):
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            ids, nw, nt, nd = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                # null text ≡ empty doc (str(None) would tokenize as 'none')
                words = [] if not isinstance(text, str) else [
                    w for w in text.lower().split() if w
                ]
                pieces: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = bpe_encode_word(w, ranks)
                        memo[w] = enc
                    pieces.extend(enc)
                ids.append(i)
                nw.append(len(words))
                nt.append(len(pieces))
                nd.append(len(set(pieces)))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": nw,
                    "n_bpe_tokens": nt,
                    "n_distinct_pieces": nd,
                }
            )

    return (
        spread(df)
        .select(id_col, text_col)
        .mapInPandas(encode_batches, schema=out_schema)
    )


def bpe_invariants(
    df,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Oracle-checkable witness for the distributed BPE encoder — the same
    Arrow-batched merge loop as :func:`bpe_encode_counts`, with the OUTPUT
    restricted to SQL-reproducible columns:

    - ``n_words``: whitespace word count (DuckDB ``string_split``);
    - ``n_chars``: non-whitespace character count (word lengths summed);
    - ``reconstruct_ok``: every word's pieces concatenate back to
      ``word + '</w>'`` — the defining lossless property of BPE;
    - ``token_bounds_ok``: ``n_words <= n_bpe_tokens <= n_chars + n_words``
      (one ``</w>`` per word; merges only ever shrink a word's sequence).

    The flags are deterministically 1 for a correct encoder, so the oracle
    emits literal 1s and a value-hash match certifies the distributed
    encoding ran losslessly over every document.  The full token counts
    (not SQL-expressible) stay on :func:`bpe_encode_counts`, pinned
    piece-for-piece against :func:`bpe_encode_word` in pytest."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    from kafka_streaming_spark.ops.partitioning import spread

    ranks = {p: i for i, p in enumerate(merges)}
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("n_words", LongType()),
            StructField("n_chars", LongType()),
            StructField("reconstruct_ok", LongType()),
            StructField("token_bounds_ok", LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            ids, nw, nc, rec, bnd = [], [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = [] if not isinstance(text, str) else [
                    w for w in text.lower().split() if w
                ]
                n_tokens = 0
                ok = 1
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = bpe_encode_word(w, ranks)
                        memo[w] = enc
                    n_tokens += len(enc)
                    if "".join(enc) != w + "</w>":
                        ok = 0
                chars = sum(len(w) for w in words)
                ids.append(i)
                nw.append(len(words))
                nc.append(chars)
                rec.append(ok)
                bnd.append(int(len(words) <= n_tokens <= chars + len(words)))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": nw,
                    "n_chars": nc,
                    "reconstruct_ok": rec,
                    "token_bounds_ok": bnd,
                }
            )

    return spread(df).select(id_col, text_col).mapInPandas(run, out_schema)


def dsir_importance_weights(
    df,
    target_cond,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
):
    """DSIR-style importance weights (Xie et al., 2023): score every
    document by how much its hashed-unigram distribution looks like a
    TARGET subcorpus relative to the raw corpus — the data-selection
    signal used to resample pretraining data toward a quality domain.

    Per hashed bucket ``b`` the weight is the smoothed probability ratio
    ``p_target(b)/p_raw(b)`` held in exact integer micro-units::

        w_micro(b) = ((t_b+1) * (TT_raw+B) * 1e6)
                     DIV ((r_b+1) * (TT_target+B))

    and a document's weight is the integer mean over its tokens (DSIR
    proper sums log ratios; the arithmetic mean of ratios is the log-free
    surrogate that keeps every value a BIGINT reproduced bit-identically
    by the oracle — document-level orderings agree except where ratios
    straddle 1 asymmetrically).

    Scale shape: ONE tokenize pass; two bounded count tables (≤``buckets``
    rows each) + a 1-row totals broadcast; per-doc scoring joins tokens to
    the ≤256-row weight table map-side (broadcast).  The hashing trick
    means no vocabulary join at any scale.
    Output: ``(id, n_tokens, dsir_weight_micro)``.
    """
    from kafka_streaming_spark.functions.dedup import portable_hash60
    from kafka_streaming_spark.ops.partitioning import spread

    B = buckets
    tokb = (
        spread(df)
        .select(
            F.col(id_col),
            target_cond.cast("long").alias("__is_t"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"),
        )
        .select(
            id_col,
            "__is_t",
            F.pmod(portable_hash60(F.col("__tok")), F.lit(B)).alias("__b"),
        )
    )
    raw = tokb.groupBy("__b").agg(F.count(F.lit(1)).alias("__rb"))
    tgt = tokb.filter(F.col("__is_t") == 1).groupBy("__b").agg(
        F.count(F.lit(1)).alias("__tb")
    )
    totals = tokb.agg(
        F.count(F.lit(1)).alias("__ttr"), F.sum("__is_t").alias("__ttt")
    )
    w = (
        raw.join(tgt, "__b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.expr(
                f"((coalesce(__tb, 0) + 1) * (__ttr + {B}) * 1000000)"
                f" DIV ((__rb + 1) * (__ttt + {B}))"
            ).alias("__wm"),
        )
    )
    return (
        tokb.join(F.broadcast(w), "__b")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("__wm").alias("__sw"))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.expr("__sw DIV n_tokens").alias("dsir_weight_micro"),
        )
    )


def bm25_topk(
    df,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 full-text ranking (k1=1.2, b=0.75) in EXACT integer
    arithmetic — the inverted-index search workload at corpus scale.

    Deviation from textbook BM25, on purpose: the idf is the log-free
    rational surrogate ``idf_micro = (2N - 2df + 1)*1e6 DIV (2df + 1)``
    (the argument of Robertson's log; log is monotone, so per-term
    orderings are preserved and no libm call whose last ulp differs
    between engines enters the score).  The tf saturation keeps the real
    k1/b constants through exact fractions::

        tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*L/avgL))
                = 44*TT*tf / (20*TT*tf + 6*TT + 18*L*ND)   [×20·TT]

    with TT = total corpus tokens, ND = docs, L = doc length — all
    BIGINT.  Per-term score = ``(idf_micro * tf_part_micro) DIV 1e6``;
    per-(query, doc) score = the exact integer sum.  Overflow headroom:
    ``44·TT·tf·1e6`` must stay below 2^63 — fine to ~10^9-token corpora;
    shard the constant (or move to DECIMAL accumulation) beyond that.

    Scale shape: ONE tokenize projection computes the doc length
    (``size``) and the query-term matches (array ``filter``) map-side, so
    the ONLY rows that ever explode or shuffle are query-term postings —
    a document without a query term contributes one row to the corpus
    stats and nothing else.  Doc length rides the posting rows (no
    doc-length join); corpus stats are a 1-row broadcast; df and the
    query relation are literal-bounded broadcasts; final top-k per query
    is a partial TakeOrdered.
    Output: ``(query_id, doc_id, score_micro, rank)``.
    """
    from pyspark.sql import functions as F

    from kafka_streaming_spark.ops.partitioning import spread
    from kafka_streaming_spark.ops.windows import top_k_per_group

    spark = df.sparkSession
    terms = sorted({t for _, q in queries for t in q.split()})
    qrel = spark.createDataFrame(
        [(qid, t) for qid, q in queries for t in sorted(set(q.split()))],
        ["query_id", "term"],
    )
    base = (
        spread(df)
        .select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__t"))
        .select(
            id_col,
            F.size("__t").cast("long").alias("L"),
            F.filter("__t", lambda x: x.isin(terms)).alias("__m"),
        )
    )
    stats = base.agg(F.sum("L").alias("TT"), F.count(F.lit(1)).alias("ND"))
    tf = (
        base.select(id_col, "L", F.explode("__m").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("L").alias("L"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    sc = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qrel), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            F.col(id_col),
            F.expr(
                "(((2*ND - 2*df + 1) * 1000000) DIV (2*df + 1)"
                " * ((44 * TT * tf * 1000000)"
                "    DIV (20 * TT * tf + 6 * TT + 18 * L * ND))) DIV 1000000"
            ).alias("__s"),
        )
    )
    agg = sc.groupBy("query_id", id_col).agg(F.sum("__s").alias("score_micro"))
    return top_k_per_group(
        agg,
        ["query_id"],
        [F.col("score_micro").desc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
    )


def hashed_feature_score(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
):
    """Feature-hashed linear text scorer — the fasttext-style *hashing
    trick* shape that any trained linear quality/toxicity/lang model runs
    at corpus scale: token → hash bucket, per-bucket weight lookup, one
    aggregated dot product per document.  No vocabulary table, no join,
    constant memory regardless of token diversity; one explode + one
    groupBy shuffle total.

    The weight vector here is a deterministic md5-derived stand-in
    (integer weights in [-1000, 1000], bucket ``b`` → hash of ``"w:b"``);
    swap in trained weights as a literal map/broadcast without touching
    the plan shape.  Accumulation is EXACT integer arithmetic with one
    final IEEE division, so the score is bit-identical across engines and
    row orders (the DuckDB oracle recomputes it independently).

    Output: (id, n_tokens, model_score) with score = sum(w)/1000/n.
    """
    from kafka_streaming_spark.functions.dedup import portable_hash60
    from kafka_streaming_spark.ops.partitioning import spread

    tok = spread(df).select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok")
    )
    bucket = F.pmod(portable_hash60(F.col("__tok")), F.lit(buckets))
    w_int = F.pmod(
        portable_hash60(F.concat(F.lit("w:"), bucket.cast("string"))), F.lit(2001)
    ) - F.lit(1000)
    return (
        tok.select(F.col(id_col), w_int.alias("__w"))
        .groupBy(id_col)
        .agg(F.sum("__w").alias("__sw"), F.count(F.lit(1)).alias("n_tokens"))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (
                F.col("__sw").cast("double")
                / (F.lit(1000.0) * F.col("n_tokens").cast("double"))
            ).alias("model_score"),
        )
    )
