"""Property-based tests (hypothesis): algebraic invariants that must hold
for ANY input, not just the synthetic tables — the fold/agg equivalence at
the heart of the gold table (SURVEY.md §7 step 2), as-of join semantics
against a naive per-row reference, and idempotent insert-if-absent.

Spark jobs per example are expensive → small example counts, tiny row
strategies, no deadline.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streaming_spark.ops.aggregates import group_agg, incremental_fold
from kafka_streaming_spark.ops.dedup import merge_insert_if_absent
from kafka_streaming_spark.ops.joins import asof_join
from kafka_streaming_spark.schemas import EVENT_SCHEMA

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (id, group, score, ts) with deliberately tiny key/time spaces to force
# collisions, ties, and empty-batch splits.
event_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.sampled_from(["g1", "g2"]),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=32),
        st.integers(min_value=0, max_value=10).map(lambda s: 1_700_000_000_000 + s * 1000),
    ),
    min_size=1,
    max_size=12,
)


@given(rows=event_rows, n_batches=st.integers(min_value=1, max_value=4))
@SET
def test_fold_equals_agg_over_union(spark, rows, n_batches):
    """incremental_fold(batches) ≡ group_agg(union(batches)) for every
    split of the input — including splits that leave some batch empty or
    missing a key (exercises the full-outer coalesce arms of J2)."""
    df = spark.createDataFrame(rows, schema=EVENT_SCHEMA)
    batches = [
        df.filter(F.crc32(F.col("id").cast("binary")) % n_batches == i)
        for i in range(n_batches)
    ]
    batches = [b for b in batches if b.count() > 0]
    if not batches:
        return
    folded = {r["group_id"]: r for r in incremental_fold(batches).collect()}
    direct = {r["group_id"]: r for r in group_agg(df).collect()}
    # keys present in any non-empty batch == keys of the union of them
    union_keys = {r[0] for b in batches for r in b.select("group_id").collect()}
    assert set(folded) == union_keys
    for k in folded:
        assert folded[k]["event_count"] == direct[k]["event_count"]
        assert folded[k]["first_event_timestamp"] == direct[k]["first_event_timestamp"]
        assert folded[k]["last_event_timestamp"] == direct[k]["last_event_timestamp"]
        assert folded[k]["cumulative_score"] == pytest.approx(
            direct[k]["cumulative_score"], rel=1e-9
        )


@given(
    left=st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 20)),
        min_size=1,
        max_size=8,
    ),
    right=st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 20), st.floats(0, 1, allow_nan=False)),
        min_size=0,
        max_size=8,
    ),
)
@SET
def test_asof_join_matches_naive(spark, left, right):
    """asof_join ≡ per-row 'latest right at-or-before' lookup (ties on
    equal ts match; no prior right row → NULL)."""
    # right must be unique per (key, ts): keep the max value per slot
    best: dict[tuple[str, int], float] = {}
    for k, ts, v in right:
        best[(k, ts)] = max(v, best.get((k, ts), v))
    rrows = [(k, ts, v) for (k, ts), v in best.items()]
    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k string, ts long, lid long"
    )
    rdf = spark.createDataFrame(rrows or [("__none__", -1, 0.0)], "k string, ts long, v double")
    out = {
        r["lid"]: r["v_asof"]
        for r in asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"]).collect()
    }
    for i, (k, ts) in enumerate(left):
        cands = [(rts, v) for (rk, rts), v in best.items() if rk == k and rts <= ts]
        expected = max(cands)[1] if cands else None
        assert out[i] == (pytest.approx(expected) if expected is not None else None), (i, k, ts)


@given(rows=event_rows)
@SET
def test_merge_insert_if_absent_idempotent(spark, rows):
    """J1 algebra: merging a source twice adds nothing the second time, and
    the result key-set is target-keys ∪ source-keys."""
    df = spark.createDataFrame(rows, schema=EVENT_SCHEMA).withColumn(
        "bucket", (F.col("event_timestamp") / 1000 / 180).cast("long")
    )
    target = df.filter(F.crc32(F.col("id").cast("binary")) % 2 == 0).dropDuplicates(["bucket", "id"])
    source = df.dropDuplicates(["bucket", "id"])
    once = merge_insert_if_absent(target, source, keys=["bucket", "id"], prune_col="bucket")
    twice = merge_insert_if_absent(once, source, keys=["bucket", "id"], prune_col="bucket")
    assert once.count() == source.count()  # target ⊆ source here
    assert twice.count() == once.count()
    assert (
        once.select("bucket", "id").subtract(source.select("bucket", "id")).count() == 0
    )


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 400)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(2, 7),
)
@SET
def test_pack_distributed_equals_global_window(spark, rows, buckets):
    """The bucket-stitched distributed prefix sum must assign every doc the
    SAME pack as a naive single-partition global window, for arbitrary
    (sparse, skewed) order keys and any bucket count."""
    from pyspark.sql import Window

    from kafka_streaming_spark.functions.sampling import pack_sequential

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequential(df, "doc_id", "n_tokens", budget=512, buckets=buckets).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = {
        r["doc_id"]: r["pack_id"]
        for r in df.select(
            "doc_id",
            F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 512)
            .cast("long")
            .alias("pack_id"),
        ).collect()
    }
    assert got == naive


def test_pack_non_numeric_order_falls_back_to_single_bucket(spark):
    """String order keys can't be arithmetically bucketed; pack_sequential
    must fall back to the one-bucket (naive) path and still assign correct
    consecutive packs in lexicographic order."""
    from kafka_streaming_spark.functions.sampling import pack_sequential

    df = spark.createDataFrame(
        [("a", 300), ("b", 300), ("c", 300), ("d", 300)],
        "doc_key string, n_tokens long",
    )
    got = {
        r["doc_key"]: r["pack_id"]
        for r in pack_sequential(df, "doc_key", "n_tokens", budget=512).collect()
    }
    # running sums 300,600,900,1200 -> (run - tokens)/512 floors: 0,0,1,1
    assert got == {"a": 0, "b": 0, "c": 1, "d": 1}


def test_bloom_filter_no_false_negatives(spark):
    """The Bloom probe's one-sided error contract: every actual member is
    flagged maybe_member, and the false-positive rate stays small for
    3,840 bits / k=3 at this member count."""
    from kafka_streaming_spark.queries import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["x_bloom_filter_probe"][0](spark, SF_SMALL).collect()
    fn = [r for r in rows if r["actual_member"] == 1 and r["maybe_member"] == 0]
    assert fn == []
    non_members = [r for r in rows if r["actual_member"] == 0]
    fp = sum(r["maybe_member"] for r in non_members)
    assert fp / max(len(non_members), 1) < 0.2


corpus_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=0, max_size=6),
    min_size=1,
    max_size=8,
)


@SET
@given(corpus=corpus_strategy)
def test_bigram_lm_matches_python_reference(spark, corpus):
    """bigram_lm_scores ≡ a from-scratch Python implementation of the same
    integer math, for arbitrary tiny corpora (duplicates, empty docs,
    repeated tokens)."""
    from kafka_streaming_spark.functions.text import bigram_lm_scores

    docs = [(i, " ".join(words)) for i, words in enumerate(corpus)]
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score_micro"])
        for r in bigram_lm_scores(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }

    # reference: identical tokenization (split on whitespace of trimmed
    # lowered text -> [''] for empty docs, matching regexp-split semantics)
    toks = {i: (t.strip().lower().split() if t.strip() else [""]) for i, t in docs}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for p in zip(ws, ws[1:]):
            big[p] = big.get(p, 0) + 1
    v = len(uni)
    want = {}
    for i, ws in toks.items():
        ps = list(zip(ws, ws[1:]))
        if not ps:
            continue
        scores = [(1_000_000 * (big[p] + 1)) // (uni[p[0]] + v) for p in ps]
        want[i] = (len(ps), sum(scores) // len(ps))
    assert got == want


def test_salt_always_in_range_even_for_min_value_hash(spark):
    """ADVICE r4: abs(hash) % n goes NEGATIVE when hash() == Int.MinValue
    and n doesn't divide 2^31 — a silent row-loss hazard in salted_join
    (dim side only replicated for salts 0..n-1).  salt() must use pmod.

    Two checks: (1) the expression-level fix — pmod of Int.MinValue is
    non-negative for a non-power-of-2 modulus, while the old
    ``abs(hash)``-form fails outright (ANSI abs(Int.MinValue) overflows
    → ArithmeticException; with ANSI off it silently goes negative);
    (2) the contract — salted_join with buckets=7 (2^31 % 7 != 0) is
    row-identical to the plain join on real data."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from kafka_streaming_spark.ops.joins import salted_join
    from kafka_streaming_spark.ops.partitioning import salt

    row = spark.range(1).select(
        F.pmod(F.lit(-2147483648), F.lit(7)).alias("pmod_form"),
    ).collect()[0]
    assert row["pmod_form"] >= 0
    with _pytest.raises((Py4JJavaError, Exception)):  # ANSI overflow
        spark.range(1).select(
            (F.abs(F.lit(-2147483648)) % 7).alias("abs_form")
        ).collect()

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    salted = salt(e, ["event_type"], buckets=7)
    mn, mx = salted.agg(
        F.min("__salt"), F.max("__salt")
    ).collect()[0]
    assert 0 <= mn and mx <= 6

    dim = e.select("event_type").distinct().withColumn(
        "tag", F.length("event_type")
    )
    plain = e.join(dim, "event_type").count()
    assert salted_join(e, dim, ["event_type"], buckets=7).count() == plain


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    ),
    n_seeds=st.integers(1, 3),
    rounds=st.integers(1, 3),
)
@SET
def test_bfs_distances_match_python_reference(spark, edges, n_seeds, rounds):
    """Frontier BFS ≡ a naive per-round Python relaxation on ANY random
    graph (undirected both sides): same reachable set, same level for
    every node, for any seed set and round budget."""
    from kafka_streaming_spark.functions import graph as G

    pairs = spark.createDataFrame(edges, ["u", "v"])
    seeds = sorted({u for u, _ in edges})[:n_seeds]
    got = {
        r["node"]: r["dist"]
        for r in G.bfs_distances(
            G.undirect(pairs), spark.createDataFrame([(s,) for s in seeds], ["node"]),
            rounds=rounds,
        ).collect()
    }

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for k in range(1, rounds + 1):
        nxt = {n for f in frontier for n in adj.get(f, ()) if n not in want}
        for n in nxt:
            want[n] = k
        frontier = nxt
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=8).map(
            lambda ws: " ".join(ws)
        ),
        min_size=2,
        max_size=8,
    ),
    t_micro=st.sampled_from([300_000, 500_000, 800_000]),
)
@SET
def test_prefix_filter_complete_on_random_corpora(spark, docs, t_micro):
    """Prefix-filter similarity join ≡ brute-force shingle-set Jaccard on
    ANY random corpus and threshold — the pigeonhole completeness proof
    exercised beyond the fixture corpus (tiny vocab forces heavy shingle
    sharing, the filter's hardest regime)."""
    from kafka_streaming_spark.functions.dedup import prefix_filter_pairs

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["n_union"])
        for r in prefix_filter_pairs(df, n=3, threshold_micro=t_micro).collect()
    }

    def shingles(text):
        ws = text.lower().split()
        k = max(len(ws) - 2, 1)
        return {" ".join(ws[i : i + 3]) for i in range(k)}

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = shingles(docs[i]), shingles(docs[j])
            inter, union = len(a & b), len(a | b)
            if inter * 1_000_000 >= t_micro * union:
                want[(i, j)] = (inter, union)
    assert got == want


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.one_of(
                    st.text(alphabet=" \t\n\r\x0b\x0c", max_size=3),
                    st.text(min_size=1, max_size=6),
                ),
                max_size=5,
            ).map("".join),
        ),
        min_size=1,
        max_size=10,
    )
)
@SET
def test_token_stats_arrow_matches_catalyst_on_random_text(spark, texts):
    """The Arrow token kernel must agree with its Catalyst-expression
    contract on arbitrary unicode — including the two trim traps pinned in
    its docstring: whitespace-class mismatches (ASCII \\s vs unicode
    whitespace like NBSP) and edge tabs/newlines that plain F.trim leaves
    behind."""
    from kafka_streaming_spark.functions.arrowops import token_stats_arrow
    from tests.test_arrowops import _token_stats_builtin

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: (r["char_len"], r["token_count"])
        for r in token_stats_arrow(df, "id", "text").collect()
    }
    exp = {
        r["id"]: (r["char_len"], r["token_count"])
        for r in _token_stats_builtin(df, "id").collect()
    }
    assert got == exp
