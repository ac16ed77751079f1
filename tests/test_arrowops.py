"""Arrow-native operator surface (VERDICT r6 ask #7 item 2): the
``applyInArrow`` grouped map and the ``mapInArrow`` batch map must agree
exactly with their built-in DataFrame equivalents on real testdata — the
same "custom runtime ≡ declarative plan" contract the pandas-UDF operators
carry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_spark.functions.arrowops import (
    grouped_stats_arrow,
    token_stats_arrow,
)
from kafka_streaming_spark.schemas import load_table
from tests.conftest import SF_SMALL


def test_grouped_stats_arrow_matches_groupby(spark):
    events = load_table(spark, SF_SMALL, "events")
    got = {
        r["event_type"]: r
        for r in grouped_stats_arrow(events, "event_type", "value").collect()
    }
    exp = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").cast("double").alias("total"),
            F.min("value").cast("double").alias("vmin"),
            F.max("value").cast("double").alias("vmax"),
            F.avg("value").alias("mean"),
        )
        .collect()
    }
    assert set(got) == set(exp) and len(got) > 1
    for k in exp:
        assert got[k]["n"] == exp[k]["n"], k
        assert got[k]["total"] == pytest.approx(exp[k]["total"], rel=1e-12), k
        assert got[k]["vmin"] == exp[k]["vmin"], k
        assert got[k]["vmax"] == exp[k]["vmax"], k
        assert got[k]["mean"] == pytest.approx(exp[k]["mean"], rel=1e-12), k


def test_grouped_stats_arrow_plan_shuffles_once(spark):
    events = load_table(spark, SF_SMALL, "events")
    plan = (
        grouped_stats_arrow(events, "event_type", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one hash shuffle on the key
    assert "BatchEvalPython" not in plan  # Arrow path, never row-at-a-time


def _token_stats_builtin(df, id_col):
    """The Catalyst-expression equivalent the kernel's docstring promises:
    ASCII-whitespace tokens via regexp trim (NOT F.trim, which strips
    spaces only and would disagree on tab/newline-edged strings)."""
    txt = F.coalesce("text", F.lit(""))
    trimmed = F.regexp_replace(txt, r"^\s+|\s+$", "")
    return df.select(
        id_col,
        F.length(txt).alias("char_len"),
        F.when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
        .alias("token_count"),
    )


def test_token_stats_arrow_matches_builtin(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    got = {r["doc_id"]: r for r in token_stats_arrow(docs, "doc_id", "text").collect()}
    exp = {r["doc_id"]: r for r in _token_stats_builtin(docs, "doc_id").collect()}
    assert set(got) == set(exp) and len(got) > 10
    for k in exp:
        assert got[k]["char_len"] == exp[k]["char_len"], k
        assert got[k]["token_count"] == exp[k]["token_count"], k


def test_token_stats_arrow_edge_rows(spark):
    df = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "one"),
            (5, " a  b\tc\nd "),
            (6, "\tx\n"),  # tab/newline edges: F.trim would get this wrong
            (8, "a\x0bb"),  # VT IS Java \s but NOT RE2 \s — two tokens
            (7, " "),  # NBSP is NOT \s — one token, like Spark/DuckDB
        ],
        "id int, text string",
    )
    got = {r["id"]: r for r in token_stats_arrow(df, "id", "text").collect()}
    assert (got[1]["char_len"], got[1]["token_count"]) == (0, 0)
    assert (got[2]["char_len"], got[2]["token_count"]) == (0, 0)
    assert (got[3]["char_len"], got[3]["token_count"]) == (3, 0)
    assert (got[4]["char_len"], got[4]["token_count"]) == (3, 1)
    assert (got[5]["char_len"], got[5]["token_count"]) == (10, 4)
    assert (got[6]["char_len"], got[6]["token_count"]) == (3, 1)
    assert (got[7]["char_len"], got[7]["token_count"]) == (1, 1)
    assert (got[8]["char_len"], got[8]["token_count"]) == (3, 2)


def test_token_stats_arrow_plan_is_narrow(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    plan = (
        token_stats_arrow(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map — no shuffle
    assert "BatchEvalPython" not in plan
