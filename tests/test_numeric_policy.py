"""Cross-engine numeric-policy conformance sweep (VERDICT r6 ask #3).

Two drift classes have each produced a real bug, so both are now pinned
as source-level lints over every registered query:

1. **Float division feeding an integer cast.**  Spark ``CAST(double AS
   BIGINT)`` truncates toward zero while DuckDB rounds half-even, so a
   true division whose result is cast to an integer type diverges
   whenever the fractional part crosses 0.5 — a latent mismatch that
   only fires on unlucky data (q17 passed the sf0.01 driver for three
   rounds before the class was caught).  Divisions are only safe inside
   an integerizing call (``floor``/``round``/``ceil``/``trunc``), where
   both engines produce the same integer-valued double, or as integer
   division (``DIV`` / ``//``), where both truncate identically.
   Pre-fix ``x_temporal_join_size`` (``/ 2`` into a BIGINT context) and
   ``q17_small_qty_revenue`` (``SUM(...)/7.0`` through the fixed-point
   BIGINT cast) are the motivating instances.

2. **Products of BIGINT aggregates without DECIMAL(38,0) headroom.**
   Spark ``sum(BIGINT)`` stays BIGINT and silently wraps past 2^63
   (ANSI off), while DuckDB's SUM returns HUGEINT — so a Spark-side
   product of two aggregate outputs is the side that diverges first at
   scale.  Pre-fix ``x_kfold_cv_ols`` (normal-equation cross products)
   and ``x_ks_test`` (``md·10⁶`` with md ≤ n₁·n₂, overflow exactly at
   the 100× replica) are the motivating instances.  Every product of
   two aggregate aliases in Spark expression text must either route
   through DECIMAL(38,0) or carry an entry in the audited allow-list
   below documenting why its magnitude is bounded at ≥100× row counts.
"""

from __future__ import annotations

import inspect
import re

import pytest

from kafka_streaming_spark.queries import REGISTRY

# ---------------------------------------------------------------------------
# shared scanning helpers
# ---------------------------------------------------------------------------

_INTEGERIZERS = ("FLOOR", "ROUND", "CEIL", "CEILING", "TRUNC")
_INT_TYPES = re.compile(r"^(BIGINT|INT|INTEGER|SMALLINT|TINYINT|LONG)$", re.I)


def _strip_literals(text: str) -> str:
    """Blank out single-quoted SQL string literals (keeps offsets)."""
    return re.sub(r"'[^']*'", lambda m: " " * len(m.group(0)), text)


def _matched_span(text: str, open_paren: int) -> int:
    """Index one past the ``)`` matching the ``(`` at ``open_paren``."""
    depth = 0
    for i in range(open_paren, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(text)


def _integerizer_spans(text: str) -> list[tuple[int, int]]:
    """Spans of FLOOR/ROUND/CEIL/TRUNC(...) calls (contents included)."""
    spans = []
    for m in re.finditer(
        r"\b(%s)\s*\(" % "|".join(_INTEGERIZERS), text, re.I
    ):
        spans.append((m.start(), _matched_span(text, m.end() - 1)))
    return spans


def _true_div_positions(text: str) -> list[int]:
    """Positions of ``/`` that are true division (not ``//`` int-div)."""
    return [m.start() for m in re.finditer(r"(?<!/)/(?!/)", text)]


def _cast_operands(sql: str):
    """Yield ``(operand_text, target_type)`` for every ``CAST(x AS T)``."""
    for m in re.finditer(r"\bCAST\s*\(", sql, re.I):
        end = _matched_span(sql, m.end() - 1)
        inner = sql[m.end() : end - 1]
        depth = 0
        for j in range(len(inner) - 4, -1, -1):
            if inner[j] == ")":
                depth += 1
            elif inner[j] == "(":
                depth -= 1
            elif depth == 0 and inner[j : j + 4].upper() == " AS ":
                yield inner[:j].strip(), inner[j + 4 :].strip()
                break


def _unintegerized_div_into_int_cast(sql: str) -> list[str]:
    """Integer-cast operands containing a ``/`` not enclosed by an
    integerizing call — the class-1 violation."""
    bad = []
    for operand, typ in _cast_operands(_strip_literals(sql)):
        if not _INT_TYPES.match(typ):
            continue
        spans = _integerizer_spans(operand)
        for pos in _true_div_positions(operand):
            if not any(a <= pos < b for a, b in spans):
                bad.append(operand.strip()[:120])
                break
    return bad


def _spark_source(fn) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # built dynamically; nothing to scan
        return ""
    # docstrings are prose, not expressions — drop triple-quoted blocks
    return re.sub(r'"""(?:[^"]|"(?!""))*"""', '""', src, flags=re.S)


def _call_first_args(src: str, fname: str):
    """First positional argument text of every ``fname(...)`` call."""
    for m in re.finditer(rf"\b{fname}\s*\(", src):
        end = _matched_span(src, m.end() - 1)
        arg = src[m.end() : end - 1]
        depth = 0
        for j, c in enumerate(arg):
            if c in "([{":
                depth += 1
            elif c in ")]}":
                depth -= 1
            elif c == "," and depth == 0:
                yield arg[:j]
                break
        else:
            yield arg


# ---------------------------------------------------------------------------
# class 1: division into an integer cast
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(n for n, (_f, s) in REGISTRY.items() if s))
def test_oracle_no_bare_division_into_int_cast(name):
    _fn, sql = REGISTRY[name]
    bad = _unintegerized_div_into_int_cast(sql)
    assert not bad, (
        f"{name}: oracle casts a true-division result to an integer type "
        f"without floor/round — Spark truncates, DuckDB rounds half-even; "
        f"use DIV / // or wrap in floor(): {bad}"
    )


def test_spark_no_division_inside_fixed_point_operand():
    """The ``dfix``/``dsum``/``_fixed`` helpers end in ``.cast('long')``
    (truncation); feeding them a division is the q17 drift pattern —
    fix the exact scaled integer FIRST, then integer-DIV."""
    offenders = []
    for name, (fn, _sql) in REGISTRY.items():
        src = _spark_source(fn)
        for helper in ("dfix", "dsum", "_fixed"):
            for arg in _call_first_args(src, helper):
                if "/" in arg:
                    offenders.append((name, helper, arg.strip()[:100]))
    assert not offenders, (
        "division feeding a truncating fixed-point cast (Spark truncates, "
        f"DuckDB rounds): {offenders}"
    )


def test_spark_no_bare_division_into_int_cast_in_expr_strings():
    """Same class-1 scan over the Spark side's SQL-expression strings
    (``F.expr`` / ``selectExpr`` fragments containing CAST ... AS
    BIGINT)."""
    offenders = []
    for name, (fn, _sql) in REGISTRY.items():
        src = _spark_source(fn)
        for m in re.finditer(r'"((?:[^"\\]|\\.)*)"', src):
            s = m.group(1)
            if "CAST" not in s.upper() or "/" not in s:
                continue
            if re.search(r"\b(SELECT|WITH)\b", s):
                continue  # oracle SQL text — covered by the oracle test
            for frag in _unintegerized_div_into_int_cast(s):
                offenders.append((name, frag))
    assert not offenders, (
        "Spark expr casts a true-division result to an integer type "
        f"without floor/round: {offenders}"
    )


# ---------------------------------------------------------------------------
# class 2: aggregate-product overflow headroom
# ---------------------------------------------------------------------------

# Audited sites: products of two aggregate aliases whose magnitude is
# BOUNDED at ≥100× the sf0.1 row counts (measured 2026-08-15; int64 max
# 9.2·10¹⁸).  A query in this list is exempt; everything else multiplying
# two aggregate outputs must route through DECIMAL(38,0).
_HEADROOM_AUDITED: dict[str, str] = {
    # counts a,b ≤ r0,r1 ≤ N rows → product ≤ N²: 3.6·10¹⁵ at 100×
    # (N = 6·10⁷); fits while N ≤ 3·10⁹.
    "x_chi2_feature_select": "count×count ≤ N², N ≤ 3e9",
    # calendar-bounded regression moments: n ≤ ~30 distinct days (the
    # data's time range is fixed — replicas repeat it), x = day index
    # ≤ ~30, y = daily cents ≈ 5.6·10¹⁰/type at 100× → n·sxy ≤ 5·10¹³,
    # ·1000 ≤ 5·10¹⁶.
    "x_trend_slope": "calendar-bounded moments, ≤5e16 at 100×",
    "x_conformal_interval": "same moment bounds as x_trend_slope",
    "x_regression_metrics": "same moment bounds as x_trend_slope",
    # cooc ≤ pop ≤ distinct (order,item) pairs ≈ 3.1e5 at 100× →
    # cooc²·10⁶ ≤ 9.7·10¹⁶; overflows only past pop ≈ 3·10⁶ (~1000×).
    "x_item_cf_topk": "cooc²·1e6 ≤ pop²·1e6 ≤ 9.7e16 at 100×",
    # t ≤ deg², per-copy node degrees are replication-invariant
    # (replicas offset keys, they don't densify a node's neighborhood).
    "x_local_clustering": "degree-bounded, replication-invariant",
    # x, y are truncated-dollar DAILY MEANS ≤ max(value) ≈ 560 —
    # scale-INVARIANT; all 7-day co-moments ≤ 7·560² ≈ 2.2e6.
    "x_rolling_corr": "daily means bounded by max value, SF-invariant",
    # n_events·n_days·10⁶ ≤ 10⁷·30·10⁶ = 3·10¹⁴ at 100×.
    "x_seasonal_baseline": "≤3e14 at 100×",
    # n_pop·(avg·1000) ≤ 10⁷·5.6·10⁷ = 5.6·10¹⁴ at 100×.
    "x_stratified_estimate": "≤5.6e14 at 100×",
    # per-time-bucket pair counts: worst case every row in one bucket →
    # sum(nt)² ≤ (10⁷)² = 10¹⁴ at 100×.
    "x_temporal_join_size": "per-bucket count² ≤ 1e14 at 100×",
    # wedge/triangle counts ≤ row counts → product ≤ 10¹⁴ at 100×.
    "x_triangle_count": "count×count comparison ≤ 1e14 at 100×",
    # -- DataFrame-API products (the round-7 lint extension) ------------
    # sx/sy are sums of DECIMAL columns — Spark's sum(decimal) stays
    # decimal, so every product below is decimal arithmetic; no int64
    # path exists.
    "a_stats_pack": "sx/sy/sxx/syy/sxy are DECIMAL sums — products are decimal",
    "x_ab_test": "sx/sxx are DECIMAL sums — products are decimal",
    # trailing window is ≤7 rows: n·t_n·2 ≤ 2·7·10⁷ = 1.4e8 at 100×.
    "x_traffic_anomaly": "n·t_n·2 ≤ 1.4e8 at 100× (window ≤ 7)",
    # per-row n_events·n_days ≤ 10⁷·5000 (calendar-bounded days); the
    # windowed prefix sum ≤ 5000 such terms → ≤ 2.5e14 at 100×.
    "x_cusum_drift": "prefix Σ(n_events·n_days) ≤ 2.5e14 at 100×",
    # customer-grain contingency: o, rtot, ctot, nn ≤ 1.5e6 at 100× →
    # o·nn ≤ 2.3e12; d² runs in double.
    "x_chi2_independence": "o·nn ≤ 2.3e12 at 100×; d² in double",
    # per-row degree products fit int64 (≤~1e12); every SUM of them is
    # wrapped in dec() = DECIMAL(38,0) accumulation at the agg site.
    "x_assortativity": "per-row x·y ≤ ~1e12; sums accumulate in DECIMAL",
    # m ≤ 6e7 undirected trade edges at 100× → 4m² ≤ 1.5e16;
    # degree_sum ≤ 2m → square ≤ 1.5e16.
    "x_modularity": "4m² and degree_sum² ≤ 1.5e16 at 100×",
    # cumulative counts ca ≤ na, cb ≤ nb ≤ 10⁷ events at 100× →
    # ca·nb ≤ 1e14.
    "x_ks_test": "ca·nb ≤ na·nb ≤ 1e14 at 100×",
    # Σ ca·cb IS the exact join cardinality = |lineitem| ≤ 6e9 at 100×.
    "x_join_size_estimate": "Σ ca·cb = join size ≤ 6e9 at 100×",
    # rank identity: Σ nc·two_r ≤ 2N² = 2e14 at 100× (N ≤ 1e7 events).
    "x_mann_whitney": "rank sums ≤ 2N² = 2e14 at 100×",
    # c = per-(source,gram) count; Σc² ≤ (Σc)·max(c) ≤ 1e8·2.5e5 ≈
    # 2.5e13 at 100× documents.
    "x_source_similarity": "Σc² ≤ 2.5e13 at 100×",
    # x = per-(event_type, day) count ≤ ~7e4 at 100× → x² ≤ 5e9/row;
    # q ≤ 5000 calendar days · 5e9 = 2.5e13.
    "x_fano_factor": "daily-count² ≤ 5e9/row; q ≤ 2.5e13 at 100×",
    # n ≤ 1.5e6 points per cell at 100×, neighbor_cnt ≤ 8 →
    # n·neighbor_cnt ≤ 1.2e7; neighbor_sum·2 ≤ 2.4e7.
    "x_hotspot_cells": "n·neighbor_cnt ≤ 1.2e7 at 100×",
    # per-row cnt² ≤ 2.25e12 fits int64, then cast to DECIMAL(38,0)
    # BEFORE summation; the (n2 − Σcnt²)·1e6 combination runs in
    # decimal/double (the r7 bridge).
    "x_gini_impurity": "per-row cnt² ≤ 2.25e12; sums/combination DECIMAL",
    # q and s are DECIMAL(38,0) sums since the r7 bridge — n·q and s·s
    # are decimal arithmetic (the lint is textual and can't see types).
    "x_zscore_normalize": "q/s are DECIMAL sums — n·q and s·s decimal",
}


def _aggregate_aliases(src: str) -> set[str]:
    """Column names bound to SUM/COUNT aggregates in this function —
    DataFrame ``.alias("x")`` form and expr-string ``SUM(...) AS x``."""
    out = set(
        a.lower()
        for a in re.findall(
            r'F\.(?:sum|count)\([^;]*?\)\s*\.alias\(\s*"(\w+)"', src
        )
    )
    out |= set(
        m.group(1).lower()
        for m in re.finditer(
            r"(?:SUM|COUNT)\s*\([^()]*(?:\([^()]*\)[^()]*)*\)\s+AS\s+(\w+)",
            src,
            re.I,
        )
    )
    return out


def test_spark_aggregate_products_have_decimal_headroom():
    offenders = []
    for name, (fn, _sql) in REGISTRY.items():
        if name in _HEADROOM_AUDITED:
            continue
        src = _spark_source(fn)
        aliases = _aggregate_aliases(src)
        # Direct aggregate-expression products — F.sum(...) * F.sum(...)
        # with no alias step at all (the pre-fix x_gini_impurity form).
        # No alias check possible or needed: a raw product of two sums is
        # the class regardless of names; the DECIMAL bridge again breaks
        # the adjacency (.cast sits between the closing paren and *).
        # Runs BEFORE the `aliases` gate below — an alias-free function is
        # exactly the shape this pattern exists to catch.
        for mm in re.finditer(r'(F\.sum\("?\w+"?\)\s*\*\s*F\.sum\()', src):
            offenders.append((name, mm.group(1).replace("\n", " ")))
            break
        if not aliases:
            continue
        for m in re.finditer(r'"((?:[^"\\]|\\.)*)"', src):
            s = m.group(1)
            if "*" not in s or re.search(r"\b(SELECT|WITH)\b", s):
                continue  # skip oracle SQL text (DuckDB sums are HUGEINT)
            if "decimal(38" in s.lower():
                continue
            for mm in re.finditer(r"\b(\w+)\s*\*\s*\(?\s*(\w+)\b", s):
                if mm.group(1).lower() in aliases and mm.group(2).lower() in aliases:
                    offenders.append((name, s.replace("\n", " ").strip()[:110]))
                    break
        # DataFrame-API form of the same class: F.col("a") * F.col("b")
        # where both names are aggregate outputs.  A DECIMAL bridge breaks
        # the pattern (the .cast chain sits between col and *), so bridged
        # products don't match.
        for mm in re.finditer(
            r'F\.col\(\s*"(\w+)"\s*\)\s*\*\s*F\.col\(\s*"(\w+)"\s*\)', src
        ):
            if mm.group(1).lower() in aliases and mm.group(2).lower() in aliases:
                offenders.append(
                    (name, f'F.col("{mm.group(1)}") * F.col("{mm.group(2)}")')
                )
                break
    assert not offenders, (
        "Spark-side product of two aggregate aliases without DECIMAL(38,0) "
        "headroom — Spark BIGINT wraps past 2^63 while DuckDB's SUM is "
        "HUGEINT (the x_kfold_cv_ols / x_ks_test class).  Either bridge "
        "through DECIMAL(38,0) or add an audited magnitude bound to "
        f"_HEADROOM_AUDITED: {offenders}"
    )


def test_headroom_allowlist_entries_still_exist():
    stale = [n for n in _HEADROOM_AUDITED if n not in REGISTRY]
    assert not stale, f"allow-list names no longer registered: {stale}"
