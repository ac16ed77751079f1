"""bench.py outlier re-measure selection (VERDICT r9 ask #2): bounded,
worst-first, history-gated — pure logic, no Spark."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
select_outliers = _bench.select_outliers


def test_threshold_and_order():
    hist = {"a": 1.0, "b": 2.0, "c": 0.5, "d": 1.0}
    timings = {"a": 1.4, "b": 3.1, "c": 2.5, "d": 1.5, "new_query": 9.9}
    # a: 1.4x (under), b: 1.55x, c: 5x, d: exactly 1.5x (not >), new: no
    # history -> only b and c qualify, worst relative inflation first
    assert select_outliers(timings, hist) == ["c", "b"]


def test_cap_bounds_the_rerun():
    hist = {f"q{i}": 1.0 for i in range(50)}
    timings = {f"q{i}": 2.0 + i * 0.01 for i in range(50)}
    out = select_outliers(timings, hist, cap=20)
    assert len(out) == 20
    assert out[0] == "q49"  # worst inflation first


def test_empty_history_is_free():
    assert select_outliers({"a": 9.0}, {}) == []
    assert select_outliers({}, {"a": 1.0}) == []
    # zero/negative history entries never divide
    assert select_outliers({"a": 9.0}, {"a": 0.0}) == []
