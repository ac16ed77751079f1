"""Registry/driver-contract hygiene: the invariants the round driver
relies on but never checks itself.  These catch rotation mistakes (a
DRIVER_PRIORITY name that no longer exists, a duplicate, a wrong-sized
window) at pytest time instead of as a silently skipped driver row.
"""

from __future__ import annotations

from kafka_streaming_spark.queries import DRIVER_PRIORITY, REGISTRY, driver_ordered


def test_driver_window_is_exactly_50_valid_unique_names():
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert missing == []


def test_driver_ordered_puts_priority_first_and_loses_nothing():
    ordered = driver_ordered()
    assert list(ordered)[: len(DRIVER_PRIORITY)] == DRIVER_PRIORITY
    assert set(ordered) == set(REGISTRY)


def test_every_query_has_an_oracle():
    """Round-5 invariant: NO rows-only queries remain.  The three former
    exceptions (a_approx_sketch, x_bpe_tokenize, x_compression_ratio) now
    emit exact-value + invariant-flag outputs that DuckDB reproduces, so
    every registry entry gets the driver's full hash check."""
    rows_only = sorted(n for n, (_f, sql) in REGISTRY.items() if sql is None)
    assert rows_only == []


def test_register_names_are_unique_in_source():
    """A second @register under an existing name silently overwrites the
    first (dict assignment), shadowing a live query — exactly what
    happened to a_grouping_sets in round 4 (caught and un-shadowed in
    round 5).  Pin uniqueness at the source-text level, where the dict
    can't hide the collision."""
    import collections
    import pathlib
    import re

    pkg = (
        pathlib.Path(__file__).parent.parent
        / "kafka_streaming_spark"
        / "queries"
    )
    src = "\n".join(
        f.read_text() for f in sorted(pkg.glob("*.py"))
    )
    names = re.findall(r'@register\(\s*\n?\s*"([a-z0-9_]+)"', src)
    dupes = [n for n, c in collections.Counter(names).items() if c > 1]
    assert dupes == []
    assert len(names) == len(REGISTRY)


def test_oracles_are_nonempty_sql():
    bad = [
        n
        for n, (_f, sql) in REGISTRY.items()
        if sql is not None and ("SELECT" not in sql.upper() or len(sql) < 20)
    ]
    assert bad == []
