"""Fold-horizon bounds for every `aggregate`-HOF append-accumulator fold.

SCALE.md's round-5 lesson: an append-accumulator fold copies its
accumulator array once per step, so total copy cost is O(steps²) — fine
at ~100 steps, 20 s at 2,400 steps (the pre-fix x_holt_winters).  The
discipline is that every such fold's step count must be bounded by a
CALENDAR/KEY constant (months in the data's calendar, a literal horizon
filter, the duration range implied by the calendar), never by data
volume.  These tests measure each fold's actual input length at sf0.01
with DuckDB (no Spark session needed — the fold inputs are plain
grouped-distinct counts over the same parquet) and pin them under their
documented constants; if a future edit changes a fold key to something
row-scaled (e.g. folding per order instead of per duration-day), the
length blows past the ceiling and the test fails.

Scalar-accumulator folds (x_embedding_normalize/quantize, f_hof_pack,
f_variant_pack, f_map_pack, x_pair_distance_hist, x_silhouette) carry a
single number, not a growing array — O(steps) regardless — and their
arrays are structurally bounded anyway (embedding dim 64, map size ≤ 5),
so they need no horizon pin.
"""

from __future__ import annotations

import duckdb
import pytest

SF01 = "/root/testdata/sf0.01"

# (query, fold-length SQL at {base}, ceiling, what bounds it)
FOLD_BOUNDS = [
    (
        "x_holt_linear",
        """
        SELECT MAX(c) FROM (
          SELECT c_nationkey,
                 COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS c
          FROM '{base}/orders.parquet' o
          JOIN '{base}/customer.parquet' cu ON o_custkey = c_custkey
          GROUP BY 1)
        """,
        120,
        "order calendar months (1995-01..2001-08 = 80; ceiling 120)",
    ),
    (
        "x_holt_winters",
        """
        SELECT MAX(c) FROM (
          SELECT c_nationkey,
                 COUNT(DISTINCT CAST(epoch(o_orderdate)/86400 AS BIGINT)) AS c
          FROM '{base}/orders.parquet' o
          JOIN '{base}/customer.parquet' cu ON o_custkey = c_custkey
          WHERE CAST(epoch(o_orderdate)/86400 AS BIGINT) >= 11355
          GROUP BY 1)
        """,
        181,
        "the 180-day horizon literal (epoch day >= 11355) + 1",
    ),
    (
        "x_kaplan_meier",
        """
        SELECT MAX(c) FROM (
          SELECT o_orderpriority,
                 COUNT(DISTINCT l_shipdate - o_orderdate) AS c
          FROM '{base}/lineitem.parquet' l
          JOIN '{base}/orders.parquet' o ON l_orderkey = o_orderkey
          GROUP BY 1)
        """,
        5000,
        "duration range <= ship span + order span (~4,900 days; saturates"
        " at 4,804 by sf0.1 and cannot grow further at any volume)",
    ),
]


@pytest.mark.parametrize(
    "query,sql,ceiling,why", FOLD_BOUNDS, ids=[r[0] for r in FOLD_BOUNDS]
)
def test_fold_length_calendar_bounded(query, sql, ceiling, why):
    con = duckdb.connect()
    n = con.sql(sql.format(base=SF01)).fetchall()[0][0]
    assert n <= ceiling, (
        f"{query}: fold length {n} exceeds its calendar ceiling {ceiling}"
        f" ({why}) — an append-accumulator fold this long is O(steps^2)"
        f" in copy cost; re-bound the horizon or checkpoint fold state"
    )


def test_holt_winters_horizon_literal_present():
    """The 180-day horizon filter is x_holt_winters' ONLY defense against
    the O(steps²) fold (20.1s -> 1.9s when added); pin the literal in the
    source so it cannot be silently dropped."""
    import inspect

    from kafka_streaming_spark import queries

    src = inspect.getsource(queries.x_holt_winters)
    assert "11355" in src
