"""Build deterministic Nx replicas of the testdata fact tables for scale
self-benches (SCALE.md "10x"/"100x" sections) — the standing
overflow-and-shuffle regression harness.

Facts (orders / lineitem / events) are copied N times with offset keys via
a range cross join, so joins stay key-consistent within each copy;
dimensions are copied once.  Offsets are derived at run time from
``MAX(key)+1`` of each base table (NOT hardcoded — with a larger ``--base``
fixed offsets would silently collide and merge rows across copies,
ADVICE r5).  With ``--vary-documents`` the documents table is also
replicated with a per-copy suffix token appended to the text, so text
operators scale WITHOUT the pathological every-doc-has-N-exact-copies
regime (use the default no-documents mode to stress dedup with exactly
that regime instead — see the round-4/5 tables in SCALE.md).

DANGLING-FK REGIME (deliberate): dimensions are copied ONCE, so
replicated fact keys that are offset past the dimension key range
(o_custkey in copies i>=1, and any fact->dim key that was offset) have NO
dimension match.  Inner fact⋈dim joins therefore only see copy 0's rows —
1/N of the replicated volume — which is fine for the scan/shuffle-volume
stress the replicas exist for, but means dim-join SELECTIVITY does not
scale with N.  Fact⋈fact joins (lineitem⋈orders on l_orderkey, events
self-joins) stay fully matched in every copy.  Interpret SCALE.md numbers
for customer/supplier-join operators accordingly, or extend FACTS with
offset dim replicas if a bench needs matched dims at scale.

Usage:
    python tools/make_scale_replica.py --factor 100 \
        --base /root/testdata/sf0.1 --out .tmp/sf10r5 [--vary-documents]

Runs in DuckDB (no Spark session needed); ~75 s for 100x at sf0.1.
"""

from __future__ import annotations

import argparse
import os
import time

import duckdb

# Per-fact SELECT templates; {ok}/{ck}/{ek}/{uk}/{dk} are the derived
# MAX(key)+1 offsets multiplied by the copy index i.
FACTS = {
    "orders": (
        "SELECT o_orderkey + i*{ok} AS o_orderkey,"
        " o_custkey + i*{ck} AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    ),
    "lineitem": (
        "SELECT l_orderkey + i*{ok} AS l_orderkey, l_partkey, l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate"
    ),
    "events": (
        "SELECT event_id + i*{ek} AS event_id, ts,"
        " user_id + i*{uk} AS user_id, event_type, value, props"
    ),
}
DIMS = ["region", "nation", "customer", "supplier", "part", "embeddings"]
# --replicate-customer: customer copies share orders' {ck} offset, so the
# replicated o_custkey values keep a matching dim row (kills the
# dangling-FK regime for customer-join operators; c_nationkey is kept
# per-copy so nation rollups scale with volume).
REPL_CUSTOMER = (
    "SELECT c_custkey + i*{ck} AS c_custkey, c_name, c_nationkey,"
    " c_acctbal, c_mktsegment"
)
VARIED_DOCS = (
    "SELECT doc_id + i*{dk} AS doc_id,"
    " text || ' copyword' || CAST(i AS VARCHAR) AS text,"
    " lang, source, n_chars + 9 + CASE WHEN i >= 10 THEN 1 ELSE 0 END AS n_chars"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--vary-documents", action="store_true")
    ap.add_argument("--replicate-customer", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    t0 = time.time()

    def max_plus_one(table: str, key: str) -> int:
        return con.sql(
            f"SELECT MAX({key}) + 1 FROM read_parquet('{args.base}/{table}.parquet')"
        ).fetchall()[0][0]

    offsets = {
        "ok": max_plus_one("orders", "o_orderkey"),
        # ck must clear BOTH key ranges: with standard TPC-H ~1/3 of
        # customers never order, so MAX(c_custkey) can exceed
        # MAX(o_custkey) — an orders-only offset would overlap replicated
        # customer copies and silently fan out every customer join
        # (ADVICE r6).
        "ck": max(
            max_plus_one("orders", "o_custkey"),
            max_plus_one("customer", "c_custkey"),
        ),
        "ek": max_plus_one("events", "event_id"),
        "uk": max_plus_one("events", "user_id"),
        "dk": max_plus_one("documents", "doc_id"),
    }
    print("derived offsets:", offsets)
    for table, sel in FACTS.items():
        con.execute(
            f"COPY ({sel.format(**offsets)}"
            f" FROM read_parquet('{args.base}/{table}.parquet')"
            f" CROSS JOIN range({args.factor}) t(i))"
            f" TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
    doc_tables = DIMS + ([] if args.vary_documents else ["documents"])
    if args.replicate_customer:
        doc_tables = [t for t in doc_tables if t != "customer"]
        con.execute(
            f"COPY ({REPL_CUSTOMER.format(**offsets)}"
            f" FROM read_parquet('{args.base}/customer.parquet')"
            f" CROSS JOIN range({args.factor}) t(i))"
            f" TO '{args.out}/customer.parquet' (FORMAT PARQUET)"
        )
    for table in doc_tables:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.base}/{table}.parquet'))"
            f" TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
    if args.vary_documents:
        con.execute(
            f"COPY ({VARIED_DOCS.format(**offsets)}"
            f" FROM read_parquet('{args.base}/documents.parquet')"
            f" CROSS JOIN range({args.factor}) t(i))"
            f" TO '{args.out}/documents.parquet' (FORMAT PARQUET)"
        )
    for table in list(FACTS) + ["documents"]:
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{args.out}/{table}.parquet')"
        ).fetchall()[0][0]
        print(f"{table}: {n:,} rows")
    print(f"built {args.factor}x replica in {time.time() - t0:.1f}s → {args.out}")


if __name__ == "__main__":
    main()
