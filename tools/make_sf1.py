"""Generate sf1 parquet by replicating the driver's sf0.1 fixtures 10x with
key offsets, preserving join cardinality ratios (each replica's orders point
at that replica's customers, etc.). Timing-only data for the BASELINE.md
scale-up measurement — correctness certification stays on the driver's own
sf0.01 fixtures.

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [replicas]
Defaults: /root/testdata/sf0.1 -> ./testdata_sf1 (gitignored), 10 replicas.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
)
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-table key columns to offset per replica (column -> stride table)
OFFSETS: dict[str, dict[str, str]] = {
    "lineitem": {"l_orderkey": "orders"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_ONLY = ("region", "nation")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # stride per key domain: max+1 of the owning table's key at source scale
    stride = {
        "orders": con.execute(
            f"SELECT MAX(o_orderkey)+1 FROM read_parquet('{SRC}/orders.parquet')"
        ).fetchone()[0],
        "customer": con.execute(
            f"SELECT MAX(c_custkey)+1 FROM read_parquet('{SRC}/customer.parquet')"
        ).fetchone()[0],
        "supplier": con.execute(
            f"SELECT MAX(s_suppkey)+1 FROM read_parquet('{SRC}/supplier.parquet')"
        ).fetchone()[0],
        "part": con.execute(
            f"SELECT MAX(p_partkey)+1 FROM read_parquet('{SRC}/part.parquet')"
        ).fetchone()[0],
        "events": con.execute(
            f"SELECT MAX(event_id)+1 FROM read_parquet('{SRC}/events.parquet')"
        ).fetchone()[0],
        "events_user": con.execute(
            f"SELECT MAX(user_id)+1 FROM read_parquet('{SRC}/events.parquet')"
        ).fetchone()[0],
        "documents": con.execute(
            f"SELECT MAX(doc_id)+1 FROM read_parquet('{SRC}/documents.parquet')"
        ).fetchone()[0],
        "embeddings": con.execute(
            f"SELECT MAX(vec_id)+1 FROM read_parquet('{SRC}/embeddings.parquet')"
        ).fetchone()[0],
    }
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keys in OFFSETS.items():
        cols = con.execute(
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0"
        ).df().columns.tolist()
        sel = ", ".join(
            f"{c} + r.i * {stride[keys[c]]} AS {c}" if c in keys else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT UNNEST(generate_series(0, {REPLICAS - 1})) AS i) r) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
