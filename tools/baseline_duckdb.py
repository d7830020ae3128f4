"""Measure the DuckDB side of BASELINE.md: median wall-clock per B1-B10
oracle SQL at a given sf dir (default sf0.1). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kql_engine_spark.corpus import BENCH_QUERIES, CORPUS  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    timings = {}
    for bench_id, corpus_name in BENCH_QUERIES.items():
        sql = CORPUS[corpus_name][1]
        con.sql(sql).fetchall()  # warm-up
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[bench_id] = round(statistics.median(runs), 4)
    print(json.dumps({"duckdb_median_sec": timings, "sf_dir": sf_dir,
                      "total": round(sum(timings.values()), 4)}))


if __name__ == "__main__":
    main()
