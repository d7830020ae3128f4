"""Local replica of the driver's correctness gate: run each corpus entry
through the Spark engine AND its DuckDB oracle, compare row-count, column
names, and an order-insensitive canonical multiset (columns sorted by name,
floats at 9 significant digits).

Usage: python tools/oracle_check.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return canon_cell(float(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.timedelta):
        return f"{v.total_seconds()}s"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canonize(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    # trusted repo corpus: opt in to the default-off python plugin entry
    os.environ.setdefault("KQL_ENGINE_ENABLE_PYTHON_PLUGIN", "1")

    import duckdb

    from kql_engine_spark.corpus import CORPUS
    from kql_engine_spark.session import get_spark
    from kql_engine_spark.translator import kql

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_skip = 0
    for name, (kql_text, sql) in CORPUS.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            sdf = kql(spark, kql_text, sf_dir=sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(srows)} rows)")
            n_skip += 1
            continue
        try:
            rel = con.sql(sql)
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            cs = canonize(scols, [[r[c] for c in scols] for r in srows])
            cd = canonize(dcols, drows)
            if cs != cd:
                diffs = [
                    (a, b) for a, b in zip(cs, cd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
