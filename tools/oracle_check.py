"""Local replica of the driver's correctness gate: run each corpus entry
through the Spark engine AND its DuckDB oracle, compare ordered column
names, row-count, and an order-insensitive canonical multiset.

Driver-faithful fetch paths (round-6 hardening): BOTH sides go through
pandas — `sdf.toPandas()` for the engine, `rel.df()` for the oracle —
because that is how the driver reads results. This reproduces the
driver's type observations exactly:
  * DuckDB DECIMAL and HUGEINT collapse to float64 on the oracle side,
    so an engine BIGINT vs an oracle SUM(BIGINT) is an int-vs-float
    mismatch ("32" vs "32.0"), as the driver sees it;
  * Spark DecimalType survives toPandas() as Decimal objects and is
    tagged distinctly ("dec:") — it does NOT silently equal float64;
  * DuckDB TIMESTAMPTZ comes back tz-aware and fails against the
    engine's naive-UTC timestamps (the driver's schema_match failure);
  * integer WIDTH (int32 vs int64) and ns-vs-us timestamps still
    compare equal (driver-tolerated per r4/r5 evidence).

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
    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if bool(v) else "false"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
        )
    # scalar NA (None/NaN/NaT) — pandas collapses SQL NULL in a float
    # column to NaN on BOTH fetch paths, so NULL and NaN canonize alike
    try:
        if pd.isna(v):
            if isinstance(v, (float, np.floating)):
                return "nan"
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (float, np.floating)):
        # floats keep a decimal-point marker so 32.0 != 32, as in the
        # driver's stringified hash
        f = float(v)
        if f == 0:
            return "0.0"
        s = f"{f:.9g}"
        if "." not in s and "e" not in s and "inf" not in s:
            s += ".0"
        return s
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        # only the ENGINE side can produce Decimal objects (Spark
        # DecimalType via toPandas); the oracle's DECIMALs became float64
        # in rel.df(). Tag them so the delta is visible locally.
        return "dec:" + f"{float(v):.9g}"
    if isinstance(v, pd.Timestamp):
        # µs-floor (ns-vs-µs driver-tolerated); KEEP tz-awareness — a
        # TIMESTAMPTZ oracle vs naive engine must fail here
        return v.floor("us").isoformat()
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (dt.timedelta, pd.Timedelta, np.timedelta64)):
        td = pd.Timedelta(v)
        return f"{td.total_seconds()}s"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def canonize(cols: list[str], df) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = df.to_numpy(dtype=object)
    out = [tuple(canon_cell(r[i]) for i in order) for r in mat]
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
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(spdf)} rows)")
            n_skip += 1
            continue
        try:
            rel = con.sql(sql)
            dcols = rel.columns
            dpdf = rel.df()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        problems = []
        if list(scols) != list(dcols):
            # driver-strict: ordered column-name equality
            problems.append(f"columns spark={list(scols)} duck={list(dcols)}")
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        if not problems:
            cs = canonize(scols, spdf)
            cd = canonize(dcols, dpdf)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
