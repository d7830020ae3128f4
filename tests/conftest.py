from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("KQL_TEST_SF_DIR", "/root/testdata/sf0.001")

# The test corpus is trusted repo content: opt in to the (default-off)
# evaluate python(...) plugin so its corpus entry is exercisable.
os.environ.setdefault("KQL_ENGINE_ENABLE_PYTHON_PLUGIN", "1")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon_cell(v) -> str:
    import datetime as dt
    import decimal
    import math

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


def canonize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_rows_close(got, want, tol):
    """Compare two canonize_rows outputs, tolerating per-cell float deltas
    up to `tol`. For laws where both sides apply round(x, k): the engine and
    the oracle can land on opposite sides of a half-ulp tie, differing by
    exactly 10^-k — a rounding artifact, not a semantics bug. Pairing is by
    sorted canonical order, which is stable as long as the group keys (exact
    cells) dominate the sort; fuzz laws keep keys exact for that reason."""
    assert len(got) == len(want), f"rowcount {len(got)} != {len(want)}"
    for rg, rw in zip(got, want):
        assert len(rg) == len(rw), f"width {rg} vs {rw}"
        for a, b in zip(rg, rw):
            if a == b:
                continue
            try:
                fa, fb = float(a), float(b)
            except ValueError:
                raise AssertionError(f"cell {a!r} != {b!r} in {rg} vs {rw}")
            assert abs(fa - fb) <= tol, f"cell {a} vs {b} beyond tol={tol}"


@pytest.fixture(scope="session")
def spark():
    from kql_engine_spark.session import get_spark

    s = get_spark("kql-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def run_kql(spark):
    from kql_engine_spark.translator import kql

    def run(text: str):
        return kql(spark, text, sf_dir=SF_DIR)

    return run
