"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Every entry routes through the full KQL pipeline — lexer -> parser ->
AST -> PySpark DataFrame translation (kql_engine_spark/translator.py) —
so a green row certifies the whole stack for that operator, not just a
hand-built DataFrame. The corpus itself lives in
kql_engine_spark/corpus.py (shared with tests/ and bench.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The corpus below is trusted repo content; opt in to the (default-off)
# `evaluate python(...)` plugin so its corpus entry runs under the driver.
os.environ.setdefault("KQL_ENGINE_ENABLE_PYTHON_PLUGIN", "1")
# Rotation note (round 12): the last 17 never-certified entries went green
# in CORRECTNESS_r12 -> cumulative 313/313; _rotation_order() below now
# orders by certification AGE instead of a hardcoded never-certified list.

from kql_engine_spark.corpus import CORPUS, FLAGSHIP  # noqa: E402


def _ensure_engine_confs(spark: SparkSession) -> None:
    """The engine's semantic contract (SURVEY.md §4.3) on a session we did
    not build: UTC timestamps (KQL datetimes are UTC; a local-tz session
    would shift collected values vs the DuckDB oracle) and ANSI off (KQL
    conversions are null-on-failure). Both are runtime-settable."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def _runner(kql_text: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from kql_engine_spark.translator import kql

        _ensure_engine_confs(spark)
        return kql(spark, kql_text, sf_dir=sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 in KQL) on /root/testdata/sf0.001."""
    from kql_engine_spark.translator import kql

    _ensure_engine_confs(spark)
    return kql(spark, FLAGSHIP, sf_dir="/root/testdata/sf0.001")


# Driver-certification rotation (round 12): the driver certifies a
# 50-entry prefix of queries() per round. These 17 entries have never
# appeared in a CORRECTNESS_r{N} prefix (all green locally at the
# identical comparator); exporting them FIRST converges the rotation
# to cumulative 313/313. Regenerated via tools/rotation_order.py from
# CORRECTNESS_r01..r11 (+ the two new round-12 entries).
def _rotation_order() -> list[str]:
    """Driver-certification rotation (round 13): every corpus entry has
    been driver-certified at least once (cumulative 313/313 over
    CORRECTNESS_r1..r12), so the rotation now optimizes FRESHNESS — the
    driver certifies a 50-entry prefix per round, and entries whose last
    green certification is OLDEST lead (r3/r4-era entries predate the
    split-distinct, bloom-join, AQE-probe and small-plan rewrites of the
    engine underneath them). Computed from the committed
    CORRECTNESS_r*.json records next to this file; never-certified (new)
    entries sort first; ties break in corpus order. Self-maintaining:
    each round's new CORRECTNESS file pushes its 50 entries to the back.
    """
    last = _last_certified()
    pos = {n: i for i, n in enumerate(CORPUS)}
    return sorted(CORPUS, key=lambda n: (last.get(n, -1), pos[n]))


def _last_certified() -> dict[str, int]:
    """name -> newest round whose CORRECTNESS_r{N}.json certified it
    (all three gates green). Single source of truth for the rotation;
    tools/rotation_order.py reports from the same map."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(f) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, least-
    recently-driver-certified entries first (see _rotation_order)."""
    return {name: _runner(CORPUS[name][0]) for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each corpus entry that is SQL-expressible."""
    return {
        name: CORPUS[name][1]
        for name in _rotation_order()
        if CORPUS[name][1] is not None
    }
