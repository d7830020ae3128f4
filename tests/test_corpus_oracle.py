"""Differential oracle over the whole corpus (SURVEY.md §5.2) at sf0.001.

Each corpus entry runs through the full KQL pipeline AND its DuckDB twin
with the DRIVER-STRICT comparator from tools/oracle_check.py (round 6):
both sides fetched through pandas (toPandas / rel.df()) so oracle
DECIMAL/HUGEINT collapse to float64 while engine Decimals stay tagged,
tz-awareness and int-vs-float mismatch FAIL, ordered column names, floats
at 9 significant digits. This makes every pytest run a full-corpus
replica of the driver's certification — twin type bugs can no longer
hide behind a laxer local gate.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from kql_engine_spark.corpus import CORPUS

from oracle_check import canonize

ENTRIES = sorted(CORPUS.items())


@pytest.mark.parametrize("name", [n for n, _ in ENTRIES])
def test_corpus_entry(name, run_kql, duck):
    kql_text, sql = CORPUS[name]
    sdf = run_kql(kql_text)
    # Driver-comparator shape invariant (round 11): the driver canonicalizes
    # by sorting the pandas frame, which cannot hash list/dict cells — a raw
    # ArrayType/MapType/StructType output column turns a correct answer into
    # an `err` row (CORRECTNESS_r10's three reds). Corpus entries must
    # tostring() complex outputs.
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"corpus entry {name} returns complex-typed columns {complex_cols}; "
        "wrap them in tostring() so the driver comparator can hash them"
    )
    scols = sdf.columns
    spdf = sdf.toPandas()
    if sql is None:
        # rows-only contract: runs, stable schema, deterministic row count
        again = run_kql(kql_text)
        assert again.columns == scols
        assert len(again.toPandas()) == len(spdf)
        return
    rel = duck.sql(sql)
    dcols = rel.columns
    dpdf = rel.df()
    assert list(scols) == list(dcols), f"columns: {scols} vs {dcols}"
    assert len(spdf) == len(dpdf), f"rowcount: {len(spdf)} vs {len(dpdf)}"
    cs = canonize(scols, spdf)
    cd = canonize(dcols, dpdf)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        pytest.fail(f"values differ, first diffs: {diffs}")
