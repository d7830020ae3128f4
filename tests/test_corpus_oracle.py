"""Differential oracle over the whole corpus (SURVEY.md §5.2) at sf0.001.

Each corpus entry runs through the full KQL pipeline AND its DuckDB twin;
results must agree on column names, row count, and canonical multiset
(columns sorted by name, floats at 9 significant digits) — the same compare
the driver's correctness gate performs at sf0.01.
"""

from __future__ import annotations

import pytest

from kql_engine_spark.corpus import CORPUS

from conftest import canonize_rows

ENTRIES = sorted(CORPUS.items())


@pytest.mark.parametrize("name", [n for n, _ in ENTRIES])
def test_corpus_entry(name, run_kql, duck):
    kql_text, sql = CORPUS[name]
    sdf = run_kql(kql_text)
    scols = sdf.columns
    srows = [[r[c] for c in scols] for r in sdf.collect()]
    if sql is None:
        # rows-only contract: runs, stable schema, deterministic row count
        again = run_kql(kql_text)
        assert again.columns == scols
        assert len(again.collect()) == len(srows)
        return
    rel = duck.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), f"columns: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount: {len(srows)} vs {len(drows)}"
    assert canonize_rows(scols, srows) == canonize_rows(dcols, drows)
