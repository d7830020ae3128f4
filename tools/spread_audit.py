"""Whole-corpus parse-spread decision audit (round 18).

Instruments _single_task_spread_point, translates every corpus entry at
the given SF dir, and prints which entries would spread (and at which op
index). Used to prove the round-18 gate changes leave the certified set
untouched: at sf0.01 exactly one entry spreads — extractjson_props (b7),
at op index 0, same as round 17.

Usage: python tools/spread_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import kql_engine_spark.translator as TR  # noqa: E402
from kql_engine_spark.corpus import CORPUS  # noqa: E402
from kql_engine_spark.session import get_spark  # noqa: E402
from kql_engine_spark.translator import kql  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    orig = TR._single_task_spread_point
    decisions: dict[str, list[int]] = {}
    current: list[str | None] = [None]

    def wrapper(ops, source_dtypes=None, plain_source=False):
        out = orig(ops, source_dtypes, plain_source)
        if out is not None and current[0] is not None:
            decisions.setdefault(current[0], []).append(out)
        return out

    TR._single_task_spread_point = wrapper
    spark = get_spark("spread-audit")
    errs: dict[str, str] = {}
    for name, entry in CORPUS.items():
        current[0] = name
        try:
            kql(spark, entry[0], sf_dir=sf)
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            errs[name] = f"{type(e).__name__}: {e}"[:120]
    current[0] = None
    print(json.dumps({"spreads": decisions, "translate_errors": errs},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
