"""Regenerate __spark_entry__._NEVER_CERTIFIED from CORRECTNESS_r*.json.

The driver certifies a 50-entry prefix of queries() per round; exporting
never-yet-certified entries first converges the rotation. Run from the
repo root after a new CORRECTNESS_r{N}.json lands and paste the printed
tuple into __spark_entry__.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kql_engine_spark.corpus import CORPUS  # noqa: E402


def main() -> None:
    # certified = appeared in a prefix AND passed all three gates; a row
    # that errored or mismatched must be re-exported, not counted covered
    certified: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                certified.add(name)
    never = [n for n in CORPUS if n not in certified]
    print(f"# {len(never)} never-certified of {len(CORPUS)}")
    print("_NEVER_CERTIFIED = (")
    for i in range(0, len(never), 3):
        print("    " + " ".join(f'"{n}",' for n in never[i : i + 3]))
    print(")")


if __name__ == "__main__":
    main()
