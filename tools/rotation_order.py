"""Report the driver-certification rotation (freshness order).

Round 13: __spark_entry__._rotation_order() computes the order itself
(least-recently-certified first) from the committed CORRECTNESS_r*.json
records, so nothing needs to be pasted anywhere — this tool just PRINTS
the computed order with each entry's last-certified round, for sanity
checks and for the per-round BASELINE.md notes. The last-certified map
comes from the SAME implementation the rotation uses
(__spark_entry__._last_certified) so the report can never disagree with
the order the driver runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import _last_certified, _rotation_order  # noqa: E402


def main() -> None:
    last = _last_certified()
    order = _rotation_order()
    never = [n for n in order if n not in last]
    print(f"# {len(order)} corpus entries, {len(never)} never certified")
    print("# next driver prefix (first 50, with last-certified round):")
    for i, n in enumerate(order[:50]):
        print(f"  {i + 1:3d}. r{last.get(n, 0):<3d} {n}")
    from collections import Counter

    dist = Counter(last.get(n, 0) for n in order)
    print("# last-certified distribution:",
          dict(sorted(dist.items())))


if __name__ == "__main__":
    main()
