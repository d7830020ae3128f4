"""The round-17 batched repetition-metrics kernel must be bit-identical
to the round-14 row-wise kernel it replaced.

_repetition_metrics_udf computes all 13 raw Gopher repetition fractions
for repetition_filter; its doubles are certified transitively through the
DuckDB twin (rounding/capping stays column-side). The batch rewrite
(exact pd.factorize token ids, iterative packed-pair gram densification,
reduceat per-doc scoring, 2048-doc sub-blocks) must not change ONE bit.
This test freezes the row-wise implementation verbatim and compares all
13 fields (NaN-aware) on adversarial and randomized documents, plus a
sub-block seam shift. The same differential ran over all 500k sf10
documents during the round (OPTIMIZATION_r17.md).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from kql_engine_spark.extensions.llm import _repetition_metrics_udf

FIELDS = ("dlf", "dlcf", "dpf", "dpcf", "t2", "t3", "t4",
          "d5", "d6", "d7", "d8", "d9", "d10")


def _rowwise_reference(texts):
    """The pre-round-17 per-row kernel, frozen (do not 'fix' or optimize:
    it is the semantic golden master the batch kernel must reproduce)."""
    import re
    from collections import Counter

    ws = re.compile(r"\s+", re.ASCII)
    para_re = re.compile(r"\n\s*\n", re.ASCII)
    rows = {f: [] for f in FIELDS}

    def elem_stats(parts):
        vals = [v for v in (p.strip(" ") for p in parts) if v]
        cnt = Counter(vals)
        total = float(sum(len(v) * c for v, c in cnt.items()))
        extra_items = float(len(vals) - len(cnt))
        extra_chars = float(sum((c - 1) * len(v) for v, c in cnt.items()))
        return (extra_items / max(len(vals), 1.0),
                extra_chars / max(total, 1.0))

    for raw in texts:
        if raw is None:
            for f in FIELDS:
                rows[f].append(None)
            continue
        src = raw.strip(" ")
        dc = float(max(len(src), 1))
        dlf, dlcf = elem_stats(src.split("\n"))
        dpf, dpcf = elem_stats(para_re.split(src))
        rows["dlf"].append(dlf)
        rows["dlcf"].append(dlcf)
        rows["dpf"].append(dpf)
        rows["dpcf"].append(dpcf)
        toks = [t for t in ws.split(src.lower()) if t]
        lens = [len(t) for t in toks]
        for n in range(2, 11):
            m = len(toks) - n + 1
            fname = f"t{n}" if n < 5 else f"d{n}"
            if m <= 0:
                rows[fname].append(0.0)
                continue
            cnt: Counter = Counter()
            glen: dict = {}
            cur = sum(lens[:n]) + (n - 1)
            for i in range(m):
                if i:
                    cur += lens[i + n - 1] - lens[i - 1]
                g = tuple(toks[i:i + n])
                cnt[g] += 1
                glen[g] = cur
            if n < 5:
                top = max(cnt.values())
                if top > 1:
                    score = top * max(glen[g] for g, c in cnt.items()
                                      if c == top)
                    rows[fname].append(score / dc)
                else:
                    rows[fname].append(0.0)
            else:
                dup = float(sum(c * glen[g] for g, c in cnt.items()
                                if c > 1))
                rows[fname].append(dup / dc)
    return pd.DataFrame(rows)


EDGE_DOCS = [
    None, "", "   ", " x ", "a", "a a", "a a a", ("a " * 30).strip(),
    "one two one two one two", "x\nx\nx\ny", "p1\n\np1\n\np2",
    "l1\nl1 \n l1\nl2", "tab\ttab\ttab", "A a A a",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
    "short", "\n\n\n", "a\n\nb\n\nc", "same same same same same",
    "Σα Σα Σα unicode", "中文 中文 中文", ". . . . . . . . . . . .",
    ("the quick brown fox " * 8).strip(), "x" * 3000,
    ("ab " * 500).strip(), "a  double  spaces  b",
    "mixed CASE Mixed case mixed CASE",
]


def _random_docs(rng, count):
    vocab = ["the", "a", "of", "and", "Σ", "émü", "bb", "ccc", "データ",
             "x1", "tok-en", "..", "🙂", "重复"]
    docs = []
    for _ in range(count):
        ln = int(rng.integers(0, 60))
        words = rng.choice(vocab, size=max(ln, 1))
        sep = rng.choice([" ", "  ", "\t", "\n", "\n\n"], size=max(ln, 1))
        doc = "".join(w + s for w, s in zip(words, sep))
        # bias in real repetition so the >1-count paths are exercised
        if ln and rng.integers(0, 3) == 0:
            doc = doc + " " + doc
        docs.append(doc)
    return docs


def _assert_identical(ref_df, new_df):
    assert list(ref_df.columns) == list(new_df.columns)
    for col in ref_df.columns:
        va = ref_df[col].to_numpy(dtype=np.float64)
        vb = new_df[col].to_numpy(dtype=np.float64)
        same = (va == vb) | (np.isnan(va) & np.isnan(vb))
        assert bool(same.all()), (col, np.where(~same)[0][:5])


def test_rf_batch_kernel_bit_identical(spark):
    new = _repetition_metrics_udf().func
    rng = np.random.default_rng(20240317)
    docs = pd.Series(EDGE_DOCS + _random_docs(rng, 500), dtype="object")
    _assert_identical(_rowwise_reference(docs), new(docs))


def test_rf_batch_kernel_sub_block_seams(spark):
    # docs straddling the BLK=2048 sub-block boundary must score exactly
    # as in a different block position
    new = _repetition_metrics_udf().func
    rng = np.random.default_rng(7)
    docs = pd.Series(_random_docs(rng, 2200), dtype="object")
    whole = new(docs)
    shifted = new(pd.Series(list(docs[1900:]) + list(docs[:1900]),
                            dtype="object"))
    for col in FIELDS:
        a = whole[col].to_numpy(dtype=np.float64)[1900:]
        b = shifted[col].to_numpy(dtype=np.float64)[: len(docs) - 1900]
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert bool(same.all()), col
