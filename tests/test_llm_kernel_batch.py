"""The round-17 batched gram/minhash kernel must be bit-identical to the
r5-r16 row-wise kernel it replaced.

_jaccard_feature_udf feeds every dedup-family op, decontaminate and the
minhash index stores; its hashes are certified transitively through their
DuckDB twins, so the batch rewrite (one unit stream per ~1k-doc sub-block,
lexsort + reduceat per-doc reductions, in-place splitmix buffers) must not
change ONE bit. This test freezes the row-wise implementation verbatim and
compares gh/bands/ngh across every caller configuration on adversarial and
randomized documents. The same differential ran over all 500k sf10
documents during the round (OPTIMIZATION_r17.md) — this pins the edge
geometry permanently.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from kql_engine_spark.extensions.llm import (
    _jaccard_feature_udf,
    _np_hash_helpers,
)


def _rowwise_reference(n, n_bands, rows_per_band, mode="char",
                       short_gram=True, extra_n=None):
    """The pre-round-17 per-row kernel, frozen (do not 'fix' or optimize:
    it is the semantic golden master the batch kernel must reproduce)."""

    def feat(texts):
        nperm = n_bands * rows_per_band
        seeds = np.empty(nperm, dtype=np.uint64)
        x = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            for i in range(nperm):
                x = x + np.uint64(0x9E3779B97F4A7C15)
                z = x
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                seeds[i] = z ^ (z >> np.uint64(31))
            powers = np.power(
                np.uint64(1099511628211), np.arange(n, dtype=np.uint64)
            )
            epowers = (
                np.power(np.uint64(1099511628211),
                         np.arange(extra_n, dtype=np.uint64))
                if extra_n is not None else None
            )
        ghs, bandss, nghs = [], [], []
        mix, token_hashes = _np_hash_helpers()
        with np.errstate(over="ignore"):
            for s in texts:
                s = "" if s is None else str(s).strip()
                if not s and mode != "token":
                    ghs.append(None)
                    bandss.append(None)
                    continue
                if mode == "token":
                    cp = token_hashes(
                        np.frombuffer(
                            s.lower().encode("utf-32-le"), dtype="<u4"
                        ).astype(np.uint64)
                    )
                    if len(cp) == 0:
                        cp = np.zeros(1, dtype=np.uint64)
                else:
                    cp = np.frombuffer(
                        s.encode("utf-32-le"), dtype="<u4"
                    ).astype(np.uint64)
                if extra_n is not None:
                    if len(cp) >= extra_n:
                        winx = np.lib.stride_tricks.sliding_window_view(
                            cp, extra_n
                        )
                        nghs.append(
                            np.unique(
                                (winx * epowers[None, :]).sum(axis=1)
                            ).astype(np.int64)
                        )
                    else:
                        nghs.append(np.empty(0, dtype=np.int64))
                if len(cp) >= n:
                    win = np.lib.stride_tricks.sliding_window_view(cp, n)
                    gh = np.unique((win * powers[None, :]).sum(axis=1))
                elif short_gram:
                    gh = (cp * powers[: len(cp)]).sum(keepdims=True)
                else:
                    ghs.append(np.empty(0, dtype=np.int64))
                    bandss.append(None)
                    continue
                mins = mix(gh[:, None] ^ seeds[None, :]).min(axis=0)
                bm = mins.reshape(n_bands, rows_per_band)
                bands = bm[:, 0].copy()
                for r in range(1, rows_per_band):
                    bands = bands * np.uint64(1099511628211) + bm[:, r]
                ghs.append(gh.astype(np.int64))
                bandss.append(bands.astype(np.int64))
        out = {"gh": ghs, "bands": bandss}
        if extra_n is not None:
            out["ngh"] = nghs
        return pd.DataFrame(out)

    return feat


EDGE_DOCS = [
    None, "", "   ", "\t\n \x0b\x0c\r", "a", "a b", "a b c", "a b c d",
    "ONE two THREE four five", "x" * 300, ("tok " * 90).strip(),
    " nbsp is-not-split", "Σα ΤΕΛΟΣ", "café CAFÉ naïve",
    "emoji \U0001F600 mix \U0001F600 tail", "same same same",
    "1 2 3 1 2 3", "\x00nul byte", "tab\tsep\ttoks",
    "multi\n\nline\ndoc body", "word", "word word", "中文 文中 中文 词",
    " leading and trailing  ", "a  double  spaces  b",
]

CONFIGS = [
    dict(n=3, n_bands=24, rows_per_band=10, mode="token"),
    dict(n=3, n_bands=30, rows_per_band=6, mode="token", extra_n=13),
    dict(n=3, n_bands=40, rows_per_band=4, mode="token", extra_n=1),
    dict(n=5, n_bands=20, rows_per_band=5, mode="char"),
    dict(n=2, n_bands=20, rows_per_band=5, mode="char"),
    dict(n=7, n_bands=1, rows_per_band=1, mode="token", short_gram=False),
]


def _random_docs(rng, count):
    vocab = ["the", "quick", "Σ", "émü", "a", "bb", "ccc", "データ", "x1",
             "tok-en", "..", "🙂"]
    docs = []
    for _ in range(count):
        ln = int(rng.integers(0, 40))
        sep = rng.choice([" ", "  ", "\t", "\n"], size=max(ln, 1))
        words = rng.choice(vocab, size=ln)
        docs.append("".join(w + s for w, s in zip(words, sep)))
    return docs


def _assert_identical(ref_df, new_df, cfg):
    assert list(ref_df.columns) == list(new_df.columns)
    for col in ref_df.columns:
        for i, (x, y) in enumerate(zip(ref_df[col], new_df[col])):
            if x is None or y is None:
                assert x is None and y is None, (cfg, col, i)
                continue
            xa, ya = np.asarray(x), np.asarray(y)
            assert xa.dtype == ya.dtype, (cfg, col, i, xa.dtype, ya.dtype)
            assert xa.shape == ya.shape and bool((xa == ya).all()), (
                cfg, col, i)


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: str(sorted(c.items())))
def test_batch_kernel_bit_identical(spark, cfg):
    # `spark` fixture: pandas_udf construction needs an active session;
    # .func unwraps to the raw batch function
    new = _jaccard_feature_udf(**cfg).func
    ref = _rowwise_reference(**cfg)
    rng = np.random.default_rng(20240317)
    docs = pd.Series(EDGE_DOCS + _random_docs(rng, 400), dtype="object")
    _assert_identical(ref(docs), new(docs), cfg)


def test_batch_kernel_sub_block_seams(spark):
    # documents straddling the SUB=1024 sub-block boundary must hash
    # exactly as a single-block run: compare a 1100-doc series against
    # itself shifted so the same docs land in different blocks
    cfg = dict(n=3, n_bands=24, rows_per_band=10, mode="token")
    new = _jaccard_feature_udf(**cfg).func
    rng = np.random.default_rng(7)
    docs = pd.Series(_random_docs(rng, 1100), dtype="object")
    whole = new(docs)
    shifted = new(pd.Series(list(docs[900:]) + list(docs[:900]),
                            dtype="object"))
    # doc 900+i in `whole` is doc i in `shifted`
    for i in range(len(docs) - 900):
        a, b = whole["bands"][900 + i], shifted["bands"][i]
        if a is None or b is None:
            assert a is None and b is None
        else:
            assert (np.asarray(a) == np.asarray(b)).all()
