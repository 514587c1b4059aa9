"""r9 per-task-work rewrite of the Arrow fingerprint passes (guide §4.2).

``dedup._span_fingerprint_batches`` and ``dedup._winnow_fp_batches``
replaced their per-doc NumPy loops (measured 78% of the span pass at
sf0.1 — ~130 µs/doc of call overhead) with whole-batch vectorized
folds: one sliding view over the concatenated token/gram hashes with
doc-boundary masking, plus one lexsort-dedup for the per-doc distinct.

These tests pin the rewrite to a straightforward per-doc REFERENCE
implementation (the shape of the pre-r9 loop): every output row, its
dtype, and the row ORDER must be bit-identical, because downstream
pair counts (q31/q42/q61/q67/q113/q118/q128/q148/q171) and the DuckDB
oracles replay the exact fingerprint semantics.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest
from numpy.lib.stride_tricks import sliding_window_view

from bloomy_etl_spark.operators import dedup as D

_WS = re.compile(r"[ \t\n\r\f\v]+")
_M64 = (1 << 64) - 1
_IMULT = 0x9E3779B97F4A7C15


def _h64(tok: str) -> np.uint64:
    return np.frombuffer(
        hashlib.blake2b(tok.encode(), digest_size=8).digest(),
        dtype=np.uint64,
    )[0]


def _span_reference(pdf: pd.DataFrame, span: int, with_counts: bool):
    """Per-doc loop reference — the pre-r9 implementation, verbatim
    semantics: blake2b-8 token hashes, positional-multiplier window
    fold + avalanche, masked-int Horner for < span-token docs, sorted
    per-doc distinct."""
    mults = np.array(
        [((_IMULT * (k + 1)) & _M64) | 1 for k in range(span)],
        dtype=np.uint64,
    )
    mult = np.uint64(_IMULT)
    ids = pdf["doc_id"].to_numpy()
    per_doc = []
    for txt in pdf["text"].fillna(""):
        toks = _WS.split(txt)
        th = np.array([_h64(t) for t in toks], dtype=np.uint64)
        if len(th) < span:
            acc = int(th[0])
            for x in th[1:]:
                acc = (acc * _IMULT + int(x)) & _M64
            fps = np.array([acc], dtype=np.uint64)
        else:
            w = sliding_window_view(th, span)
            fps = (w * mults).sum(axis=1, dtype=np.uint64)
            fps ^= fps >> np.uint64(33)
            fps *= mult
            fps ^= fps >> np.uint64(29)
        per_doc.append(np.unique(fps))
    counts = [len(f) for f in per_doc]
    if not per_doc or sum(counts) == 0:
        out = {"doc_id": pdf["doc_id"].iloc[:0]}
        if with_counts:
            out["n_sh"] = pd.Series([], dtype="int32")
        out["span"] = pd.Series([], dtype="int64")
        return pd.DataFrame(out)
    out = {"doc_id": np.repeat(ids, counts)}
    if with_counts:
        out["n_sh"] = np.repeat(np.asarray(counts, dtype=np.int32), counts)
    out["span"] = np.concatenate(per_doc).view(np.int64)
    return pd.DataFrame(out)


def _winnow_reference(pdf: pd.DataFrame, k: int, window: int):
    ids = pdf["doc_id"].to_numpy()
    per_doc = []
    for txt in pdf["text"].fillna(""):
        toks = _WS.split(txt)
        if len(toks) >= k:
            grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        else:
            grams = [" ".join(toks)]
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
                for g in grams
            ),
            dtype=np.uint64,
            count=len(grams),
        )
        if len(hs) >= window:
            sel = sliding_window_view(hs, window).min(axis=1)
        else:
            sel = hs.min(keepdims=True)
        per_doc.append(np.unique(sel))
    counts = [len(f) for f in per_doc]
    if not per_doc or sum(counts) == 0:
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"].iloc[:0],
             "fp": pd.Series([], dtype="int64")}
        )
    return pd.DataFrame(
        {"doc_id": np.repeat(ids, counts),
         "fp": np.concatenate(per_doc).view(np.int64)}
    )


_EDGE = pd.DataFrame(
    {
        "doc_id": np.arange(14, dtype=np.int64),
        "text": [
            "",                      # empty -> one '' token
            "   ",                   # whitespace-only -> ['', '']
            "a",                     # single token, below any span
            "a b",
            "a b c",                 # == span 3 exactly
            "a b c d e f g h i j",   # long
            "a  b\t c\nd\fe\vf",     # every ASCII ws class
            None,                    # NULL text
            "x " * 300,              # one dominating repeated token
            "a b a b a b a b",       # repeating windows -> dedup inside doc
            "  nbsp stays in token",  # NBSP not a separator
            "q w e r t y u i o p",
            "same same same",
            "tail space ",
        ],
    }
)


def _rand_frame(seed: int, n_docs: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"t{i}" for i in range(40)])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 60)))
        for _ in range(n_docs)
    ]
    return pd.DataFrame(
        {"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts}
    )


class TestSpanFingerprintVectorized:
    @pytest.mark.parametrize("span", [1, 2, 3, 8])
    @pytest.mark.parametrize("with_counts", [True, False])
    def test_bit_identical_to_reference(self, span, with_counts):
        for frame in (_EDGE, _rand_frame(span, 200), _EDGE.iloc[:0]):
            got = list(
                D._span_fingerprint_batches(span, with_counts=with_counts)(
                    [frame]
                )
            )
            assert len(got) == 1
            got = got[0].reset_index(drop=True)
            ref = _span_reference(frame, span, with_counts).reset_index(
                drop=True
            )
            assert list(got.columns) == list(ref.columns)
            assert got.equals(ref), (span, with_counts, got.compare(ref))

    def test_multi_batch_stream(self):
        gen = D._span_fingerprint_batches(3, with_counts=True)
        frames = [_EDGE, _rand_frame(7, 50), _EDGE.iloc[:0]]
        outs = list(gen(iter(frames)))
        assert len(outs) == len(frames)
        for frame, out in zip(frames, outs):
            ref = _span_reference(frame, 3, True)
            assert out.reset_index(drop=True).equals(
                ref.reset_index(drop=True)
            )


class TestWinnowVectorized:
    @pytest.mark.parametrize("k,window", [(5, 4), (2, 3), (1, 1), (3, 7)])
    def test_bit_identical_to_reference(self, k, window):
        for frame in (_EDGE, _rand_frame(k * 10 + window, 200),
                      _EDGE.iloc[:0]):
            got = list(D._winnow_fp_batches(k, window)([frame]))
            assert len(got) == 1
            got = got[0].reset_index(drop=True)
            ref = _winnow_reference(frame, k, window).reset_index(drop=True)
            assert list(got.columns) == list(ref.columns)
            assert got.equals(ref), (k, window, got.compare(ref))
