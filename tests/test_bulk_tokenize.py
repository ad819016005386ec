"""Differential pins for the bulk batch tokenizers (stages/dedup.py
``batch_words`` / ``batch_split_ws``) against the per-doc reference
semantics they replaced in the doc-query partials:

- ``batch_words``  ≡ ``_WORD_RE.findall((t or '').lower())`` per row
- ``batch_split_ws`` ≡ ``[w for w in (t or '').split(' ') if w]`` per row

Ray-free (pure kernel tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pycatcher_ray.stages.dedup import (
    _WORD_RE,
    batch_split_ws,
    batch_words,
)

TRICKY = [
    "",
    " ",
    "   ",
    None,
    "plain words here",
    "double  space",
    " leading and trailing ",
    "punct! don't stop-now; really?",
    "UPPER Mixed lower",
    "unicode café naïve — ☃ snow",
    "tabs\tand\nnewlines keep",
    "a",
    "'quoted' words' edge'",
    "numbers 123 mix3d w0rds_under",
]


def _rows_words(texts, lower=True):
    out_w, out_i = [], []
    for i, t in enumerate(texts):
        ws = (_WORD_RE.findall((t or "").lower()) if lower
              else _WORD_RE.findall(t or ""))
        out_w.extend(ws)
        out_i.extend([i] * len(ws))
    return out_w, out_i


def _rows_split(texts):
    out_w, out_i = [], []
    for i, t in enumerate(texts):
        ws = [w for w in (t or "").split(" ") if w]
        out_w.extend(ws)
        out_i.extend([i] * len(ws))
    return out_w, out_i


def test_batch_words_matches_per_row_reference():
    for lower in (True, False):
        w, idx = batch_words(pd.Series(TRICKY, dtype=object), lower=lower)
        rw, ri = _rows_words(TRICKY, lower=lower)
        assert list(w) == rw
        assert list(idx) == ri


def test_batch_split_ws_matches_per_row_reference():
    w, idx = batch_split_ws(pd.Series(TRICKY, dtype=object))
    rw, ri = _rows_split(TRICKY)
    assert list(w) == rw
    assert list(idx) == ri


def test_empty_batch():
    for fn in (batch_words, batch_split_ws):
        w, idx = fn(pd.Series([], dtype=object))
        assert w.size == 0 and idx.size == 0
        assert idx.dtype == np.int64 or idx.dtype == np.intp


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.text(alphabet=st.characters(codec="utf-8",
                                   exclude_characters="\x00"),
            max_size=40)),
    max_size=12))
def test_batch_words_fuzz(texts):
    series = pd.Series(texts, dtype=object)
    w, idx = batch_words(series)
    rw, ri = _rows_words(texts)
    assert list(w) == rw
    assert list(idx) == ri


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.text(alphabet=st.characters(codec="utf-8",
                                   exclude_characters="\x00"),
            max_size=40)),
    max_size=12))
def test_batch_split_ws_fuzz(texts):
    series = pd.Series(texts, dtype=object)
    w, idx = batch_split_ws(series)
    rw, ri = _rows_split(texts)
    assert list(w) == rw
    assert list(idx) == ri
