"""Text-analysis operators for training-data pipelines (actor-pool stages).

Beyond the reference's scope (it has no text ops) but required of a
100 TB training-data engine: language-ID, quality scoring, token
counting, and document fingerprinting, each as a callable-class
``map_batches`` stage — regexes and stopword tables are compiled ONCE
per actor in ``__init__``, vectorized pandas/numpy work per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["TextStats", "LangId", "Fingerprint", "text_stats", "lang_id",
           "fingerprint"]

# compact stopword tables for the language heuristic (public common words)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
           "was", "with", "on", "as", "are", "this", "be", "at", "have"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "se", "por", "con", "para", "es", "del", "al", "como", "su"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "du",
           "que", "qui", "dans", "pour", "sur", "avec", "au", "ce", "il"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "den", "mit",
           "auf", "für", "ein", "eine", "nicht", "im", "des", "sich", "dem"},
}


class TextStats:
    """Quality-scoring features: lengths, punctuation/digit/stopword
    ratios, mean word length, and a composite quality score in [0, 1]."""

    def __init__(self):
        self.word_re = re.compile(r"[\w']+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.digit_re = re.compile(r"\d")
        self.en_stop = _STOPWORDS["en"]
        # BPE-ish pre-tokenizer: GPT-2-style contractions / word / number /
        # punctuation split (public pattern family)
        self.bpe_re = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?\d+| ?[^\sA-Za-z\d]+|\s+"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().astype("int64")
        words = text.map(self.word_re.findall)
        n_words = words.map(len).astype("int64")
        n_punct = text.map(lambda t: len(self.punct_re.findall(t)))
        n_digit = text.map(lambda t: len(self.digit_re.findall(t)))
        stop_ratio = words.map(
            lambda ws: sum(w.lower() in self.en_stop for w in ws) / max(1, len(ws))
        )
        mean_wlen = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
        )
        n_bpe = text.map(lambda t: sum(1 for m in self.bpe_re.finditer(t)
                                       if not m.group().isspace()))
        with np.errstate(divide="ignore", invalid="ignore"):
            punct_ratio = (n_punct / n_chars.clip(lower=1)).astype(float)
            digit_ratio = (n_digit / n_chars.clip(lower=1)).astype(float)
        # composite quality: long enough, low punct/digit noise, plausible
        # word lengths (C4/Gopher-style heuristic filters)
        length_ok = np.clip(n_words / 50.0, 0, 1)
        wlen_ok = np.exp(-0.5 * ((mean_wlen - 5.0) / 3.0) ** 2)
        quality = (
            0.4 * length_ok
            + 0.3 * (1 - np.clip(punct_ratio * 5, 0, 1))
            + 0.1 * (1 - np.clip(digit_ratio * 5, 0, 1))
            + 0.2 * wlen_ok
        )
        out = batch[[c for c in ("doc_id", "source", "lang") if c in batch]].copy()
        out["n_chars"] = n_chars
        out["n_words"] = n_words
        out["n_bpe_tokens"] = n_bpe.astype("int64")
        out["punct_ratio"] = punct_ratio.round(6)
        out["digit_ratio"] = digit_ratio.round(6)
        out["stopword_ratio"] = stop_ratio.astype(float).round(6)
        out["mean_word_len"] = mean_wlen.astype(float).round(6)
        out["quality_score"] = quality.astype(float).round(6)
        return out


class LangId:
    """Stopword + charset heuristic language ID with confidence."""

    def __init__(self):
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ가-힯]")

    def classify(self, text: str) -> tuple[str, float]:
        if not text:
            return "und", 0.0
        cjk = len(self.cjk_re.findall(text))
        if cjk > 0.2 * max(1, len(text)):
            return "zh", min(1.0, cjk / len(text) * 2)
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und", 0.0
        scores = {
            lang: sum(w in table for w in words) / len(words)
            for lang, table in self.tables.items()
        }
        lang = max(scores, key=scores.get)
        conf = scores[lang]
        if conf == 0.0:
            return "und", 0.0
        return lang, round(min(1.0, conf * 3), 6)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pred = batch["text"].fillna("").map(self.classify)
        out = batch[[c for c in ("doc_id", "lang") if c in batch]].copy()
        out["pred_lang"] = pred.map(lambda t: t[0])
        out["lang_confidence"] = pred.map(lambda t: t[1])
        return out


class Fingerprint:
    """Karp-Rabin rolling-hash document fingerprints (winnowing-style):
    a 64-bit content hash plus the minimum k-gram rolling hash, usable
    as a cheap near-dup prefilter and shard-stable doc signature."""

    def __init__(self, k: int = 5):
        self.k = k
        self.word_re = re.compile(r"[\w']+")
        self.base = np.uint64(1099511628211)

    def _fingerprint(self, text: str) -> tuple[int, int]:
        full, mins = self._fingerprints([text])
        return int(full[0]), int(mins[0])

    def _fingerprints(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Batch fingerprints: ONE bulk word-hash call across all docs,
        polynomial content hash and min k-gram via vectorized power
        products per doc slice (no per-word Python)."""
        from .dedup import word_hashes  # deterministic across processes

        words_per_doc = [self.word_re.findall((t or "").lower())
                         for t in texts]
        lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                           count=len(words_per_doc))
        flat: list[str] = []
        for ws in words_per_doc:
            flat.extend(ws)
        hs = word_hashes(flat)
        offs = np.concatenate(([0], np.cumsum(lens)))
        max_n = int(lens.max()) if lens.size else 0
        # ascending powers base^0..base^(max_n-1), wrapping mod 2^64
        powers_asc = self.base ** np.arange(max(max_n, self.k),
                                            dtype=np.uint64)
        kpow = powers_asc[:self.k][::-1]
        full = np.zeros(len(texts), dtype=np.uint64)
        mins = np.zeros(len(texts), dtype=np.uint64)
        for i, n in enumerate(lens):
            if n == 0:
                continue
            sub = hs[offs[i]:offs[i] + n]
            full[i] = (sub * powers_asc[:n][::-1]).sum(dtype=np.uint64)
            if n < self.k:
                mins[i] = sub.min()
            else:
                windows = np.lib.stride_tricks.sliding_window_view(sub, self.k)
                grams = (windows * kpow).sum(axis=1, dtype=np.uint64)
                mins[i] = grams.min()
        return full, mins

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        full, mins = self._fingerprints(list(batch["text"].fillna("")))
        out = batch[["doc_id"]].copy()
        out["content_hash"] = full
        out["min_kgram_hash"] = mins
        return out


def _apply(ds, cls, **kwargs):
    # task carrier + per-process singleton (config.stage_instance): no
    # mid-session actor-pool spawn cost for these cheap-state stages
    from ..config import stage_instance

    def fn(batch: pd.DataFrame, _cls=cls) -> pd.DataFrame:
        return stage_instance(_cls, _cls)(batch)

    return ds.map_batches(fn, batch_format="pandas", batch_size=4096,
                          **kwargs)


def text_stats(ds):
    return _apply(ds, TextStats)


def lang_id(ds):
    return _apply(ds, LangId)


def fingerprint(ds):
    return _apply(ds, Fingerprint)
