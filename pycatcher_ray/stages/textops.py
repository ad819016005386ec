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


# BPE-ish pre-tokenizer: GPT-2-style contractions / word / number /
# punctuation split (public pattern family).  NOTE no trailing `|\s+`
# branch: counting non-space matches of the full pattern equals counting
# matches of this reduced pattern (the scan skips whitespace the \s+
# branch would consume; verified over the sf corpora + stress strings),
# and the reduced form is one vectorized str.count / one DuckDB
# regexp_extract_all on both engine and oracle sides.
_BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?\d+| ?[^\sA-Za-z\d]+"


def _token_regex(words) -> str:
    """Count WHOLE tokens only: a stopword occurrence is a maximal
    [\\w']+ run equal to the word, expressed with word-set alternation
    guarded by [\\w'] lookarounds (engine side; RE2 has no lookbehind so
    the SQL oracle uses the token-list form instead)."""
    alts = "|".join(sorted(words, key=len, reverse=True))
    return r"(?<![\w'])(?:" + alts + r")(?![\w'])"


class TextStats:
    """Quality-scoring features: lengths, punctuation/digit/stopword
    ratios, mean word length, and a composite quality score in [0, 1].

    Every feature is vectorized (compiled-regex ``str.count`` — no
    per-doc Python loop) and every float is a deterministic IEEE
    expression a DuckDB oracle reproduces bit-for-bit (int/int divides,
    least/greatest clips, one rational word-length bump — no libm
    transcendentals whose last ulp could differ between numpy and
    DuckDB).  Ratios are emitted UNROUNDED: both engine and oracle
    produce the identical double, and the driver's compare rounds both
    sides with the same rule."""

    def __init__(self):
        self.word_re = re.compile(r"[\w']+")
        self.wordchar_re = re.compile(r"[\w']")
        self.punct_re = re.compile(r"[^\w\s]")
        self.digit_re = re.compile(r"\d")
        self.en_stop = _STOPWORDS["en"]
        self.stop_re = re.compile(_token_regex(_STOPWORDS["en"]),
                                  re.IGNORECASE)
        self.bpe_re = re.compile(_BPE_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().astype("int64")
        n_words = text.str.count(self.word_re).astype("int64")
        word_chars = text.str.count(self.wordchar_re).astype("int64")
        n_punct = text.str.count(self.punct_re).astype("int64")
        n_digit = text.str.count(self.digit_re).astype("int64")
        n_stop = text.str.count(self.stop_re).astype("int64")
        n_bpe = text.str.count(self.bpe_re).astype("int64")
        stop_ratio = (n_stop / n_words.clip(lower=1)).astype(float)
        # mean word length = total token chars / token count (exact int
        # sums, ONE divide — same value as the per-token np.mean)
        mean_wlen = (word_chars / n_words.clip(lower=1)).astype(float)
        mean_wlen[n_words == 0] = 0.0
        punct_ratio = (n_punct / n_chars.clip(lower=1)).astype(float)
        digit_ratio = (n_digit / n_chars.clip(lower=1)).astype(float)
        # composite quality: long enough, low punct/digit noise, plausible
        # word lengths (C4/Gopher-style heuristic filters).  The word-
        # length bump is the RATIONAL 1/(1 + z²/2) (same shape as the
        # former exp(-z²/2) gaussian) so the whole score is division/
        # multiply/add-only — bit-reproducible in SQL.
        z = (mean_wlen - 5.0) / 3.0
        wlen_ok = 1.0 / (1.0 + 0.5 * (z * z))
        quality = (
            0.4 * np.minimum(n_words / 50.0, 1.0)
            + 0.3 * (1 - np.minimum(punct_ratio * 5, 1.0))
            + 0.1 * (1 - np.minimum(digit_ratio * 5, 1.0))
            + 0.2 * wlen_ok
        )
        out = batch[[c for c in ("doc_id", "source", "lang") if c in batch]].copy()
        out["n_chars"] = n_chars
        out["n_words"] = n_words
        out["n_bpe_tokens"] = n_bpe
        out["punct_ratio"] = punct_ratio
        out["digit_ratio"] = digit_ratio
        out["stopword_ratio"] = stop_ratio
        out["mean_word_len"] = mean_wlen
        out["quality_score"] = quality.astype(float)
        return out


class LangId:
    """Stopword + charset heuristic language ID with confidence.

    The batch path is fully vectorized (one compiled-regex
    ``str.count`` per language table) and emits only
    SQL-reproducible arithmetic: integer stopword counts, one
    int/int divide, one ×3 multiply, a least() clip — so the
    ``lang_id_pred`` registry query carries an exact DuckDB oracle.
    Ties pick the first language in (en, es, fr, de) order on both
    sides; confidence is emitted UNROUNDED (identical doubles)."""

    _LANG_ORDER = ("en", "es", "fr", "de")

    def __init__(self):
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}
        self.stop_res = {
            lang: re.compile(_token_regex(_STOPWORDS[lang]), re.IGNORECASE)
            for lang in self._LANG_ORDER
        }
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
        return lang, min(1.0, conf * 3)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_char = text.str.len().to_numpy(np.int64)
        n_cjk = text.str.count(self.cjk_re).to_numpy(np.int64)
        n_words = text.str.count(self.word_re).to_numpy(np.int64)
        counts = np.stack([
            text.str.count(self.stop_res[lang]).to_numpy(np.int64)
            for lang in self._LANG_ORDER
        ])                                   # (4, n) — rows in tie order
        best = counts.argmax(axis=0)         # first max wins = tie order
        c_best = counts[best, np.arange(len(text))]
        langs = np.array(self._LANG_ORDER, dtype=object)[best]
        with np.errstate(divide="ignore", invalid="ignore"):
            conf = np.minimum(
                1.0, (c_best / np.maximum(1, n_words)) * 3)
        und = (n_words == 0) | (c_best == 0)
        langs[und] = "und"
        conf[und] = 0.0
        is_zh = n_cjk > 0.2 * np.maximum(1, n_char)
        if is_zh.any():
            langs[is_zh] = "zh"
            conf[is_zh] = np.minimum(
                1.0, n_cjk[is_zh] / n_char[is_zh] * 2)
        out = batch[[c for c in ("doc_id", "lang") if c in batch]].copy()
        out["pred_lang"] = langs
        out["lang_confidence"] = conf
        return out


class Fingerprint:
    """Karp-Rabin rolling-hash document fingerprints (winnowing-style):
    a 64-bit content hash plus the minimum k-gram rolling hash, usable
    as a cheap near-dup prefilter and shard-stable doc signature."""

    def __init__(self, k: int = 5, hash_fn: str = "fast"):
        self.k = k
        self.word_re = re.compile(r"[\w']+")
        self.base = np.uint64(1099511628211)
        # "fast" = bulk polars/crc word hash (production prefilter path);
        # "md5" = first 8 bytes of md5(word) — slower, but DuckDB
        # reproduces it bit-for-bit, giving the doc_fingerprints registry
        # query an exact SQL oracle (the minhash_signatures_md5
        # convention).  md5 hashes each DISTINCT word once per batch.
        self.hash_fn = hash_fn

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
        hs = (_md5_word_hashes(flat) if self.hash_fn == "md5"
              else word_hashes(flat))
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


def _md5_word_hashes(words: list[str]) -> np.ndarray:
    """First 8 bytes of md5(word) as uint64 — each DISTINCT word hashed
    once (dictionary encoding); DuckDB replays it as
    CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT)."""
    import hashlib

    import pyarrow.compute as _pc

    if not words:
        return np.array([], dtype=np.uint64)
    arr = _pc.dictionary_encode(pa.array(words, type=pa.string()))
    dict_hashes = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
         for w in arr.dictionary.to_pylist()),
        dtype=np.uint64, count=len(arr.dictionary))
    return dict_hashes[arr.indices.to_numpy(zero_copy_only=False)]


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


def fingerprint(ds, hash_fn: str = "fast"):
    from ..config import stage_instance

    def fn(batch: pd.DataFrame, _h=hash_fn) -> pd.DataFrame:
        return stage_instance((Fingerprint, _h),
                              lambda: Fingerprint(hash_fn=_h))(batch)

    return ds.map_batches(fn, batch_format="pandas", batch_size=4096)
