"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting. All
vectorized-per-batch map_batches stages (no shuffle)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ir_base_ray.perf import pool_size

# small per-language function-word marker lists (public, common knowledge)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "was", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "une", "dans", "pour", "que", "pas"},
    "es": {"el", "la", "los", "y", "es", "en", "que", "por", "con", "para"},
    "zh": set(),  # no-space script: detected via CJK char ratio instead
}

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)
_DIGIT_RE = re.compile(r"\d", re.ASCII)
_UPPER_RE = re.compile(r"[A-Z]")
# BPE-ish subword pretokenizer: word pieces OR single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def _clean_string_column(batch: pa.Table, col: str) -> pa.Array:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("")
    return arr


def _split_tokens(arr: pa.Array):
    """Whitespace-split an Arrow string array fully in C++: returns
    (seg, flat, flat_len, nonempty) — the doc index per flat token, the flat
    token array, its codepoint lengths, and the non-empty-token mask (Arrow's
    split keeps empty edge pieces that Python's ``str.split()`` drops)."""
    import pyarrow.compute as pc

    toks = pc.utf8_split_whitespace(arr)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    seg = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
    return seg, flat, flat_len, flat_len > 0


class TextQualityActor:
    """Per-doc quality metrics (length / punctuation / stopword ratios) —
    float ratios are computed as plain float64 divisions so the DuckDB oracle
    can mirror them exactly. Fully vectorized: one Arrow whitespace split +
    RE2 count kernels per batch, per-doc reductions via ``np.bincount`` over
    the token→doc segment index (the oracle itself is RE2-on-DuckDB, so the
    Arrow RE2 classes ``[^\\w\\s]`` / ``\\d`` mirror it exactly)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.stop = _LANG_MARKERS["en"]
        self.stop_arr = pa.array(sorted(self.stop), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = _clean_string_column(batch, self.text_col)
        n = len(arr)
        n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        seg, flat, flat_len, nonempty = _split_tokens(arr)
        n_tokens = np.bincount(seg[nonempty], minlength=n).astype(np.int64)
        tok_len_sum = np.bincount(seg, weights=flat_len, minlength=n)
        # distinct tokens per doc: C++ dictionary-encode, then unique
        # (doc, code) pairs — no per-token Python
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        stride = np.int64(len(enc.dictionary) + 1)
        uniq = np.unique(seg[nonempty] * stride + codes[nonempty])
        n_types = np.bincount(uniq // stride, minlength=n).astype(np.int64)
        hit = pc.is_in(pc.utf8_lower(flat), value_set=self.stop_arr).to_numpy(
            zero_copy_only=False)
        stop_cnt = np.bincount(seg[hit & nonempty], minlength=n)
        n_punct = pc.count_substring_regex(arr, r"[^\w\s]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_digit = pc.count_substring_regex(arr, r"\d").to_numpy(
            zero_copy_only=False).astype(np.int64)
        safe_t = np.maximum(n_tokens, 1).astype(np.float64)
        safe_c = np.maximum(n_chars, 1).astype(np.float64)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_types": pa.array(n_types, pa.int64()),
            "avg_token_len": pa.array(
                np.where(n_tokens > 0, tok_len_sum / safe_t, 0.0), pa.float64()),
            "punct_ratio": pa.array(
                np.where(n_chars > 0, n_punct / safe_c, 0.0), pa.float64()),
            "digit_ratio": pa.array(
                np.where(n_chars > 0, n_digit / safe_c, 0.0), pa.float64()),
            "stopword_ratio": pa.array(
                np.where(n_tokens > 0, stop_cnt / safe_t, 0.0), pa.float64()),
        })


class LangIdActor:
    """n-gram-free language-ID heuristic: function-word hit counts per
    language + CJK character ratio; argmax with deterministic tie-break
    (alphabetical language code). 'und' when nothing matches."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.langs = sorted(k for k in _LANG_MARKERS if k != "zh")
        self.marker_arrs = [pa.array(sorted(_LANG_MARKERS[lang]), pa.string())
                            for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized: CJK ratio via one RE2 count kernel, marker hits via
        one lowered split + per-language ``is_in`` → bincount; ``argmax``
        over the (lang × doc) hit matrix keeps the alphabetical tie-break
        (langs sorted, first max wins — same as the ``hits > best`` walk)."""
        import pyarrow.compute as pc

        arr = _clean_string_column(batch, self.text_col)
        n = len(arr)
        n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        cjk = pc.count_substring_regex(arr, "[一-鿿]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_zh = (n_chars > 0) & (cjk / np.maximum(n_chars, 1) > 0.2)
        seg, flat, _, _ = _split_tokens(arr)
        lower = pc.utf8_lower(flat)
        hits = np.zeros((len(self.langs), n), dtype=np.int64)
        for li, markers in enumerate(self.marker_arrs):
            m = pc.is_in(lower, value_set=markers).to_numpy(zero_copy_only=False)
            hits[li] = np.bincount(seg[m], minlength=n)
        best = hits.max(axis=0)
        pred = np.array(self.langs, dtype=object)[hits.argmax(axis=0)]
        pred[best == 0] = "und"
        pred[is_zh] = "zh"
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "pred_lang": pa.array(pred, pa.string()),
        })


class TokenCountActor:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    pretokenization (letters / digit runs / single symbols)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Two RE2 count kernels per batch (the oracle counts the same RE2
        extractions in DuckDB) — no Python token materialization."""
        import pyarrow.compute as pc

        arr = _clean_string_column(batch, self.text_col)
        ws = pc.count_substring_regex(arr, r"\S+")
        bpe = pc.count_substring_regex(arr, r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_ws_tokens": pc.cast(ws, pa.int64()),
            "n_bpe_tokens": pc.cast(bpe, pa.int64()),
        })


class FingerprintActor:
    """Rolling polynomial fingerprint (Rabin-Karp style, base 257 mod 2^61-1)
    over the raw bytes, plus the min rolling window hash (winnowing-lite) —
    deterministic 64-bit doc fingerprints for fast prefiltering.

    Hot path is the compile-once C kernel (functions/ckernels.py) fed the
    batch's UTF-8 buffer zero-copy through the Arrow string offsets —
    hundreds of MB/s/core vs ~1 MB/s for the per-byte Python loop, which is
    kept as ``_call_py`` for compiler-less workers and as the pytest parity
    oracle."""

    MOD = (1 << 61) - 1
    BASE = 257

    def __init__(self, window: int = 16, id_col: str = "doc_id", text_col: str = "text"):
        self.window = window
        self.id_col = id_col
        self.text_col = text_col
        # precompute BASE^(window-1) mod MOD for the rolling update
        self.pow_w = pow(self.BASE, window - 1, self.MOD)
        from ir_base_ray.functions.ckernels import fingerprint_kernel
        self.lib = fingerprint_kernel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.lib is None:
            return self._call_py(batch)
        import ctypes

        col = batch.column(self.text_col)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if arr.null_count:
            arr = arr.fill_null("")
        if pa.types.is_large_string(arr.type):
            off_dt = np.int64
        else:
            off_dt = np.int32
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], dtype=off_dt)[
            arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
            else np.empty(0, np.uint8)
        full_fp = np.empty(len(arr), dtype=np.uint64)
        min_fp = np.empty(len(arr), dtype=np.uint64)
        self.lib.fingerprints(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(arr), self.window, self.pow_w,
            full_fp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            min_fp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "fingerprint": pa.array(full_fp, pa.uint64()),
            "min_window_hash": pa.array(min_fp, pa.uint64()),
        })

    def _call_py(self, batch: pa.Table) -> pa.Table:
        full_fp, min_window = [], []
        for t in batch.column(self.text_col).to_pylist():
            data = (t or "").encode("utf-8")
            h = 0
            for byte in data:
                h = (h * self.BASE + byte) % self.MOD
            full_fp.append(h)
            w = self.window
            if len(data) < w:
                min_window.append(h)
                continue
            rh = 0
            for byte in data[:w]:
                rh = (rh * self.BASE + byte) % self.MOD
            mn = rh
            for i in range(w, len(data)):
                rh = ((rh - data[i - w] * self.pow_w) * self.BASE + data[i]) % self.MOD
                if rh < mn:
                    mn = rh
            min_window.append(mn)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "fingerprint": pa.array(np.array(full_fp, dtype=np.uint64), pa.uint64()),
            "min_window_hash": pa.array(np.array(min_window, dtype=np.uint64), pa.uint64()),
        })


class RepetitionActor:
    """Within-document repetition signals for training-data quality
    filtering (the Gopher-rule family, Rae et al. 2021 §A1.1 — public
    method): per doc the non-empty-line duplicate fraction (count- and
    char-weighted) and the most-frequent word-bigram share. All ratios are
    plain float64 divisions so the DuckDB oracle mirrors them exactly
    (lines = ``[^\\n]+`` runs, words = ``\\S+`` runs — the same
    ``regexp_extract_all`` device as the text-quality oracle). Stateless
    per-batch map; no shuffle."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self._line_re = re.compile(r"[^\n]+")
        self._word_re = re.compile(r"\S+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        texts = batch.column(self.text_col).to_pylist()
        n_lines, dup_line, dup_char, top_bigram = [], [], [], []
        for t in texts:
            t = t or ""
            lines = self._line_re.findall(t)
            if lines:
                lc = Counter(lines)
                total = len(lines)
                n_lines.append(total)
                dup_line.append(round((total - len(lc)) / total, 6))
                tot_chars = sum(len(ln) * c for ln, c in lc.items())
                dup_chars = sum(len(ln) * (c - 1) for ln, c in lc.items())
                dup_char.append(round(dup_chars / tot_chars, 6)
                                if tot_chars else 0.0)
            else:
                n_lines.append(0)
                dup_line.append(0.0)
                dup_char.append(0.0)
            words = self._word_re.findall(t)
            if len(words) >= 2:
                bc = Counter(a + " " + b for a, b in zip(words, words[1:]))
                top_bigram.append(round(max(bc.values()) / (len(words) - 1), 6))
            else:
                top_bigram.append(0.0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_lines": pa.array(n_lines, pa.int64()),
            "dup_line_frac": pa.array(dup_line, pa.float64()),
            "dup_line_char_frac": pa.array(dup_char, pa.float64()),
            "top_bigram_frac": pa.array(top_bigram, pa.float64()),
        })


def _actor_stage(ds, cls, concurrency=4, batch_size: int = 2048, **kwargs):
    return ds.map_batches(
        cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
        batch_size=batch_size, concurrency=pool_size(concurrency), num_cpus=1,
    )


def text_quality(ds, **kw):
    return _actor_stage(ds, TextQualityActor, **kw)


def lang_id(ds, **kw):
    return _actor_stage(ds, LangIdActor, **kw)


def token_counts(ds, **kw):
    return _actor_stage(ds, TokenCountActor, **kw)


def fingerprints(ds, **kw):
    return _actor_stage(ds, FingerprintActor, **kw)


def repetition_stats(ds, **kw):
    return _actor_stage(ds, RepetitionActor, **kw)
