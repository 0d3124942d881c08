"""The analyzer chain: tokenize → normalize → stem → stopword/length filter →
n-gram join. Exact transcription of the reference semantics (operators M1-M8
in SURVEY.md §2.2):

- tokenizer: the reference uses a learned OpenNLP maxent model
  (``DocAnalyzer.java:159-162``). Per SURVEY.md §7.0 decision 1 this rebuild
  DEFINES its tokenizer as the deterministic rule: split on whitespace, then
  peel leading and trailing non-word-character runs off each chunk as separate
  tokens (≈ OpenNLP on clean prose: punctuation becomes separate tokens, which
  normalize to "" and act as n-gram boundaries). This is the pinned analyzer
  spec; the oracle in tests/oracle.py transcribes the same rule.
- normalize: ``DocAnalyzer.java:165-174`` (see functions/normalize.py)
- stem: Porter2 (see functions/porter2.py), ``DocAnalyzer.java:177-183``
- isLegit: non-empty ∧ not stopword ∧ 1 < len < 20, ``DocAnalyzer.java:185-190``
- isBoundary: token == "" post-normalize, ``DocAnalyzer.java:193-195``
- n-grams: ``DocAnalyzer.java:223-258`` (``TokenizerNormalizeStemmer``):
  unigram emitted iff legit (else stopword counter++); for each position i not
  a boundary, for j from i-1 down to max(0, i-N+1): stop at boundary;
  n-gram = tokens[j] + "-" + ... + "-" + tokens[i]; emitted iff ALL component
  tokens are legit (``legit &=``, the single-threaded canonical semantics —
  ``MultiThreadedUserAnalyzer.java:230`` diverges with ``|=``; we pin ``&=``).
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from ir_base_ray.functions.normalize import normalize, normalize_unicode
from ir_base_ray.functions.porter2 import CachedStemmer, stem
from ir_base_ray.sources.stopwords import load_stopwords

# Unicode-aware edge peel: leading non-word run / core / trailing non-word run.
_CHUNK_RE = re.compile(r"^(\W*)(.*?)(\W*)$", re.UNICODE | re.DOTALL)


def tokenize(text: str) -> list[str]:
    """Rule tokenizer (pinned spec). Punctuation runs at chunk edges become
    their own tokens so they can act as n-gram boundaries after normalize."""
    out: list[str] = []
    for chunk in text.split():
        m = _CHUNK_RE.match(chunk)
        lead, core, trail = m.group(1), m.group(2), m.group(3)
        if lead:
            out.append(lead)
        if core:
            out.append(core)
        if trail:
            out.append(trail)
    return out


@dataclass(frozen=True)
class TokenizeResult:
    """Mirror of ``structures/TokenizeResult.java:10-51``."""

    tokens: list[str]  # final unigrams + n-grams, in emission order
    stopword_cnt: int  # non-legit unigram count (incStopwords)
    raw_cnt: int  # raw token count pre-filter

    @property
    def stopword_proportion(self) -> float:
        return self.stopword_cnt / self.raw_cnt if self.raw_cnt else 0.0


@dataclass
class Analyzer:
    """Stateful analyzer — one instance per Ray actor (state loaded once,
    mirroring the per-core tokenizer/stemmer pools,
    ``MultiThreadedUserAnalyzer.java:39-62``)."""

    ngram: int = 1
    min_len_exclusive: int = 1  # isLegit: len > 1
    max_len_exclusive: int = 20  # isLegit: len < 20
    stopwords: frozenset[str] = field(default_factory=load_stopwords)
    lang: str = "en"  # stemmer language (functions/snowball.py registry)

    def __post_init__(self):
        from ir_base_ray.functions.snowball import get_stemmer

        self._stemmer = CachedStemmer(stem_fn=get_stemmer(self.lang))
        # en = the byte-parity ASCII normalize; other languages use the
        # Unicode-aware variant (accents survive to reach their stemmers)
        self._normalize = normalize if self.lang == "en" else normalize_unicode
        # cache: raw token -> analyzed (normalized+stemmed) token
        self._token_cache: dict[str, str] = {}
        # cache: raw whitespace chunk -> tuple of (analyzed token, legit) in
        # emission order (lead punct run, core, trail punct run) — web text is
        # Zipf-distributed so most chunks repeat; one dict hit replaces the
        # edge-peel regex + per-token normalize/stem/stopword work
        self._chunk_cache: dict[str, tuple] = {}

    def _analyze_token(self, raw: str) -> str:
        cached = self._token_cache.get(raw)
        if cached is not None:
            return cached
        result = self._stemmer(self._normalize(raw))
        if len(self._token_cache) < 2_000_000:
            self._token_cache[raw] = result
        return result

    def is_legit(self, token: str) -> bool:
        return (
            bool(token)
            and token not in self.stopwords
            and self.min_len_exclusive < len(token) < self.max_len_exclusive
        )

    def _analyze_chunk(self, chunk: str) -> tuple:
        """whitespace chunk → ((analyzed_token, legit), ...) with edge-peel
        tokenization; memoized."""
        hit = self._chunk_cache.get(chunk)
        if hit is not None:
            return hit
        m = _CHUNK_RE.match(chunk)
        out = []
        for raw in m.groups():
            if raw:
                t = self._analyze_token(raw)
                out.append((t, self.is_legit(t)))
        out = tuple(out)
        if len(self._chunk_cache) < 2_000_000:
            self._chunk_cache[chunk] = out
        return out

    def analyze(self, text: str) -> TokenizeResult:
        """TokenizerNormalizeStemmer, exactly (``DocAnalyzer.java:223-258``)."""
        pairs: list[tuple] = []
        for chunk in text.split():
            pairs.extend(self._analyze_chunk(chunk))
        if self.ngram == 1:
            # fast path: no n-gram assembly needed
            out = [t for t, legit in pairs if legit]
            return TokenizeResult(
                tokens=out, stopword_cnt=len(pairs) - len(out), raw_cnt=len(pairs)
            )
        toks = [t for t, _ in pairs]
        n = self.ngram
        legit_flags = [l for _, l in pairs]
        boundary = [t == "" for t in toks]
        out: list[str] = []
        stopword_cnt = 0
        for i, token in enumerate(toks):
            legit = legit_flags[i]
            if legit:
                out.append(token)
            else:
                stopword_cnt += 1
            if not boundary[i]:
                gram = token
                for j in range(i - 1, max(0, i - n + 1) - 1, -1):
                    if boundary[j]:
                        break
                    gram = toks[j] + "-" + gram
                    legit = legit and legit_flags[j]
                    if legit:
                        out.append(gram)
        return TokenizeResult(tokens=out, stopword_cnt=stopword_cnt, raw_cnt=len(pairs))

    def term_counts(self, text: str) -> dict:
        """token sequence → {term: count} (``constructSpVct`` semantics,
        ``DocAnalyzer.java:377-423``, open-vocabulary path: every emitted
        token counts; DF/TTF aggregation happens downstream).

        ngram==1 fast path: count raw whitespace chunks first (C-speed
        ``Counter``), then analyze each UNIQUE chunk once and accumulate its
        count — per-unique-chunk work instead of per-occurrence. Insertion
        order is unchanged: unique chunks iterate in first-occurrence order,
        and the first chunk emitting a token IS the chunk of that token's
        first occurrence, so the resulting dict order equals the
        per-occurrence walk's first-occurrence order exactly."""
        if self.ngram != 1:
            return Counter(self.analyze(text).tokens)
        out: dict = {}
        get_hit = self._chunk_cache.get
        for chunk, c in Counter(text.split()).items():
            hit = get_hit(chunk)
            if hit is None:
                hit = self._analyze_chunk(chunk)
            for t, legit in hit:
                if legit:
                    if t in out:
                        out[t] += c
                    else:
                        out[t] = c
        # plain dict, not Counter(out): saves one dict copy per doc in the
        # hot path; every consumer uses dict-compatible ops only
        return out


_SIMPLE_STRIP = re.compile(r"[^a-zA-Z0-9_]+")
_SIMPLE_DIGITS = re.compile(r"\d+\Z", re.ASCII)


def analyze_simple_flat(texts):
    """Vectorized ``analyze_simple`` over a whole Arrow string column.

    Returns ``(flat_tokens, counts)``: one flat ``pa.StringArray`` of every
    surviving token in doc-major order, plus a per-doc ``np.int64`` token
    count — value-identical to ``[analyze_simple(t or "") for t in col]``
    (pinned by a hypothesis property test). All steps are Arrow C++ / RE2:
    ``utf8_split_whitespace`` (same whitespace set as Python ``str.split()``,
    see pipelines/ops.py), per-chunk ``[^a-zA-Z0-9_]+`` strip, ASCII lower
    (post-strip chunks are pure ASCII), all-digit → ``NUM`` fold, and the
    drop-empty filter (which also removes the empty EDGE chunks Arrow keeps
    where Python's ``split()`` drops them)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    n_docs = len(lists)
    cnt_raw = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    stripped = pc.replace_substring_regex(
        flat, pattern=_SIMPLE_STRIP.pattern, replacement="")
    lowered = pc.ascii_lower(stripped)
    toks = pc.if_else(
        pc.match_substring_regex(lowered, r"^[0-9]+$"), "NUM", lowered)
    keep = pc.not_equal(toks, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), cnt_raw)
    counts = np.bincount(doc_of[keep_np], minlength=n_docs).astype(np.int64)
    return toks.filter(keep), counts


def analyze_simple(text: str) -> list[str]:
    """The SQL-expressible 'simple mode' used for DuckDB cross-checks:
    whitespace-split → per-token ASCII \\W-strip → lower → NUM-fold → drop
    empty. No NFKC (not SQL-expressible), no stemming, no stopwords, no
    n-grams. Mirrored exactly by regexp-based SQL in
    __ray_entry__.oracle_sql()."""
    out = []
    for chunk in text.split():
        t = _SIMPLE_STRIP.sub("", chunk).lower()
        if t:
            out.append("NUM" if _SIMPLE_DIGITS.match(t) else t)
    return out


__all__ = [
    "Analyzer",
    "TokenizeResult",
    "tokenize",
    "normalize",
    "stem",
    "analyze_simple",
    "analyze_simple_flat",
]
