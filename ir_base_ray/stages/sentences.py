"""M11 sentence split + per-sentence vectors (SURVEY.md §2.2,
``DocAnalyzer.java:491-541`` AnalyzeDocWithStnSplit).

The reference uses an OpenNLP ``SentenceDetectorME`` statistical model
(``en-sent.bin``); that model isn't available here, so the splitter is a
deterministic rule-based boundary detector (sentence-final punctuation
``.!?`` followed by whitespace + an uppercase/digit start, with abbreviation
guard for single-letter initials). The REFERENCE-EXACT parts are everything
downstream of detection, transcribed from the cited lines:

- per-sentence sparse vector via the same analyzer chain;
- a sentence is kept iff its vector has > 2 distinct terms (:519 ``if
  (stnVct.size() > 2)``);
- the doc is accepted iff total distinct terms > length threshold AND
  #kept sentences ≥ stn threshold (:528 ``if (docVct.size() >
  m_lengthThreshold && stnList.size() >= m_stnSizeThreshold)``).

Output adds nested-list columns (sentences:list<string>,
stn_terms:list<list<string>>, stn_tfs:list<list<int64>>) — the layout a
sentence-level model (HTMM / sentence LDA) consumes.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ir_base_ray.config import AnalyzerSpec
from ir_base_ray.functions.analyzer import Analyzer

_BOUNDARY = re.compile(r"(?<=[.!?])\s+(?=[A-Z0-9\"'])")
_ABBREV = re.compile(r"\b[A-Z]\.$")


def split_sentences(text: str) -> list[str]:
    """Deterministic boundary detector (see module docstring for why this is
    rule-based)."""
    parts = []
    for piece in _BOUNDARY.split(text or ""):
        piece = piece.strip()
        if not piece:
            continue
        # re-join single-letter-initial false splits ("J. Smith")
        if parts and _ABBREV.search(parts[-1]):
            parts[-1] = parts[-1] + " " + piece
        else:
            parts.append(piece)
    return parts


class SentenceAnalyzerActor:
    """Stateful stage: analyzer chain built once per actor/process (T2)."""

    def __init__(self, spec: AnalyzerSpec | None = None, text_col: str = "text",
                 keep_cols: tuple = ("doc_id",), stn_threshold: int = 2):
        from ir_base_ray.sources.stopwords import load_stopwords

        spec = spec or AnalyzerSpec()
        self.spec = spec
        self.text_col = text_col
        self.keep_cols = keep_cols
        self.stn_threshold = stn_threshold
        self._analyzer = Analyzer(ngram=spec.ngram,
                                  stopwords=load_stopwords(spec.stopwords_path))

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep_mask, stn_texts, stn_terms, stn_tfs, n_terms = [], [], [], [], []
        for text in batch.column(self.text_col).to_pylist():
            kept_s, kept_t, kept_f = [], [], []
            doc_terms: set = set()
            for s in split_sentences(text or ""):
                counts = self._analyzer.term_counts(s)
                if len(counts) > 2:  # :519 stnVct.size() > 2
                    kept_s.append(s)
                    kept_t.append(list(counts.keys()))
                    kept_f.append([counts[t] for t in counts])
                    doc_terms.update(counts)
            ok = (len(doc_terms) > self.spec.length_threshold
                  and len(kept_s) >= self.stn_threshold)  # :528
            keep_mask.append(ok)
            if ok:
                stn_texts.append(kept_s)
                stn_terms.append(kept_t)
                stn_tfs.append(kept_f)
                n_terms.append(len(doc_terms))

        mask = pa.array(keep_mask, pa.bool_())
        cols = {}
        for c in self.keep_cols:
            if c in batch.column_names:
                cols[c] = batch.column(c).filter(mask)
        cols["sentences"] = pa.array(stn_texts, pa.list_(pa.string()))
        cols["stn_terms"] = pa.array(stn_terms, pa.list_(pa.list_(pa.string())))
        cols["stn_tfs"] = pa.array(stn_tfs, pa.list_(pa.list_(pa.int64())))
        cols["n_terms"] = pa.array(n_terms, pa.int64())
        return pa.table(cols)


def analyze_with_sentences(ds, spec: AnalyzerSpec | None = None, *,
                           text_col: str = "text", keep_cols: tuple = ("doc_id",),
                           stn_threshold: int = 2, concurrency: int = 4):
    from ir_base_ray.perf import pool_size

    return ds.map_batches(
        SentenceAnalyzerActor,
        fn_constructor_kwargs={"spec": spec, "text_col": text_col,
                               "keep_cols": keep_cols, "stn_threshold": stn_threshold},
        batch_format="pyarrow", batch_size=None,
        concurrency=pool_size(concurrency), num_cpus=1,
    )
