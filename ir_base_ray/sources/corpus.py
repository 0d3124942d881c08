"""Corpus sources.

- ``synth_corpus``: deterministic Common-Crawl-style corpus generator per
  FIXTURES.md §1 / BASELINE.json input_hint — schema
  ``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.
  Seeded, reproducible, exercises every analyzer edge (NUM folding, NFKC,
  length filters, stopwords, punctuation boundaries, Zipf head terms).
- ``read_corpus``: column-pruned parquet read of that schema.
- ``corpus_from_documents``: adapter mapping the driver-provided
  ``documents.parquet`` (doc_id, text, lang, ...) into the corpus schema with
  a deterministic sortable url per row.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

import ray.data

_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def _make_vocab(n: int, rng: np.random.Generator) -> list[str]:
    """n deterministic pseudo-words (CV syllables, 2-4 syllables)."""
    out = []
    seen = set()
    while len(out) < n:
        k = int(rng.integers(1, 4))
        w = "".join(
            _CONS[int(rng.integers(len(_CONS)))] + _VOW[int(rng.integers(len(_VOW)))]
            for _ in range(k + 1)
        )
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


_PLANTED = [
    "42",  # -> NUM
    "1234567890",  # -> NUM
    "MixedCase",
    "ﬁne",  # NFKC ligature
    "①st",  # NFKC circled digit
    "café",  # non-ASCII letter stripped by Java \W
    "x",  # len 1 -> filtered
    "supercalifragilisticexpialidocious",  # >19 chars -> filtered
    "state-of-the-art",
    "(parenthetical)",
    "end.",
    "don't",
]

_STOP_SAMPLE = [
    "the", "and", "of", "to", "a", "in", "that", "is", "was", "for",
    "with", "as", "on", "be", "at", "by", "this", "had", "not", "are",
]


def synth_corpus(n_rows: int, seed: int = 42, vocab_size: int = 5000) -> pa.Table:
    """Deterministic corpus table (pyarrow). Zipf-distributed vocabulary so
    head terms hit nearly every doc (the skew path the index build must salt)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_make_vocab(vocab_size, rng), dtype=object)
    # Zipf ranks: P(rank r) ∝ 1/(r+1); sample via normalized cumulative
    ranks = np.arange(vocab_size, dtype=np.float64)
    probs = 1.0 / (ranks + 1.0)
    probs /= probs.sum()
    cum = np.cumsum(probs)

    urls = []
    texts = []
    htmls = []
    langs = []
    ts = []
    base_ts = _dt.datetime(2024, 1, 1)
    lang_choices = np.array(["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"])
    for i in range(n_rows):
        n_words = int(rng.integers(30, 120))
        draws = np.searchsorted(cum, rng.random(n_words))
        words = list(vocab[draws])
        # interleave stopwords (~30% extra) and occasional planted tokens
        n_stop = n_words // 3
        stop_positions = rng.integers(0, len(words) + 1, size=n_stop)
        for p in sorted(stop_positions.tolist(), reverse=True):
            words.insert(p, _STOP_SAMPLE[int(rng.integers(len(_STOP_SAMPLE)))])
        if i % 7 == 0:
            p = int(rng.integers(0, len(words) + 1))
            words.insert(p, _PLANTED[int(rng.integers(len(_PLANTED)))])
        if i % 11 == 0:
            p = int(rng.integers(0, len(words)))
            words[p] = words[p] + "."  # punctuation boundary mid-text
        text = " ".join(words)
        url = f"https://site{i % 97}.example/p/{i:08d}"
        html = (
            "<html><body>\n  " + text + "\n <!-- boilerplate comment "
            + str(i) + " --> </body></html>"
        ).encode("utf-8")
        urls.append(url)
        texts.append(text)
        htmls.append(html)
        langs.append(str(lang_choices[int(rng.integers(len(lang_choices)))]))
        ts.append(base_ts + _dt.timedelta(minutes=i))

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_synth_corpus(path: str, n_rows: int, seed: int = 42) -> str:
    import pyarrow.parquet as pq

    pq.write_table(synth_corpus(n_rows, seed), path)
    return path


def read_corpus(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Column-pruned corpus read (S1: prune at the read — never ship html
    bytes into stages that only need text)."""
    return ray.data.read_parquet(path, columns=columns or ["url", "text", "lang"])


def corpus_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """Adapter: driver testdata documents.parquet → corpus schema. url is a
    zero-padded doc_id so lexicographic url order == numeric doc_id order."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def to_corpus(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id")
        urls = pc.binary_join_element_wise(
            pa.array(["https://corpus.example/d/"] * len(batch), pa.string()),
            pc.utf8_lpad(pc.cast(ids, pa.string()), 12, "0"),
            "",
        )
        return pa.table(
            {
                "url": urls,
                "text": batch.column("text"),
                "lang": batch.column("lang"),
            }
        )

    return ds.map_batches(to_corpus, batch_format="pyarrow")
