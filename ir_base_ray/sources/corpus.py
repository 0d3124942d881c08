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


def synth_corpus(n_rows: int, seed: int = 42, vocab_size: int = 5000,
                 include_html: bool = True) -> pa.Table:
    """Deterministic corpus table (pyarrow), vectorized for multi-million-row
    bench generation. Zipf-distributed vocabulary (head terms hit nearly every
    doc — the skew path the index build must salt) + ~30% stopword mass +
    planted analyzer edge-case tokens (NUM folds, NFKC, length filters,
    punctuation boundaries). ``include_html=False`` writes empty html payloads
    (bench corpora only need url/text; the html-cleaning path is exercised by
    the default)."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(vocab_size, rng)
    # sampling distribution: 30% mass uniformly on stopwords, 70% Zipf on vocab
    items = np.array(_STOP_SAMPLE + vocab, dtype=object)
    n_stop = len(_STOP_SAMPLE)
    zipf = 1.0 / (np.arange(vocab_size, dtype=np.float64) + 1.0)
    probs = np.concatenate((np.full(n_stop, 0.30 / n_stop), 0.70 * zipf / zipf.sum()))
    cum = np.cumsum(probs / probs.sum())

    n_words = rng.integers(40, 160, size=n_rows)
    offsets = np.concatenate(([0], np.cumsum(n_words)))
    total = int(offsets[-1])
    draws = np.searchsorted(cum, rng.random(total))
    words = items[draws]

    # punctuation boundaries: every 11th doc gets a '.' glued to its first word
    texts = []
    planted_idx = rng.integers(0, len(_PLANTED), size=n_rows)
    for i in range(n_rows):
        w = words[offsets[i]: offsets[i + 1]]
        if i % 11 == 0:
            w = w.copy()
            w[0] = w[0] + "."
        t = " ".join(w)
        if i % 7 == 0:
            t = _PLANTED[planted_idx[i]] + " " + t
        texts.append(t)

    urls = [f"https://site{i % 97}.example/p/{i:08d}" for i in range(n_rows)]
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + np.arange(n_rows) * np.timedelta64(60_000_000, "us")
    lang_pool = np.array(["en"] * 8 + ["de", "fr"], dtype=object)
    langs = lang_pool[rng.integers(0, len(lang_pool), size=n_rows)]
    if include_html:
        htmls = [
            ("<html><body>\n  " + t + "\n <!-- boilerplate comment "
             + str(i) + " --> </body></html>").encode("utf-8")
            for i, t in enumerate(texts)
        ]
    else:
        htmls = [b""] * n_rows

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )


def write_synth_corpus(path: str, n_rows: int, seed: int = 42,
                       include_html: bool = True, row_group_size: int = 50_000) -> str:
    """Write a synthetic corpus parquet; modest row groups so a single file
    still splits into parallel read tasks."""
    import pyarrow.parquet as pq

    pq.write_table(synth_corpus(n_rows, seed, include_html=include_html), path,
                   row_group_size=row_group_size)
    return path


def write_synth_corpus_dir(dir_path: str, n_rows: int, seed: int = 42,
                           include_html: bool = True, n_files: int = 16,
                           row_group_size: int = 50_000) -> str:
    """Write the synthetic corpus as a DIRECTORY of ``n_files`` parquet
    shards — the realistic web-corpus layout (a 100 TB crawl is many files,
    never one): the read then parallelizes into one task per file instead of
    one task streaming blocks to everyone. Deterministic: shard i holds the
    same rows as rows [i·n/n_files, (i+1)·n/n_files) of the single-file
    corpus with the same seed."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)
    tbl = synth_corpus(n_rows, seed, include_html=include_html)
    per = -(-n_rows // n_files)
    for i in range(n_files):
        sl = tbl.slice(i * per, per)
        if len(sl) == 0:
            break
        pq.write_table(sl, os.path.join(dir_path, f"part-{i:05d}.parquet"),
                       row_group_size=row_group_size)
    return dir_path


def extract_text_stage(ds) -> "ray.data.Dataset":
    """M9+M14: (url, html:binary) → (url, text) via the reference-exact
    cleaning chain (``functions/textclean.py``: comment-block strip →
    CDATA strip → tag strip → whitespace canonicalization). A plain
    ``map_batches`` task stage — the regexes are module-level compiled, so
    per-process state needs no actor. The per-row invariant (byte-identical
    extracted text per url) is pinned by tests/test_analyzer.py."""
    from ir_base_ray.functions.textclean import extract_text

    def extract(batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch.column("html").to_pylist()]
        out = {c: batch.column(c) for c in batch.column_names if c != "html"}
        out["text"] = pa.array(texts, pa.string())
        return pa.table(out)

    return ds.map_batches(extract, batch_format="pyarrow", batch_size=None)


def read_corpus(path: str, columns: list[str] | None = None,
                override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """Column-pruned corpus read (S1: prune at the read — never ship html
    bytes into stages that only need text). For a SINGLE large file pass
    ``override_num_blocks`` ≈ its row-group count so the decompress runs as
    parallel read tasks instead of one (a multi-file corpus parallelizes on
    its own)."""
    return ray.data.read_parquet(path, columns=columns or ["url", "text", "lang"],
                                 override_num_blocks=override_num_blocks)


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
