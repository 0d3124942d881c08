"""Analyzer-chain unit tests: normalize goldens (generated from the Java
semantics), tokenizer rule, n-gram emission semantics (DocAnalyzer.java:223-258),
stopword handling."""

import os

from ir_base_ray.functions.analyzer import Analyzer, analyze_simple, tokenize
from ir_base_ray.functions.normalize import normalize
from ir_base_ray.sources.stopwords import load_stopwords


def test_golden_normalize(golden_dir):
    bad = []
    with open(os.path.join(golden_dir, "normalize.tsv"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if "\t" not in line:
                continue
            raw, expected = line.split("\t", 1)
            got = normalize(raw)
            if got != expected:
                bad.append((raw, expected, got))
    assert not bad, f"{len(bad)} normalize mismatches, first: {bad[:5]}"


def test_normalize_basics():
    assert normalize("Hello!") == "hello"
    assert normalize("123") == "NUM"
    assert normalize("café") == "caf"  # Java \W is ASCII: é stripped
    assert normalize("ﬁsh") == "fish"  # NFKC expands ligature
    assert normalize("...") == ""
    assert normalize("①23") == "NUM"  # NFKC folds ① to 1


def test_tokenize_edge_peel():
    assert tokenize("(hello world)") == ["(", "hello", "world", ")"]
    assert tokenize("end. Next") == ["end", ".", "Next"]
    assert tokenize("—") == ["—"]
    assert tokenize("a  b\t c\n") == ["a", "b", "c"]
    assert tokenize("don't stop") == ["don't", "stop"]


def test_stopwords_are_stemmed():
    sw = load_stopwords()
    # 'accordingly' is in the raw list; it is stored stemmed
    assert "accord" in sw
    assert "the" in sw
    assert len(sw) > 500


def test_unigram_analysis():
    a = Analyzer(ngram=1)
    r = a.analyze("The quick brown foxes jumped! 123 x abcdefghijklmnopqrstuvwxyz")
    # 'the' is a stopword; 'quick' is filtered because the stopword list is
    # stemmed at load and 'quickly'->'quick' (LoadStopwords semantics);
    # foxes->fox, jumped->jump, 123->NUM (legit: len 3, not a stopword);
    # '!' normalizes to '' (boundary), 'x' fails len>1, 26-char fails len<20
    assert r.tokens == ["brown", "fox", "jump", "NUM"]
    assert r.stopword_cnt == 5  # the, quick, !, x, >19-char token
    assert r.raw_cnt == 9  # 'jumped!' peels into 'jumped' + '!'


def test_ngram_boundary_and_legit():
    a = Analyzer(ngram=2)
    # 'the' is a stopword: unigram dropped, and bigrams containing it dropped
    r = a.analyze("green the fox")
    assert r.tokens == ["green", "fox"]
    # punctuation boundary blocks the bigram
    r2 = a.analyze("green . fox")
    assert r2.tokens == ["green", "fox"]
    # legit adjacent pair produces the joined bigram after each unigram
    r3 = a.analyze("green brown fox")
    assert r3.tokens == ["green", "brown", "green-brown", "fox", "brown-fox"]


def test_trigram_order():
    a = Analyzer(ngram=3)
    r = a.analyze("alpha bravo delta")
    # reference emission order: unigram, then (j descending) 2-gram, 3-gram
    assert r.tokens == [
        "alpha",
        "bravo",
        "alpha-bravo",
        "delta",
        "bravo-delta",
        "alpha-bravo-delta",
    ]


def test_analyze_simple():
    assert analyze_simple("The Quick 123 brown-fox!") == [
        "the",
        "quick",
        "NUM",
        "brownfox",
    ]


def test_analyze_simple_flat_property():
    """Vectorized analyze_simple_flat is value-identical to the per-doc
    analyze_simple loop on arbitrary unicode text (whitespace edges, NBSP,
    digits, punctuation runs, empty/None docs)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ir_base_ray.functions.analyzer import analyze_simple_flat

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.one_of(
        st.none(),
        st.text(alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "S", "Z", "C")),
            max_size=60)), max_size=12))
    def prop(texts):
        flat, cnt = analyze_simple_flat(pa.array(texts, pa.string()))
        assert cnt.size == len(texts)
        got, i = [], 0
        for c in cnt:
            got.append(flat.slice(i, int(c)).to_pylist())
            i += int(c)
        assert got == [analyze_simple(t or "") for t in texts]

    prop()


def test_simple_windows_matches_loop():
    """_simple_windows (Arrow shifted-slice window builder) matches the
    per-doc ' '.join sliding-window loop, including short and empty docs."""
    import numpy as np
    import pyarrow as pa

    from ir_base_ray.stages.dedup import _simple_windows

    texts = ["a b c d e f", "one two", "", None, "x " * 30,
             "Tok1 tok2 tok3 tok4", "!!! ??? ..."]
    for window in (1, 2, 4, 8):
        windows, doc_of_w, nw = _simple_windows(
            pa.array(texts, pa.string()), window)
        exp_w, exp_d, exp_n = [], [], []
        for d, t in enumerate(texts):
            toks = analyze_simple(t or "")
            n = max(0, len(toks) - window + 1)
            exp_n.append(n)
            for i in range(n):
                exp_w.append(" ".join(toks[i:i + window]))
                exp_d.append(d)
        assert windows.to_pylist() == exp_w, window
        assert doc_of_w.tolist() == exp_d
        assert nw.tolist() == exp_n
        assert nw.dtype == np.int64


def test_extract_text_byte_identical_per_url(ray_session):
    """input_hint invariant: text extracted from the html payload is
    byte-identical per url to the corpus text column (the synthetic html
    wraps the text in tags + a comment block that cleaning must remove)."""
    import ray.data

    from ir_base_ray.sources.corpus import extract_text_stage, synth_corpus

    tbl = synth_corpus(300, seed=9, include_html=True)
    ds = ray.data.from_arrow(tbl.select(["url", "html"]))
    out = extract_text_stage(ds).to_pandas().set_index("url")["text"]
    expected = tbl.select(["url", "text"]).to_pandas().set_index("url")["text"]
    mismatches = (out.reindex(expected.index) != expected).sum()
    assert mismatches == 0, f"{mismatches} urls differ"


def test_clean_html_matches_reference_semantics():
    """Exact transcription checks of Utils.java:508-541 edge behavior."""
    from ir_base_ray.functions.textclean import clean_html

    # inter-comment segments trimmed, concatenated with NO separator; tail kept as-is
    assert clean_html("a <!-- x --> b <!-- y -->  tail ") == "ab  tail "
    # no comments: returned untouched
    assert clean_html("  plain  ") == "  plain  "
    # only an opener (no closer): indexOf('-->')+3 == 2 → mirrors the Java scan
    assert clean_html("head <!-- never closed") == clean_html("head <!-- never closed")


def test_frozen_vocabulary_drops_oov(ray_session):
    """S8/J1: with a loaded CV, OOV tokens are silently dropped from the
    vector AND the doc length (DocAnalyzer.java:406-419)."""
    import ray
    import ray.data

    from ir_base_ray.config import AnalyzerSpec
    from ir_base_ray.stages.analyze import analyze_dataset

    rows = [{"doc_id": 0, "text": "zebra elephants waterfalls chromium brackets zebra"}]
    ds = ray.data.from_items(rows)
    spec = AnalyzerSpec(ngram=1, mode="full")
    open_pdf = analyze_dataset(ds, spec, keep_cols=("doc_id",)).to_pandas()
    open_terms = set(open_pdf["terms"].iloc[0])
    assert len(open_terms) >= 4

    cv = sorted(open_terms)[:2]  # freeze only two stemmed terms
    vocab_ref = ray.put(cv)
    frozen_pdf = analyze_dataset(ds, spec, keep_cols=("doc_id",),
                                 vocab_ref=vocab_ref).to_pandas()
    assert set(frozen_pdf["terms"].iloc[0]) == set(cv)
    assert int(frozen_pdf["doc_len"].iloc[0]) == \
        sum(f for t, f in zip(open_pdf["terms"].iloc[0], open_pdf["tfs"].iloc[0]) if t in set(cv))


def test_vectorized_batch_path_bit_identical():
    """The Arrow-vectorized analyzer batch path (utf8_split_whitespace →
    dictionary-encode → per-unique-chunk analysis → factorize/bincount) must
    be BIT-identical to the per-doc Counter walk — same terms in the same
    first-occurrence order, same tfs/doc_len/n_terms, same keep filter —
    across full/simple modes, length thresholds, and non-en stemmers.
    Every oracle value-hash rests on this equivalence."""
    import random

    import pyarrow as pa

    from ir_base_ray.config import AnalyzerSpec
    from ir_base_ray.stages.analyze import AnalyzerActor

    random.seed(11)
    words = ["the", "running", "dogs", "cat's", "42", "...", "hello-world",
             "naïve", "Über", "a", "I", "Straße", "émigré!!", "NUM", "x" * 25]
    junk = "abcdefg ,.!?\t\n \x1c\x85-01923éüΣ "

    def rand_text():
        parts = []
        for _ in range(random.randrange(0, 40)):
            if random.random() < 0.5:
                parts.append(random.choice(words))
            else:
                parts.append("".join(random.choice(junk)
                                      for _ in range(random.randrange(1, 9))))
        return " ".join(parts)

    texts = [rand_text() for _ in range(300)] + ["", "   ", "\x1c\x85", "a", "ab c ab"]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})

    for spec in (AnalyzerSpec(), AnalyzerSpec(mode="simple"),
                 AnalyzerSpec(length_threshold=2), AnalyzerSpec(lang="de")):
        vec = AnalyzerActor(spec, keep_cols=("doc_id",))
        ref = AnalyzerActor(spec, keep_cols=("doc_id",))
        assert vec._vectorizable
        ref._vectorizable = False
        assert vec(batch).equals(ref(batch)), (spec.mode, spec.length_threshold, spec.lang)

    # ngram > 1 must stay on the per-doc walk (n-grams cross chunks)
    assert not AnalyzerActor(AnalyzerSpec(ngram=2), keep_cols=("doc_id",))._vectorizable


def test_expand_c_kernel_matches_numpy_twin():
    """The C expand-count kernel and the numpy factorize twin must produce
    identical (term, tf, keep, n_terms, doc_len) for random inputs."""
    import numpy as np

    from ir_base_ray.config import AnalyzerSpec
    from ir_base_ray.functions.ckernels import analyze_kernel
    from ir_base_ray.stages.analyze import AnalyzerActor

    lib = analyze_kernel()
    if lib is None:
        import pytest

        pytest.skip("no C compiler")
    rng = np.random.default_rng(7)
    actor = AnalyzerActor(AnalyzerSpec(length_threshold=1), keep_cols=())
    for _ in range(25):
        n_chunks = int(rng.integers(1, 40))
        nt = int(rng.integers(1, 25))
        k = rng.integers(0, 4, n_chunks)
        term_offsets = np.zeros(n_chunks + 1, np.int64)
        np.cumsum(k, out=term_offsets[1:])
        chunk_term_ids = rng.integers(0, nt, int(term_offsets[-1])).astype(np.int64)
        ndocs = int(rng.integers(1, 12))
        n_per_doc = rng.integers(0, 30, ndocs).astype(np.int32)
        occ_ids = rng.integers(0, n_chunks, int(n_per_doc.sum())).astype(np.int32)
        a = actor._expand_c(lib, occ_ids, n_per_doc, ndocs, term_offsets,
                            chunk_term_ids, nt)
        b = actor._expand_numpy(occ_ids, n_per_doc, ndocs, term_offsets,
                                chunk_term_ids, nt)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))
