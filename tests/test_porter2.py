"""Porter2 stemmer parity vs golden vectors generated from the vendored
Snowball english stemmer the reference uses (see SURVEY.md §7.0 decision 1)."""

import os

from ir_base_ray.functions.porter2 import CachedStemmer, stem


def test_golden_stems(golden_dir):
    bad = []
    with open(os.path.join(golden_dir, "stems.tsv"), encoding="utf-8") as f:
        for line in f:
            if "\t" not in line:
                continue
            word, expected = line.rstrip("\n").split("\t")
            got = stem(word)
            if got != expected:
                bad.append((word, expected, got))
    assert not bad, f"{len(bad)} stem mismatches, first: {bad[:5]}"


def test_known_examples():
    assert stem("consignment") == "consign"
    assert stem("knackeries") == "knackeri"
    assert stem("exceed") == "exceed"
    assert stem("skies") == "sky"
    assert stem("dying") == "die"
    assert stem("hopping") == "hop"
    assert stem("hoping") == "hope"
    assert stem("generate") == "generat"
    assert stem("communism") == "communism"
    assert stem("beautiful") == "beauti"
    assert stem("by") == "by"
    assert stem("say") == "say"
    assert stem("cry") == "cri"


def test_cached_stemmer_matches():
    s = CachedStemmer()
    for w in ["running", "running", "jumps", "beautiful", "NUM"]:
        assert s(w) == stem(w)
