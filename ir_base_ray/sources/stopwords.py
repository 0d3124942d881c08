"""Stopword list loading.

Reference: ``Analyzer/DocAnalyzer.java:141-156`` (``LoadStopwords``) — each
line is passed through ``SnowballStemming(Normalize(line))`` at load time, and
the *stemmed+normalized* form goes into the set; ``isLegit`` then tests
stemmed tokens against it.

``ir_base_ray/data/stopwords.txt`` is a committed copy of the standard
749-word English stopword list the reference ships as data
(``data/Model/stopwords.dat``).
"""

from __future__ import annotations

import os

from ir_base_ray.functions.normalize import normalize
from ir_base_ray.functions.porter2 import stem

DEFAULT_STOPWORDS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "stopwords.txt"
)


def load_stopwords(path: str | None = None) -> frozenset[str]:
    """Load and stem+normalize the stopword list (mirrors LoadStopwords)."""
    path = path or DEFAULT_STOPWORDS_PATH
    out = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.add(stem(normalize(line)))
    return frozenset(out)
