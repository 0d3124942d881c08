"""Token normalization — exact transcription of the reference semantics.

Reference: ``Analyzer/DocAnalyzer.java:165-174`` (``Normalize``) and
``utils/Utils.java:401-403`` (``isNumber``).

Order of operations (must match for byte-parity):
  1. Unicode NFKC normalization
  2. strip ALL non-word characters (Java ``\\W`` is ASCII: ``[^a-zA-Z0-9_]``,
     since the reference compiles patterns without UNICODE_CHARACTER_CLASS —
     so non-ASCII letters are REMOVED, e.g. "café" → NFKC → strip → "caf")
  3. lowercase (post-strip the token is pure ASCII ``[A-Za-z0-9_]``)
  4. if the token matches ``\\d+`` (ASCII digits, Java ``\\d``) → literal "NUM"
"""

from __future__ import annotations

import re
import unicodedata

_NON_WORD_ASCII = re.compile(r"[^a-zA-Z0-9_]+")
_ALL_DIGITS = re.compile(r"\d+\Z", re.ASCII)


def normalize(token: str) -> str:
    token = unicodedata.normalize("NFKC", token)
    token = _NON_WORD_ASCII.sub("", token)
    token = token.lower()
    if token and _ALL_DIGITS.match(token):
        return "NUM"
    return token


_NON_WORD_UNICODE = re.compile(r"\W+")  # \w is Unicode-aware in Python


def normalize_unicode(token: str) -> str:
    """Unicode-aware variant for the multilingual analyzer path
    (``AnalyzerSpec.lang != "en"``): same chain but the strip keeps
    non-ASCII letters. Deliberate, documented deviation — the reference's
    ASCII ``\\W`` (a Java default-flags artifact, DocAnalyzer.java:165-174)
    would delete every accented/umlaut character before its vendored
    non-English Snowball stemmers ever saw them."""
    token = unicodedata.normalize("NFKC", token)
    token = _NON_WORD_UNICODE.sub("", token)
    token = token.lower()
    if token and _ALL_DIGITS.match(token):
        return "NUM"
    return token
