"""Text extraction / cleaning (operators M9 + M14 in SURVEY.md §2.2).

- ``clean_html``: exact transcription of ``utils/Utils.java:508-541``
  (``cleanHTML`` + ``cleanVideoReview``): strips ``<!-- ... -->`` comment
  blocks (each inter-comment segment is Java-``trim()``-ed, segments are
  concatenated with NO separator, the tail after the last ``-->`` is NOT
  trimmed), then strips the CDATA video-review boilerplate.
- ``canonicalize_ws``: ``MultiThreadedReviewAnalyzer.java:53`` —
  ``replaceAll("\\n"," ").trim().replaceAll("\\s+"," ")`` with Java ASCII
  ``\\s`` and Java ``trim`` (strips chars <= U+0020).
"""

from __future__ import annotations

import re

_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_JAVA_TRIM_CHARS = "".join(chr(c) for c in range(0x21))


def java_trim(s: str) -> str:
    return s.strip(_JAVA_TRIM_CHARS)


def canonicalize_ws(s: str) -> str:
    s = s.replace("\n", " ")
    s = java_trim(s)
    return _JAVA_WS.sub(" ", s)


def clean_video_review(content: str) -> str | None:
    if "// <![CDATA[" not in content or "Length::" not in content:
        return content
    start = content.find("// <![CDATA[")
    end = content.find("Length::", start)
    end = content.find("Mins", end) + 4
    out = content[:start] + content[end:]
    return out if out else None


def clean_html(content: str) -> str | None:
    if "<!--" not in content or "-->" not in content:
        return content
    start = 0
    end = content.find("<!--")
    parts: list[str] = []
    while end != -1:
        if end > start:
            parts.append(java_trim(content[start:end]))
        start = content.find("-->", end) + 3  # mirrors indexOf()+3, even when -1
        end = content.find("<!--", start)
    if start < len(content):
        parts.append(content[start:])
    return clean_video_review("".join(parts))


def extract_text(html: bytes | str) -> str:
    """html payload → cleaned, whitespace-canonical text. Tag stripping is a
    plain regex (the reference never parses HTML; its corpora are text/JSON —
    this stage exists for the corpus schema's ``html:binary`` column)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    cleaned = clean_html(html)
    if cleaned is None:
        return ""
    cleaned = re.sub(r"<[^>]*>", " ", cleaned)
    return canonicalize_ws(cleaned)
