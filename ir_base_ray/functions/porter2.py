"""Porter2 (Snowball "english") stemmer — pure-Python, from the published
algorithm description (snowballstem.org, "The English (Porter2) stemming
algorithm"). Behavior-compatible with the stemmer the reference vendors
(``org/tartarus/snowball/ext/englishStemmer.java``), including the standard
exception lists (skis/dying/... , inning/outing/... invariants) and the
``gener``/``commun``/``arsen`` R1 overrides, all of which are present in that
generated file.

Reference call site: ``Analyzer/DocAnalyzer.java:177-183`` (``SnowballStemming``
falls back to the input token when stemming fails; Snowball's ``stem()`` only
returns false on internal error, so the fallback never fires in practice).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariants
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)

_STEP2_SUFFIXES = (
    # (suffix, replacement) — longest-match-first order
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", None),  # special: -> "og" if preceded by l
    ("li", None),  # special: delete if preceded by valid li-ending
)

_STEP3_SUFFIXES = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", ""),  # special: only if in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4_SUFFIXES = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",  # special: only if preceded by s or t
    "al",
    "er",
    "ic",
)


def _compute_r1_r2(word: str) -> tuple[int, int]:
    r1 = len(word)
    if word.startswith(("gener", "commun", "arsen")):
        r1 = 5 if not word.startswith("commun") else 6
    else:
        for i in range(1, len(word)):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_with_short_syllable(word: str) -> bool:
    if len(word) == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if len(word) >= 3:
        return (
            word[-2] in _VOWELS
            and word[-1] not in _VOWELS
            and word[-1] not in "wxY"
            and word[-3] not in _VOWELS
        )
    return False


def _contains_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def stem(word: str) -> str:
    """Stem one token. Like the Java stemmer, input is NOT lowercased —
    uppercase letters are not vowels and match no suffixes, so tokens such as
    the literal "NUM" produced by Normalize pass through unchanged."""
    # order matches the vendored Java stemmer: length gate and exception list
    # are consulted BEFORE the initial apostrophe is stripped ("'s" -> "'s")
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    if word.startswith("'"):
        word = word[1:]

    # mark consonant-y as Y; like the Java stemmer, un-marking at the end
    # happens only if we marked something (pre-existing 'Y's stay otherwise)
    chars = list(word)
    marked = False
    if chars[0] == "y":
        chars[0] = "Y"
        marked = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
            marked = True
    word = "".join(chars)

    r1, r2 = _compute_r1_r2(word)

    # Step 0: strip 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_with_short_syllable(word):
                        word += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel that is not the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (longest match; apply only if suffix in R1)
    for suf, repl in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if len(word) >= 4 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3
    for suf, repl in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (in R2)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_with_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y") if marked else word


class CachedStemmer:
    """Memoizing wrapper — web text is Zipf-distributed, so a per-actor cache
    turns almost every stem() into a dict hit. One instance per analyzer actor
    (mirrors the per-core stemmer pool, ``MultiThreadedUserAnalyzer.java:39-62``)."""

    __slots__ = ("_cache", "_maxsize", "_stem")

    def __init__(self, maxsize: int = 1_000_000, stem_fn=None):
        self._cache: dict[str, str] = {}
        self._maxsize = maxsize
        self._stem = stem_fn or stem

    def __call__(self, word: str) -> str:
        c = self._cache
        hit = c.get(word)
        if hit is not None:
            return hit
        result = self._stem(word)
        if len(c) < self._maxsize:
            c[word] = result
        return result
