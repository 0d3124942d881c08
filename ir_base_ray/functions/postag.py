"""M12/M13 substitutions: rule-based POS tagging + sentiment lexicon scoring.

The reference tags tokens with an OpenNLP maxent model
(``DocAnalyzer.java:159-162,426-452``) and scores sentiment from the
SentiWordNet file (``:198-220``); neither model file ships in this
container, so — per the SURVEY §7.0 substitution policy (same decision as
the rule tokenizer) — the rebuild PINS a deterministic rule tagger and a
built-in polarity lexicon. Both are simple enough to mirror exactly in SQL,
so unlike the reference this path is oracle-checkable.

- Tagger (suffix rules over simple-mode tokens): closed adverb list or
  ``-ly`` (len>3) → RB; adjectival suffixes (len>4) → JJ; else NN. Only
  JJ/RB matter downstream (``constructPOSSpVct`` keeps adj/adv only).
- Sentiment: lexicon hit → polarity in [−1, 1]; miss → skipped (the
  reference's ``extract == -2`` sentinel); doc score = Σ hits / #tokens
  (``sentiWordScore`` :198-220 averages over ALL tokens).
"""

from __future__ import annotations

ADVERB_WORDS = frozenset({
    "very", "quite", "too", "so", "rather", "almost", "always", "never",
    "often", "really", "soon", "now", "then", "here", "there",
})

ADJ_SUFFIXES = ("able", "ible", "ful", "ous", "ive", "ish", "less", "ic", "al")

# deterministic built-in polarity lexicon (public sentiment words; the
# 0.125-grid values echo SentiWordNet's eighths)
SENTI_LEXICON = {
    "good": 0.625, "great": 0.75, "excellent": 0.875, "best": 0.75,
    "better": 0.5, "nice": 0.5, "love": 0.625, "like": 0.25,
    "happy": 0.625, "amazing": 0.75, "wonderful": 0.75, "perfect": 0.875,
    "fine": 0.375, "helpful": 0.5, "useful": 0.5, "fast": 0.25,
    "easy": 0.375, "clean": 0.375, "fresh": 0.375, "right": 0.25,
    "bad": -0.625, "worst": -0.875, "worse": -0.625, "terrible": -0.75,
    "awful": -0.75, "hate": -0.625, "poor": -0.5, "wrong": -0.375,
    "broken": -0.5, "slow": -0.25, "hard": -0.25, "sad": -0.5,
    "ugly": -0.5, "dirty": -0.5, "boring": -0.5, "annoying": -0.625,
    "horrible": -0.875, "useless": -0.625, "expensive": -0.25, "fail": -0.5,
}


def rule_pos_tag(token: str) -> str:
    """→ 'RB' | 'JJ' | 'NN' (pinned rule spec; see module docstring)."""
    if token in ADVERB_WORDS:
        return "RB"
    if len(token) > 3 and token.endswith("ly"):
        return "RB"
    if len(token) > 4 and token.endswith(ADJ_SUFFIXES):
        return "JJ"
    return "NN"


def senti_score(tokens: list[str]) -> float:
    """``sentiWordScore``: Σ lexicon hits / #tokens; 0.0 for empty docs."""
    if not tokens:
        return 0.0
    total = 0.0
    for t in tokens:
        v = SENTI_LEXICON.get(t)
        if v is not None:           # miss = the reference's -2 sentinel skip
            total += v
    return total / len(tokens)
