"""Bounded top-k with the reference's exact tie semantics.

Transcription of ``structures/MyPriorityQueue.java:16-74`` (descending mode)
over items ordered by a float score (``structures/_RankItem.java:26-33``
compares on value only):

- the backing vector is kept sorted descending;
- ``add`` when full: if ``compare(last, new) >= 0`` (i.e. the incumbent
  minimum is >= the newcomer) the newcomer is DISCARDED — the incumbent wins
  ties;
- insert position is found by binary search where an equal element returns
  ``mid`` — i.e. an equal-scored newcomer lands *before* the equal element the
  bisection happens to probe (NOT a stable insertion) — we replicate the exact
  recursion so ordering among ties is bit-identical.

Feed candidates in deterministic (doc_id ascending) order for rank-identical
results.
"""

from __future__ import annotations

from typing import Any


class BoundedTopK:
    """size-k descending top-k; items are (score, payload) pairs."""

    __slots__ = ("k", "_scores", "_items")

    def __init__(self, k: int):
        self.k = k
        self._scores: list[float] = []
        self._items: list[Any] = []

    def _find(self, score: float, start: int, end: int) -> int:
        # transcribes MyPriorityQueue.find(:63-74): descending order;
        # compare(object, mid) > 0 → left half; == 0 → mid; < 0 → right half
        while start != end:
            mid = (start + end) // 2
            pivot = self._scores[mid]
            if score > pivot:
                end = mid
            elif score == pivot:
                return mid
            else:
                start = mid + 1
        return start

    def _insert(self, score: float, payload: Any) -> None:
        pos = self._find(score, 0, len(self._scores))
        self._scores.insert(pos, score)
        self._items.insert(pos, payload)

    def add(self, score: float, payload: Any) -> bool:
        """MyPriorityQueue.add(:40-52)."""
        if len(self._scores) < self.k:
            self._insert(score, payload)
            return True
        if self._scores[-1] >= score:
            return False  # incumbent wins ties
        self._insert(score, payload)
        del self._scores[self.k]
        del self._items[self.k]
        return True

    def __len__(self) -> int:
        return len(self._scores)

    @property
    def full(self) -> bool:
        return len(self._scores) >= self.k

    @property
    def threshold(self) -> float:
        """Current admission threshold (for WAND pruning): a new candidate
        enters only if score > threshold once the queue is full."""
        if len(self._scores) < self.k:
            return float("-inf")
        return self._scores[-1]

    def result(self) -> list[tuple[float, Any]]:
        """Descending (score, payload) list, ties ordered exactly as the
        reference vector would hold them."""
        return list(zip(self._scores, self._items))
