"""Input-text inverted index + min-cover window.

References:
  - util/InputTextInvertedIndex.java (positions with/without stopwords,
    mention-span exclusion and position shifting)
  - util/MinCoverCalculator.java / util/MinCover.java
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field


class InvertedIndex:
    """Token-id -> positions, in two coordinate systems.

    ``incl`` positions are raw token positions; ``excl`` positions are
    indices in the stopword-free token stream.  Stopwords (and unknown
    tokens, id 0) are kept only in the incl coordinates and are never
    query-able — matching InputTextInvertedIndex.java:22-47 given that
    unknown ids collide with the Trove no-entry value.
    """

    __slots__ = ("incl", "excl", "word_set")

    def __init__(self, token_ids: list[int], stop_ids: frozenset[int]):
        self.incl: dict[int, list[int]] = {}
        self.excl: dict[int, list[int]] = {}
        no_stop_pos = 0
        for pos, tok in enumerate(token_ids):
            self.incl.setdefault(tok, []).append(pos)
            if tok not in stop_ids:
                self.excl.setdefault(tok, []).append(no_stop_pos)
                no_stop_pos += 1
        self.word_set = frozenset(self.excl)

    def contains_word(self, word: int, m_start: int, m_end: int) -> bool:
        """Word present (non-stop) with >=1 occurrence outside the mention span."""
        if word not in self.excl:
            return False
        return any(p < m_start or p > m_end for p in self.incl[word])

    def positions(self, word: int, m_start: int, m_end: int) -> list[int]:
        """Occurrence positions in stopword-free coordinates, mention span
        excluded; positions after the mention are shifted left by the
        mention token length (InputTextInvertedIndex.java:63-85)."""
        m_len = m_end - m_start + 1
        out = []
        incl = self.incl[word]
        excl = self.excl[word]
        for i, p in enumerate(incl):
            if p < m_start:
                out.append(excl[i])
            elif p > m_end:
                out.append(excl[i] - m_len)
        return out


@dataclass
class MinCover:
    length: int
    start_positions: list[int] = field(default_factory=list)
    end_positions: list[int] = field(default_factory=list)


def min_cover(positions: list[list[int]]) -> MinCover:
    """Smallest window covering one occurrence of every symbol
    (MinCoverCalculator.java)."""
    if not positions:
        return MinCover(length=-1)
    k = len(positions)
    if k == 1:
        return MinCover(length=1, start_positions=list(positions[0]),
                        end_positions=list(positions[0]))

    heap: list[tuple[int, int]] = []
    for sym, plist in enumerate(positions):
        for p in plist:
            heap.append((p, sym))
    heapq.heapify(heap)

    covered = [-1] * k
    covered_count = 0
    while covered_count < k:
        p, sym = heapq.heappop(heap)
        if covered[sym] == -1:
            covered_count += 1
        covered[sym] = p

    lo = min(covered)
    hi = max(covered)
    best = hi - lo + 1
    mc = MinCover(length=best, start_positions=[lo], end_positions=[hi])

    while best > k and heap:
        p, sym = heapq.heappop(heap)
        hi = p
        if covered[sym] == lo:
            covered[sym] = p
            lo = min(covered)
        else:
            covered[sym] = p
        length = hi - lo + 1
        if length < best:
            best = length
            mc = MinCover(length=best, start_positions=[lo], end_positions=[hi])
        elif length == best:
            mc.start_positions.append(lo)
            mc.end_positions.append(hi)
    return mc
