"""String/set scalar utilities ported from the reference (SURVEY §2.9).

References:
  - StringUtils.getNgrams (util/StringUtils.java:22-44): boundary-padded
    character n-grams, used by the LSH fuzzy-lookup feature extractor;
  - MathUtil.computeJaccardSimilarity (used by EntityLookup.java:217-221).
"""

from __future__ import annotations

BOUNDARY_CHAR = "_"


def get_ngrams(s: str, length: int) -> set[str]:
    """Boundary-padded n-grams: "ab",2 → {_a, ab, b_};
    "abcd",3 → {__a, _ab, abc, bcd, cd_, d__}."""
    out: set[str] = set()
    for i in range(-length + 1, len(s)):
        gram = []
        j = i
        while j < 0:
            gram.append(BOUNDARY_CHAR)
            j += 1
        while len(gram) < length and j < len(s):
            gram.append(s[j])
            j += 1
        while len(gram) < length:
            gram.append(BOUNDARY_CHAR)
        out.add("".join(gram))
    return out


def jaccard_sets(a: set, b: set) -> float:
    """|A ∩ B| / |A ∪ B| (MathUtil.computeJaccardSimilarity)."""
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------- date utils

_DAY_MS = 24 * 60 * 60 * 1000


def round_to_midnight(ts_ms: int) -> int:
    """Truncate an epoch-millis timestamp to its UTC midnight
    (DateTimeUtils.roundToMidnight)."""
    return (ts_ms // _DAY_MS) * _DAY_MS


def get_day_range(start_ms: int, end_ms: int) -> list[int]:
    """Inclusive list of day timestamps from start to end in day steps
    (DateTimeUtils.getDayRange); endpoints are included as given."""
    out = [start_ms]
    cur = round_to_midnight(start_ms) + _DAY_MS
    while cur < end_ms:
        out.append(cur)
        cur += _DAY_MS
    if end_ms != start_ms:
        out.append(end_ms)
    return out
