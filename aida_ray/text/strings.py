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
