"""Document chunkers (SURVEY M12).

References:
  - SingleChunkDocumentChunker (preparation/documentchunking/, 30 LoC)
  - FixedLengthDocumentChunker.java:27-68 — fixed number of SENTENCES
    per chunk, chunk id "<docId>_<i>"
  - PageBasedDocumentChunker — split on page-number metadata; our pages
    carry none, so page = paragraph (blank-line delimited)

Chunks re-tokenize independent sub-documents; mention detection and
disambiguation run per chunk, and chunk results are merged by
cross-chunk reconciliation (ResultsReconciler semantics,
aida_ray.ned.disambiguator.reconcile_chunks).
"""

from __future__ import annotations

from aida_ray.text.tokenizer import tokenize


def single_chunk(text: str) -> list[tuple[str, int]]:
    """[(chunk_text, char_offset)]."""
    return [(text, 0)]


def fixed_length_chunks(text: str, sentences_per_chunk: int = 5) -> list[tuple[str, int]]:
    """Split on sentence boundaries every N sentences (char offsets kept)."""
    tokens = tokenize(text)
    if not tokens:
        return [(text, 0)]
    boundaries = [0]
    last_sentence = tokens[0].sentence
    for t in tokens:
        if t.sentence != last_sentence:
            last_sentence = t.sentence
            if t.sentence % sentences_per_chunk == 0:
                boundaries.append(t.begin)
    out = []
    for i, start in enumerate(boundaries):
        end = boundaries[i + 1] if i + 1 < len(boundaries) else len(text)
        chunk = text[start:end]
        if chunk.strip():
            out.append((chunk, start))
    return out or [(text, 0)]


def paragraph_chunks(text: str) -> list[tuple[str, int]]:
    """Page-based analogue: one chunk per newline-separated paragraph."""
    out = []
    pos = 0
    for para in text.split("\n"):
        if para.strip():
            out.append((para, pos))
        pos += len(para) + 1
    return out or [(text, 0)]


CHUNKERS = {
    "single": lambda text, **kw: single_chunk(text),
    "fixed": fixed_length_chunks,
    "paragraph": lambda text, **kw: paragraph_chunks(text),
}
