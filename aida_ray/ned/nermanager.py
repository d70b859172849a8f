"""NERManager-style multi-tagger annotation filtering + reconciliation.

Faithful port of the orchestration layer around the taggers
(src/mpi/ner/NERManager.java:103-226):
  - ``filter_annotations``: drop single-character mentions
    (filterAnnotationsBySingleChar:110-125) and mentions whose first
    token starts a sentence (filterAnnotationsIfBeginningOfSentence:
    127-165 — a name with no token at its exact start offset is KEPT,
    matching the reference's warn-and-add branch);
  - ``reconcile_annotations``: pool all taggers' names, sort by start,
    group transitively-overlapping runs, keep the LONGEST name of each
    run and score it with the number of distinct agreeing annotators
    (reconcileAnnotations:167-226).

Golden tests ported from test/mpi/ner/NERManagerTest.java.
"""

from __future__ import annotations

from dataclasses import dataclass

from aida_ray.text.tokenizer import Token, tokenize


@dataclass
class Name:
    """mpi.ner.data.Name: surface + char start; end = start + len."""
    name: str
    start: int
    annotator: str = ""
    score: float = 0.0

    @property
    def end(self) -> int:
        return self.start + len(self.name)

    @property
    def length(self) -> int:
        return len(self.name)


def filter_annotations(annotations: dict[str, list[Name]],
                       tokens: list[Token],
                       remove_single_char: bool = True,
                       remove_sentence_initial: bool = True
                       ) -> dict[str, list[Name]]:
    out = annotations
    if remove_single_char:
        out = {ner: [n for n in names if n.length > 1]
               for ner, names in out.items()}
    if remove_sentence_initial:
        offset2token = {t.begin: t for t in tokens}
        filtered: dict[str, list[Name]] = {}
        for ner, names in out.items():
            keep: list[Name] = []
            for n in names:
                t = offset2token.get(n.start)
                if t is None:
                    # offset misalignment: reference warns and keeps
                    keep.append(n)
                elif t.token_id > 0 and \
                        tokens[t.token_id - 1].sentence == t.sentence:
                    keep.append(n)
            filtered[ner] = keep
        out = filtered
    return out


def reconcile_annotations(annotations: dict[str, list[Name]]) -> list[Name]:
    all_names: list[Name] = []
    for ner, names in annotations.items():
        for n in names:
            all_names.append(Name(n.name, n.start, annotator=ner or n.annotator))
    all_names.sort(key=lambda n: n.start)
    reconciled: list[Name] = []
    overlapping: list[Name] = []
    max_end = -1
    for n in all_names:
        if not overlapping:
            overlapping.append(n)
            max_end = n.end
            continue
        if n.start <= max_end:
            overlapping.append(n)
        else:
            reconciled.append(_reconcile_overlapping(overlapping))
            overlapping = [n]
        max_end = max(max_end, n.end)
    if overlapping:
        reconciled.append(_reconcile_overlapping(overlapping))
    return reconciled


def _reconcile_overlapping(overlapping: list[Name]) -> Name:
    if len(overlapping) == 1:
        return overlapping[0]
    longest = overlapping[0]
    annotators = {longest.annotator}
    for n in overlapping[1:]:
        annotators.add(n.annotator)
        if n.length > longest.length:
            longest = n
    longest.score = float(len(annotators))
    return longest


def detect_names(text: str,
                 taggers: dict[str, object]) -> list[Name]:
    """NERManager.findNames: run every tagger, filter, reconcile.

    Each tagger is a callable ``(text, tokens) -> list[Name]``."""
    tokens = tokenize(text)
    annotations = {ner: tagger(text, tokens)
                   for ner, tagger in taggers.items()}
    return reconcile_annotations(filter_annotations(annotations, tokens))
