"""Natural-text NER accuracy evidence (M7, pipelines/ner_eval.py)."""


def test_gold_spans_point_at_entities():
    from aida_ray.pipelines.ner_eval import build_docs
    docs = build_docs()
    assert len(docs) == 16
    for _id, text, gold in docs:
        assert gold, "every doc carries at least one gold mention"
        for b, ln in gold:
            surface = text[b:b + ln]
            assert surface == surface.strip() and surface[0].isupper()


def test_routes_pinned_counts():
    """Deterministic corpus + deterministic training => exact counts.
    A kernel change that shifts tagging must update these pins (and
    the ner_pr VALUES oracle) deliberately."""
    from aida_ray.pipelines.ner_eval import evaluate_routes
    by = {r["route"]: r for r in evaluate_routes()}
    assert (by["trie"]["tp"], by["trie"]["fp"], by["trie"]["fn"]) == \
        (28, 0, 15)
    assert (by["ensemble"]["tp"], by["ensemble"]["fp"],
            by["ensemble"]["fn"]) == (33, 14, 10)
    assert (by["perceptron"]["tp"], by["perceptron"]["fp"],
            by["perceptron"]["fn"]) == (17, 26, 26)
    # the ensemble exists to add recall over the trie without giving
    # the precision floor away entirely
    assert by["ensemble"]["recall_1e6"] > by["trie"]["recall_1e6"]
    assert by["ensemble"]["precision_1e6"] > 500_000


def test_trie_subset_is_partial():
    """The dictionary deliberately covers only a subset of gold
    surfaces — full coverage would make the trie row a tautology."""
    from aida_ray.pipelines.ner_eval import (DICT_SURFACES, DOC_SPECS)
    gold_surfaces = {p for spec in DOC_SPECS for p, is_e in spec if is_e}
    known = set(DICT_SURFACES)
    assert known < gold_surfaces
    assert len(known) / len(gold_surfaces) < 0.9
