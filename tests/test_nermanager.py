"""Golden ports of test/mpi/ner/NERManagerTest.java."""

from aida_ray.ned.nermanager import (Name, filter_annotations,
                                     reconcile_annotations)
from aida_ray.text.tokenizer import tokenize


def test_filter_annotations_golden():
    # NERManagerTest.testFilterAnnotations
    text = "Mention at the beginning. Mention at the End. This A should be gone."
    tokens = tokenize(text)
    annotations = {"test": [Name("Mention", 0), Name("Mention", 26),
                            Name("End", 41), Name("A", 51)]}
    out = filter_annotations(annotations, tokens)["test"]
    assert len(out) == 1
    assert out[0].name == "End"


def test_reconcile_annotations_golden():
    # NERManagerTest.testReconcileAnnotations — two taggers submit the
    # same list; longest span per overlap run wins, 2 names survive
    ann = [Name("pablo", 5), Name("pablo picasso", 5),
           Name("picasso test", 10), Name("diego maradona", 50)]
    annotations = {"test": list(ann), "test1": list(ann)}
    names = reconcile_annotations(annotations)
    assert len(names) == 2
    assert names[0].name == "pablo picasso" and names[0].start == 5
    assert names[1].name == "diego maradona" and names[1].start == 50
    # score = number of distinct agreeing annotators
    assert names[0].score == 2.0


def test_reconcile_single_no_score():
    names = reconcile_annotations({"a": [Name("solo", 3)]})
    assert len(names) == 1 and names[0].score == 0.0
