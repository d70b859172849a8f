"""CoNLL-style conformance gate: pipeline P/R on testb >= 0.95."""

from aida_ray.kb.synth import synth_kb
from aida_ray.pipelines.conformance import (generate_conll_corpus,
                                            run_conformance)
from aida_ray.sources.conll_tsv import parse_conll_tsv


def test_conll_corpus_wellformed():
    kb = synth_kb(200, seed=42)
    tsv = generate_conll_corpus(kb, 20)
    docs = parse_conll_tsv(tsv)
    assert len(docs) == 20
    for d in docs:
        for m in d.mentions:
            assert d.text[m.begin:m.begin + m.length] == m.mention
    # deterministic
    assert tsv == generate_conll_corpus(kb, 20)


def test_testb_precision_recall():
    kb = synth_kb(500, seed=42)
    pr, _pred = run_conformance(kb, n_docs=200)
    assert pr.precision >= 0.95
    assert pr.recall >= 0.95
