"""Mention-level NER accuracy on natural (non-synthetic) text — M7
accuracy evidence.

The reference's statistical member is a pretrained Stanford CRF
(src/mpi/aida/ner/taggers/StanfordNER.java); this repo substitutes the
deterministic averaged-perceptron BIO tagger (ned/perceptron.py),
trained on the synthetic CoNLL-style corpus.  The synthetic
conformance suite proves pipeline wiring, but says nothing about how
the tagger ensemble behaves on REAL prose — this module measures
exactly that: a small corpus of freshly-authored news-register English
documents (the register of the reference's preparedinput fixtures,
testdata/preparedinput/preparedinputtest.tsv — the text here is
original, nothing is copied) with gold mention spans, scored
span-exact for three detector routes:

* ``trie``      — dictionary tagging only (M7's trie member), with a
  dictionary holding a SUBSET of the gold surfaces (the realistic
  case: the KB never covers everything);
* ``ensemble``  — the production route of ``ned.doc.prepare``:
  dictionary → perceptron (statistical spans lose to overlapping
  dictionary spans) → capitalized-run OOD tagger (loses to both);
* ``perceptron`` — the statistical member alone (trained on the
  synthetic corpus; this row is the honest domain-transfer number).

Everything is deterministic (fixed corpus, deterministic training), so
the resulting counts are pinned exactly by a VALUES oracle
(``ner_pr`` in __ray_entry__) and by tests/test_ner_eval.py.
"""

from __future__ import annotations

from types import SimpleNamespace

from aida_ray.ned.doc import (Mention, capitalized_tag, dictionary_tag,
                              hybrid_merge)
from aida_ray.text.tokenizer import conflate_token, tokenize

# Each doc is a list of (text_piece, is_entity) segments; gold spans are
# derived from concatenation, so offsets can never drift from the text.
DOC_SPECS: list[list[tuple[str, bool]]] = [
    [("", False), ("Angela Merkel", True), (" met ", False),
     ("Emmanuel Macron", True), (" in ", False), ("Strasbourg", True),
     (" on Tuesday to discuss farm subsidies.", False)],
    [("Shares of ", False), ("Siemens", True), (" fell after ", False),
     ("Deutsche Bank", True), (" cut its outlook for the ", False),
     ("Munich", True), ("-based group.", False)],
    [("", False), ("Kenya", True), (" beat ", False), ("Uganda", True),
     (" by three wickets in the final of the ", False),
     ("Africa Cup", True), (" in ", False), ("Nairobi", True),
     (".", False)],
    [("The spokesman said ", False), ("Peter Blackwood", True),
     (" would leave the ", False), ("European Commission", True),
     (" at the end of June.", False)],
    [("", False), ("Toyota", True), (" will recall 40,000 cars in ",
     False), ("Japan", True), (" and ", False), ("South Korea", True),
     (", a ministry official said.", False)],
    [("Heavy rain flooded parts of ", False), ("New South Wales", True),
     (" over the weekend, and ", False), ("Sydney", True),
     (" airport delayed dozens of flights.", False)],
    [("", False), ("Maria Santos", True), (" scored twice as ", False),
     ("Brazil", True), (" routed ", False), ("Bolivia", True),
     (" in a qualifier played in ", False), ("La Paz", True),
     (".", False)],
    [("The ", False), ("United Nations", True),
     (" warned that drought in the ", False), ("Horn of Africa", True),
     (" could displace two million people.", False)],
    [("", False), ("Novartis", True), (" said its new drug beat ",
     False), ("Pfizer", True), ("'s rival treatment in a late-stage "
     "trial.", False)],
    [("Voters in ", False), ("Bavaria", True),
     (" go to the polls on Sunday, with the premier of ", False),
     ("Bavaria", True), (" seeking a third term.", False)],
    [("", False), ("John Okafor", True), (", a union leader in ",
     False), ("Lagos", True), (", called the strike off after talks "
     "with the government of ", False), ("Nigeria", True),
     (".", False)],
    [("A court in ", False), ("Milan", True), (" fined ", False),
     ("Enel", True), (" over a 1996 pipeline spill near ", False),
     ("Genoa", True), (".", False)],
    [("", False), ("Rachel Kim", True), (" of ", False),
     ("Stanford University", True), (" won the physics prize for work "
     "on superconductors.", False)],
    [("Wheat futures rose in ", False), ("Chicago", True),
     (" after ", False), ("Russia", True), (" said it would curb "
     "exports through the port of ", False), ("Novorossiysk", True),
     (".", False)],
    [("The central bank of ", False), ("Iceland", True),
     (" raised rates, and governor ", False), ("Anna Sigurdsson", True),
     (" signalled more hikes.", False)],
    [("", False), ("Air France", True), (" and ", False),
     ("Lufthansa", True), (" cancelled flights to ", False),
     ("Tel Aviv", True), (" citing airspace restrictions.", False)],
]

# Surfaces the trie dictionary covers (the KB-known subset, ~60%).
DICT_SURFACES = [
    "Angela Merkel", "Emmanuel Macron", "Strasbourg", "Siemens",
    "Deutsche Bank", "Kenya", "Uganda", "Nairobi",
    "European Commission", "Toyota", "Japan", "South Korea", "Sydney",
    "Brazil", "Bolivia", "United Nations", "Pfizer", "Bavaria",
    "Lagos", "Nigeria", "Milan", "Genoa", "Chicago", "Russia",
    "Iceland", "Air France", "Lufthansa", "Tel Aviv",
]


# Structurally-distinct generalization probe (r5): sentence shapes the
# TRAINING template bank does not contain — passive voice, datelines,
# conjunction lists, age appositives, participial openers, quote-first
# attribution, parentheticals, name particles.  The training corpus
# (ned/ner_train.py) deliberately covers the same REGISTER as
# DOC_SPECS above; this second corpus checks the tagger did not merely
# memorize that template bank.  Text freshly authored, like DOC_SPECS.
OOD_DOC_SPECS: list[list[tuple[str, bool]]] = [
    [("", False), ("Henri Okonkwo", True), (" was arrested in ", False),
     ("Casablanca", True), (" on Friday.", False)],
    [("OSLO — ", False), ("Norsk Hydro", True),
     (" posted a record quarterly loss.", False)],
    [("", False), ("Renault", True), (", ", False), ("Fiat", True),
     (" and ", False), ("Peugeot", True),
     (" all cut production forecasts.", False)],
    [("", False), ("Ingrid Bergqvist", True), (", 54, was appointed "
     "chief executive of ", False), ("Telenor", True), (".", False)],
    [("Born in ", False), ("Rotterdam", True), (", ", False),
     ("Willem de Vries", True), (" studied at ", False),
     ("Leiden University", True), (".", False)],
    [("The deal gives ", False), ("Vodafone", True),
     (" control of ", False), ("Telecom Italia", True), (".", False)],
    [("“We cannot wait,” said ", False), ("Fatima al-Rashid", True),
     (", the mayor of ", False), ("Marrakesh", True), (".", False)],
    [("The order, placed with ", False), ("Airbus", True),
     (" in March, was cancelled without penalty.", False)],
    [("Talks between ", False), ("Ghana", True), (" and ", False),
     ("Ivory Coast", True), (" collapsed late on Thursday.", False)],
    [("A fire at the ", False), ("Gdansk", True),
     (" shipyard injured three welders, the mayor's office said.",
      False)],
]


def _build(specs) -> list[tuple[str, str, list[tuple[int, int]]]]:
    out = []
    for d, spec in enumerate(specs):
        pos, text, gold = 0, [], []
        for piece, is_ent in spec:
            if is_ent:
                gold.append((pos, len(piece)))
            text.append(piece)
            pos += len(piece)
        out.append((f"ner://{d}", "".join(text), gold))
    return out


def build_docs() -> list[tuple[str, str, list[tuple[int, int]]]]:
    """(doc_id, text, gold spans as (begin, length)) per document."""
    return _build(DOC_SPECS)


def _trie_kb():
    """Minimal duck-typed view for dictionary_tag (it reads only
    ``dictionary`` and ``mention_max_tokens``)."""
    dictionary = {conflate_token(s): [(1, 1.0)] for s in DICT_SURFACES}
    return SimpleNamespace(
        dictionary=dictionary,
        mention_max_tokens=max(s.count(" ") + 1 for s in DICT_SURFACES))


_DEFAULT_MODEL = None


def _default_model():
    """The production-configuration model (deterministic training on
    the fixed synthetic corpora), trained once per process — the
    ner_pr and ner_generalization queries share it."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        from aida_ray.kb.synth import synth_kb
        from aida_ray.ned.perceptron import train_production
        _DEFAULT_MODEL = train_production(synth_kb(200, seed=42))
    return _DEFAULT_MODEL


def evaluate_routes(model=None) -> list[dict]:
    """tp/fp/fn (span-exact) per detector route over the natural-text
    corpus.  ``model``: a trained PerceptronNER; trained on the default
    synthetic corpus when omitted (the production configuration)."""
    if model is None:
        model = _default_model()
    kb = _trie_kb()
    counts = {r: [0, 0, 0] for r in ("trie", "ensemble", "perceptron")}
    for _doc_id, text, gold_list in build_docs():
        gold = set(gold_list)
        tokens = tokenize(text)
        trie = dictionary_tag(text, tokens, kb)
        stat = model.find_mentions(text, tokens)
        # production ensemble order (ned.doc.prepare): statistical
        # spans lose to dictionary overlaps, OOD cap-runs lose to both
        ens = hybrid_merge(hybrid_merge(trie, stat),
                           capitalized_tag(text, tokens))
        for route, mentions in (("trie", trie), ("ensemble", ens),
                                ("perceptron", stat)):
            pred = {(m.char_offset, m.char_length) for m in mentions}
            c = counts[route]
            c[0] += len(pred & gold)
            c[1] += len(pred - gold)
            c[2] += len(gold - pred)
    rows = []
    for route in ("trie", "ensemble", "perceptron"):
        tp, fp, fn = counts[route]
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        rows.append({"route": route, "tp": tp, "fp": fp, "fn": fn,
                     "precision_1e6": round(prec * 1e6),
                     "recall_1e6": round(rec * 1e6)})
    return rows


def evaluate_generalization(model=None) -> list[dict]:
    """Span-exact P/R of the statistical tagger ALONE over the
    structurally-distinct probe corpus (OOD_DOC_SPECS) — sentence
    shapes absent from the training template bank.  This is the
    honest number guarding against "the tagger merely memorized its
    template grammar"; pinned by the ``ner_generalization`` oracle."""
    if model is None:
        model = _default_model()
    tp = fp = fn = 0
    misses: list[str] = []
    for _doc_id, text, gold_list in _build(OOD_DOC_SPECS):
        gold = set(gold_list)
        pred = {(m.char_offset, m.char_length)
                for m in model.find_mentions(text)}
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
        misses.extend(sorted(text[b:b + ln] for b, ln in gold - pred))
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return [{"corpus": "ood_structures", "tp": tp, "fp": fp, "fn": fn,
             "precision_1e6": round(prec * 1e6),
             "recall_1e6": round(rec * 1e6),
             "missed": "|".join(misses)}]
