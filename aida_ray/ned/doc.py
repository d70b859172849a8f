"""Document preparation: manual markup, mention detection, alignment.

Replaces the reference's Preparator flow
(src/mpi/aida/preparator/Preparator.java:71-123):
  - ManualFilter parses ``[[...]]`` spans
    (preparation/mentionrecognition/ManualFilter.java:31-60)
  - the automatic tagger is a dictionary-trie tagger (the deterministic
    analogue of ner/taggers/TernaryTreeDictionary.java chosen over the
    Stanford CRF, see SURVEY.md §7.2)
  - HybridFilter merges manual + automatic, manual wins on overlap
    (preparation/mentionrecognition/HybridFilter.java)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from aida_ray.kb.kb import KB
from aida_ray.text.tokenizer import Token, conflate_token, normalize_whitespace, tokenize


@dataclass
class Mention:
    mention: str                 # surface string
    char_offset: int
    char_length: int
    start_token: int = -1
    end_token: int = -1
    sentence: int = -1
    manual: bool = False
    candidates: list[tuple[int, float]] = field(default_factory=list)  # (entity, prior)
    priors: dict[int, float] = field(default_factory=dict)

    @property
    def key(self) -> tuple[str, int, int]:
        return (self.mention, self.char_offset, self.char_length)

    def normalized(self) -> str:
        return normalize_whitespace(self.mention)


@dataclass
class PreparedDoc:
    doc_id: str
    text: str                    # cleaned text (markup removed)
    tokens: list[Token]
    token_ids: list[int]         # context word ids (unknown -> 0)
    mentions: list[Mention]


START_TAG = "[["
END_TAG = "]]"
_TAG = len(START_TAG)


def manual_filter(text: str) -> tuple[str, list[Mention]]:
    """Strip ``[[...]]`` markup, return cleaned text + mention char spans."""
    out: list[str] = []
    mentions: list[Mention] = []
    s = 0
    e = text.find(START_TAG)
    removed = 0
    while e >= 0:
        out.append(text[s:e])
        s = e
        e = text.find(END_TAG, s)
        if e == -1:
            out.append(text[s:])
            s = len(text)
            break
        name = text[s + _TAG:e]
        if name.strip():
            mentions.append(Mention(
                mention=name,
                char_offset=s - removed,
                char_length=e - (s + _TAG),
                manual=True,
            ))
        removed += 2 * _TAG
        out.append(name)
        s = e + _TAG
        e = text.find(START_TAG, s)
    out.append(text[s:])
    return "".join(out), mentions


def align_mentions_to_tokens(mentions: list[Mention], tokens: list[Token]) -> list[Mention]:
    """Keep mentions whose char span matches token boundaries exactly
    (ManualFilter.tokenize drops misaligned mentions)."""
    begin_index = {t.begin: t for t in tokens}
    end_index = {t.end: t for t in tokens}
    kept = []
    for m in mentions:
        start = begin_index.get(m.char_offset)
        end = end_index.get(m.char_offset + m.char_length)
        if start is None or end is None or end.token_id < start.token_id:
            continue
        m.start_token = start.token_id
        m.end_token = end.token_id
        m.sentence = start.sentence
        kept.append(m)
    return kept


def trim_surface_len(surface: str) -> int:
    """Length of the mention surface after trimming attachments the
    tokenizer glues onto a name (M9 mention-normalizer family):

    * trailing possessive ``'s`` / ``’s`` — ``Pfizer's`` → ``Pfizer``;
    * a trailing lowercase adjectival hyphen compound from a small
      closed list — ``Munich-based`` → ``Munich`` (legitimately
      hyphenated names like ``Jean-Pierre`` keep their capital tail
      and are untouched).

    Returns the (possibly unchanged) surface length."""
    n = len(surface)
    if n >= 3 and surface[n - 2] in "'’" and surface[n - 1] in "sS":
        return n - 2
    h = surface.rfind("-")
    if 0 < h < n - 1:
        from aida_ray.ned.ner_train import HYPHEN_TAILS
        if surface[h + 1:] in HYPHEN_TAILS:
            return h
    return n


def kb_cjk_lexicon(kb) -> frozenset[str]:
    """CJK dictionary surfaces of a KB, for zh greedy segmentation
    (tokenize_zh).  Derived once per KB instance and cached on it —
    the per-actor cost is one dictionary scan, not one per document."""
    lex = getattr(kb, "_cjk_lexicon", None)
    if lex is None:
        import re as _re
        cjk = _re.compile(r"^[㐀-鿿豈-﫿]{2,}$")
        lex = frozenset(s for s in kb.dictionary if cjk.match(s))
        try:
            kb._cjk_lexicon = lex
        except AttributeError:            # frozen/slots KB views
            pass
    return lex


def _looks_like_name(tok: Token) -> bool:
    # upper/digit initial, or a CASELESS script (Arabic/CJK — no
    # capitalization signal exists, so the dictionary decides alone)
    t = tok.text
    if len(t) <= 1:
        return False
    c = t[0]
    return c.isupper() or c.isdigit() or \
        (c.isalpha() and not c.islower() and not c.isupper())


def _german_compound_head(word: str, kb: KB) -> str | None:
    """German compound-aware dictionary probe: a capitalized compound
    like ``Knebworthfestival`` carries the entity as its MODIFIER with
    a lowercase head noun (optionally behind a linking element
    ``-s/-es/-n/-en/-e`` or hyphen).  Returns the longest leading
    segment that is a dictionary surface when the remainder looks like
    a compound head (≥4 lowercase letters); None otherwise.
    Deterministic stand-in for the reference's Stanford German
    pipeline's compound handling (TokenizerManager GERMAN_TOKENS
    route)."""
    if len(word) < 8 or not word[0].isupper():
        return None
    if "-" in word:                      # hyphenated compound: X-kopf
        left, _, rest = word.partition("-")
        if len(left) >= 4 and left.isalpha() and rest[:1].islower() \
                and conflate_token(left) in kb.dictionary:
            return left
        return None
    if not word.isalpha():
        return None
    for i in range(len(word) - 4, 3, -1):
        left, rest = word[:i], word[i:]
        if rest.islower() and conflate_token(left) in kb.dictionary:
            return left
    return None


def dictionary_tag(text: str, tokens: list[Token], kb: KB,
                   language: str = "en") -> list[Mention]:
    """Greedy longest-match dictionary tagging over conflated surfaces.

    Tags token spans (up to the longest dictionary surface) whose
    conflated surface text is a dictionary key and whose first token is
    name-like.  Deterministic; replaces Stanford NER.  Single-character
    names are dropped (NERManager.java:103-160).  On the ``de`` route
    an unmatched capitalized token additionally gets the compound
    probe (:func:`_german_compound_head`) — the emitted mention covers
    only the matched modifier segment, so downstream candidate lookup
    by surface works unchanged.
    """
    max_len = kb.mention_max_tokens
    found: list[Mention] = []
    i = 0
    n = len(tokens)
    while i < n:
        if not _looks_like_name(tokens[i]):
            i += 1
            continue
        match = None
        for L in range(min(max_len, n - i), 0, -1):
            surface = text[tokens[i].begin:tokens[i + L - 1].end]
            if "\n" in surface:
                continue
            conflated = conflate_token(normalize_whitespace(surface))
            if conflated in kb.dictionary:
                match = (L, surface)
                break
            # possessive / hyphen-compound attachment on the last
            # token: probe the trimmed name (``Pfizer's`` → PFIZER)
            tl = trim_surface_len(surface)
            if tl != len(surface):
                trimmed = surface[:tl]
                if conflate_token(normalize_whitespace(trimmed)) \
                        in kb.dictionary:
                    match = (L, trimmed)
                    break
        if match is None:
            if language == "de":
                head = _german_compound_head(tokens[i].text, kb)
                if head is not None:
                    found.append(Mention(
                        mention=head,
                        char_offset=tokens[i].begin,
                        char_length=len(head),
                        start_token=tokens[i].token_id,
                        end_token=tokens[i].token_id,
                        sentence=tokens[i].sentence,
                    ))
            i += 1
            continue
        L, surface = match
        found.append(Mention(
            mention=surface,
            char_offset=tokens[i].begin,
            char_length=len(surface),
            start_token=tokens[i].token_id,
            end_token=tokens[i + L - 1].token_id,
            sentence=tokens[i].sentence,
        ))
        i += L
    return found


def capitalized_tag(text: str, tokens: list[Token],
                    drop_sentence_initial: bool = True,
                    max_run: int = 5) -> list[Mention]:
    """Out-of-dictionary mention detector: maximal runs of capitalized
    tokens, with the reference's NER post-filters applied
    (NERManager.java:103-160 via filterAnnotations):
      - single-character mentions dropped
        (filterAnnotationsBySingleChar, MENTION_FILTER_REMOVESINGLECHAR);
      - mentions whose first token starts a sentence dropped
        (filterAnnotationsIfBeginningOfSentence) — sentence-case noise;
      - runs consisting entirely of weekday/month names dropped
        (temporal expressions are not named entities for NED; the
        closed-class analog of the sentence-case filter);
      - possessive / adjectival-hyphen attachments on the last token
        trimmed to the name proper (trim_surface_len).
    Deterministic; gives the pipeline recall on surfaces absent from the
    KB dictionary (they surface as --OOKBE-- rows downstream)."""
    from aida_ray.ned.ner_train import DAYMONTH

    def cap(tok: Token) -> bool:
        t = tok.text
        return len(t) > 0 and t[0].isupper() and any(c.isalpha() for c in t)

    found: list[Mention] = []
    i, n = 0, len(tokens)
    while i < n:
        if not cap(tokens[i]):
            i += 1
            continue
        j = i
        while (j + 1 < n and j + 1 - i < max_run and cap(tokens[j + 1])
               and tokens[j + 1].sentence == tokens[i].sentence):
            j += 1
        sentence_initial = tokens[i].token_id == 0 or \
            tokens[tokens[i].token_id - 1].sentence != tokens[i].sentence
        if drop_sentence_initial and sentence_initial:
            # the filtered token is sentence-case noise; the rest of the
            # run (if any) is a legitimate mid-sentence name
            i += 1
            if i > j:
                continue
        surface = text[tokens[i].begin:tokens[j].end]
        ln = trim_surface_len(surface)
        all_temporal = all(tokens[k].text in DAYMONTH
                           for k in range(i, j + 1))
        if ln > 1 and "\n" not in surface and not all_temporal:
            found.append(Mention(
                mention=surface[:ln],
                char_offset=tokens[i].begin,
                char_length=ln,
                start_token=tokens[i].token_id,
                end_token=tokens[j].token_id,
                sentence=tokens[i].sentence,
            ))
        i = j + 1
    return found


def hybrid_merge(manual: list[Mention], automatic: list[Mention]) -> list[Mention]:
    """Merge manual + automatic mentions; manual wins on overlap
    (HybridFilter.java)."""
    out = list(manual)
    for a in automatic:
        a_lo, a_hi = a.char_offset, a.char_offset + a.char_length
        overlaps = any(
            not (a_hi <= m.char_offset or a_lo >= m.char_offset + m.char_length)
            for m in manual)
        if not overlaps:
            out.append(a)
    out.sort(key=lambda m: (m.char_offset, m.char_length))
    return out


def prepare(doc_id: str, raw_text: str, kb: KB, detection: str = "hybrid",
            min_mention_occurrence: int = 1,
            injected_manual: list[Mention] | None = None,
            detect_ood: bool = False,
            statistical_ner=None, language: str = "en") -> PreparedDoc:
    """Full preparation: markup filter → tokenize → tag → align → context ids.

    ``injected_manual`` supplies pre-parsed manual mentions (already in
    cleaned-text coordinates) — used by the chunked path, where markup is
    stripped once for the whole document before chunking."""
    cleaned, manual = manual_filter(raw_text)
    if injected_manual:
        manual = manual + [Mention(m.mention, m.char_offset, m.char_length,
                                   manual=True) for m in injected_manual]
    if language == "en":
        tokens = tokenize(cleaned)
    else:
        # M2 language routing (TokenizerManager.java dispatch): de gets
        # German sentence rules, zh greedy dictionary segmentation over
        # the KB's CJK surfaces, anything else the multilingual fallback
        from aida_ray.text.multilingual import tokenize_for_lang
        lex = kb_cjk_lexicon(kb) if language[:2] == "zh" else None
        tokens = tokenize_for_lang(cleaned, language, lexicon=lex)
    manual = align_mentions_to_tokens(manual, tokens)
    if detection == "manual":
        mentions = manual
    else:
        automatic = dictionary_tag(cleaned, tokens, kb, language=language)
        if detection == "automatic":
            mentions = automatic
        else:
            mentions = hybrid_merge(manual, automatic)
    if statistical_ner is not None:
        # NERManager-style tagger ensemble: statistical spans lose to
        # overlapping dictionary/manual mentions (reconcileAnnotations)
        mentions = hybrid_merge(
            mentions, statistical_ner.find_mentions(cleaned, tokens))
    if detect_ood:
        # OOD candidates lose to any overlapping higher-priority mention
        mentions = hybrid_merge(mentions, capitalized_tag(cleaned, tokens))
    if min_mention_occurrence > 1:
        counts: dict[str, int] = {}
        for m in mentions:
            counts[m.mention] = counts.get(m.mention, 0) + 1
        mentions = [m for m in mentions if counts[m.mention] >= min_mention_occurrence]
    token_ids = [kb.word_id(t.text) for t in tokens]
    mentions.sort(key=lambda m: (m.char_offset, m.char_length))
    return PreparedDoc(doc_id=doc_id, text=cleaned, tokens=tokens,
                       token_ids=token_ids, mentions=mentions)
