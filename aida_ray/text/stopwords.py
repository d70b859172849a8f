"""English stopword / symbol sets.

Semantics follow the reference's ``mpi.aida.util.StopWord``
(src/mpi/aida/util/StopWord.java:96-130): a token is a
stopword-or-symbol if its lowercase form is in the stopword set or the
token is a symbol.  On *word ids*, any id that maps to no known word
(id == UNKNOWN_WORD_ID) is also treated as a stopword — the reference
gets this behaviour accidentally (unknown stopword strings map to the
Trove no-entry value 0, which is also the id of unknown document
tokens), and the keyword-position index depends on it.
"""

from __future__ import annotations

UNKNOWN_WORD_ID = 0

# A standard English stopword list (common function words).  The scoring
# semantics only depend on membership of frequent function words; content
# words must NOT appear here.
STOPWORDS = frozenset("""
a about above after again against all am an and any are aren't as at be
because been before being below between both but by can cannot can't could
couldn't did didn't do does doesn't doing don't down during each few for from
further had hadn't has hasn't have haven't having he he'd he'll he's her here
here's hers herself him himself his how how's i i'd i'll i'm i've if in into
is isn't it it's its itself let's me more most mustn't my myself no nor not of
off on once only or other ought our ours ourselves out over own same shan't
she she'd she'll she's should shouldn't so some such than that that's the
their theirs them themselves then there there's these they they'd they'll
they're they've this those through to too under until up upon very was wasn't
we we'd we'll we're we've were weren't what what's when when's where where's
which while who who's whom why why's will with won't would wouldn't you you'd
you'll you're you've your yours yourself yourselves also however thus hence
yet although though whether either neither per via etc de la el le en un une
""".split())

# Symbol tokens (punctuation emitted as standalone tokens by the tokenizer).
SYMBOLS = frozenset(list("\"%'()[]{},.:;!?$&*+-/<=>@\\^_`|~#") + ["''", "``", "--", "...", "…"])


def is_stopword_or_symbol(token: str) -> bool:
    """String-level check (StopWord.java:115-119)."""
    return token.lower() in STOPWORDS or token in SYMBOLS


def stopword_ids(word2id: dict[str, int]) -> set[int]:
    """Ids considered stopwords for a given word dictionary.

    Mirrors StopWord.java:96-98: ids of known stopword/symbol strings,
    plus the unknown-word id (see module docstring).
    """
    ids = {UNKNOWN_WORD_ID}
    for w in STOPWORDS:
        if w in word2id:
            ids.add(word2id[w])
    for s in SYMBOLS:
        if s in word2id:
            ids.add(word2id[s])
    return ids
