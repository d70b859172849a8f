"""Wikipedia-markup cleaner — faithful port of
``WikipediaUtil.cleanWikipediaArticle`` (src/mpi/aida/util/
WikipediaUtil.java:38-99), replacement-by-replacement in the same
order.  Golden-tested against WikipediaUtilTest.java's full article.

Java-regex translation notes: Java's nested character classes
``[[^<]\\n]`` and ``[[^{}]]`` reduce to ``[^<]`` / ``[^{}]`` (the
union adds nothing), and ``$1`` backrefs become ``\\1``.

Useful beyond parity: a crawl of wiki-style pages runs this as a
stateless ``map_batches`` stage before NED (see ``clean_batch``).
"""

from __future__ import annotations

import re

import pyarrow as pa

_STEPS: list[tuple[re.Pattern, str]] = [
    # external link directly followed by a wiki link: drop the wiki link
    (re.compile(r"(\[https?:.+)\[\[[^\[\]]+\]\]"), r"\1"),
    # bare external links -> space
    (re.compile(r"\[https?:[^\[\]]+\]"), " "),
    # <ref>...</ref> and <ref ... />
    (re.compile(r"<ref[^<]+</ref>"), ""),
    (re.compile(r"<ref[^<]+/>"), ""),
    # galleries
    (re.compile(r"<gallery>.*</gallery>", re.DOTALL), ""),
    # stray html tags (not starting with /, t, !, space)
    (re.compile(r"<[^/t! ][^>]+>"), " "),
    (re.compile(r"</[^t][^>]+>"), " "),
    # html tables
    (re.compile(r"<table[^>]+>(?!</table>).*</table>", re.DOTALL), ""),
    # comments
    (re.compile(r"<!--.+-->", re.DOTALL), ""),
    # bold/italic quotes
    (re.compile(r"'{2,}"), ""),
    # namespaced links (Category:, Image:, ...)
    (re.compile(r"\[\[[^\[\]]+:[^\[\]]+\]\]"), ""),
    # wiki tables, box templates
    (re.compile(r"\{\{Standard table\|0\}\}.*\{\{close table\}\}",
                re.DOTALL), ""),
    (re.compile(r"\{\{[sS]tart [bB]ox\}\}"), "{|"),
    (re.compile(r"\{\{[eE]nd [bB]ox\}\}"), "|}"),
    (re.compile(r"\{\|((?!\|\}).)*\n\|\}\n", re.DOTALL), ""),
    # remaining templates -> space
    (re.compile(r"\{\{[^{}]+\}\}"), " "),
    (re.compile(r"\{\|.*\n\|\}†Denotes wild-card team \(since 1995\)\.\n",
                re.DOTALL), ""),
    # bullet / definition / indent lines
    (re.compile(r"^\*{1,2}.*$", re.MULTILINE), ""),
    (re.compile(r"^;.*$", re.MULTILINE), ""),
    (re.compile(r"^:+.*$", re.MULTILINE), ""),
    # namespaced links again (some were nested in templates)
    (re.compile(r"\[\[[^\[\]]+:[^\[\]]+\]\]"), " "),
    # section headings
    (re.compile(r"={2,}.*?={2,}"), " "),
    # piped links -> label; plain links -> target
    (re.compile(r"\[\[[^\]]+?\|([^\]\n]+?)\]\]"), r"\1"),
    (re.compile(r"\[\[([^\]]+?)\]\]"), r"\1"),
    # control chars + whitespace runs -> single space
    (re.compile(r"[\s\x00-\x1F]+"), " "),
]


def clean_wikipedia_article(text: str) -> str:
    # FIRST: newlines -> spaces (WikipediaUtil.java:40).  This is
    # load-bearing: afterwards the greedy external-link rule spans the
    # whole document (deleting only the LAST wiki link after the first
    # http link), and the MULTILINE bullet/definition rules can only
    # ever match at the very start — exactly the reference's behavior.
    text = text.replace("\n", " ")
    for pattern, repl in _STEPS:
        text = pattern.sub(repl, text)
    text = text.replace("&lt;", "<").replace("&gt;", ">")
    return text


def clean_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless map_batches stage: wiki markup → clean text."""
    cleaned = [clean_wikipedia_article(t)
               for t in batch[text_col].to_pylist()]
    return batch.set_column(batch.schema.get_field_index(text_col),
                            text_col, pa.array(cleaned, pa.string()))
