"""Deterministic HTML → text extraction.

The north rule requires byte-identical extracted text per url.  We define
the extraction contract ourselves (the reference has no HTML input; its
closest analogue is the XML input-format dispatch at
src/mpi/aida/preparator/Preparator.java:73-95): a small, fully
deterministic rule set.  Handled HTML constructs (r5 item 5 — each one
exercised by the synthetic corpus generator and/or a unit test):

* ``<!-- comments -->`` (multiline, may contain tags/entities) — dropped;
* ``<![CDATA[...]]>`` — wrapper dropped, content then processed like
  ordinary text (entities unescape, any embedded tags strip);
* ``<script>``/``<style>`` elements — dropped with their bodies,
  including an UNCLOSED script/style running to end-of-input (HTML5
  swallows to EOF);
* block tags (p/div/br/h1-6/li/…​) → newline; other well-formed tags
  (incl. ``<!DOCTYPE …>``) dropped in place;
* malformed tags: a tag broken by a second ``<`` (``<a href="x"
  <b>``) strips through the first ``>``; an unclosed ELEMENT
  (``<b>word`` without ``</b>``) strips the tag and keeps the word; a
  stray ``<`` NOT followed by a letter / ``/`` / ``!`` / ``?``
  (``1 < 2``) is literal text, not a tag;
* entities: the five XML ones (``&amp; &lt; &gt; &quot; &apos;``),
  numeric character references (``&#65;`` and ``&#x41;``), and a
  documented set of common named entities (nbsp/dashes/quotes/…​ — see
  ``_NAMED_ENTITIES``); ``&amp;`` decodes LAST so double-escaped text
  (``&amp;#65;``) survives as the literal ``&#65;``;
* whitespace: horizontal runs collapse to one space, blank-line runs
  drop, lines trim.

``aida_ray.pipelines.corpus`` generates pages whose ``text`` column is
exactly ``extract_text(html)``, and the invariant is tested per url.
"""

from __future__ import annotations

import hashlib
import re

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_SCRIPT_OPEN_RE = re.compile(r"<(?:script|style)\b[^>]*>.*\Z", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|article|section|header|footer)\b[^>]*>",
    re.I,
)
# a '<' opens a tag only when followed by a letter, '/', '!' or '?'
# (the HTML5 tag-open rule) — '1 < 2' stays literal text
_TAG_RE = re.compile(r"<[/!?]?[A-Za-z][^>]*>")
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]
_NAMED_ENTITIES = [
    ("&nbsp;", " "), ("&mdash;", "—"), ("&ndash;", "–"),
    ("&hellip;", "…"), ("&lsquo;", "‘"), ("&rsquo;", "’"),
    ("&ldquo;", "“"), ("&rdquo;", "”"), ("&middot;", "·"),
    ("&copy;", "©"), ("&reg;", "®"), ("&trade;", "™"),
    ("&deg;", "°"), ("&euro;", "€"), ("&pound;", "£"),
    ("&laquo;", "«"), ("&raquo;", "»"), ("&times;", "×"),
]
_NUMREF_RE = re.compile(r"&#(?:x([0-9A-Fa-f]{1,6})|([0-9]{1,7}));")


def _decode_numref(m: re.Match) -> str:
    cp = int(m.group(1), 16) if m.group(1) else int(m.group(2))
    # control chars / out-of-range refs stay literal (deterministic,
    # never raises)
    if 0x20 <= cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
        return chr(cp)
    return m.group(0)


def _unescape_all(s: str) -> str:
    """Entity pipeline: numeric refs, named set, the five XML entities
    with ``&amp;`` strictly last (double-escape safety)."""
    s = _NUMREF_RE.sub(_decode_numref, s)
    for ent, ch in _NAMED_ENTITIES:
        s = s.replace(ent, ch)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def _strip_hidden(s: str) -> str:
    """Comments, CDATA wrappers, script/style bodies (incl. unclosed)."""
    s = _COMMENT_RE.sub("", s)
    s = _CDATA_RE.sub(r"\1", s)
    s = _SCRIPT_RE.sub("", s)
    s = _SCRIPT_OPEN_RE.sub("", s)
    return s


def extract_text(html: bytes | str) -> str:
    """Deterministic text extraction. html bytes are decoded as UTF-8 (strict)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8")
    s = _strip_hidden(html)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _unescape_all(s)
    # Collapse horizontal whitespace; collapse blank-line runs to one \n.
    lines = [re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def _inline_wrap(esc_para: str) -> str:
    """Deterministically wrap words of an escaped paragraph in INLINE
    constructs so the synthetic corpus exercises the full messy-HTML
    grammar, not just block tags (r5 item 5): inline/nested tags,
    comments carrying tags+entities, CDATA wrappers, script bodies
    with raw ``<``, numeric character references, ``&nbsp;``
    separators, broken-attribute tags and unclosed elements — every
    one strips/decodes back to the original word, so the round-trip
    stays byte-identical.  Keyed by crc32 of the paragraph (no RNG)."""
    import zlib
    words = esc_para.split(" ")
    if len(words) < 4:
        return esc_para
    h = zlib.crc32(esc_para.encode("utf-8"))
    i = h % (len(words) - 1)          # never the last word
    j = (i + 1 + (h >> 8) % (len(words) - 1 - i)) if i + 1 < len(words) else i

    def numref(w: str) -> str:
        # first letter becomes a decimal character reference
        if w and w[0].isalpha():
            return f"&#{ord(w[0])};" + w[1:]
        return w

    styles = [
        lambda w: f'<a href="/w/{h & 0xffff}">{w}</a>',
        lambda w: f"<b>{w}</b>",
        lambda w: f'<span class="kw">{w}</span>',
        lambda w: f"<b><i>{w}</i></b>",
        lambda w: f"{w}<!-- nav <b>x</b> &amp; -->",
        lambda w: f"<![CDATA[{w}]]>",
        lambda w: f"{w}<script>var q = 1 < 2;</script>",
        numref,
        lambda w: f"{w}&nbsp;<wbr>",   # nbsp + void inline tag
        lambda w: f'<a href="/x" <b>{w}</a>',   # broken-attribute tag
        lambda w: f"<b>{w}",           # unclosed element
    ]
    words[i] = styles[(h >> 16) % len(styles)](words[i])
    if j != i:
        words[j] = styles[(h >> 20) % len(styles)](words[j])
    return " ".join(words)


def wrap_text_as_html(text: str, title: str = "") -> bytes:
    """Inverse generator used by the synthetic corpus: produces html whose
    extract_text() is exactly ``text`` (given text has no blank/edge
    whitespace).  Paragraphs carry deterministic inline tags
    (:func:`_inline_wrap`) so extraction regressions on inline-tagged
    HTML flip the round-trip oracles red."""
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    paras = "".join(f"<p>{_inline_wrap(p)}</p>\n" for p in esc.split("\n"))
    doc = (
        "<html><head><title>" + title + "</title>"
        "<script>var x = 1 < 2;</script><style>.a{color:red}</style></head>\n"
        "<body>\n<!-- synthetic page -->\n" + paras + "</body></html>\n"
    )
    return doc.encode("utf-8")


_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)


def _unescape(s: str) -> str:
    return _unescape_all(s)


def main_content(html: bytes | str, min_block_chars: int = 30,
                 max_link_ratio: float = 0.5) -> str:
    """Density-based MAIN-content extraction (the Boilerpipe/JusText
    principle as a deterministic rule set): segment at block tags,
    score each block by normalized text length and link-text ratio,
    keep blocks with >= ``min_block_chars`` chars and <=
    ``max_link_ratio`` of their characters inside anchors.  Navigation
    bars (pure links), footers (link-dominated), and stub blocks drop;
    article paragraphs survive.  Kept blocks join with newlines.

    Like :func:`extract_text` this is a self-defined deterministic
    contract (the reference has no HTML input); byte-stable per url.
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8")
    s = _strip_hidden(html)
    out = []
    for blk in _BLOCK_TAG_RE.split(s):
        text = _unescape(_TAG_RE.sub("", blk))
        norm = re.sub(r"\s+", " ", text).strip()
        if len(norm) < min_block_chars:
            continue
        link_text = "".join(_unescape(_TAG_RE.sub("", m))
                            for m in _ANCHOR_RE.findall(blk))
        lnorm = re.sub(r"\s+", " ", link_text).strip()
        if len(lnorm) / len(norm) > max_link_ratio:
            continue
        out.append(norm)
    return "\n".join(out)


_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.S | re.I)
_META_DESC_RE = re.compile(
    r'<meta\b[^>]*name\s*=\s*["\']description["\'][^>]*'
    r'content\s*=\s*["\']([^"\']*)["\']', re.I)
_CANONICAL_RE = re.compile(
    r'<link\b[^>]*rel\s*=\s*["\']canonical["\'][^>]*'
    r'href\s*=\s*["\']([^"\']*)["\']', re.I)


def extract_meta(html: bytes | str) -> dict:
    """Deterministic page-metadata extraction: first <title> text
    (whitespace-normalized, entities unescaped), first
    <meta name="description" content=...>, first
    <link rel="canonical" href=...>; missing fields are ''.
    Attribute order within the tag is fixed by the contract
    (name/rel before content/href) — the synthetic-corpus shape; a
    full HTML5 attribute parser is out of scope like the rest of
    text/extract.py's self-defined contract."""
    if isinstance(html, bytes):
        html = html.decode("utf-8")
    s = _COMMENT_RE.sub("", html)
    m = _TITLE_RE.search(s)
    title = _unescape(re.sub(r"\s+", " ", m.group(1)).strip()) if m else ""
    m = _META_DESC_RE.search(s)
    desc = _unescape(m.group(1).strip()) if m else ""
    m = _CANONICAL_RE.search(s)
    canon = m.group(1).strip() if m else ""
    return {"title": title, "description": desc, "canonical": canon}


_HEADING_RE = re.compile(r"<h([1-6])\b[^>]*>(.*?)</h\1\s*>",
                         re.I | re.S)


def extract_headings(html: bytes | str) -> list[dict]:
    """Document outline: (idx, level, heading, parent_idx) per
    <h1>-<h6> in document order; parent_idx is the nearest PRECEDING
    heading with a smaller level, -1 at the top.  Heading text is
    whitespace-normalized and entity-unescaped (same contract as
    extract_meta); comments stripped first."""
    if isinstance(html, bytes):
        html = html.decode("utf-8")
    s = _COMMENT_RE.sub("", html)
    out = []
    for m in _HEADING_RE.finditer(s):
        level = int(m.group(1))
        text = _unescape(re.sub(r"\s+", " ", m.group(2)).strip())
        parent = -1
        for j in range(len(out) - 1, -1, -1):
            if out[j]["level"] < level:
                parent = out[j]["idx"]
                break
        out.append({"idx": len(out), "level": level,
                    "heading": text, "parent_idx": parent})
    return out


_BOMS = [(b"\xef\xbb\xbf", "utf-8-bom"),
         (b"\xff\xfe", "utf-16-le"),
         (b"\xfe\xff", "utf-16-be")]
_CHARSET_RE = re.compile(
    r'<meta\s+charset=["\']?([A-Za-z0-9_.:-]+)', re.I)
_CONTENT_CHARSET_RE = re.compile(
    r'<meta\s+http-equiv=["\']?content-type["\']?\s+'
    r'content=["\'][^"\']*charset=([A-Za-z0-9_.:-]+)', re.I)


def sniff_charset(html: bytes, probe_bytes: int = 1024) -> tuple[str, str]:
    """(charset, how) for a raw html payload — the decode-routing step
    a crawl pipeline runs before text extraction.  Detection order
    matches the WHATWG encoding sniff: byte-order mark first, then the
    first <meta charset=...> / http-equiv content-type charset within
    the first ``probe_bytes`` bytes, else the utf-8 default.
    Deterministic; never decodes the full payload."""
    for bom, name in _BOMS:
        if html.startswith(bom):
            return name, "bom"
    head = html[:probe_bytes].decode("latin-1", errors="replace")
    m = _CHARSET_RE.search(head)
    if m:
        return m.group(1).lower(), "meta"
    m = _CONTENT_CHARSET_RE.search(head)
    if m:
        return m.group(1).lower(), "http-equiv"
    return "utf-8", "default"


_OPEN_TAG_RE = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)")


def tag_fingerprint(html: bytes | str) -> dict:
    """Structural DOM-shape fingerprint: the ordered opening-tag
    sequence hashed with md5 (matching DuckDB's ``md5`` for SQL
    twins) plus tag counts — pages rendered from the same template
    collide on ``fp`` regardless of their text, the standard
    signal for per-template boilerplate/wrapper grouping."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    tags = [t.lower() for t in _OPEN_TAG_RE.findall(html)]
    joined = ">".join(tags)
    return {"fp": hashlib.md5(joined.encode()).hexdigest(),
            "n_tags": len(tags),
            "n_distinct_tags": len(set(tags))}
