"""XML input-format parsers (SURVEY S3).

The reference dispatches NYT / ALTO / TEI / Spiegel XML to per-format
parsers (src/mpi/aida/preparator/inputformat/xml/*, dispatch at
Preparator.java:73-95).  We provide deterministic regex parsers for the
three shapes that matter for text extraction — each returns
(title, body) and is usable inside a stateless ``map_batches`` over a
raw-xml column.
"""

from __future__ import annotations

import re

_TAG = re.compile(r"<[^>]+>")


def _strip(xml: str) -> str:
    s = _TAG.sub(" ", xml)
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")]:
        s = s.replace(ent, ch)
    return re.sub(r"\s+", " ", s).strip()


def _first(pattern: str, xml: str) -> str:
    m = re.search(pattern, xml, re.S | re.I)
    return _strip(m.group(1)) if m else ""


def parse_nyt(xml: str) -> tuple[str, str]:
    """NYT corpus shape: <hedline><hl1>title</hl1></hedline>,
    <block class="full_text"><p>...</p></block>."""
    title = _first(r"<hl1[^>]*>(.*?)</hl1>", xml)
    block = re.search(r"<block[^>]*class=\"full_text\"[^>]*>(.*?)</block>",
                      xml, re.S | re.I)
    if block:
        paras = re.findall(r"<p[^>]*>(.*?)</p>", block.group(1), re.S | re.I)
        body = "\n".join(_strip(p) for p in paras if _strip(p))
    else:
        body = ""
    return title, body


def parse_tei(xml: str) -> tuple[str, str]:
    """TEI shape: <titleStmt><title>, <body> paragraphs."""
    title = _first(r"<titleStmt[^>]*>.*?<title[^>]*>(.*?)</title>", xml)
    body_m = re.search(r"<body[^>]*>(.*?)</body>", xml, re.S | re.I)
    if body_m:
        paras = re.findall(r"<p[^>]*>(.*?)</p>", body_m.group(1), re.S | re.I)
        body = "\n".join(_strip(p) for p in paras if _strip(p)) \
            or _strip(body_m.group(1))
    else:
        body = ""
    return title, body


def parse_alto(xml: str) -> tuple[str, str]:
    """ALTO OCR shape: <String CONTENT="word"/> per word, <TextLine> rows."""
    lines = []
    for line in re.findall(r"<TextLine[^>]*>(.*?)</TextLine>", xml, re.S | re.I):
        words = re.findall(r"<String[^>]*CONTENT=\"([^\"]*)\"", line, re.I)
        if words:
            lines.append(" ".join(words))
    return "", "\n".join(lines)


def parse_spiegel(xml: str) -> tuple[str, str]:
    """Spiegel corpus shape (SpiegelPreparatorInputFormat.java:15-84):
    doc id in <artikel-id>; title from <titel>; text from <vorspann>,
    <kurztitel>, <beschriftung>; each <absatz> starts a new paragraph;
    whitespace compacted (shouldCompactText)."""
    title = _first(r"<titel[^>]*>(.*?)</titel>", xml)
    parts: list[str] = []
    for tag in ("kurztitel", "vorspann"):
        for m in re.findall(rf"<{tag}[^>]*>(.*?)</{tag}>", xml, re.S | re.I):
            s = _strip(m)
            if s:
                parts.append(s)
    for m in re.findall(r"<absatz[^>]*>(.*?)</absatz>", xml, re.S | re.I):
        s = _strip(m)
        if s:
            parts.append(s)
    for m in re.findall(r"<beschriftung[^>]*>(.*?)</beschriftung>",
                        xml, re.S | re.I):
        s = _strip(m)
        if s:
            parts.append(s)
    return title, "\n".join(parts)


def spiegel_doc_id(xml: str) -> str:
    return _first(r"<artikel-id[^>]*>(.*?)</artikel-id>", xml)


def parse_robust04(xml: str) -> tuple[str, str]:
    """TREC Robust04 shape (Robust04PreparatorInputFormat.java:42-59):
    doc id from <DOCNO>; text = the document with ALL tags stripped
    (extractTextUsingRegex: xmlText.replaceAll("<.*?>", ""))."""
    return "", _strip(xml)


def robust04_doc_id(xml: str) -> str:
    return _first(r"<DOCNO>(.*?)</DOCNO>", xml)


PARSERS = {"nyt": parse_nyt, "tei": parse_tei, "alto": parse_alto,
           "spiegel": parse_spiegel, "robust04": parse_robust04}


def parse_xml(xml: str, fmt: str) -> tuple[str, str]:
    return PARSERS[fmt](xml)
