"""Wikitext infobox extraction.

Parses MediaWiki ``{{Infobox ...}}`` template blocks into (key,
value) attribute rows — the classic DBpedia-style extraction step
(public format: https://en.wikipedia.org/wiki/Help:Infobox).

Rules (deterministic, lenient — crawl reality):
- a block starts at ``{{Infobox <subject>`` (case-insensitive) and
  ends at the matching ``}}`` (nested ``{{...}}`` inside values are
  depth-tracked);
- attribute lines are ``| key = value``; keys are lowercased,
  ``_``-normalized and trimmed; values are trimmed with inner
  ``[[link|label]]`` reduced to the label (or the target when no
  label) and ``{{template}}`` calls dropped;
- empty values and key-less lines are skipped; multiple infoboxes per
  page all emit, tagged with their subject.

Scale shape: stateless ``map_batches`` parse over the page stream —
same shape as sources/xml_formats.py; output is attribute-row sized.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
import ray.data

_START = re.compile(r"\{\{\s*infobox\s+([^|}\n]+)", re.IGNORECASE)
_LINK = re.compile(r"\[\[(?:[^\]|]*\|)?([^\]|]*)\]\]")
_TMPL = re.compile(r"\{\{[^{}]*\}\}")


def _clean_value(v: str) -> str:
    v = _LINK.sub(r"\1", v)
    v = _TMPL.sub("", v)
    return v.strip()


def parse_infoboxes(text: str) -> list[tuple[str, str, str]]:
    """(subject, key, value) rows for one page."""
    out: list[tuple[str, str, str]] = []
    for m in _START.finditer(text):
        subject = m.group(1).strip()
        # find the matching close brace from the block start
        depth = 2
        i = m.start() + 2
        end = None
        while i < len(text):
            if text.startswith("{{", i):
                depth += 2
                i += 2
            elif text.startswith("}}", i):
                depth -= 2
                i += 2
                if depth <= 0:
                    end = i - 2
                    break
            else:
                i += 1
        body = text[m.end():end if end is not None else len(text)]
        # split on top-level pipes only (depth-track nested braces
        # and links so a pipe inside [[a|b]] or {{t|x}} doesn't split)
        parts, buf, d = [], [], 0
        j = 0
        while j < len(body):
            if body.startswith("{{", j) or body.startswith("[[", j):
                d += 1
                buf.append(body[j:j + 2])
                j += 2
            elif body.startswith("}}", j) or body.startswith("]]", j):
                d -= 1
                buf.append(body[j:j + 2])
                j += 2
            elif body[j] == "|" and d == 0:
                parts.append("".join(buf))
                buf = []
                j += 1
            else:
                buf.append(body[j])
                j += 1
        parts.append("".join(buf))
        for part in parts[1:]:
            if "=" not in part:
                continue
            key, _, value = part.partition("=")
            key = key.strip().lower().replace(" ", "_")
            value = _clean_value(value)
            if key and value:
                out.append((subject, key, value))
    return out


def infobox_attributes(ds: ray.data.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, subject, key, value) attribute rows."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        did, sub, key, val = [], [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            for s, k, v in parse_infoboxes(txt or ""):
                did.append(int(i))
                sub.append(s)
                key.append(k)
                val.append(v)
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "subject": pa.array(sub, pa.string()),
            "key": pa.array(key, pa.string()),
            "value": pa.array(val, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
