"""N-Triples (RDF 1.1, W3C) serialization and parsing of triple tables.

The KG publish seam: triple tables leave the engine as standard
line-oriented N-Triples (one fact per line, trivially splittable for
re-ingest at any parallelism) and come back in byte-identically —
escaping is the full ECHAR set (``\\\\ \\" \\n \\r \\t``) so literals
containing quotes/newlines survive the round-trip.

Both directions are map-only ``map_batches`` stages: serialization is
string concat over Arrow columns; parsing is one RE2
``pc.extract_regex`` per batch plus a vectorized unescape that only
touches lines containing a backslash.  No shuffle either way.

Scale note: a 100-TB triple table serializes to sharded ``.nt``
partitions via the same partitioned-write machinery as the parquet
sink; each shard parses independently (N-Triples has no cross-line
state — that is the point of the format).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_ESCAPES = [("\\", "\\\\"), ("\"", "\\\""), ("\n", "\\n"),
            ("\r", "\\r"), ("\t", "\\t")]

# Two disjoint patterns (Arrow extract_regex returns "" — not null —
# for non-participating groups, so one alternation regex cannot tell
# an empty IRI from an empty literal): <s> <p> <o> .  |  <s> <p> "lit" .
_NT_IRI_RE = (r'^<(?P<s>[^>]*)> <(?P<p>[^>]*)> '
              r'<(?P<o>[^>]*)> \.$')
_NT_LIT_RE = (r'^<(?P<s>[^>]*)> <(?P<p>[^>]*)> '
              r'"(?P<o>(?:[^"\\]|\\.)*)" \.$')


def _escape_literal(s: pd.Series) -> pd.Series:
    for raw, esc in _ESCAPES:
        s = s.str.replace(raw, esc, regex=False)
    return s


_UNESC = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}


def _unescape_literal(s: pd.Series) -> pd.Series:
    """Single-pass ECHAR unescape — sequential replaces would corrupt
    ``\\\\n`` (escaped backslash + n) into a newline.  The per-match
    callback only runs on literals that contain a backslash at all."""
    has = s.str.contains("\\", regex=False)
    if not has.any():
        return s
    out = s.copy()
    out[has] = s[has].str.replace(
        r"\\(.)", lambda m: _UNESC.get(m.group(1), m.group(0)),
        regex=True)
    return out


def format_ntriples_batch(b: pa.Table, subj: str = "subj",
                          pred: str = "pred", obj: str = "obj",
                          is_literal: str = "is_literal") -> pa.Table:
    """(subj, pred, obj, is_literal) -> one ``line`` per triple.
    IRI terms are wrapped in angle brackets verbatim (caller
    guarantees no ``>`` inside an IRI — RDF forbids it); literal
    objects are ECHAR-escaped and double-quoted."""
    s = b[subj].to_pandas()
    p = b[pred].to_pandas()
    o = b[obj].to_pandas()
    lit = b[is_literal].to_numpy(zero_copy_only=False).astype(bool)
    oterm = pd.Series(np.where(
        lit,
        '"' + _escape_literal(o) + '"',
        "<" + o + ">"))
    lines = "<" + s + "> <" + p + "> " + oterm + " ."
    return pa.table({"line": pa.array(lines, pa.string())})


def parse_ntriples_batch(b: pa.Table,
                         line_col: str = "line") -> pa.Table:
    """One ``line`` per N-Triples statement -> (subj, pred, obj,
    is_literal); malformed lines (and comments / blank lines) are
    dropped.  RE2 via Arrow ``extract_regex`` — no Python loop."""
    lines = pc.utf8_trim_whitespace(b[line_col].combine_chunks())

    def _fields(m):
        st = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
        flat = st.flatten()
        return (pc.is_valid(m).to_numpy(zero_copy_only=False),
                flat[0].to_pandas(), flat[1].to_pandas(),
                flat[2].to_pandas())

    ok_i, s_i, p_i, o_i = _fields(
        pc.extract_regex(lines, pattern=_NT_IRI_RE))
    ok_l, s_l, p_l, o_l = _fields(
        pc.extract_regex(lines, pattern=_NT_LIT_RE))
    ok_l &= ~ok_i
    subj = pd.concat([s_i[ok_i], s_l[ok_l]], ignore_index=True)
    pred = pd.concat([p_i[ok_i], p_l[ok_l]], ignore_index=True)
    obj = pd.concat([o_i[ok_i],
                     _unescape_literal(o_l[ok_l].fillna(""))],
                    ignore_index=True)
    is_lit = np.concatenate([np.zeros(int(ok_i.sum()), bool),
                             np.ones(int(ok_l.sum()), bool)])
    return pa.table({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(pred, pa.string()),
        "obj": pa.array(obj, pa.string()),
        "is_literal": pa.array(is_lit, pa.bool_()),
    })


def to_ntriples(triples: ray.data.Dataset, **cols) -> ray.data.Dataset:
    return triples.map_batches(
        lambda b: format_ntriples_batch(b, **cols),
        batch_format="pyarrow")


def from_ntriples(lines: ray.data.Dataset,
                  line_col: str = "line") -> ray.data.Dataset:
    return lines.map_batches(
        lambda b: parse_ntriples_batch(b, line_col=line_col),
        batch_format="pyarrow")
