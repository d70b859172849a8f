"""Temporal-expression normalization (TIMEX-lite).

Grounds date mentions to ISO-8601 values the way a TimeML/HeidelTime
style normalizer does (public rule families), restricted to the
deterministic core a web-KG build needs — absolute dates at day /
month / year granularity plus document-creation-time (DCT) relative
expressions:

    2021-05-03            -> 2021-05-03
    May 3 , 2021          -> 2021-05-03
    3 May 2021            -> 2021-05-03
    May 2021              -> 2021-05
    in 1987               -> 1987          (1500-2099 window)
    today|yesterday|tomorrow -> DCT +/- 1 day (needs a dct column)

One combined alternation regex scans each document left-to-right;
earlier (more specific) alternatives consume their span, so a full
date never double-emits its year.  Unparseable months/days (e.g.
month 13 in an ISO-looking string) emit nothing.

Scale shape: stateless ``map_batches`` (the compiled pattern is
module-level — shared, not per-batch); no shuffle, output tracks
date-mention density.
"""

from __future__ import annotations

import datetime
import re

import pyarrow as pa

import ray
import ray.data

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["january", "february", "march", "april", "may", "june", "july",
     "august", "september", "october", "november", "december"])}
_MON_ALT = "|".join(_MONTHS) + "|" + "|".join(
    m[:3] for m in _MONTHS if m != "may")

_PAT = re.compile(
    r"(?P<iso>\b\d{4}-\d{2}-\d{2}\b)"
    r"|(?P<mdy>\b(?P<m1>" + _MON_ALT + r")\s+(?P<d1>\d{1,2})\s*,?\s+"
    r"(?P<y1>\d{4})\b)"
    r"|(?P<dmy>\b(?P<d2>\d{1,2})\s+(?P<m2>" + _MON_ALT + r")\s+"
    r"(?P<y2>\d{4})\b)"
    r"|(?P<my>\b(?P<m3>" + _MON_ALT + r")\s+(?P<y3>\d{4})\b)"
    r"|(?P<rel>\b(?:today|yesterday|tomorrow)\b)"
    r"|(?P<y>\b(?:1[5-9]\d{2}|20\d{2})\b)",
    re.IGNORECASE)


def _month_num(name: str) -> int | None:
    low = name.lower()
    if low in _MONTHS:
        return _MONTHS[low]
    for full, num in _MONTHS.items():
        if full.startswith(low):
            return num
    return None


def normalize_timex(text: str, dct: str | None = None
                    ) -> list[tuple[str, str]]:
    """(mention, iso_value) pairs for one document; ``dct`` is the
    document creation date as YYYY-MM-DD (required only for the
    relative expressions, which are skipped without it)."""
    out: list[tuple[str, str]] = []
    for m in _PAT.finditer(text):
        kind = m.lastgroup if m.lastgroup in (
            "iso", "rel", "y") else None
        mention = m.group(0)
        if m.group("iso"):
            y, mo, d = mention.split("-")
            if 1 <= int(mo) <= 12 and 1 <= int(d) <= 31:
                out.append((mention, mention))
        elif m.group("mdy") or m.group("dmy"):
            mdy = bool(m.group("mdy"))
            mon = _month_num(m.group("m1" if mdy else "m2"))
            day = int(m.group("d1" if mdy else "d2"))
            year = int(m.group("y1" if mdy else "y2"))
            if mon is not None and 1 <= day <= 31:
                out.append((mention, f"{year:04d}-{mon:02d}-{day:02d}"))
        elif m.group("my"):
            mon = _month_num(m.group("m3"))
            if mon is not None:
                out.append((mention,
                            f"{int(m.group('y3')):04d}-{mon:02d}"))
        elif kind == "rel":
            if dct is None:
                continue
            base = datetime.date.fromisoformat(dct)
            low = mention.lower()
            if low == "yesterday":
                base = base - datetime.timedelta(days=1)
            elif low == "tomorrow":
                base = base + datetime.timedelta(days=1)
            out.append((mention, base.isoformat()))
        elif kind == "y":
            out.append((mention, mention))
    return out


def timex_mentions(ds: ray.data.Dataset, id_col: str = "doc_id",
                   text_col: str = "text",
                   dct_col: str | None = None) -> ray.data.Dataset:
    """(doc_id, mention, value) rows of normalized date mentions."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        dcts = (b[dct_col].to_pylist() if dct_col is not None
                and dct_col in b.column_names else [None] * b.num_rows)
        did, men, val = [], [], []
        for i, txt, dct in zip(ids, b[text_col].to_pylist(), dcts):
            for mention, value in normalize_timex(txt or "", dct):
                did.append(int(i))
                men.append(mention)
                val.append(value)
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "mention": pa.array(men, pa.string()),
            "value": pa.array(val, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
