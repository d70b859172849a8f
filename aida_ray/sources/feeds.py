"""RSS 2.0 / Atom feed ingest — the freshness-crawl companion to the
sitemap source (a news crawl discovers new pages through feeds).

- :func:`read_feeds` — directory (or file) of RSS/Atom XML shards →
  Dataset of (url, title, published_s, feed_kind, source) rows, one
  parse task per file.  RSS ``<item>`` rows carry ``feed_kind='rss'``
  (link/title/pubDate, RFC-822 dates); Atom ``<entry>`` rows carry
  ``feed_kind='atom'`` (link@href/title/updated, W3C dates).
- Writers emit protocol-shaped XML for round-trip tests/oracles.

Stdlib ``xml.etree`` only; lenient like the sitemap/WARC sources:
missing dates → -1, malformed shards → 0 rows.  Reference anchor: the
reference's pluggable CollectionReader family (`mpi/aida/config`);
feeds are the freshness-crawl-native analogue.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import pyarrow as pa

import ray
import ray.data

_ATOM = "{http://www.w3.org/2005/Atom}"
_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}


def _parse_rfc822(s: str | None) -> int:
    """RFC-822 pubDate ('Tue, 02 Jan 2024 03:04:05 GMT'/'+0000') →
    epoch seconds; -1 if absent/unparseable."""
    if not s:
        return -1
    parts = s.strip().split()
    try:
        if "," in parts[0]:
            parts = parts[1:]
        day, mon, year = int(parts[0]), _MONTHS[parts[1]], int(parts[2])
        hh, mm, ss = (int(x) for x in parts[3].split(":"))
        dt = datetime(year, mon, day, hh, mm, ss, tzinfo=timezone.utc)
        off = parts[4] if len(parts) > 4 else "GMT"
        secs = int(dt.timestamp())
        if off and off[0] in "+-":
            sign = 1 if off[0] == "+" else -1
            secs -= sign * (int(off[1:3]) * 3600 + int(off[3:5]) * 60)
        return secs
    except (ValueError, KeyError, IndexError):
        return -1


def _parse_w3c(s: str | None) -> int:
    if not s:
        return -1
    try:
        dt = datetime.fromisoformat(s.strip().replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    except ValueError:
        return -1


def parse_feed_bytes(data: bytes, source: str = "") -> pa.Table:
    """One RSS/Atom document → (url, title, published_s, feed_kind,
    source) rows; malformed XML yields 0 rows."""
    urls: list[str] = []
    titles: list[str] = []
    pubs: list[int] = []
    kinds: list[str] = []
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        root = None
    if root is not None and root.tag == "rss":
        for item in root.iter("item"):
            loc = item.findtext("link")
            if not loc:
                continue
            urls.append(loc.strip())
            titles.append((item.findtext("title") or "").strip())
            pubs.append(_parse_rfc822(item.findtext("pubDate")))
            kinds.append("rss")
    elif root is not None and root.tag == f"{_ATOM}feed":
        for entry in root.findall(f"{_ATOM}entry"):
            link = entry.find(f"{_ATOM}link")
            loc = link.get("href") if link is not None else None
            if not loc:
                continue
            urls.append(loc.strip())
            titles.append((entry.findtext(f"{_ATOM}title") or "").strip())
            pubs.append(_parse_w3c(entry.findtext(f"{_ATOM}updated")))
            kinds.append("atom")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "title": pa.array(titles, pa.string()),
        "published_s": pa.array(pubs, pa.int64()),
        "feed_kind": pa.array(kinds, pa.string()),
        "source": pa.array([source] * len(urls), pa.string())})


def read_feeds(path: str) -> ray.data.Dataset:
    """Directory (or single file) of feed XML shards → Dataset, one
    parse task per file."""

    def parse(b: pa.Table) -> pa.Table:
        tabs = [parse_feed_bytes(raw.as_py(), os.path.basename(p))
                for p, raw in zip(b["path"].to_pylist(), b["bytes"])]
        return pa.concat_tables(tabs) if tabs else parse_feed_bytes(b"", "")

    return ray.data.read_binary_files(path, include_paths=True) \
        .map_batches(parse, batch_format="pyarrow")


def write_rss_file(path: str, items: list[tuple[str, str, int]]) -> None:
    """Protocol-shaped RSS 2.0 (url, title, epoch_s) (atomic write)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<rss version="2.0"><channel>']
    for url, title, ts in items:
        lines.append("<item>")
        lines.append(f"<title>{title}</title>")
        lines.append(f"<link>{url}</link>")
        if ts >= 0:
            d = datetime.fromtimestamp(ts, tz=timezone.utc)
            lines.append("<pubDate>" + d.strftime(
                "%a, %d %b %Y %H:%M:%S GMT") + "</pubDate>")
        lines.append("</item>")
    lines.append("</channel></rss>")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write("\n".join(lines).encode())
    os.replace(tmp, path)


def write_atom_file(path: str, entries: list[tuple[str, str, int]]) -> None:
    """Protocol-shaped Atom feed (url, title, epoch_s) (atomic write)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<feed xmlns="http://www.w3.org/2005/Atom">']
    for url, title, ts in entries:
        lines.append("<entry>")
        lines.append(f"<title>{title}</title>")
        lines.append(f'<link href="{url}"/>')
        if ts >= 0:
            d = datetime.fromtimestamp(ts, tz=timezone.utc)
            lines.append("<updated>" + d.strftime(
                "%Y-%m-%dT%H:%M:%SZ") + "</updated>")
        lines.append("</entry>")
    lines.append("</feed>")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write("\n".join(lines).encode())
    os.replace(tmp, path)
