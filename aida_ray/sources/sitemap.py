"""XML sitemap ingest (sitemaps.org protocol) — the crawl-seed
companion to :mod:`aida_ray.sources.warc` and the robots filter.

- :func:`read_sitemaps` — directory (or file) of ``urlset`` /
  ``sitemapindex`` XML shards → Dataset of (url, lastmod_s, priority,
  is_index, source) rows, one parse task per file.  ``sitemapindex``
  entries come out with ``is_index = true`` (their ``url`` is the
  child sitemap loc); page entries with ``is_index = false``.  Callers
  fan out on index rows with a second ``read_sitemaps`` over the named
  files — two bounded waves (the protocol caps an index at 50k
  children and a urlset at 50k urls), no recursive task trees.
- Writers emit protocol-shaped XML for round-trip tests/oracles.

Stdlib ``xml.etree`` only (no lxml in the container); lenient on
missing optional fields (``lastmod`` → -1, ``priority`` → 0.5 per the
protocol default) and on malformed shards (0 rows, the lenient-WARC
convention).  Reference anchor: the reference ingests collections via
pluggable readers (`mpi/aida/config`-driven CollectionReader family);
sitemap XML is the crawl-native analogue.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import pyarrow as pa

import ray
import ray.data

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def _parse_lastmod(s: str | None) -> int:
    """W3C datetime (date-only or full) → epoch seconds; -1 if absent."""
    if not s:
        return -1
    s = s.strip()
    try:
        if len(s) == 10:                       # YYYY-MM-DD
            dt = datetime.strptime(s, "%Y-%m-%d") \
                .replace(tzinfo=timezone.utc)
        else:
            dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    except ValueError:
        return -1


def parse_sitemap_bytes(data: bytes, source: str = "") -> pa.Table:
    """One urlset/sitemapindex document → (url, lastmod_s, priority,
    is_index, source) rows; malformed XML yields 0 rows."""
    if data[:2] == b"\x1f\x8b":          # .xml.gz sitemaps
        import gzip
        data = gzip.decompress(data)
    urls: list[str] = []
    lastmods: list[int] = []
    prios: list[float] = []
    idx: list[bool] = []
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        root = None
    if root is not None:
        is_index = root.tag == f"{_NS}sitemapindex"
        child_tag = f"{_NS}sitemap" if is_index else f"{_NS}url"
        for el in root.findall(child_tag):
            loc = el.findtext(f"{_NS}loc")
            if not loc:
                continue
            urls.append(loc.strip())
            lastmods.append(_parse_lastmod(el.findtext(f"{_NS}lastmod")))
            p = el.findtext(f"{_NS}priority")
            prios.append(float(p) if p else 0.5)
            idx.append(is_index)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "lastmod_s": pa.array(lastmods, pa.int64()),
        "priority": pa.array(prios, pa.float64()),
        "is_index": pa.array(idx, pa.bool_()),
        "source": pa.array([source] * len(urls), pa.string())})


def read_sitemaps(path: str) -> ray.data.Dataset:
    """Directory (or single file) of sitemap XML shards → Dataset of
    (url, lastmod_s, priority, is_index, source) rows, one parse task
    per file."""

    def parse(b: pa.Table) -> pa.Table:
        tabs = [parse_sitemap_bytes(raw.as_py(), os.path.basename(p))
                for p, raw in zip(b["path"].to_pylist(), b["bytes"])]
        return pa.concat_tables(tabs) if tabs \
            else parse_sitemap_bytes(b"", "")

    return ray.data.read_binary_files(path, include_paths=True) \
        .map_batches(parse, batch_format="pyarrow")


def write_sitemap_file(path: str, urls: list[str],
                       lastmods_s: list[int] | None = None,
                       priorities: list[float] | None = None) -> None:
    """Protocol-shaped urlset XML (atomic tmp+rename)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<urlset xmlns="http://www.sitemaps.org/schemas/'
             'sitemap/0.9">']
    for i, u in enumerate(urls):
        lines.append("<url>")
        lines.append(f"<loc>{u}</loc>")
        if lastmods_s is not None and lastmods_s[i] >= 0:
            ts = datetime.fromtimestamp(lastmods_s[i], tz=timezone.utc) \
                .strftime("%Y-%m-%dT%H:%M:%SZ")
            lines.append(f"<lastmod>{ts}</lastmod>")
        if priorities is not None:
            lines.append(f"<priority>{priorities[i]:.1f}</priority>")
        lines.append("</url>")
    lines.append("</urlset>")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write("\n".join(lines).encode())
    os.replace(tmp, path)


def write_sitemap_index(path: str, sitemap_locs: list[str]) -> None:
    """Protocol-shaped sitemapindex XML naming child sitemaps."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
             'sitemap/0.9">']
    for u in sitemap_locs:
        lines.append(f"<sitemap><loc>{u}</loc></sitemap>")
    lines.append("</sitemapindex>")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write("\n".join(lines).encode())
    os.replace(tmp, path)
