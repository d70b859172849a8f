"""WARC (Web ARChive, ISO 28500) ingest — the container format
Common-Crawl actually ships; the step upstream of this repo's pages
parquet (``input_hint`` shape ``url, warc_ts, html``).

Two record flavors are supported, matching the two CC products a
pipeline consumes:

- ``response`` (the .warc files): payload is an HTTP response; the
  html body is everything after the HTTP header block;
- ``conversion`` (the .wet files): payload is already-extracted plain
  text, no HTTP framing.

The reference has no crawl ingest (prepared collections only —
``src/mpi/aida/preparator``); this is the crawl-side complement, built
like the repo's XML readers: a deterministic stdlib parser exercised
byte-exactly, no external codec.

Scale shape: WARC shards are ~1 GB by CC convention, so
``ray.data.read_binary_files`` (one file per block) feeds a stateless
``map_batches`` parse whose output drops the container framing — raw
WARC bytes die in the parse stage, and everything downstream is the
columnar pages shape.  Record-granularity Python is the parse cost,
exactly like the XML sources.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pyarrow as pa

import ray.data

_CRLF2 = b"\r\n\r\n"


def _parse_ts(s: str) -> int:
    """WARC-Date (ISO 8601 Zulu) → epoch seconds."""
    return int(datetime.fromisoformat(
        s.replace("Z", "+00:00")).timestamp())


def parse_warc_bytes(data: bytes) -> pa.Table:
    """All records of one WARC file → (url, ts_s, rec_type, payload).

    ``payload`` is the html body for ``response`` records (HTTP
    headers stripped) and the raw payload for everything else.
    Truncated trailing records are dropped, records without a
    Content-Length or WARC-Target-URI are skipped — the lenient
    posture a crawl reader needs."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    urls: list[str] = []
    tss: list[int] = []
    types: list[str] = []
    payloads: list[bytes] = []
    i, n = 0, len(data)
    while i < n:
        j = data.find(b"WARC/", i)
        if j < 0:
            break
        he = data.find(_CRLF2, j)
        if he < 0:
            break
        headers: dict[bytes, bytes] = {}
        for line in data[j:he].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            i = he + 4
            continue
        body = data[he + 4: he + 4 + clen]
        i = he + 4 + clen
        if len(body) < clen:
            break                      # truncated tail record
        url = headers.get(b"warc-target-uri")
        if url is None:
            continue
        rtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
        try:
            ts = _parse_ts(headers.get(b"warc-date", b"")
                           .decode("ascii", "replace"))
        except ValueError:
            continue
        if rtype == "response":
            k = body.find(_CRLF2)
            body = body[k + 4:] if k >= 0 else b""
        urls.append(url.decode("utf-8", "replace"))
        tss.append(ts)
        types.append(rtype)
        payloads.append(body)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "ts_s": pa.array(tss, pa.int64()),
        "rec_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary())})


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated per-record gzip members → plain bytes — the
    Common-Crawl .warc.gz layout (each record its own member so byte
    ranges can be fetched and decompressed independently).  A plain
    single-member gzip stream decodes through the same loop."""
    import zlib
    out = []
    mv = memoryview(data)
    pos, n = 0, len(data)
    chunk = 1 << 20
    # feed bounded chunks from a memoryview so each member costs
    # O(member_size): no data[pos:] slice copy, and unused_data is at
    # most one chunk instead of the whole remaining file
    while pos < n and data[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        fed_end = pos
        while not d.eof and fed_end < n:
            take = min(chunk, n - fed_end)
            out.append(d.decompress(mv[fed_end:fed_end + take]))
            fed_end += take
        if not d.eof:
            break                       # truncated final member
        nxt = fed_end - len(d.unused_data)
        if nxt <= pos:
            break
        pos = nxt
    return b"".join(out)


def write_warc_gz_file(path: str, records: list[bytes]) -> None:
    """Per-record gzip members (the .warc.gz convention)."""
    import gzip
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for r in records:
            f.write(gzip.compress(r, mtime=0))
    os.replace(tmp, path)


def write_warc_gz_with_index(path: str, records: list[bytes]
                             ) -> list[dict]:
    """Per-record gzip members PLUS a CDX-style sidecar index
    (``<path>.cdx``): one line per record — ``url ts offset length``
    — the Common-Crawl pattern that lets a consumer fetch and
    decompress ONE record by byte range without touching the rest of
    the shard.  Returns the index rows."""
    import gzip
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    rows = []
    with open(tmp, "wb") as f:
        for r in records:
            member = gzip.compress(r, mtime=0)
            off = f.tell()
            f.write(member)
            # url + ts from the record head (cheap header scan)
            head = r.split(b"\r\n\r\n", 1)[0].decode("latin-1")
            url = ts = ""
            for line in head.split("\r\n"):
                if line.startswith("WARC-Target-URI:"):
                    url = line.split(":", 1)[1].strip()
                elif line.startswith("WARC-Date:"):
                    ts = line.split(":", 1)[1].strip()
            rows.append({"url": url, "ts": ts, "offset": off,
                         "length": len(member)})
    os.replace(tmp, path)
    with open(path + ".cdx.tmp", "w") as f:
        for r in rows:
            f.write(f"{r['url']} {r['ts']} {r['offset']} "
                    f"{r['length']}\n")
    os.replace(path + ".cdx.tmp", path + ".cdx")
    return rows


def fetch_warc_record(path: str, offset: int, length: int) -> pa.Table:
    """Random access: read ONE gzip member by byte range and parse it
    — the record-level pruning a 100-TB archive consumer relies on
    (never the whole shard)."""
    with open(path, "rb") as f:
        f.seek(offset)
        member = f.read(length)
    return parse_warc_bytes(member)


def read_warc(path: str, rec_types: tuple[str, ...] = ("response",),
              ) -> ray.data.Dataset:
    """Directory (or single file) of WARC shards → Dataset of
    (url, ts_s, rec_type, payload) rows, one parse task per shard."""
    want = set(rec_types)

    def parse(b: pa.Table) -> pa.Table:
        tabs = [parse_warc_bytes(raw.as_py()) for raw in b["bytes"]]
        t = pa.concat_tables(tabs) if tabs else parse_warc_bytes(b"")
        if want:
            import pyarrow.compute as pc
            t = t.filter(pc.is_in(t["rec_type"],
                                  value_set=pa.array(sorted(want))))
        return t

    return ray.data.read_binary_files(path) \
        .map_batches(parse, batch_format="pyarrow")


def warc_record(url: str, ts_s: int, payload: bytes,
                rec_type: str = "conversion",
                http_headers: bytes = b"HTTP/1.1 200 OK\r\n"
                                      b"Content-Type: text/html\r\n",
                ) -> bytes:
    """One serialized WARC record (response records get HTTP framing)."""
    if rec_type == "response":
        payload = http_headers + b"\r\n" + payload
    ts = datetime.fromtimestamp(ts_s, tz=timezone.utc) \
        .strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(payload)}\r\n").encode()
    # head lines each end with CRLF; one more CRLF closes the header
    # block (appending CRLF2 here would leak a stray CRLF into the body)
    return head + b"\r\n" + payload + _CRLF2


def write_warc_file(path: str, records: list[bytes]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for r in records:
            f.write(r)
    os.replace(tmp, path)
