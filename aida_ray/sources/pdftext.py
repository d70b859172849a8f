"""PDF text extraction, pure stdlib + zlib (no poppler/pdfminer).

A web crawl is full of PDFs; the ingest path needs their text.  This
is the deterministic subset that covers the common machine-generated
document: scan the file for stream objects, inflate FlateDecode
content streams, and walk the text operators —

* ``BT … ET`` text blocks; ``Tj`` / ``'`` / ``"`` show a literal or
  hex string; ``TJ`` shows an array with kerning numbers (ignored);
* literal strings handle the PDF escapes (``\\n \\r \\t \\b \\f \\( \\)
  \\\\``, octal ``\\ddd``, and line continuations); hex strings decode
  byte-wise;
* ``Td``/``TD``/``T*``/``TL`` line-advance operators insert newlines;
  other positioning/state operators are skipped.

Honest scope: bytes in simple (WinAnsi/Standard-encoding) fonts come
out as latin-1-ish text — exactly what the golden PDFs on this host
use; CID/Type0 composite fonts, ToUnicode CMaps, and encrypted files
are out of scope and yield garbled or empty text rather than errors
(the lenient crawl posture).  Validated against third-party PDFs
(TeX- and docbook-generated) in tests.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")

_ESCAPES = {ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
            ord("b"): "\b", ord("f"): "\f", ord("("): "(",
            ord(")"): ")", ord("\\"): "\\"}


def _content_streams(data: bytes) -> list[bytes]:
    """All decodable stream payloads (Flate-inflated or raw)."""
    out = []
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            break
        # the object dictionary sits between the enclosing 'N 0 obj'
        # token and 'stream'; bound the scan by the preceding 'obj'
        # (matches the 'obj' in a prior 'endobj' too, which bounds
        # equally well) instead of a fixed window so arbitrarily large
        # dictionaries keep their /Length and /Filter detection
        obj_pos = data.rfind(b"obj", 0, m.start())
        lo = obj_pos + 3 if obj_pos >= 0 else 0
        dict_start = data.find(b"<<", lo, m.start())
        head = data[dict_start:m.start()] if dict_start >= 0 else b""
        lm = _LENGTH_RE.search(head)
        if lm and start + int(lm.group(1)) <= end:
            # the declared Length is authoritative — a trailing-EOL
            # trim heuristic corrupts compressed data that happens to
            # end in 0x0D/0x0A bytes
            body = data[start:start + int(lm.group(1))]
        else:
            body = data[start:end]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n"):
                body = body[:-1]
        if _FLATE_RE.search(head):
            try:
                body = zlib.decompress(body)
            except zlib.error:
                body = b""
        elif b"/Filter" in head:
            body = b""                    # unsupported filter chain
        if body:
            out.append(body)
        pos = end + 9
    return out


def _literal_string(s: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal starting at the '('; returns (text,
    index after the closing paren)."""
    out = []
    depth = 1
    i += 1
    n = len(s)
    while i < n and depth:
        c = s[i]
        if c == 0x5C:                     # backslash
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:       # octal
                oct_digits = chr(e)
                i += 1
                for _ in range(2):
                    if i < n and 0x30 <= s[i] <= 0x37:
                        oct_digits += chr(s[i])
                        i += 1
                    else:
                        break
                out.append(chr(int(oct_digits, 8) & 0xFF))
            elif e in (0x0A, 0x0D):       # line continuation
                i += 1
                if e == 0x0D and i < n and s[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")
_NUM_RE = re.compile(rb"-?\d+(?:\.\d+)?")


def _stream_text(s: bytes) -> str:
    """Text shown by one content stream (BT/ET blocks only)."""
    out: list[str] = []
    i, n = 0, len(s)
    in_text = False
    pending: list[str] = []

    def flush_line():
        if pending:
            out.append("".join(pending))
            pending.clear()

    in_array = False
    while i < n:
        c = s[i]
        if c == 0x28 and in_text:         # literal string
            txt, i = _literal_string(s, i)
            pending.append(txt)
            continue
        if in_text and c == 0x5B:         # TJ array opens
            in_array = True
            i += 1
            continue
        if in_text and c == 0x5D:
            in_array = False
            i += 1
            continue
        if in_text and in_array and (c == 0x2D or 0x30 <= c <= 0x39):
            m = _NUM_RE.match(s, i)
            if m:
                # large negative kerning in a TJ array is an implicit
                # word gap (TeX and friends position spaces this way)
                if float(m.group()) < -150:
                    pending.append(" ")
                i = m.end()
                continue
        if c == 0x3C and in_text and i + 1 < n and s[i + 1] != 0x3C:
            m = _HEX_RE.match(s, i)
            if m:
                hx = re.sub(rb"\s", b"", m.group(1))
                if len(hx) % 2:
                    hx += b"0"
                pending.append(bytes.fromhex(hx.decode()).decode(
                    "latin-1"))
                i = m.end()
                continue
        if c in (0x42, 0x45, 0x54, 0x27, 0x22) or (65 <= c <= 122):
            m = _OP_RE.match(s, i)
            if m:
                op = m.group()
                if op == b"BT":
                    in_text = True
                elif op == b"ET":
                    in_text = False
                    flush_line()
                elif in_text and op in (b"Td", b"TD", b"T*"):
                    flush_line()
                elif in_text and op in (b"'", b'"'):
                    # ' and " move to the NEXT line BEFORE showing
                    # their operand (T* then Tj); the operand string
                    # was already parsed into pending, so carry it
                    # over the line break instead of flushing it with
                    # the previous line
                    operand = pending.pop() if pending else None
                    flush_line()
                    if operand is not None:
                        pending.append(operand)
                i = m.end()
                continue
        i += 1
    flush_line()
    return "\n".join(x for x in (ln.strip() for ln in out) if x)


def extract_pdf_text(payload: bytes) -> str:
    """Whole-document text: every content stream's shown text, joined
    by newlines.  Returns "" for encrypted/imageless/unsupported
    documents (lenient — a crawl reader drops, it does not crash)."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF (missing %PDF- header)")
    parts = [_stream_text(s) for s in _content_streams(payload)]
    return "\n".join(p for p in parts if p)


def make_simple_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Minimal single-page PDF showing ``lines`` with Tj/Td (and a TJ
    kerning-gap word on the first line) — test/fixture writer whose
    output any conformant viewer renders; exercises the Flate path,
    literal-string escapes and the TJ space heuristic."""
    def esc(t: str) -> str:
        return t.replace("\\", r"\\").replace("(", r"\(") \
            .replace(")", r"\)")

    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for k, ln in enumerate(lines):
        if k == 0 and " " in ln:
            a, b = ln.split(" ", 1)
            ops.append(f"[({esc(a)}) -300 ({esc(b)})] TJ")
        else:
            ops.append(f"({esc(ln)}) Tj")
        ops.append("0 -14 Td")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    if compress:
        body = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        body, filt = content, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref}\n%%EOF\n").encode()
    return bytes(out)
