"""PII scrubbing for training-data pipelines.

A stateless ``map_batches`` stage over zero-copy Arrow batches: emails,
phone numbers and IPv4 addresses are replaced with typed placeholder
tokens and counted per document.  All matching runs in Arrow's RE2
kernels (``replace_substring_regex`` / ``count_substring_regex``) — no
Python loop over rows — and DuckDB's regexp functions are RE2 too, so
the exact same patterns serve as the SQL oracle (no semantic drift
between engines).

Patterns are deliberately simple/deterministic (this is a redaction
pass, not a validator): broad-match-then-redact is the standard
crawl-pipeline posture — over-redaction is cheap, leakage is not.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# RE2-compatible (works identically in Arrow and DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# order matters: emails first (an email never contains a phone/ip match
# after redaction), then phones, then bare IPv4s
PII_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact PII in ``text_col``; append per-type counts and the
    scrubbed text. Pure Arrow kernels, applied in PII_RULES order."""
    text = batch[text_col]
    out = batch
    for name, pattern, repl in PII_RULES:
        n = pc.cast(pc.count_substring_regex(text, pattern=pattern), pa.int64())
        text = pc.replace_substring_regex(text, pattern=pattern,
                                          replacement=repl)
        out = out.append_column(f"n_{name}", n)
    return out.set_column(out.schema.get_field_index(text_col), text_col, text)


def redact(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """PII-scrub a corpus: streaming, stateless, zero-copy Arrow."""
    return ds.map_batches(lambda b: redact_batch(b, text_col),
                          batch_format="pyarrow")
