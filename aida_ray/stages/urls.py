"""URL canonicalization for crawl corpora.

Canonical form (the usual crawl-dedup normalization):
  - scheme and host lowercased;
  - default ports stripped (:80 for http, :443 for https);
  - fragment stripped;
  - tracking query params removed (utm_*, fbclid, gclid, and the
    leftover '?'/'&' punctuation repaired);
  - trailing '?' dropped.

Everything is Arrow RE2 kernels (`extract_regex` for the structural
split, `replace_substring_regex` for the scrubs) — no Python loop —
and the SQL oracle runs the IDENTICAL patterns through DuckDB's RE2
regexp functions, so the two engines cannot drift.

`registrable_domain` approximates the eTLD+1 as the last two host
labels (a real public-suffix list is a data file, not an algorithm;
the approximation is the standard crawl-stats shortcut and is exact
for .com/.org/.net-style suffixes).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

URL_PARTS_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)(?P<rest>[^#]*)"
_TRACK = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"
DOMAIN_RE = r"(?P<dom>[^.]+\.[^.]+)$"


def canonicalize_batch(batch: pa.Table, url_col: str = "url",
                       out_col: str = "canonical_url") -> pa.Table:
    parts = pc.extract_regex(batch[url_col], URL_PARTS_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    rest = pc.struct_field(parts, "rest")
    # default ports off the (lowercased) host
    host = pc.replace_substring_regex(host, pattern=r":80$", replacement="")
    host = pc.replace_substring_regex(host, pattern=r":443$", replacement="")
    # tracking params, in an order that keeps '?' bookkeeping exact:
    # '&tracker' pairs vanish, a leading '?tracker&' hands '?' to the
    # next param, a lone '?tracker' drops the query entirely
    rest = pc.replace_substring_regex(rest, pattern="&" + _TRACK,
                                      replacement="")
    rest = pc.replace_substring_regex(rest, pattern=r"\?" + _TRACK + "&",
                                      replacement="?")
    rest = pc.replace_substring_regex(rest, pattern=r"\?" + _TRACK + "$",
                                      replacement="")
    canon = pc.binary_join_element_wise(scheme, pa.array(
        ["://"] * len(batch)), host, rest, "")
    # non-URL rows (no scheme://host match) pass through unchanged
    canon = pc.if_else(pc.is_valid(canon), canon, batch[url_col])
    return batch.append_column(out_col, canon)


def domain_batch(batch: pa.Table, url_col: str = "canonical_url",
                 out_col: str = "domain") -> pa.Table:
    parts = pc.extract_regex(batch[url_col], URL_PARTS_RE)
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, pattern=r":\d+$", replacement="")
    dom = pc.struct_field(pc.extract_regex(host, DOMAIN_RE), "dom")
    dom = pc.if_else(pc.is_valid(dom), dom, host)
    dom = pc.if_else(pc.is_valid(dom), dom, pa.scalar("", pa.string()))
    return batch.append_column(out_col, dom)


def canonicalize_urls(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    """Streaming URL canonicalization + registrable-domain extraction."""
    return ds.map_batches(lambda b: domain_batch(canonicalize_batch(b, url_col)),
                          batch_format="pyarrow")


def frontier_rank(ds: "ray.data.Dataset", host_col: str = "host",
                  url_col: str = "url",
                  group_size_limit: int = 50_000_000) -> "ray.data.Dataset":
    """Politeness crawl-frontier ranking: per-host fetch position
    ``rn`` (ROW_NUMBER over the host's URL order).  Dequeuing by
    ``(rn, host, url)`` interleaves hosts round-robin — no host is hit
    twice before every host with pending URLs is hit once — which is
    the standard frontier politeness discipline.

    One ``groupby(host).map_groups`` shuffle; per-host URL counts are
    politeness-bounded in practice (a crawl schedules a bounded batch
    per host per cycle), with the same ``group_size_limit`` guard as
    the window operators against pathological hosts.
    """
    import numpy as np
    import pandas as pd

    def per_host(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot host {g[host_col].iloc[0]!r}: {len(g)} rows "
                "exceed the per-group bound — pre-split by url bucket")
        g = g.sort_values(url_col).reset_index(drop=True)
        out = pd.DataFrame({
            host_col: g[host_col], url_col: g[url_col],
            "rn": np.arange(1, len(g) + 1, dtype="int64")})
        return out

    return ds.groupby(host_col).map_groups(per_host,
                                           batch_format="pandas")
