"""Web-graph operators over crawl pages: outlink extraction from raw
html and robots.txt-style URL prefix filtering.

Both are per-page stateless `map_batches` stages — the web-scale shape
is: heavy html bytes never leave the extraction stage (only (src, href)
rows ship), and the host aggregate shuffles per-batch pre-aggregated
(host, src, n) rows, bounded by distinct (host, source) pairs x blocks,
never by raw link volume.

Reference parity: the reference has no crawl-graph surface (its inputs
are prepared collections, src/mpi/aida/preparator/Preparator.java); the
href regex is the crawl-side complement of our deterministic
`text/extract.py` contract and uses the same "define the rule set, test
it byte-exactly" approach.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# double-quoted href attributes on <a> tags, case-insensitive; the
# deterministic contract (single quotes / unquoted hrefs are out of
# scope and documented, exactly like extract_text's entity list)
_HREF_RE = re.compile(rb'<a\s[^>]*href="([^"]+)"', re.I)
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/?#]*)"


def extract_links(pages: ray.data.Dataset, html_col: str = "html",
                  url_col: str = "url") -> ray.data.Dataset:
    """(src url, href) rows from raw html bytes.

    The regex runs per page over the html BYTES (no decode — hrefs are
    ASCII-safe by the attribute grammar); html is dropped on emit so
    the heavy column dies in this stage.
    """

    def explode(b: pa.Table) -> pa.Table:
        srcs: list[str] = []
        hrefs: list[str] = []
        urls = b[url_col].to_pylist()
        for u, h in zip(urls, b[html_col].to_pylist()):
            if h is None:
                continue
            for m in _HREF_RE.findall(h):
                srcs.append(u)
                hrefs.append(m.decode("utf-8", "replace"))
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "href": pa.array(hrefs, pa.string())})

    return pages.map_batches(explode, batch_format="pyarrow")


def host_link_stats(links: ray.data.Dataset) -> ray.data.Dataset:
    """Per target host: total inbound links + distinct source pages.

    Phase 1 pre-aggregates each batch to (host, src, n) — the shuffle
    ships distinct pairs, not links; phase 2 is one groupby(host) whose
    groups are bounded by sources-per-host."""

    def partial(b: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(b["href"], _HOST_RE), "host")
        df = pd.DataFrame({
            "host": pc.utf8_lower(host).to_numpy(zero_copy_only=False),
            "src": b["src"].to_numpy(zero_copy_only=False)})
        df = df[pd.notna(df["host"])]
        g = df.groupby(["host", "src"], sort=False) \
            .size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_host(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "host": [g["host"].iloc[0]],
            "n_links": [int(g["n"].sum())],
            "n_sources": [int(g["src"].nunique())]})

    return links.map_batches(partial, batch_format="pyarrow") \
        .groupby("host").map_groups(per_host, batch_format="pandas")


def robots_filter(pages: ray.data.Dataset, rules: list[tuple[str, str]],
                  url_col: str = "url") -> ray.data.Dataset:
    """Append ``blocked`` — true when the page's (host, path) matches a
    disallow rule (host equality + path PREFIX, robots.txt Disallow
    semantics).

    The rule set broadcasts once in closure form, grouped by prefix
    LENGTH: for each distinct rule length l the batch test is one
    vectorized ``utf8_slice + is_in`` over "host|path[:l]" keys — no
    per-row Python, exact for any rule set, O(distinct lengths) kernel
    passes per batch."""
    by_len: dict[int, set[str]] = {}
    for host, prefix in rules:
        by_len.setdefault(len(prefix), set()).add(
            host.lower() + "|" + prefix)
    lens = sorted(by_len)
    value_sets = {l: pa.array(sorted(v), pa.string())
                  for l, v in by_len.items()}

    parts_re = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/?#]*)(?P<path>[^?#]*)"

    def tag(b: pa.Table) -> pa.Table:
        parts = pc.extract_regex(b[url_col], parts_re)
        host = pc.utf8_lower(pc.struct_field(parts, "host"))
        path = pc.struct_field(parts, "path")
        path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
        blocked = np.zeros(len(b), dtype=bool)
        for l in lens:
            key = pc.binary_join_element_wise(
                host, pc.utf8_slice_codeunits(path, 0, l), "|")
            hit = pc.is_in(key, value_set=value_sets[l])
            blocked |= hit.to_numpy(zero_copy_only=False)
        # non-URL rows (no scheme://host) are never blocked
        blocked &= pc.is_valid(host).to_numpy(zero_copy_only=False)
        return b.append_column("blocked", pa.array(blocked))

    return pages.map_batches(tag, batch_format="pyarrow")


# anchor tags with their inner text: the raw material of a
# mention->entity prior dictionary (anchor-link frequency)
_ANCHOR_RE = re.compile(rb'<a\s[^>]*href="([^"]+)"[^>]*>([^<]*)</a>', re.I)


def anchor_surface_pairs(pages: ray.data.Dataset,
                         html_col: str = "html") -> ray.data.Dataset:
    """(surface, target) rows from raw html bytes: surface = the
    anchor's inner text lowercased/stripped, target = its href.  Heavy
    html dies in this stage, exactly like :func:`extract_links`."""

    def explode(b: pa.Table) -> pa.Table:
        surfs: list[str] = []
        tgts: list[str] = []
        for h in b[html_col].to_pylist():
            if h is None:
                continue
            for href, txt in _ANCHOR_RE.findall(h):
                s = txt.decode("utf-8", "replace").strip().lower()
                if not s:
                    continue
                surfs.append(s)
                tgts.append(href.decode("utf-8", "replace"))
        return pa.table({"surface": pa.array(surfs, pa.string()),
                         "target": pa.array(tgts, pa.string())})

    return pages.map_batches(explode, batch_format="pyarrow")


def anchor_priors(pages: ray.data.Dataset, html_col: str = "html",
                  broadcast_rows: int = 4_000_000) -> ray.data.Dataset:
    """Mention→entity prior dictionary from corpus anchor statistics —
    prior(surface, target) = links(surface→target) / links(surface).

    This is how the reference's YAGO2 dictionary priors are built
    (anchor-link frequency over Wikipedia; consumed by
    `DataAccess.getEntitiesForMention` — SURVEY.md §2.5 G1 asserts
    they sum to 1 per surface), lifted to crawl scale:

    1. per-block (surface, target) partial counts (pandas hash groupby
       in C — the shuffle ships dictionary rows × blocks, never links);
    2. pair combine via :func:`agg.bucket_reduce` (the pair space IS
       the dictionary — unbounded, so no single-reducer finisher);
    3. per-surface totals: a second bucket_reduce over the already-
       combined pairs (volume = dictionary rows);
    4. totals rejoin the pairs map-side — broadcast as sorted
       hash + searchsorted lookup below ``broadcast_rows`` distinct
       surfaces, hash-join fallback above — and the prior divide is
       one vectorized float64 op.

    Output: (surface, target, n, prior) — priors sum to 1 per surface
    by construction."""
    from aida_ray.stages.agg import bucket_reduce
    from aida_ray.stages.dedup import _concat_blocks, _get_cached, \
        hash_strings62
    import ray

    raw = anchor_surface_pairs(pages, html_col=html_col)

    def count_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "surface": b["surface"].to_numpy(zero_copy_only=False),
            "target": b["target"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["surface", "target"], sort=False) \
            .size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = raw.map_batches(count_partial, batch_format="pyarrow")
    pairs = bucket_reduce(partials, ["surface", "target"],
                          {"n": "sum"}).materialize()
    totals = bucket_reduce(pairs, ["surface"],
                           {"tot": ("n", "sum")}).materialize()

    if totals.count() <= broadcast_rows:
        tt = _concat_blocks([ray.get(r) for r in totals.to_arrow_refs()],
                            pa.schema([("surface", pa.string()),
                                       ("tot", pa.int64())]))
        th = hash_strings62(tt["surface"])
        o = np.argsort(th)
        tot_ref = ray.put((th[o],
                           tt["tot"].to_numpy(zero_copy_only=False)[o]))

        def divide(b: pa.Table) -> pa.Table:
            hs, tots = _get_cached(tot_ref)
            h = hash_strings62(b["surface"])
            pos = np.searchsorted(hs, h)
            n = b["n"].to_numpy(zero_copy_only=False).astype("float64")
            tot = tots[pos].astype("float64")
            return pa.table({
                "surface": b["surface"],
                "target": b["target"],
                "n": pc.cast(b["n"], pa.int64()),
                "prior": pa.array(n / tot, pa.float64())})

        return pairs.map_batches(divide, batch_format="pyarrow")

    from aida_ray.stages.shuffle_join import hash_join
    joined = hash_join(pairs, totals, on=("surface",))

    def divide_joined(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype("float64")
        tot = b["tot"].to_numpy(zero_copy_only=False).astype("float64")
        return pa.table({
            "surface": b["surface"],
            "target": b["target"],
            "n": pc.cast(b["n"], pa.int64()),
            "prior": pa.array(n / tot, pa.float64())})

    return joined.map_batches(divide_joined, batch_format="pyarrow")


def parse_robots(ds: ray.data.Dataset, host_col: str = "host",
                 body_col: str = "body",
                 agent: str = "*") -> ray.data.Dataset:
    """Parse robots.txt bodies into the (host, prefix) disallow rules
    :func:`robots_filter` consumes (REP semantics per RFC 9309, the
    subset a crawl filter needs): group lines by User-agent, collect
    ``Disallow:`` paths of every group whose agent matches ``agent``
    exactly or is ``*``; empty Disallow (allow-all) and comment/blank
    lines drop; paths keep their case, hosts lowercase.

    Scale shape: stateless parse-bound map (one robots.txt per host —
    the input is HOST-bounded, tiny next to the page stream); output
    is rule rows.
    """

    def batch(b: pa.Table) -> pa.Table:
        hosts_out, prefixes = [], []
        for host, body in zip(b[host_col].to_pylist(),
                              b[body_col].to_pylist()):
            host = (host or "").lower()
            applies = False
            group_open = False   # new User-agent lines extend a group
            for raw in (body or "").splitlines():
                line = raw.split("#", 1)[0].strip()
                if not line or ":" not in line:
                    continue
                field, _, value = line.partition(":")
                field = field.strip().lower()
                value = value.strip()
                if field == "user-agent":
                    if not group_open:
                        applies = False
                        group_open = True
                    applies = applies or value == "*" or value == agent
                elif field == "disallow":
                    group_open = False
                    if applies and value:
                        hosts_out.append(host)
                        prefixes.append(value)
                else:
                    group_open = False
        return pa.table({"host": pa.array(hosts_out, pa.string()),
                         "prefix": pa.array(prefixes, pa.string())})

    return ds.map_batches(batch, batch_format="pyarrow")


def anchor_term_index(pages: ray.data.Dataset, k: int = 3,
                      html_col: str = "html") -> ray.data.Dataset:
    """Inbound anchor-term profile per link target — "what the web
    calls this page" (the anchor-text description signal of classic
    web IR, e.g. Craswell/Hawking/Robertson SIGIR'01): tokenize every
    anchor surface pointing at a target, count (target, term), keep
    each target's top-``k`` terms by (n DESC, term ASC).

    Scale shape: anchor explode streams; (target, term) counting is
    one groupby-sum over per-block pandas partials (shuffle =
    distinct profile rows); the top-k cut is a per-target
    ``map_groups`` (bounded by each target's distinct anchor
    vocabulary)."""
    import re as _re

    from ray.data.aggregate import Sum

    raw = anchor_surface_pairs(pages, html_col=html_col)
    tok = _re.compile(r"[a-z0-9]+")

    def explode_terms(b: pa.Table) -> pa.Table:
        tg, tm = [], []
        for t, s in zip(b["target"].to_pylist(),
                        b["surface"].to_pylist()):
            for w in tok.findall(s):
                tg.append(t)
                tm.append(w)
        df = pd.DataFrame({"target": tg, "term": tm, "n": 1})
        g = df.groupby(["target", "term"], sort=False)["n"].sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = raw.map_batches(explode_terms, batch_format="pyarrow") \
        .groupby(["target", "term"]).aggregate(Sum("n"))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sum(n)", "term"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            "target": g["target"].to_numpy(),
            "term": g["term"].to_numpy(),
            "n": g["sum(n)"].to_numpy().astype("int64"),
            "rank_idx": np.arange(1, len(g) + 1, dtype="int64")})

    return counts.groupby("target").map_groups(topk,
                                               batch_format="pandas")


_REL_NEXT_RE = re.compile(
    r'<link\b[^>]*\brel\s*=\s*["\']next["\'][^>]*'
    r'href\s*=\s*["\']([^"\']*)["\']', re.I)


def parse_next_links(pages: ray.data.Dataset, id_col: str = "url_id",
                     html_col: str = "html") -> ray.data.Dataset:
    """(url_id, next_href) per page carrying a <link rel="next">
    pagination pointer (first match wins — the standard contract).
    Attribute order follows the package's extract_meta convention
    (rel before href).  Pages without one emit no row."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        out_id, hrefs = [], []
        for i, h in zip(ids, b[html_col].to_pylist()):
            if isinstance(h, bytes):
                h = h.decode("utf-8", "replace")
            m = _REL_NEXT_RE.search(h or "")
            if m:
                out_id.append(int(i))
                hrefs.append(m.group(1))
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "next_href": pa.array(hrefs, pa.string())})

    return pages.map_batches(batch, batch_format="pyarrow")


def robots_compliance(urls: ray.data.Dataset,
                      rules: list[tuple[str, str]],
                      url_col: str = "url") -> ray.data.Dataset:
    """Per-host crawl-compliance report: how many crawled urls a
    host's disallow rules would have blocked — the crawl-QA metric
    that catches a fetcher ignoring robots.txt.

    Emits (host, n_crawled, n_blocked, rate) with rate rounded to 6.

    Scale shape: rules broadcast via robots_filter's length-grouped
    closure; per-batch partial (host, crawled, blocked) counts bound
    the one shuffle by the HOST vocabulary."""
    from ray.data.aggregate import Sum

    tagged = robots_filter(urls, rules, url_col=url_col)
    host_re = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/?#]*)"

    def partial(b: pa.Table) -> pa.Table:
        host = pc.utf8_lower(pc.struct_field(
            pc.extract_regex(b[url_col], host_re), "host"))
        df = pd.DataFrame({
            "host": host.to_numpy(zero_copy_only=False),
            "blocked": b["blocked"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        df = df[pd.notna(df["host"])]
        g = df.groupby("host", sort=False).agg(
            n=("blocked", "size"), nb=("blocked", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["nb"] = g["nb"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = tagged.map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("n"), Sum("nb"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({"host": pa.array([], pa.string()),
                             "n_crawled": pa.array([], pa.int64()),
                             "n_blocked": pa.array([], pa.int64()),
                             "rate": pa.array([], pa.float64())})
        n = b["sum(n)"].to_numpy(zero_copy_only=False)
        nb = b["sum(nb)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "host": b["host"],
            "n_crawled": pa.array(n.astype(np.int64)),
            "n_blocked": pa.array(nb.astype(np.int64)),
            "rate": pa.array(np.round(nb / n, 6), pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")
