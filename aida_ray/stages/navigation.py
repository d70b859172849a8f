"""Site-navigation extraction: breadcrumbs, headed lists, hreflang.

Three webtext signals a KG builder mines from page CHROME rather than
body text (reference parity: the reference's extractors stop at body
text — these are the crawl-native complements):

- breadcrumb trails (``<nav class="breadcrumb">``) are editor-curated
  taxonomy paths; aggregated parent→child edges induce a site
  category tree, the same shape Hearst patterns induce from prose.
- headed lists (``<h*>`` followed by ``<ul>/<ol>``) are class-member
  assertions ("Notable alumni" → member entities) — list-based set
  expansion's raw material.
- ``hreflang`` alternate links group language versions of one logical
  page; clustering them yields the canonical-document key that
  cross-language dedup and per-language NED routing join on.

Scale shape: extraction stages are stateless map_batches over the
html column (per-page regex walk — HTML is inherently per-document;
the heavy column dies at this stage, matching links.extract_links);
``breadcrumb_edges`` pre-aggregates per batch so the shuffle ships
distinct (parent, child) pairs, never pages; ``alternate_clusters``
reuses the distributed min-label CC machinery
(dedup.label_propagation_clusters) over a dense id space built from
the ALTERNATE-EDGE urls only — markup-bearing pages, a tiny fraction
of the corpus, gated + documented like every broadcast side.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_NAV_RE = re.compile(
    rb'<nav[^>]*breadcrumb[^>]*>(.*?)</nav>', re.I | re.S)
_CRUMB_RE = re.compile(rb'<(?:a|span)[^>]*>([^<]*)</(?:a|span)>', re.I)
_HEAD_OR_LIST_RE = re.compile(
    rb'<h([1-6])[^>]*>([^<]*)</h\1>|<(ul|ol)[^>]*>(.*?)</\3>',
    re.I | re.S)
_LI_RE = re.compile(rb'<li[^>]*>([^<]*)</li>', re.I)
_LINK_TAG_RE = re.compile(rb'<link\s[^>]*>', re.I)
_ATTR_RE = {
    "rel": re.compile(rb'\brel="([^"]*)"', re.I),
    "hreflang": re.compile(rb'\bhreflang="([^"]*)"', re.I),
    "href": re.compile(rb'\bhref="([^"]*)"', re.I),
}


def _dec(b: bytes) -> str:
    return b.decode("utf-8", "replace").strip()


def breadcrumb_trails(pages: ray.data.Dataset, id_col: str = "doc_id",
                      html_col: str = "html") -> ray.data.Dataset:
    """(doc_id, pos, crumb) — the first breadcrumb nav's item texts in
    document order, 1-based positions; pages without breadcrumb
    markup emit nothing."""

    def explode(b: pa.Table) -> pa.Table:
        ids, pos, crumb = [], [], []
        id_np = b[id_col].to_numpy(zero_copy_only=False)
        for i, h in zip(id_np, b[html_col].to_pylist()):
            if h is None:
                continue
            m = _NAV_RE.search(h)
            if not m:
                continue
            for k, c in enumerate(_CRUMB_RE.findall(m.group(1)), 1):
                ids.append(int(i))
                pos.append(k)
                crumb.append(_dec(c))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "crumb": pa.array(crumb, pa.string())})

    return pages.map_batches(explode, batch_format="pyarrow")


def breadcrumb_edges(pages: ray.data.Dataset, id_col: str = "doc_id",
                     html_col: str = "html") -> ray.data.Dataset:
    """(parent, child, n_pages) — consecutive breadcrumb pairs
    aggregated over the corpus: the induced site-taxonomy edge list
    with page-support counts.

    Per-batch partial counts make the shuffle distinct-edge-bounded
    (taxonomy-sized, never corpus-sized)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for h in b[html_col].to_pylist():
            if h is None:
                continue
            m = _NAV_RE.search(h)
            if not m:
                continue
            crumbs = [_dec(c) for c in _CRUMB_RE.findall(m.group(1))]
            for a, c in zip(crumbs, crumbs[1:]):
                counts[(a, c)] = counts.get((a, c), 0) + 1
        ks = list(counts)
        return pa.table({
            "parent": pa.array([k[0] for k in ks], pa.string()),
            "child": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64())})

    agg = pages.map_batches(partial, batch_format="pyarrow") \
        .groupby(["parent", "child"]).aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({"parent": pa.array([], pa.string()),
                             "child": pa.array([], pa.string()),
                             "n_pages": pa.array([], pa.int64())})
        return pa.table({"parent": b["parent"], "child": b["child"],
                         "n_pages": b["sum(n)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def headed_lists(pages: ray.data.Dataset, id_col: str = "doc_id",
                 html_col: str = "html") -> ray.data.Dataset:
    """(doc_id, heading, pos, item) — every ``<li>`` text with its
    1-based position inside its list and the text of the NEAREST
    PRECEDING heading (``''`` when the list opens before any
    heading): the class-member candidate table for list-based set
    expansion."""

    def explode(b: pa.Table) -> pa.Table:
        ids, heads, pos, items = [], [], [], []
        id_np = b[id_col].to_numpy(zero_copy_only=False)
        for i, h in zip(id_np, b[html_col].to_pylist()):
            if h is None:
                continue
            current = ""
            for m in _HEAD_OR_LIST_RE.finditer(h):
                if m.group(2) is not None:      # a heading
                    current = _dec(m.group(2))
                else:                           # a list body
                    for k, li in enumerate(_LI_RE.findall(m.group(4)), 1):
                        ids.append(int(i))
                        heads.append(current)
                        pos.append(k)
                        items.append(_dec(li))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "heading": pa.array(heads, pa.string()),
                         "pos": pa.array(pos, pa.int64()),
                         "item": pa.array(items, pa.string())})

    return pages.map_batches(explode, batch_format="pyarrow")


def hreflang_edges(pages: ray.data.Dataset, url_col: str = "url",
                   html_col: str = "html") -> ray.data.Dataset:
    """(url, lang, alt_url) — one row per ``<link rel="alternate"
    hreflang=...>`` tag; attribute order inside the tag is free."""

    def explode(b: pa.Table) -> pa.Table:
        srcs, langs, alts = [], [], []
        urls = b[url_col].to_pylist()
        for u, h in zip(urls, b[html_col].to_pylist()):
            if h is None:
                continue
            for tag in _LINK_TAG_RE.findall(h):
                rel = _ATTR_RE["rel"].search(tag)
                if rel is None or b"alternate" not in rel.group(1).lower():
                    continue
                hl = _ATTR_RE["hreflang"].search(tag)
                href = _ATTR_RE["href"].search(tag)
                if hl is None or href is None:
                    continue
                srcs.append(u)
                langs.append(_dec(hl.group(1)))
                alts.append(_dec(href.group(1)))
        return pa.table({"url": pa.array(srcs, pa.string()),
                         "lang": pa.array(langs, pa.string()),
                         "alt_url": pa.array(alts, pa.string())})

    return pages.map_batches(explode, batch_format="pyarrow")


def alternate_clusters(edges: ray.data.Dataset,
                       broadcast_urls: int = 8_000_000) -> ray.data.Dataset:
    """(url, rep) — language-version clusters over hreflang alternate
    edges by connected components; rep = lexicographically smallest
    url in the component (the canonical-document key).  Thin wrapper
    over graphs.string_components (the shared string-keyed CC
    front-end); the url universe is ALTERNATE-EDGE urls only —
    markup-bearing pages, a small slice of any crawl."""
    from aida_ray.stages.graphs import string_components

    out = string_components(edges, a_col="url", b_col="alt_url",
                            broadcast_nodes=broadcast_urls)
    return out.map_batches(
        lambda b: pa.table({"url": b["node"], "rep": b["rep"]})
        if "node" in b.column_names else
        pa.table({"url": pa.array([], pa.string()),
                  "rep": pa.array([], pa.string())}),
        batch_format="pyarrow")


def expand_set(lists: ray.data.Dataset, seeds: list[str],
               id_col: str = "doc_id", heading_col: str = "heading",
               item_col: str = "item",
               broadcast_contexts: int = 4_000_000
               ) -> ray.data.Dataset:
    """SEAL-style entity-set expansion from list co-occurrence: a
    candidate item's score is the number of DISTINCT list contexts
    (doc, heading) it shares with at least one seed — items that keep
    appearing in the same curated lists as the seeds are likely
    members of the same class.

    Emits (item, n_ctx) for non-seed items with n_ctx >= 1.

    Scale shape: seed-bearing contexts are collected once (bounded by
    seed popularity — a seed set's list contexts are a sliver of the
    corpus; gated by ``broadcast_contexts`` with a hash-join as the
    documented fallback) and broadcast; membership rows filter
    against the broadcast set per batch, then one distinct
    (ctx, item) groupby + one per-item count — shuffles ship
    candidate-vocabulary rows."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.dedup import _get_cached
    from aida_ray.state.collect import collect_table

    seed_set = set(seeds)

    def ctx_key(b: pa.Table) -> np.ndarray:
        d = b[id_col].to_numpy(zero_copy_only=False).astype(str)
        h = b[heading_col].to_numpy(zero_copy_only=False).astype(str)
        return np.char.add(np.char.add(d, "\x1f"), h)

    def seed_ctx(b: pa.Table) -> pa.Table:
        keep = np.isin(b[item_col].to_numpy(zero_copy_only=False),
                       list(seed_set))
        return pa.table({"ctx": pa.array(np.unique(ctx_key(b)[keep]),
                                         pa.string())})

    ctxs = collect_table(
        lists.map_batches(seed_ctx, batch_format="pyarrow"))
    ctx_arr = (np.unique(ctxs["ctx"].to_numpy(zero_copy_only=False)
                         .astype(str))
               if ctxs.num_rows else np.array([], dtype=str))
    assert len(ctx_arr) <= broadcast_contexts, \
        "expand_set: seed contexts above broadcast gate — hash-join"
    ref = ray.put(ctx_arr)

    def members(b: pa.Table) -> pa.Table:
        ca = _get_cached(ref)
        k = ctx_key(b)
        items = b[item_col].to_numpy(zero_copy_only=False)
        keep = np.isin(k, ca) & ~np.isin(items, list(seed_set))
        df = pd.DataFrame({"ctx": k[keep],
                           "item": items[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = lists.map_batches(members, batch_format="pyarrow") \
        .groupby(["ctx", "item"]).count()

    def one(b: pa.Table) -> pa.Table:
        if "item" not in b.column_names:
            return pa.table({"item": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"item": b["item"],
                         "c": pa.array(np.ones(b.num_rows,
                                               dtype=np.int64))})

    agg = distinct.map_batches(one, batch_format="pyarrow") \
        .groupby("item").aggregate(Sum("c"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(c)" not in b.column_names:
            return pa.table({"item": pa.array([], pa.string()),
                             "n_ctx": pa.array([], pa.int64())})
        return pa.table({"item": b["item"],
                         "n_ctx": b["sum(c)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


_TOKEN_SPLIT_CI = re.compile(r"[^A-Za-z0-9]+")


def invariant_tokens(pages: ray.data.Dataset,
                     cluster_col: str = "cluster",
                     id_col: str = "url", text_col: str = "text",
                     group_size_limit: int = 10_000
                     ) -> ray.data.Dataset:
    """Cross-lingual anchor tokens: within each language-version
    cluster (alternate_clusters output joined back onto pages), the
    tokens present in EVERY member page — names, numbers and codes
    survive translation, so the invariant set is the cross-lingual
    entity-alignment seed.

    Emits (cluster, token), case-sensitive alphanumeric tokens.

    Scale shape: one groupby(cluster).map_groups keyed by cluster —
    a cluster is a language-version set (tens of pages, guarded by
    ``group_size_limit``); per-group work is len(pages) set
    intersections over that cluster's text only."""

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot cluster {g[cluster_col].iloc[0]!r}: {len(g)} "
                "pages exceed the per-group bound")
        inv: set | None = None
        for _, grp in g.groupby(id_col, sort=False):
            toks: set = set()
            for t in grp[text_col]:
                toks.update(x for x in _TOKEN_SPLIT_CI.split(t or "")
                            if x)
            inv = toks if inv is None else (inv & toks)
        out = sorted(inv or ())
        return pd.DataFrame({cluster_col: [g[cluster_col].iloc[0]] *
                             len(out), "token": out})

    return pages.groupby([cluster_col]).map_groups(
        per_cluster, batch_format="pandas")


_FORM_RE = re.compile(rb'<form\b([^>]*)>(.*?)</form>', re.I | re.S)
_ACTION_RE = re.compile(rb'\baction="([^"]*)"', re.I)
_METHOD_RE = re.compile(rb'\bmethod="([^"]*)"', re.I)
_INPUT_RE = re.compile(rb'<input\b', re.I)


def form_endpoints(pages: ray.data.Dataset, id_col: str = "doc_id",
                   html_col: str = "html") -> ray.data.Dataset:
    """HTML form extraction: each form's action endpoint, method
    (lower-cased, 'get' when unspecified — the HTML default) and
    input count — the crawl's map of interactive surface (search
    boxes, logins, APIs behind POST).

    Emits (doc_id, action, method, n_inputs); forms without an
    action attribute emit action ''.

    Scale shape: stateless map_batches regex walk; the html column
    dies here."""

    def explode(b: pa.Table) -> pa.Table:
        ids, act, meth, nin = [], [], [], []
        id_np = b[id_col].to_numpy(zero_copy_only=False)
        for i, h in zip(id_np, b[html_col].to_pylist()):
            if h is None:
                continue
            for m in _FORM_RE.finditer(h):
                attrs, body = m.group(1), m.group(2)
                a = _ACTION_RE.search(attrs)
                me = _METHOD_RE.search(attrs)
                ids.append(int(i))
                act.append(_dec(a.group(1)) if a else "")
                meth.append(_dec(me.group(1)).lower() if me else "get")
                nin.append(len(_INPUT_RE.findall(body)))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "action": pa.array(act, pa.string()),
                         "method": pa.array(meth, pa.string()),
                         "n_inputs": pa.array(nin, pa.int64())})

    return pages.map_batches(explode, batch_format="pyarrow")
