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

import numpy as np
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


def _resolve_np(nodes, ptrs, max_rounds: int = 64):
    """Single-process pointer-doubling resolve of a functional graph.

    Returns (final, hops) arrays aligned to ``nodes``: the terminal
    node reached from each source and the exact path length; rows on
    or feeding a cycle get (-1, -1).
    """
    import numpy as np

    order = np.argsort(nodes, kind="stable")
    sn = nodes[order]
    ptr = ptrs.astype(np.int64).copy()
    hops = np.ones(len(nodes), dtype=np.int64)
    n = len(nodes)
    for _ in range(max_rounds):
        idx = np.searchsorted(sn, ptr)
        idx_c = np.clip(idx, 0, max(0, n - 1))
        hit = (sn[idx_c] == ptr) if n else np.zeros(0, dtype=bool)
        # rows whose accumulated length exceeds the node count are
        # provably cycling — freeze them so the loop can terminate
        hit &= hops <= n
        if not hit.any():
            break
        pos = order[idx_c]
        # simultaneous composition f <- f(f): read frozen copies
        ptr_prev, hops_prev = ptr, hops
        ptr = np.where(hit, ptr_prev[pos], ptr_prev)
        hops = np.where(hit, hops_prev + hops_prev[pos], hops_prev)
    # anything still pointing at a source node is in / feeds a cycle
    idx = np.searchsorted(sn, ptr)
    idx_c = np.clip(idx, 0, max(0, n - 1))
    cyc = ((sn[idx_c] == ptr) | (hops > n)) if n else np.zeros(0, dtype=bool)
    final = np.where(cyc, -1, ptr)
    hops = np.where(cyc, -1, hops)
    return final, hops


def resolve_redirects(edges: ray.data.Dataset, src: str = "src",
                      dst: str = "dst", max_rounds: int = 64,
                      broadcast_rows: int = 8_000_000) -> ray.data.Dataset:
    """Resolve every URL's redirect CHAIN to its terminal target.

    Input is a functional edge set (each source redirects to exactly
    one destination, int64 ids — map URLs to ids upstream with
    dictionary encoding; string keys would force object-dtype
    searchsorted in the hot loop).  Output: (node, final, hops) for
    every redirecting source — the terminal id and exact chain length,
    or (-1, -1) for sources on or feeding a redirect loop.

    Scale shape mirrors ``dedup.label_propagation_clusters``: below
    ``broadcast_rows`` (8M ≈ 192 MB of int64 triples) the edge set is
    solved by ONE distributed numpy pointer-doubling task (off-driver,
    O(log depth) vector passes); above it, an iterative self-join plan
    doubles the pointer each round (state ⋈ state on ptr = node),
    converging in O(log depth) hash-join rounds with the driver seeing
    only scalar convergence counts.
    """
    import numpy as np

    from aida_ray.state.collect import concat_blocks
    from aida_ray.stages.shuffle_join import hash_join

    schema = pa.schema([(src, pa.int64()), (dst, pa.int64())])
    n_edges = edges.count()
    if n_edges <= broadcast_rows:
        refs = edges.to_arrow_refs()
        if n_edges == 0 or not refs:
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.int64()),
                 "final": pa.array([], pa.int64()),
                 "hops": pa.array([], pa.int64())}))

        @ray.remote
        def _solve(*tabs: pa.Table) -> pa.Table:
            t = concat_blocks(tabs, schema)
            nodes = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
            ptrs = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
            final, hops = _resolve_np(nodes, ptrs, max_rounds)
            return pa.table({"node": pa.array(nodes, pa.int64()),
                             "final": pa.array(final, pa.int64()),
                             "hops": pa.array(hops, pa.int64())})

        return ray.data.from_arrow_refs([_solve.remote(*refs)])

    # ---- iterative plan: state (node, ptr, hops, live) self-joined ----
    def init(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": pc.cast(t[src], pa.int64()),
            "ptr": pc.cast(t[dst], pa.int64()),
            "hops": pa.array(np.ones(n, dtype=np.int64))})

    state = edges.map_batches(init, batch_format="pyarrow").materialize()
    for _ in range(max_rounds):
        right = state.map_batches(
            lambda b: pa.table({"jnode": b["node"], "jptr": b["ptr"],
                                "jhops": b["hops"]}),
            batch_format="pyarrow")
        joined = hash_join(state, right, on=("ptr",), right_on=("jnode",),
                           join_type="left_outer")

        def step(b: pa.Table) -> pa.Table:
            hops = b["hops"].to_numpy(zero_copy_only=False)
            jptr = b["jptr"].to_numpy(zero_copy_only=False)
            jhops = b["jhops"].to_numpy(zero_copy_only=False)
            ptr = b["ptr"].to_numpy(zero_copy_only=False)
            hit = ~pa.compute.is_null(b["jptr"]).to_numpy(
                zero_copy_only=False)
            hit &= hops <= n_edges          # freeze provable cycles
            new_ptr = np.where(hit, np.nan_to_num(
                jptr.astype("float64")).astype(np.int64), ptr)
            new_hops = np.where(hit, hops + np.nan_to_num(
                jhops.astype("float64")).astype(np.int64), hops)
            return pa.table({
                "node": b["node"],
                "ptr": pa.array(new_ptr, pa.int64()),
                "hops": pa.array(new_hops, pa.int64()),
                "moved": pa.array(hit.astype(np.int64), pa.int64())})

        stepped = joined.map_batches(step, batch_format="pyarrow") \
            .materialize()
        moved = stepped.sum("moved")
        state = stepped.drop_columns(["moved"]).materialize()
        if not moved:
            break

    # cycle marking: sources still pointing at a source are cycling
    # (the join drops the right key column, so a ones payload column
    # carries the membership signal)
    right = state.map_batches(
        lambda b: pa.table({
            "jnode": b["node"],
            "jflag": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")
    marked = hash_join(state, right, on=("ptr",), right_on=("jnode",),
                       join_type="left_outer")

    def finish(b: pa.Table) -> pa.Table:
        hops = b["hops"].to_numpy(zero_copy_only=False)
        ptr = b["ptr"].to_numpy(zero_copy_only=False)
        cyc = (~pa.compute.is_null(b["jflag"]).to_numpy(
            zero_copy_only=False)) | (hops > n_edges)
        return pa.table({
            "node": b["node"],
            "final": pa.array(np.where(cyc, -1, ptr), pa.int64()),
            "hops": pa.array(np.where(cyc, -1, hops), pa.int64())})

    return marked.map_batches(finish, batch_format="pyarrow")


def url_path_templates(ds: ray.data.Dataset,
                       path_col: str = "path") -> ray.data.Dataset:
    """URL template induction: collapse all-digit path segments to
    ``{n}`` and aggregate — ``/article/123/view`` and
    ``/article/7/view`` both template to ``/article/{n}/view``.
    The site-structure discovery step of a focused crawler (public
    pattern: URL normalization for near-dup page-template grouping).

    Emits (template, n_urls, example) where example is the
    lexicographically-smallest member path.

    Scale shape: per-block pandas pre-aggregation collapses each block
    to its distinct templates (count + min example) before ONE
    template-keyed groupby; template vocabulary is site-structure
    sized, orders below the URL stream."""
    import numpy as np
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        tpls = []
        for p in b[path_col].to_pylist():
            segs = (p or "").split("/")
            tpls.append("/".join("{n}" if s.isdigit() else s
                                 for s in segs))
        df = pd.DataFrame({"template": tpls,
                           "path": b[path_col].to_pandas()})
        g = df.groupby("template", sort=False).agg(
            n=("path", "size"), example=("path", "min")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "template": [df["template"].iloc[0]],
            "n_urls": np.array([int(df["n"].sum())], dtype=np.int64),
            "example": [df["example"].min()]})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("template").map_groups(finish, batch_format="pandas")


def mirror_hosts(pages: ray.data.Dataset, url_col: str = "url",
                 text_col: str = "text",
                 threshold: float = 0.5) -> pa.Table:
    """Mirror-site detection: host pairs whose DISTINCT content sets
    overlap with Jaccard >= threshold — crawl dedup's host-level
    counterpart (a mirror pair should be collapsed before per-page
    near-dup ever runs).

    Composes truth.source_agreement with source = host and
    claim = page content (at 100 TB substitute a content hash for the
    raw text as the claim key — the agreement plan is unchanged);
    emits (host_a, host_b, inter, size_a, size_b, jaccard) above the
    threshold.  Scale shape inherits source_agreement's: shuffles are
    claim-keyed and the pair table is host-vocabulary bounded."""
    import pyarrow.compute as pc

    from aida_ray.stages.truth import source_agreement

    host_re = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/?#]*)"

    def to_claims(b: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(b[url_col].cast(pa.string()), host_re),
            "host")
        return pa.table({"source": pc.utf8_lower(host),
                         "key": b[text_col].cast(pa.string()),
                         "value": pa.array([""] * b.num_rows,
                                           pa.string())})

    agree = source_agreement(
        pages.map_batches(to_claims, batch_format="pyarrow"))
    mask = pc.greater_equal(agree["jaccard"], threshold)
    out = agree.filter(mask)
    return pa.table({"host_a": out["src_a"], "host_b": out["src_b"],
                     "inter": out["inter"], "size_a": out["size_a"],
                     "size_b": out["size_b"],
                     "jaccard": out["jaccard"]})


def canonical_url_pick(members: ray.data.Dataset,
                       cluster_col: str = "cluster",
                       url_col: str = "url") -> ray.data.Dataset:
    """Canonical-URL election inside a duplicate cluster: prefer
    https over http, then the SHORTEST url, then lexicographic — the
    deterministic representative the crawl publishes for a content
    cluster (alternate_clusters / near-dup output).

    Emits (cluster, canonical_url).

    Scale shape: the preference tuple encodes into ONE sortable
    string key (scheme rank + zero-padded length + url), so election
    is a plain distributed min-groupby with per-batch partials —
    no per-group materialization, no window function."""
    from ray.data.aggregate import Min

    def key_of(b: pa.Table) -> pa.Table:
        urls = b[url_col].to_numpy(zero_copy_only=False).astype(str)
        rank = np.where(np.char.startswith(urls, "https://"), "0", "1")
        lens = np.char.zfill(
            np.char.mod("%d", np.char.str_len(urls)), 6)
        key = np.char.add(np.char.add(rank, lens), urls)
        return pa.table({cluster_col: b[cluster_col],
                         "k": pa.array(key, pa.string())})

    agg = members.map_batches(key_of, batch_format="pyarrow") \
        .groupby(cluster_col).aggregate(Min("k"))

    def finish(b: pa.Table) -> pa.Table:
        if "min(k)" not in b.column_names:
            return pa.table({cluster_col: pa.array([], pa.string()),
                             "canonical_url": pa.array([], pa.string())})
        ks = b["min(k)"].to_numpy(zero_copy_only=False)
        return pa.table({
            cluster_col: b[cluster_col],
            "canonical_url": pa.array([k[7:] for k in ks],
                                      pa.string())})

    return agg.map_batches(finish, batch_format="pyarrow")


def politeness_schedule(ds: "ray.data.Dataset", host_col: str = "host",
                        url_col: str = "url",
                        priority_col: str = "priority",
                        delay_s: int = 2,
                        group_size_limit: int = 50_000_000
                        ) -> "ray.data.Dataset":
    """Per-host crawl-slot assignment under a politeness delay: each
    host's pending fetches are ordered (priority DESC, url) and the
    i-th one is scheduled at ``fetch_at_s = i * delay_s`` — the
    classic per-host token-bucket discipline (one request per host per
    delay window), so the emitted schedule can be executed by any
    number of fetchers without coordinating beyond the host key.

    Same shape as :func:`frontier_rank`: ONE ``groupby(host)``
    shuffle, vectorized numpy per group, per-host batch sizes
    politeness-bounded with the ``group_size_limit`` guard.
    """
    import numpy as np
    import pandas as pd

    def per_host(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot host {g[host_col].iloc[0]!r}: {len(g)} rows "
                "exceed the per-group bound — pre-split by url bucket")
        g = g.sort_values([priority_col, url_col],
                          ascending=[False, True]).reset_index(drop=True)
        return pd.DataFrame({
            host_col: g[host_col], url_col: g[url_col],
            priority_col: g[priority_col],
            "fetch_at_s": np.arange(len(g), dtype="int64") * delay_s})

    return ds.groupby(host_col).map_groups(per_host,
                                           batch_format="pandas")
