"""Per-domain boilerplate line detection.

The frequency-based boilerplate test (the CCNet / jusText family of
web-text cleaners, public methodology): a line that appears on a
large fraction of a DOMAIN's pages is chrome (copyright footers, nav
menus), not content.  Differs from the existing global
``line_dedup`` — the unit here is (domain, line) and the statistic
is the fraction of that domain's pages containing the line.

Scale shape: each page collapses to its DISTINCT lines inside the
block pass (so the shuffle moves (domain, line) counts, not page
bodies); page totals per domain ride the same groupby via a sentinel
line (one extra row per page).  The final fraction/threshold pass is
a per-domain map_groups bounded by the domain's distinct-line
vocabulary — hot mega-domains are bounded by distinct LINES, not
pages.  The (domain, line) key is the natural partition key for the
downstream strip pass (filter against the broadcast/joined
boilerplate set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_PAGE_SENTINEL = "\x00pages"


def boilerplate_lines(ds: ray.data.Dataset, domain_col: str = "domain",
                      text_col: str = "text",
                      min_frac: float = 0.3) -> ray.data.Dataset:
    """(domain, line, n_pages, frac) rows for lines on >= min_frac of
    the domain's pages (frac rounded to 6)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        doms, lines = [], []
        for dom, txt in zip(b[domain_col].to_pylist(),
                            b[text_col].to_pylist()):
            page_lines = {ln.strip() for ln in (txt or "").split("\n")}
            page_lines.discard("")
            for ln in page_lines:
                doms.append(dom)
                lines.append(ln)
            doms.append(dom)
            lines.append(_PAGE_SENTINEL)
        df = pd.DataFrame({domain_col: doms, "line": lines})
        g = df.groupby([domain_col, "line"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([domain_col, "line"]).aggregate(Sum("n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df.loc[df["line"] == _PAGE_SENTINEL,
                           "sum(n)"].sum())
        df = df[df["line"] != _PAGE_SENTINEL]
        if total == 0 or len(df) == 0:
            return pd.DataFrame({
                domain_col: pd.Series([], dtype=object),
                "line": pd.Series([], dtype=object),
                "n_pages": pd.Series([], dtype=np.int64),
                "frac": pd.Series([], dtype=np.float64)})
        n = df["sum(n)"].astype(np.int64)
        frac = n / total
        keep = frac >= min_frac
        return pd.DataFrame({
            domain_col: df[domain_col][keep].to_numpy(),
            "line": df["line"][keep].to_numpy(),
            "n_pages": n[keep].to_numpy(),
            "frac": frac[keep].round(6).to_numpy()})

    return counts.groupby(domain_col).map_groups(
        finish, batch_format="pandas")


def wrapper_slots(pages: ray.data.Dataset, domain_col: str = "domain",
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_slots: int = 4_000_000
                  ) -> ray.data.Dataset:
    """Positional wrapper induction (the RoadRunner/template-slot
    family, public methodology): pages of one domain that share a
    line LAYOUT split each line position into TEMPLATE (one distinct
    value across the domain's pages — chrome) or SLOT (varying —
    data); slot values are the machine-extractable fields a
    site-specific wrapper would emit.  The positional complement of
    ``boilerplate_lines``' frequency test.

    Emits (domain, pos, doc_id, value) — one row per page per slot
    position (0-based line index).

    Assumes template pages share line layout (same positions carry
    the same field) — the standard wrapper precondition; pages from
    layout-drifted snapshots should be split by template id upstream
    (urls.url_path_templates) first.

    Scale shape: one (domain, pos, value)-distinct partial + groupby
    to find slot positions (template-vocabulary bounded), slot keys
    broadcast under ``broadcast_slots`` (a domain has tens of slots,
    not millions — hash-join fallback documented), then a stateless
    re-scan emits slot rows; no page body ever shuffles."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.dedup import _get_cached
    from aida_ray.state.collect import collect_table

    def explode(b: pa.Table):
        doms = b[domain_col].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        rows = []
        for d, i, t in zip(doms, ids, b[text_col].to_pylist()):
            if t is None:
                continue
            for k, line in enumerate(t.split("\n")):
                rows.append((str(d), int(i), k, line))
        return rows

    def distinct_partial(b: pa.Table) -> pa.Table:
        rows = explode(b)
        df = pd.DataFrame(rows, columns=["domain", "doc", "pos",
                                         "value"])
        df = df[["domain", "pos", "value"]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # n distinct values per (domain, pos): >1 -> slot
    dv = pages.map_batches(distinct_partial, batch_format="pyarrow") \
        .groupby(["domain", "pos", "value"]).count()

    def one(b: pa.Table) -> pa.Table:
        if "domain" not in b.column_names:
            return pa.table({"domain": pa.array([], pa.string()),
                             "pos": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"domain": b["domain"], "pos": b["pos"],
                         "c": pa.array(np.ones(b.num_rows,
                                               dtype=np.int64))})

    nv = dv.map_batches(one, batch_format="pyarrow") \
        .groupby(["domain", "pos"]).aggregate(Sum("c"))
    nv_t = collect_table(nv).to_pandas()
    slots = nv_t[nv_t.get("sum(c)", pd.Series(dtype=np.int64)) > 1] \
        if len(nv_t) else nv_t
    keys = (np.sort(np.char.add(
        np.char.add(slots["domain"].to_numpy().astype(str), "\x1f"),
        slots["pos"].to_numpy().astype(str)))
        if len(slots) else np.array([], dtype=str))
    assert len(keys) <= broadcast_slots, \
        "wrapper_slots: slot set above broadcast gate — hash-join"
    ref = ray.put(keys)

    def emit(b: pa.Table) -> pa.Table:
        ks = _get_cached(ref)
        rows = explode(b) if len(ks) else []
        if not rows:
            return pa.table({"domain": pa.array([], pa.string()),
                             "pos": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "value": pa.array([], pa.string())})
        df = pd.DataFrame(rows, columns=["domain", "doc_id", "pos",
                                         "value"])
        key = (df["domain"] + "\x1f" + df["pos"].astype(str)).to_numpy()
        idx = np.clip(np.searchsorted(ks, key), 0, len(ks) - 1)
        df = df[ks[idx] == key]
        return pa.table({
            "domain": pa.array(df["domain"].to_numpy().astype(str)),
            "pos": pa.array(df["pos"].to_numpy(dtype="int64"),
                            pa.int64()),
            "doc_id": pa.array(df["doc_id"].to_numpy(dtype="int64"),
                               pa.int64()),
            "value": pa.array(df["value"].to_numpy().astype(str))})

    return pages.map_batches(emit, batch_format="pyarrow")
