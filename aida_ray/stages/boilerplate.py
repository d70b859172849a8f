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
