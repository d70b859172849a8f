"""Clustering evaluation — B-cubed, pairwise P/R/F1, adjusted Rand.

The dedup / record-linkage / NIL-clustering family
(stages/dedup.py, stages/blocking.py, kgprofile.nil_cluster_ids)
produces entity/document clusterings; this is their evaluation
counterpart: compare a SYSTEM assignment (item, cluster) against GOLD
classes (item, gold) with the three standard families:

* B-cubed (Bagga & Baldwin): per-item precision |C(i) ∩ G(i)| / |C(i)|
  and recall |C(i) ∩ G(i)| / |G(i)|, averaged over items;
* pairwise: precision/recall/F1 over same-cluster item pairs;
* ARI (Hubert & Arabie): chance-adjusted Rand index from the same
  contingency counts.

Everything derives from the contingency table n_{cg} = |cluster c ∩
gold g| plus the marginals — so the distributed shape is: one hash
join of assignment and gold on the item key (both corpus-scale),
one groupby over (cluster, gold) with map-side partials, and two
marginal groupbys; the driver sees only contingency-sized tables
(bounded by the number of distinct (cluster, gold) co-occurrences,
never items).  All pair counts use exact integer C(n,2) arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from aida_ray.state.collect import collect_table


def _c2(n):
    n = np.asarray(n, dtype=np.int64)
    return n * (n - 1) // 2


def cluster_metrics(assign: ray.data.Dataset, gold: ray.data.Dataset,
                    item_col: str = "item", cluster_col: str = "cluster",
                    gold_col: str = "gold") -> pa.Table:
    """One-row table: n_items, bcubed_p/r/f1, pair_p/r/f1, ari
    (each metric integer-quantized ×1e6)."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join
    j = hash_join(assign.select_columns([item_col, cluster_col]),
                  gold.select_columns([item_col, gold_col]),
                  on=(item_col,))

    def cont_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"c": b[cluster_col].to_pandas(),
                           "g": b[gold_col].to_pandas(), "n": 1})
        out = df.groupby(["c", "g"], sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    cont = collect_table(
        j.map_batches(cont_partial, batch_format="pyarrow")
         .groupby(["c", "g"]).aggregate(Sum("n")),
        pa.schema([("c", pa.string()), ("g", pa.string()),
                   ("sum(n)", pa.int64())])).to_pandas() \
        .rename(columns={"sum(n)": "n"})

    n_items = int(cont.n.sum())
    if n_items == 0:
        z = [0] * 7
        return pa.table({"n_items": pa.array([0], pa.int64()),
                         **{k: pa.array([v], pa.int64())
                            for k, v in zip(
                                ["bcubed_p_1e6", "bcubed_r_1e6",
                                 "bcubed_f1_1e6", "pair_p_1e6",
                                 "pair_r_1e6", "pair_f1_1e6",
                                 "ari_1e6"], z)}})
    c_sz = cont.groupby("c")["n"].sum()
    g_sz = cont.groupby("g")["n"].sum()

    # B-cubed: item-weighted cell averages
    nc = c_sz.loc[cont.c].to_numpy()
    ng = g_sz.loc[cont.g].to_numpy()
    ncell = cont.n.to_numpy()
    b3_p = float((ncell * ncell / nc).sum()) / n_items
    b3_r = float((ncell * ncell / ng).sum()) / n_items
    b3_f = 2 * b3_p * b3_r / (b3_p + b3_r) if b3_p + b3_r else 0.0

    # pairwise from exact integer pair counts
    tp = int(_c2(ncell).sum())
    sys_pairs = int(_c2(c_sz.to_numpy()).sum())
    gold_pairs = int(_c2(g_sz.to_numpy()).sum())
    pp = tp / sys_pairs if sys_pairs else 0.0
    pr = tp / gold_pairs if gold_pairs else 0.0
    pf = 2 * pp * pr / (pp + pr) if pp + pr else 0.0

    # ARI from the same counts
    total_pairs = int(_c2([n_items])[0])
    exp = sys_pairs * gold_pairs / total_pairs if total_pairs else 0.0
    mx = (sys_pairs + gold_pairs) / 2.0
    ari = (tp - exp) / (mx - exp) if mx != exp else 0.0

    vals = [b3_p, b3_r, b3_f, pp, pr, pf, ari]
    names = ["bcubed_p_1e6", "bcubed_r_1e6", "bcubed_f1_1e6",
             "pair_p_1e6", "pair_r_1e6", "pair_f1_1e6", "ari_1e6"]
    return pa.table({"n_items": pa.array([n_items], pa.int64()),
                     **{k: pa.array([round(v * 1e6)], pa.int64())
                        for k, v in zip(names, vals)}})
