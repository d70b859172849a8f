"""Iterative truth discovery over conflicting source claims.

KG construction fuses assertions from many crawl sources; when sources
CONFLICT (two values for the same key), a single noisy-OR pass
(fuse.py) over-trusts prolific bad sources.  The public fix is the
TruthFinder family (Yin, Han & Yu, KDD'07; Pasternack & Roth "Sums",
COLING'10): iterate source trustworthiness and claim confidence to a
fixpoint —

    conf(c)  = 1 - prod_{s asserts c} (1 - damp * trust(s))
    trust(s) = mean over claims asserted by s of conf(c)

with trust(s) initialised to ``tau0``.  A fixed iteration count keeps
the operator deterministic and gives the SQL oracle an exact unrolled
twin (the pagerank-oracle pattern).

Scale shape: the assertion stream is first collapsed to DISTINCT
(source, key, value) rows by per-block partials + one groupby (the
only wide shuffle, proportional to distinct assertions, not mentions).
Each iteration is then:

* conf pass — trust is a per-SOURCE map (sources are extractors /
  crawl domains: bounded), broadcast once per iteration via
  ``ray.put``; each block turns its assertions into per-claim partial
  ``sum(ln(1 - damp*trust))`` rows and a ``groupby(key,value).sum``
  (mergeable across any blocking) finishes the product.
* trust pass — per-claim conf is re-derived inside the same block
  scan from the broadcast trust of the PREVIOUS iteration plus the
  claim-conf table shipped back as a broadcast map under a gate
  (distinct claims ≤ ``claim_broadcast_rows``) or a hash join above
  it; then ``groupby(source).mean``.

Nothing materializes the assertion stream on the driver; the driver
holds only the per-source trust vector (bounded) per iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import _concat_blocks, _get_cached
from aida_ray.stages.ml import _compact


def _distinct_assertions(claims: ray.data.Dataset, source: str,
                         key: str, value: str) -> ray.data.Dataset:
    """DISTINCT (source, key, value): per-block dedup partials, then
    one groupby-count whose count column is dropped (the standard
    wide-distinct shape — shuffle carries one row per distinct
    assertion per block)."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({source: b[source].to_pandas(),
                           key: b[key].to_pandas(),
                           value: b[value].to_pandas()})
        return pa.Table.from_pandas(
            df.drop_duplicates(), preserve_index=False)

    return claims.map_batches(partial, batch_format="pyarrow") \
        .groupby([source, key, value]).count() \
        .select_columns([source, key, value])


def truthfinder(claims: ray.data.Dataset, source: str = "source",
                key: str = "key", value: str = "value",
                iters: int = 3, tau0: float = 0.8, damp: float = 0.8,
                claim_broadcast_rows: int = 100_000) -> ray.data.Dataset:
    """(key, value, n_src, conf, best) per distinct claim.

    ``best`` marks, per key, the claim with the highest final
    confidence (ties broken by smaller ``value`` string — determinism
    over float equality).  ``conf`` is rounded to 6 decimals; the
    iteration itself runs full float64.

    ``claim_broadcast_rows``: the scale gate, on DISTINCT-assertion
    count (free — the distinct table is materialized).  At or below
    it the whole fixpoint runs as one vectorized numpy solve over the
    gathered assertion table (the bounded-input fast path, same
    pattern as the gated connected-components solve in dedup.py —
    synchronous iteration over a tiny table through 6+ distributed
    shuffles is pure fixed cost).  Above it, each iteration is fully
    distributed: conf partials + groupby-sum, conf hash-joined back
    onto the assertion stream, groupby-mean trust with ONE
    |sources|-row driver pull per iteration — no driver gather of
    claim-scale data anywhere on that route.
    """
    from ray.data.aggregate import Mean, Sum

    a = _compact(_distinct_assertions(claims, source, key, value),
                 rows_per_block=65536)
    n_assert = a.count()                    # materialized — metadata
    if n_assert == 0:
        return ray.data.from_arrow(pa.table({
            key: pa.array([], pa.string()),
            value: pa.array([], pa.string()),
            "n_src": pa.array([], pa.int64()),
            "conf": pa.array([], pa.float64()),
            "best": pa.array([], pa.bool_())}))

    if n_assert <= claim_broadcast_rows:
        at = _concat_blocks(ray.get(a.to_arrow_refs()),
                            pa.schema([(source, pa.string()),
                                       (key, pa.string()),
                                       (value, pa.string())]))
        return ray.data.from_arrow(_truthfinder_local(
            at, source, key, value, iters, tau0, damp))

    # ---------------- distributed route (assertions > gate) --------
    src_tbl = a.groupby(source).count().to_pandas()
    sources = np.sort(src_tbl[source].to_numpy())
    trust = np.full(len(sources), float(tau0))

    conf_ds = None
    for it in range(iters):
        tref = ray.put((sources, trust))

        # ---- conf pass: per-claim noisy-OR of damp*trust ----------
        def logq_partial(b: pa.Table, _tref=tref) -> pa.Table:
            srcs, tr = _get_cached(_tref)
            si = np.searchsorted(srcs, b[source].to_numpy(
                zero_copy_only=False))
            # np.log(1-x), not log1p: bit-parity with the oracle's
            # LN(1 - damp*tau) matters more than the last ulp here
            lq = np.log(1.0 - damp * tr[si])
            df = pd.DataFrame({key: b[key].to_pandas(),
                               value: b[value].to_pandas(),
                               "logq": lq, "one": 1})
            g = df.groupby([key, value], sort=False).agg(
                logq=("logq", "sum"), n=("one", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        conf_ds = a.map_batches(logq_partial, batch_format="pyarrow") \
            .groupby([key, value]).aggregate(Sum("logq"), Sum("n"))
        if it == iters - 1:
            # last round: conf_ds is consumed twice (trust pass +
            # mark_best) — materialize to avoid recompute
            conf_ds = conf_ds.materialize()

        # ---- trust pass: conf hash-joined onto the assertions -----
        def finish_conf(b: pa.Table) -> pa.Table:
            cf = 1.0 - np.exp(
                b["sum(logq)"].to_numpy(zero_copy_only=False))
            return pa.table({key: b[key], value: b[value],
                             "conf": pa.array(cf)})

        from aida_ray.stages.shuffle_join import hash_join
        cj = conf_ds.map_batches(finish_conf, batch_format="pyarrow")
        tt = hash_join(a, cj, on=(key, value)) \
            .groupby(source).aggregate(Mean("conf")).to_pandas()
        tmap = dict(zip(tt[source], tt["mean(conf)"]))
        trust = np.array([tmap[s] for s in sources])

    # ---- finish: per-key best flag, distributed (claims scale with
    # the corpus — groupby(key).map_groups, never a driver pull) -----
    def mark_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["conf"] = np.round(1.0 - np.exp(g["sum(logq)"]), 6)
        g = g.sort_values(["conf", value], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
        g["best"] = np.arange(len(g)) == 0
        g["n_src"] = g["sum(n)"].astype("int64")
        return g[[key, value, "n_src", "conf", "best"]]

    return conf_ds.groupby(key).map_groups(mark_best,
                                           batch_format="pandas")


def _truthfinder_local(at: pa.Table, source: str, key: str, value: str,
                       iters: int, tau0: float, damp: float) -> pa.Table:
    """Vectorized single-table TruthFinder solve for gated inputs —
    identical math to the distributed route (np.log(1-x) per
    assertion, per-claim sum, per-source mean), so both routes agree
    to float tolerance (tests pin this with claim_broadcast_rows=0)."""
    df = pd.DataFrame({source: at[source].to_pandas(),
                       key: at[key].to_pandas(),
                       value: at[value].to_pandas()})
    s_codes, _ = pd.factorize(df[source], sort=True)
    c_codes = df.groupby([key, value], sort=False).ngroup().to_numpy()
    n_s, n_c = int(s_codes.max()) + 1, int(c_codes.max()) + 1
    s_cnt = np.bincount(s_codes, minlength=n_s).astype(np.float64)
    trust = np.full(n_s, float(tau0))
    conf = np.zeros(n_c)
    for _ in range(iters):
        lq = np.log(1.0 - damp * trust[s_codes])
        slq = np.zeros(n_c)
        np.add.at(slq, c_codes, lq)
        conf = 1.0 - np.exp(slq)
        tsum = np.zeros(n_s)
        np.add.at(tsum, s_codes, conf[c_codes])
        trust = tsum / s_cnt
    # claim attrs by code via the first-occurrence map
    first = np.unique(c_codes, return_index=True)[1]
    order = np.empty(n_c, dtype=np.int64)
    order[c_codes[first]] = first
    out = pd.DataFrame({
        key: df[key].to_numpy()[order],
        value: df[value].to_numpy()[order],
        "n_src": np.bincount(c_codes, minlength=n_c).astype(np.int64),
        "conf": np.round(conf, 6)})
    out = out.sort_values(["conf", value], ascending=[False, True],
                          kind="stable")
    out["best"] = ~out.duplicated(subset=[key])
    return pa.Table.from_pandas(
        out[[key, value, "n_src", "conf", "best"]], preserve_index=False)


def source_agreement(claims: ray.data.Dataset, source: str = "source",
                     key: str = "key", value: str = "value"
                     ) -> pa.Table:
    """Pairwise source agreement matrix — (src_a, src_b, inter,
    size_a, size_b, jaccard) with src_a < src_b: how much two
    extraction sources' DISTINCT assertion sets overlap (the fusion
    diagnostic next to truthfinder: near-duplicate sources violate
    noisy-OR's independence assumption and should be collapsed
    upstream).

    Scale shape: one claim-keyed shuffle
    (``groupby(claim).map_groups`` over distinct assertions — the
    per-claim source set is bounded by |S|), a |S|^2-bounded
    pair-count groupby, and a |S|-row size table; nothing driver-side
    exceeds the source vocabulary."""
    from ray.data.aggregate import Sum

    a = _distinct_assertions(claims, source, key, value)

    def keyed(b: pa.Table) -> pa.Table:
        k = b[key].to_pandas().astype(str)
        v = b[value].to_pandas().astype(str)
        return pa.table({
            "ck": pa.array((k + "\x1f" + v).tolist(), pa.string()),
            "src": b[source]})

    def per_claim(g: pd.DataFrame) -> pd.DataFrame:
        srcs = sorted(set(g["src"]))
        pa_, pb_ = [], []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                pa_.append(srcs[i])
                pb_.append(srcs[j])
        return pd.DataFrame({"src_a": pa_, "src_b": pb_,
                             "one": np.ones(len(pa_), dtype=np.int64)})

    co = a.map_batches(keyed, batch_format="pyarrow") \
        .groupby("ck").map_groups(per_claim, batch_format="pandas") \
        .groupby(["src_a", "src_b"]).aggregate(Sum("one")).to_pandas()

    sz = a.groupby(source).count().to_pandas()
    sizes = dict(zip(sz[source], sz["count()"]))

    if co.empty:
        return pa.table({"src_a": pa.array([], pa.string()),
                         "src_b": pa.array([], pa.string()),
                         "inter": pa.array([], pa.int64()),
                         "size_a": pa.array([], pa.int64()),
                         "size_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    co = co.sort_values(["src_a", "src_b"]).reset_index(drop=True)
    inter = co["sum(one)"].to_numpy(dtype="int64")
    sa = co["src_a"].map(sizes).to_numpy(dtype="int64")
    sb = co["src_b"].map(sizes).to_numpy(dtype="int64")
    return pa.table({
        "src_a": pa.array(co["src_a"].astype(str)),
        "src_b": pa.array(co["src_b"].astype(str)),
        "inter": pa.array(inter, pa.int64()),
        "size_a": pa.array(sa, pa.int64()),
        "size_b": pa.array(sb, pa.int64()),
        "jaccard": pa.array(
            np.round(inter / (sa + sb - inter), 6), pa.float64())})


def numeric_consensus(claims: ray.data.Dataset, s: str = "subj",
                      p: str = "pred", v: str = "value",
                      k: float = 3.0,
                      group_size_limit: int = 2_000_000
                      ) -> ray.data.Dataset:
    """Robust numeric-slot reconciliation: per (subj, pred) slot with
    float claims, the median, the median absolute deviation, and the
    count of MAD-rule outliers (|v - median| > k * MAD; with MAD = 0
    any v != median is an outlier) — the standard robust-consensus
    step before publishing a numeric fact (population, height, ...)
    asserted by many noisy pages.

    Emits (subj, pred, n, med, mad, n_outliers); med/mad rounded to
    6 decimals for oracle comparison (the outlier test uses the
    UNROUNDED values).

    Scale shape: one groupby((subj, pred)).map_groups keyed by fact
    identity — the shuffle is claim-volume for the slot, never the
    corpus; per-group work is two numpy medians + one vectorized
    comparison (assertion-bounded, guarded by
    ``group_size_limit``)."""

    def per_slot(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot slot {g[s].iloc[0]!r}/{g[p].iloc[0]!r}: "
                f"{len(g)} claims exceed the per-group bound")
        vals = g[v].to_numpy(dtype=np.float64)
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        if mad > 0.0:
            n_out = int(np.count_nonzero(np.abs(vals - med) > k * mad))
        else:
            n_out = int(np.count_nonzero(vals != med))
        return pd.DataFrame({
            s: [g[s].iloc[0]], p: [g[p].iloc[0]],
            "n": np.array([len(vals)], dtype=np.int64),
            "med": [round(med, 6)], "mad": [round(mad, 6)],
            "n_outliers": np.array([n_out], dtype=np.int64)})

    return claims.groupby([s, p]).map_groups(per_slot,
                                             batch_format="pandas")
