"""NIL mention clustering — cross-document identity for mentions the
KB cannot link.

TAC-KBP-style NIL handling (Ji & Grishman, ACL'11): mentions whose
candidate lookup returns out-of-KB must still receive STABLE
cross-document ids so the emitted triples co-refer.  This stage
implements the deterministic core: cluster by normalized surface
(lowercase, non-alnum collapsed to single spaces, trimmed — the same
conflation family as the NED dictionary keys) and assign each cluster
a first-appearance NIL id (dense rank by (first_doc, surface) — the
order the corpus introduces the entities).  Variant unification
(acronyms, initials) is a documented seam on top of this key.

Scale shape: normalization + per-block partials are vectorized
pandas; counts merge through ONE groupby over (surface) whose volume
is the distinct NIL surface vocabulary; n_docs rides a distinct
(surface, doc) pre-pass.  The final id assignment sorts the CLUSTER
table (bounded by distinct NIL surfaces — the same vocabulary-pull
gate as textrank/anchor dictionaries), not the mention stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_NORM = r"[^a-z0-9]+"


def normalize_surface(s: pd.Series) -> pd.Series:
    return s.str.lower().str.replace(_NORM, " ", regex=True).str.strip()


def nil_cluster_ids(mentions: ray.data.Dataset, id_col: str = "doc_id",
                    mention_col: str = "mention") -> pa.Table:
    """(nil_id, surface, n_mentions, n_docs, first_doc) per cluster.
    nil_id = 1-based dense rank by (first_doc, surface)."""
    from ray.data.aggregate import Min, Sum

    # n_docs: distinct (surface, doc) pairs globally, then count
    def pair_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc": b[id_col].to_numpy(zero_copy_only=False),
            "surface": normalize_surface(
                b[mention_col].to_pandas().astype(str))})
        df = df[df["surface"] != ""]
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    pairs = mentions.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["surface", "doc"]).count() \
        .select_columns(["surface", "doc"])

    def nd_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"surface": b["surface"].to_pandas(), "nd": 1})
        g = df.groupby("surface", sort=False)["nd"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ndocs = pairs.map_batches(nd_partial, batch_format="pyarrow") \
        .groupby("surface").aggregate(Sum("nd")).to_pandas()

    def cnt_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc": b[id_col].to_numpy(zero_copy_only=False),
            "surface": normalize_surface(
                b[mention_col].to_pandas().astype(str))})
        df = df[df["surface"] != ""]
        g = df.groupby("surface", sort=False).agg(
            n=("doc", "size"), first=("doc", "min")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = mentions.map_batches(cnt_partial, batch_format="pyarrow") \
        .groupby("surface").aggregate(Sum("n"), Min("first")).to_pandas()

    m = agg.merge(ndocs, on="surface")
    m = m.sort_values(["min(first)", "surface"]).reset_index(drop=True)
    return pa.table({
        "nil_id": pa.array(np.arange(1, len(m) + 1), pa.int64()),
        "surface": pa.array(m["surface"].to_numpy().astype(str)),
        "n_mentions": pa.array(m["sum(n)"].to_numpy(dtype="int64")),
        "n_docs": pa.array(m["sum(nd)"].to_numpy(dtype="int64")),
        "first_doc": pa.array(m["min(first)"].to_numpy(dtype="int64"))})


_INVERTED_NAME = r"^(?P<last>[A-Za-z0-9]+),\s(?P<first>[A-Za-z0-9 ]+)$"


def name_aliases(mentions: ray.data.Dataset,
                 mention_col: str = "mention") -> ray.data.Dataset:
    """Person-name alias table: "Last, First" surfaces fold into the
    canonical "First Last" form; per canonical name, the number of
    DISTINCT raw variants and the total mention count — the alias
    normalization step before NIL clustering / record linkage.

    Emits (canonical, n_variants, n_mentions).

    Scale shape: the inversion is one Arrow RE2 extract per batch (no
    Python per-row); two vocabulary-bounded groupbys (distinct
    (canonical, raw) variants, then per-canonical rollup) — the
    shuffle ships name-vocabulary rows, never mentions."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        raw = b[mention_col].cast(pa.string())
        m = pc.extract_regex(raw, _INVERTED_NAME)
        last = pc.struct_field(m, "last")
        first = pc.struct_field(m, "first")
        inv = pc.binary_join_element_wise(first, last, " ")
        canon = pc.if_else(pc.is_valid(inv), inv, raw)
        df = pd.DataFrame({
            "canonical": canon.to_numpy(zero_copy_only=False),
            "raw": raw.to_numpy(zero_copy_only=False)})
        g = df.groupby(["canonical", "raw"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    variants = mentions.map_batches(partial, batch_format="pyarrow") \
        .groupby(["canonical", "raw"]).aggregate(Sum("n"))

    def var_partial(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({"canonical": pa.array([], pa.string()),
                             "v": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        return pa.table({
            "canonical": b["canonical"],
            "v": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "m": b["sum(n)"].cast(pa.int64())})

    agg = variants.map_batches(var_partial, batch_format="pyarrow") \
        .groupby("canonical").aggregate(Sum("v"), Sum("m"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(v)" not in b.column_names:
            return pa.table({"canonical": pa.array([], pa.string()),
                             "n_variants": pa.array([], pa.int64()),
                             "n_mentions": pa.array([], pa.int64())})
        return pa.table({"canonical": b["canonical"],
                         "n_variants": b["sum(v)"].cast(pa.int64()),
                         "n_mentions": b["sum(m)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")
