"""KB slot filling + triple provenance aggregation.

Two publish-side aggregations over the raw assertion stream:

- :func:`slot_fill` — majority-vote slot filling: per (subj, pred)
  pick the object with the most supporting assertions (the
  redundancy-voting step of TAC-KBP-style slot filling); ties break
  lexicographically on the object.  Emits the winner with its vote
  count, the total votes for the slot, and agreement = votes/total.
- :func:`triple_provenance` — per distinct (subj, pred, obj), the
  sorted list of supporting document ids (joined ',') and their
  count — the provenance record a published KG carries per fact.

Scale shape: both are ONE groupby after block-level pandas
pre-aggregation (each block collapses to its distinct keys first, so
the shuffle moves counts, not assertions).  slot_fill's winner pick
is a second, slot-bounded groupby.  Provenance lists for hot triples
are unbounded — ``max_docs`` caps the stored list (count stays
exact) so a fact asserted by 10^7 pages doesn't build a gigabyte
string on one reducer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def slot_fill(triples: ray.data.Dataset, s: str = "subj",
              p: str = "pred", o: str = "obj") -> ray.data.Dataset:
    """(subj, pred, obj, votes, total, agreement) — the winning
    object per slot under assertion-count majority vote."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({s: b[s].to_pandas(), p: b[p].to_pandas(),
                           o: b[o].to_pandas()})
        g = df.groupby([s, p, o], sort=False).size().rename(
            "n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    votes = triples.map_batches(partial, batch_format="pyarrow") \
        .groupby([s, p, o]).aggregate(Sum("n"))

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["sum(n)"].sum())
        df = df.sort_values(["sum(n)", o], ascending=[False, True])
        top = df.iloc[0]
        v = int(top["sum(n)"])
        return pd.DataFrame({
            s: [top[s]], p: [top[p]], o: [top[o]],
            "votes": np.array([v], dtype=np.int64),
            "total": np.array([total], dtype=np.int64),
            "agreement": [round(v / total, 6)]})

    def slot_key(b: pa.Table) -> pa.Table:
        subj = b[s].to_pandas().astype(str)
        pred = b[p].to_pandas().astype(str)
        return b.append_column(
            "slot", pa.array((subj + "\x1f" + pred).tolist(),
                             pa.string()))

    return votes.map_batches(slot_key, batch_format="pyarrow") \
        .groupby("slot").map_groups(winner, batch_format="pandas")


def triple_provenance(triples: ray.data.Dataset,
                      doc_col: str = "doc_id", s: str = "subj",
                      p: str = "pred", o: str = "obj",
                      max_docs: int | None = None) -> ray.data.Dataset:
    """(subj, pred, obj, n_docs, doc_list) — distinct supporting doc
    ids per fact, sorted ascending, ','-joined (first ``max_docs``
    kept when capped; n_docs stays the exact distinct count)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            s: b[s].to_pandas(), p: b[p].to_pandas(),
            o: b[o].to_pandas(),
            doc_col: b[doc_col].to_pandas().astype(np.int64)})
        df = df.drop_duplicates()
        df["one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = triples.map_batches(partial, batch_format="pyarrow") \
        .groupby([s, p, o, doc_col]).aggregate(Sum("one"))

    def gather(df: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(df[doc_col].to_numpy(dtype=np.int64))
        shown = docs if max_docs is None else docs[:max_docs]
        return pd.DataFrame({
            s: [df[s].iloc[0]], p: [df[p].iloc[0]],
            o: [df[o].iloc[0]],
            "n_docs": np.array([len(docs)], dtype=np.int64),
            "doc_list": [",".join(str(d) for d in shown)]})

    def fact_key(b: pa.Table) -> pa.Table:
        subj = b[s].to_pandas().astype(str)
        pred = b[p].to_pandas().astype(str)
        obj = b[o].to_pandas().astype(str)
        return b.append_column(
            "fact", pa.array(
                (subj + "\x1f" + pred + "\x1f" + obj).tolist(),
                pa.string()))

    return distinct.map_batches(fact_key, batch_format="pyarrow") \
        .groupby("fact").map_groups(gather, batch_format="pandas")


def entity_cards(triples: ray.data.Dataset, top_k: int = 2,
                 s: str = "subj", p: str = "pred",
                 o: str = "obj") -> ray.data.Dataset:
    """KB-card fact selection: the ``top_k`` most-asserted facts per
    SUBJECT (votes DESC, then pred, obj lexicographic), with a rank
    column — what an entity summary panel shows.

    Same two-phase shape as slot_fill: block-level distinct counts,
    one (s, p, o) groupby, then a subject-keyed top-k (per-subject
    fact counts are profile-bounded)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({s: b[s].to_pandas(), p: b[p].to_pandas(),
                           o: b[o].to_pandas()})
        g = df.groupby([s, p, o], sort=False).size().rename(
            "n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    votes = triples.map_batches(partial, batch_format="pyarrow") \
        .groupby([s, p, o]).aggregate(Sum("n"))

    def top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sum(n)", p, o],
                            ascending=[False, True, True]).head(top_k)
        return pd.DataFrame({
            s: df[s].to_numpy(), p: df[p].to_numpy(),
            o: df[o].to_numpy(),
            "votes": df["sum(n)"].astype(np.int64).to_numpy(),
            "rank": np.arange(1, len(df) + 1, dtype=np.int64)})

    return votes.groupby(s).map_groups(top, batch_format="pandas")


def evidence_sentences(docs: ray.data.Dataset, triples: ray.data.Dataset,
                       id_col: str = "doc_id", text_col: str = "text",
                       s: str = "subj", p: str = "pred", o: str = "obj",
                       broadcast_triples: int = 2_000_000
                       ) -> ray.data.Dataset:
    """Evidence retrieval for published facts: for each target triple,
    the sentences (newline-delimited here; swap in the tokenizer's
    ssplit upstream for prose) that mention BOTH the subject and the
    object — the provenance snippet a KG browser shows next to a
    fact, and the distant-supervision positive for relation-extractor
    training.

    Emits (subj, pred, obj, doc_id, sent_idx) with 1-based sentence
    index.

    Scale shape: the TARGET slots broadcast once (publish-bounded,
    gated by ``broadcast_triples``); the corpus streams through one
    stateless scan — per sentence the subj index is consulted, no
    shuffle at all.  Per-batch cost is sentences x targets
    substring checks vectorized per target pair."""
    from aida_ray.stages.dedup import _get_cached
    from aida_ray.state.collect import collect_table

    tt = collect_table(triples, schema=pa.schema(
        [(s, pa.string()), (p, pa.string()), (o, pa.string())]))
    assert tt.num_rows <= broadcast_triples, \
        "evidence_sentences: target slots above broadcast gate"
    ref = ray.put((tt[s].to_pylist(), tt[p].to_pylist(),
                   tt[o].to_pylist()))

    def scan(b: pa.Table) -> pa.Table:
        subs, preds, objs = _get_cached(ref)
        rs, rp, ro, rd, ri = [], [], [], [], []
        ids = b[id_col].to_numpy(zero_copy_only=False)
        for d, t in zip(ids, b[text_col].to_pylist()):
            if not t:
                continue
            for k, sent in enumerate(t.split("\n"), 1):
                for su, pr, ob in zip(subs, preds, objs):
                    if su in sent and ob in sent:
                        rs.append(su)
                        rp.append(pr)
                        ro.append(ob)
                        rd.append(int(d))
                        ri.append(k)
        return pa.table({s: pa.array(rs, pa.string()),
                         p: pa.array(rp, pa.string()),
                         o: pa.array(ro, pa.string()),
                         id_col: pa.array(rd, pa.int64()),
                         "sent_idx": pa.array(ri, pa.int64())})

    return docs.map_batches(scan, batch_format="pyarrow")


def kb_diff(old: ray.data.Dataset, new: ray.data.Dataset,
            s: str = "subj", p: str = "pred", o: str = "obj"
            ) -> ray.data.Dataset:
    """Snapshot diff between two KG versions at triple granularity:
    rows only one side asserts — 'removed' (old only) and 'added'
    (new only) — the publish-time changelog for incremental
    downstream consumers.

    Emits (subj, pred, obj, change).

    Scale shape: both sides collapse to distinct triples per batch
    with a side tag; ONE groupby((s, p, o)) sums the tags and the
    finish pass keeps one-sided rows — a single shuffle bounded by
    distinct triples, no join operator at all."""
    from ray.data.aggregate import Max

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({s: b[s].to_pandas(), p: b[p].to_pandas(),
                               o: b[o].to_pandas()}).drop_duplicates()
            df["in_old"] = np.int64(1 if side == 0 else 0)
            df["in_new"] = np.int64(1 if side == 1 else 0)
            return pa.Table.from_pandas(df, preserve_index=False)
        return f

    tagged = old.map_batches(tag(0), batch_format="pyarrow") \
        .union(new.map_batches(tag(1), batch_format="pyarrow"))
    agg = tagged.groupby([s, p, o]).aggregate(Max("in_old"),
                                              Max("in_new"))

    def finish(b: pa.Table) -> pa.Table:
        if "max(in_old)" not in b.column_names:
            return pa.table({s: pa.array([], pa.string()),
                             p: pa.array([], pa.string()),
                             o: pa.array([], pa.string()),
                             "change": pa.array([], pa.string())})
        io = b["max(in_old)"].to_numpy(zero_copy_only=False)
        inw = b["max(in_new)"].to_numpy(zero_copy_only=False)
        keep = io != inw
        t = pa.table({s: b[s], p: b[p], o: b[o],
                      "change": pa.array(
                          np.where(inw == 1, "added", "removed")
                          .astype(object), pa.string())})
        return t.filter(pa.array(keep))

    return agg.map_batches(finish, batch_format="pyarrow")
