"""Distributed inverted-index statistics and TF-IDF term scoring.

Tokenization is ``lower → RE2 split on [^a-z0-9]+`` via Arrow kernels
(``pc.utf8_lower`` + ``pc.split_pattern_regex``) — the exact pattern a
DuckDB oracle can run with ``regexp_split_to_array`` (both engines are
RE2), so results are hash-comparable.

Scale shape:

- :func:`term_stats` — per-batch partials: each doc appears in exactly
  one row, so per-batch distinct (doc, term) pairs give globally
  correct document frequencies; the groupby shuffle ships one (term,
  df_partial, tf_partial) row per term per block — volume tracks the
  VOCABULARY, never the corpus.
- :func:`tfidf_top_terms` — the df table is broadcast once via
  ``ray.put`` (natural-language vocabularies are small relative to the
  corpus; for unbounded token spaces substitute a hash join on term),
  and each batch scores + selects its own docs' top-k locally — no
  shuffle of the corpus at all.

Top-k selection ranks by (tf DESC, df ASC, term ASC): an
integer-deterministic order (ties never depend on float libm
differences), with the float tf-idf score ``tf * ln(N/df)`` emitted as
an output column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached

TOKEN_SPLIT = "[^a-z0-9]+"


def _doc_terms(b: pa.Table, id_col: str, text_col: str) -> pd.DataFrame:
    """(doc_id, term) rows for one batch — flatten the RE2 split lists
    with doc ids repeated by list length; drops empty boundary tokens."""
    lists = pc.split_pattern_regex(
        pc.utf8_lower(b[text_col].combine_chunks()), pattern=TOKEN_SPLIT)
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), lengths)
    terms = lists.flatten()
    df = pd.DataFrame({"doc_id": ids, "term": terms.to_pandas()})
    return df[df.term != ""]


def term_stats(ds: ray.data.Dataset, id_col: str = "doc_id",
               text_col: str = "text") -> ray.data.Dataset:
    """Inverted-index statistics (term, df, tf): document frequency and
    total term frequency over the corpus."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        dt = _doc_terms(b, id_col, text_col)
        tf = dt.groupby("term", sort=False).size().rename("tf")
        df = dt.drop_duplicates().groupby("term", sort=False) \
            .size().rename("df")
        out = pd.concat([df, tf], axis=1).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df"), Sum("tf"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"term": b["term"],
                         "df": pc.cast(b["sum(df)"], pa.int64()),
                         "tf": pc.cast(b["sum(tf)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def tfidf_top_terms(ds: ray.data.Dataset, k: int = 5,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms: (doc_id, term, tf, df, tfidf)
    ranked by (tf DESC, df ASC, term ASC)."""
    n_docs = ds.count()
    df_tbl = term_stats(ds, id_col, text_col).to_pandas()
    df_ref = ray.put(dict(zip(df_tbl.term, df_tbl.df.astype("int64"))))

    def score(b: pa.Table) -> pa.Table:
        df_map = _get_cached(df_ref)
        dt = _doc_terms(b, id_col, text_col)
        g = dt.groupby(["doc_id", "term"], sort=False).size() \
            .rename("tf").reset_index()
        g["df"] = g.term.map(df_map).astype("int64")
        g["tfidf"] = g.tf.to_numpy(dtype="float64") \
            * np.log(float(n_docs) / g.df.to_numpy(dtype="float64"))
        g = g.sort_values(["doc_id", "tf", "df", "term"],
                          ascending=[True, False, True, True])
        top = g.groupby("doc_id", sort=False).head(k)
        return pa.Table.from_pandas(top.reset_index(drop=True),
                                    preserve_index=False)

    return ds.map_batches(score, batch_format="pyarrow")


def _doc_ngrams(b: pa.Table, id_col: str, text_col: str,
                n: int) -> pd.DataFrame:
    """Distinct (doc_id, gram) rows per batch — word n-grams joined
    with single spaces.  Per-batch distinct is globally distinct
    because every document lives in exactly one row."""
    dt = _doc_terms(b, id_col, text_col)
    if dt.empty:
        return pd.DataFrame({"doc_id": [], "gram": []})
    ids = dt.doc_id.to_numpy()
    terms = dt.term.to_numpy()
    if len(terms) < n:
        return pd.DataFrame({"doc_id": [], "gram": []})
    same = np.ones(len(ids) - n + 1, dtype=bool)
    gram = terms[: len(terms) - n + 1].astype(object)
    for k in range(1, n):
        same &= ids[: len(ids) - n + 1] == ids[k: len(ids) - n + 1 + k]
        gram = gram + " " + terms[k: len(terms) - n + 1 + k]
    out = pd.DataFrame({"doc_id": ids[: len(ids) - n + 1][same],
                        "gram": gram[same]})
    return out.drop_duplicates()


def rare_gram_doc_pairs(ds: ray.data.Dataset, n: int = 4,
                        df_min: int = 2, df_max: int = 20,
                        min_shared: int = 2,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> ray.data.Dataset:
    """Sparse document-similarity join via the RARE-term inverted
    index: documents sharing ≥ ``min_shared`` word ``n``-grams whose
    document frequency is in [df_min, df_max].  Output (a, b,
    n_shared) with a < b.

    The classic prefix-filtered similarity-join shape: common grams
    (df > df_max) can never discriminate and are dropped BEFORE pair
    generation, so per-gram posting size — and hence the quadratic
    pair fan-out — is bounded by df_max.  Same gated plan as the
    MinHash/n-gram near-dup candidate stage (stages/dedup.py):

    1. per-batch distinct (doc_id, gram-hash) postings (map-only);
    2. gram dfs via one groupby-count; the Σ C(df, 2) pair volume is
       estimated distributed from that table;
    3. the rare-gram id set re-attaches by broadcast ``pc.is_in``
       semi-join when small, inner hash join when huge;
    4. pair counting: below the volume gate ONE numpy task sorts the
       rare postings and counts packed a<<32|b pairs (no join pools,
       no per-group pandas calls — 10k+ tiny map_groups previously
       dominated wall time); above it, a distributed self-join on the
       gram hash + groupby count.

    Grams compare by stable 64-bit hash (collisions ~ |grams|²/2⁶⁴ —
    negligible; swap in the string key if exactness at 10¹⁰ grams
    matters)."""
    from ray.data.aggregate import Sum

    def postings(b: pa.Table) -> pa.Table:
        dt = _doc_ngrams(b, id_col, text_col, n)
        gh = pd.util.hash_pandas_object(
            dt.gram.astype(str), index=False).to_numpy(dtype="uint64") \
            .view("int64")
        return pa.table({"doc_id": pa.array(
            dt.doc_id.to_numpy(dtype="int64")),
            "gh": pa.array(gh, pa.int64())})

    ex = ds.map_batches(postings, batch_format="pyarrow").materialize()

    # gram document frequencies: per-block partials + gated combine —
    # Ray's sort-based groupby.count pays per-key Python at
    # gram-vocabulary cardinality (the PERF.md wide-key lesson; this
    # step alone dominated the query's wall before)
    from aida_ray.stages.agg import gated_count
    dfc = gated_count(ex.select_columns(["gh"]), "gh",
                      min_count=df_min, max_count=df_max, out="df")

    def pair_partial(b: pa.Table) -> pa.Table:
        d = b["df"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"p": pa.array([int((d * (d - 1) // 2).sum())],
                                       pa.int64())})

    est_pairs = dfc.map_batches(pair_partial,
                                batch_format="pyarrow").sum("p") or 0
    broadcast_threshold = 2_000_000
    rare = dfc.select_columns(["gh"]).materialize()
    if rare.count() <= broadcast_threshold:
        from aida_ray.state.collect import collect_table
        rare_tbl = collect_table(rare, schema=pa.schema(
            [("gh", pa.int64())]))
        rare_ref = ray.put(pa.array(rare_tbl["gh"].to_numpy(
            zero_copy_only=False), pa.int64()))

        def keep_rare(b: pa.Table) -> pa.Table:
            from aida_ray.stages.dedup import _get_cached
            want = _get_cached(rare_ref)
            return b.filter(pc.is_in(b["gh"], value_set=want))

        rare_rows = ex.map_batches(keep_rare, batch_format="pyarrow")
    else:
        from aida_ray.stages.shuffle_join import hash_join
        rare_rows = hash_join(ex, rare, on=("gh",),
                              join_type="left_semi")

    if est_pairs <= 50_000_000:
        @ray.remote
        def pairs_task(*tabs: pa.Table) -> pa.Table:
            t = pa.concat_tables(tabs)
            gh = t["gh"].to_numpy(zero_copy_only=False)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, gh))
            gh, ids = gh[order], ids[order]
            starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]]) \
                if len(gh) else np.array([], dtype=np.int64)
            ends = np.r_[starts[1:], len(gh)] if len(starts) \
                else np.array([], dtype=np.int64)
            packed = []
            for s, e in zip(starts, ends):
                m = e - s
                if m < 2:
                    continue
                g = ids[s:e]
                iu, ju = np.triu_indices(m, k=1)
                packed.append((g[iu] << 32) | g[ju])
            if packed:
                ab, cnt = np.unique(np.concatenate(packed),
                                    return_counts=True)
                keep = cnt >= min_shared
                ab, cnt = ab[keep], cnt[keep].astype("int64")
            else:
                ab = np.empty(0, dtype="int64")
                cnt = np.empty(0, dtype="int64")
            return pa.table({"a": pa.array(ab >> 32, pa.int64()),
                             "b": pa.array(ab & 0xFFFFFFFF, pa.int64()),
                             "n_shared": pa.array(cnt)})

        refs = rare_rows.to_arrow_refs()
        if not refs:
            return ray.data.from_arrow(pa.table(
                {"a": pa.array([], pa.int64()),
                 "b": pa.array([], pa.int64()),
                 "n_shared": pa.array([], pa.int64())}))
        return ray.data.from_arrow_refs([pairs_task.remote(*refs)])

    left = rare_rows.map_batches(
        lambda b: pa.table({"gh": b["gh"], "a": b["doc_id"]}),
        batch_format="pyarrow")
    right = rare_rows.map_batches(
        lambda b: pa.table({"gh": b["gh"], "b": b["doc_id"]}),
        batch_format="pyarrow")
    from aida_ray.stages.agg import gated_count
    from aida_ray.stages.shuffle_join import hash_join
    packed = hash_join(left, right, on=("gh",)).filter(expr="a < b") \
        .map_batches(lambda b: pa.table({
            "ab": pc.bit_wise_or(
                pc.shift_left(pc.cast(b["a"], pa.int64()), 32),
                pc.cast(b["b"], pa.int64()))}), batch_format="pyarrow")
    return gated_count(packed, "ab", min_count=min_shared,
                       out="n_shared").map_batches(
        lambda b: pa.table({
            "a": pc.shift_right(b["ab"], 32),
            "b": pc.bit_wise_and(b["ab"], 0xFFFFFFFF),
            "n_shared": pc.cast(b["n_shared"], pa.int64())}),
        batch_format="pyarrow")


def doc_novelty(ds: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text",
                broadcast_terms: int = 4_000_000) -> ray.data.Dataset:
    """(doc_id, n_tokens, novelty) — novelty = mean idf ln(N/df) over
    the document's TOKENS (repeats weigh): the vocabulary-rarity
    signal for training-data curation (rare-vocabulary docs add
    information; boilerplate scores near the df ceiling).

    Scale shape: one term_stats pass builds the df table (vocabulary-
    bounded, broadcast via ray.put under ``broadcast_terms`` — the
    same gate as tfidf_top_terms; swap in a hash join beyond it),
    then a stateless scoring pass; docs with no tokens emit
    novelty = 0.0."""
    from aida_ray.stages.dedup import _get_cached

    n_docs = ds.count()
    st = term_stats(ds, id_col=id_col, text_col=text_col).to_pandas()
    assert len(st) <= broadcast_terms, \
        "doc_novelty: vocabulary above broadcast gate — use hash join"
    terms = st["term"].to_numpy()
    order = np.argsort(terms, kind="stable")
    ref = ray.put((terms[order],
                   st["df"].to_numpy(dtype="float64")[order], n_docs))

    def batch(b: pa.Table) -> pa.Table:
        t, dfv, nd = _get_cached(ref)
        dt = _doc_terms(b, id_col, text_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype("int64")
        if len(dt):
            ti = np.searchsorted(t, dt["term"].to_numpy())
            idf = np.log(nd / dfv[ti])
            g = pd.DataFrame({"d": dt["doc_id"].to_numpy(),
                              "idf": idf}).groupby("d", sort=False) \
                .agg(n=("idf", "size"), s=("idf", "sum")) \
                .reindex(ids, fill_value=0)
        else:
            g = pd.DataFrame(0, index=ids, columns=["n", "s"])
        n = g["n"].to_numpy(dtype="int64")
        s = g["s"].to_numpy(dtype="float64")
        nz = np.where(n > 0, n, 1).astype("float64")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "novelty": pa.array(
                np.where(n > 0, np.round(s / nz, 6), 0.0),
                pa.float64())})

    return ds.map_batches(batch, batch_format="pyarrow")
