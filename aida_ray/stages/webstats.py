"""Webtext scoring stages — spam concentration, lexicon sentiment,
TextRank keywords.

- :func:`spam_scores` — keyword-stuffing diagnostics per document
  (the classic SEO-spam signals: top-term concentration, low
  distinct-token ratio, unigram entropy; cf. Ntoulas et al., WWW'06
  "Detecting Spam Web Pages through Content Analysis").  Stateless
  vectorized ``map_batches``; the spam flag compares INTEGERS
  (``10*top_tf > 3*n`` etc.) so no float threshold can flip across
  engines.  Tokenization is the package-standard RE2 split
  (tfidf.TOKEN_SPLIT) for SQL-oracle parity.

- :func:`sentiment_scores` — AFINN-style lexicon scoring (Nielsen
  2011's method; the inline lexicon here is a small purpose-written
  valence table, not the AFINN data file).  Integer sum per doc,
  pos/neg/neu label.  Stateless map_batches; the lexicon is a
  module constant (hundreds of entries at most — compiled into the
  worker, never shipped per batch).

- :func:`textrank_keywords` — TextRank (Mihalcea & Tarau, EMNLP'04):
  adjacent-token co-occurrence edges over the corpus, PageRank on the
  word graph, top-k corpus keywords.  Scale shape: edges stream as
  one map pass over documents; the word graph is VOCABULARY-sized
  (graphs.pagerank's node-bounded broadcast assumption holds by
  construction); word→id mapping pulled once under the same bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached
from aida_ray.stages.tfidf import TOKEN_SPLIT, _doc_terms

# small purpose-written valence lexicon (AFINN-style integer scores)
SENTIMENT_LEXICON: dict[str, int] = {
    "good": 3, "great": 3, "excellent": 5, "best": 3, "love": 3,
    "nice": 2, "fine": 2, "happy": 3, "win": 2, "fast": 1,
    "bad": -3, "terrible": -3, "awful": -3, "worst": -3, "hate": -3,
    "poor": -2, "horrible": -3, "broken": -2, "slow": -1, "fail": -2,
}


def spam_scores(docs: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens, n_distinct, top_tf, concentration, entropy,
    is_spam) per document.  concentration = top_tf/n; entropy is the
    unigram Shannon entropy in nats; is_spam when the top term takes
    >30% of tokens OR fewer than 20% of tokens are distinct (both
    integer comparisons)."""

    def batch(b: pa.Table) -> pa.Table:
        df = _doc_terms(b, id_col, text_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype("int64")
        if len(df):
            cnt = df.groupby([id_col, "term"], sort=False) \
                .size().rename("c").reset_index()
            g = cnt.groupby(id_col, sort=False)["c"]
            stats = g.agg(n="sum", k="size", top="max")
            # entropy: sum(c*ln(c))/n trick — one vectorized pass
            cl = cnt.assign(clc=cnt["c"] * np.log(cnt["c"]))
            stats["slc"] = cl.groupby(id_col, sort=False)["clc"].sum()
            stats = stats.reindex(ids, fill_value=0)
        else:
            stats = pd.DataFrame(0, index=ids,
                                 columns=["n", "k", "top", "slc"])
        n = stats["n"].to_numpy(dtype="int64")
        kd = stats["k"].to_numpy(dtype="int64")
        top = stats["top"].to_numpy(dtype="int64")
        slc = stats["slc"].to_numpy(dtype="float64")
        nz = n > 0
        nf = np.where(nz, n, 1).astype("float64")
        ent = np.where(nz, np.round(np.log(nf) - slc / nf, 6), 0.0)
        conc = np.where(nz, np.round(top / nf, 6), 0.0)
        spam = nz & ((10 * top > 3 * n) | (5 * kd < n))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "n_distinct": pa.array(kd, pa.int64()),
            "top_tf": pa.array(top, pa.int64()),
            "concentration": pa.array(conc, pa.float64()),
            "entropy": pa.array(ent, pa.float64()),
            "is_spam": pa.array(spam, pa.bool_())})

    return docs.map_batches(batch, batch_format="pyarrow")


def sentiment_scores(docs: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     lexicon: dict[str, int] | None = None
                     ) -> ray.data.Dataset:
    """(doc_id, n_scored, score, label) per document — sum of lexicon
    valences over RE2 tokens; label pos/neg/neu by the sign."""
    lex = SENTIMENT_LEXICON if lexicon is None else lexicon

    def batch(b: pa.Table) -> pa.Table:
        df = _doc_terms(b, id_col, text_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype("int64")
        if len(df):
            df["v"] = df["term"].map(lex)
            hit = df.dropna(subset=["v"])
            agg = hit.groupby(id_col, sort=False)["v"] \
                .agg(["size", "sum"]).reindex(ids, fill_value=0)
        else:
            agg = pd.DataFrame(0, index=ids, columns=["size", "sum"])
        k = agg["size"].to_numpy(dtype="int64")
        s = agg["sum"].to_numpy(dtype="int64")
        lb = np.where(s > 0, "pos", np.where(s < 0, "neg", "neu"))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_scored": pa.array(k, pa.int64()),
            "score": pa.array(s, pa.int64()),
            "label": pa.array(lb.astype(str))})

    return docs.map_batches(batch, batch_format="pyarrow")


def _adjacent_pairs(b: pa.Table, id_col: str,
                    text_col: str) -> pd.DataFrame:
    """(w1, w2) consecutive non-empty token pairs per document."""
    df = _doc_terms(b, id_col, text_col)
    if not len(df):
        return pd.DataFrame({"w1": [], "w2": []})
    # _doc_terms preserves in-document token order within each doc run
    same = df[id_col].to_numpy()[1:] == df[id_col].to_numpy()[:-1]
    t = df["term"].to_numpy()
    return pd.DataFrame({"w1": t[:-1][same], "w2": t[1:][same]})


def textrank_keywords(docs: ray.data.Dataset, k: int = 10,
                      iters: int = 10, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Top-``k`` corpus keywords (term, rank) by TextRank: undirected
    adjacent-token graph (both directions emitted; duplicate pairs act
    as multi-edge weights, matching graphs.pagerank's degree math),
    10 damped power iterations, rank rounded to 6; ties at the k
    boundary break by term ASC."""
    from aida_ray.stages.graphs import pagerank

    def pair_batch(b: pa.Table) -> pa.Table:
        p = _adjacent_pairs(b, id_col, text_col)
        return pa.table({"w1": pa.array(p["w1"], pa.string()),
                         "w2": pa.array(p["w2"], pa.string())})

    pairs = docs.map_batches(pair_batch,
                             batch_format="pyarrow").materialize()

    # vocabulary (node-bounded by construction) — one distinct pass
    def vocab_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b["w1"].to_numpy(zero_copy_only=False),
            b["w2"].to_numpy(zero_copy_only=False)]))
        return pa.table({"term": pa.array(u, pa.string())})

    vt = pairs.map_batches(vocab_partial, batch_format="pyarrow") \
        .groupby("term").count().to_pandas()
    if vt.empty:
        return pa.table({"term": pa.array([], pa.string()),
                         "rank": pa.array([], pa.float64())})
    vocab = np.sort(vt["term"].to_numpy())
    vref = ray.put(vocab)

    def to_ids(b: pa.Table) -> pa.Table:
        v = _get_cached(vref)
        a = np.searchsorted(v, b["w1"].to_numpy(zero_copy_only=False))
        c = np.searchsorted(v, b["w2"].to_numpy(zero_copy_only=False))
        # undirected: emit both directions
        return pa.table({
            "src": pa.array(np.concatenate([a, c]), pa.int64()),
            "dst": pa.array(np.concatenate([c, a]), pa.int64())})

    ranks = pagerank(pairs.map_batches(to_ids, batch_format="pyarrow"),
                     iters=iters).to_pandas()
    ranks["term"] = vocab[ranks["node"].to_numpy()]
    ranks["rank"] = ranks["rank"].round(6)
    top = ranks.sort_values(["rank", "term"],
                            ascending=[False, True]).head(k)
    return pa.Table.from_pandas(top[["term", "rank"]].reset_index(
        drop=True), preserve_index=False)


def snapshot_drift(docs: ray.data.Dataset, key_col: str = "url_id",
                   version_col: str = "version", id_col: str = "doc_id",
                   text_col: str = "text") -> ray.data.Dataset:
    """Content drift between two crawl snapshots of the same page:
    (url_id, n_old, n_new, inter, union_size, sim, changed) per key,
    comparing DISTINCT token vocabularies of version 0 (old) and
    version 1 (new).  ``sim`` = Jaccard rounded to 6; ``changed``
    when 10*inter < 9*union (sim < 0.9, integer rule).

    Scale shape: per-block distinct (key, version, term) partials,
    one groupby over (key, term) summing version BITS (1=old, 2=new
    — a re-crawl pair, by contract), then a per-key combine; shuffle
    volume tracks distinct page vocabularies, never raw tokens.
    Keys with no tokens in either snapshot emit no row."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ids = b[key_col].to_numpy(zero_copy_only=False)
        ver = b[version_col].to_numpy(zero_copy_only=False)
        df = _doc_terms(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "v": pa.array(ver, pa.int64()),
            text_col: b[text_col]}).add_column(
                0, "rid", pa.array(np.arange(len(ids), dtype=np.int64))),
            "rid", text_col)
        if not len(df):
            return pa.table({key_col: pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "bit": pa.array([], pa.int64())})
        # _doc_terms names its id output "doc_id" — here it carries rid
        rid = df["doc_id"].to_numpy()
        out = pd.DataFrame({
            key_col: ids[rid], "term": df["term"].to_numpy(),
            "bit": np.where(ver[rid] == 0, 1, 2).astype("int64")})
        out = out.drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    masks = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby([key_col, "term"]).aggregate(Sum("bit"))

    def key_partial(b: pa.Table) -> pa.Table:
        m = b["sum(bit)"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            key_col: b[key_col].to_numpy(zero_copy_only=False),
            "o": (m & 1 > 0).astype("int64"),
            "w": (m & 2 > 0).astype("int64"),
            "i": (m == 3).astype("int64")})
        g = df.groupby(key_col, sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = masks.map_batches(key_partial, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Sum("o"), Sum("w"), Sum("i"))

    def finish(b: pa.Table) -> pa.Table:
        no = b["sum(o)"].to_numpy(zero_copy_only=False)
        nw = b["sum(w)"].to_numpy(zero_copy_only=False)
        it = b["sum(i)"].to_numpy(zero_copy_only=False)
        un = no + nw - it
        return pa.table({
            key_col: b[key_col],
            "n_old": pa.array(no, pa.int64()),
            "n_new": pa.array(nw, pa.int64()),
            "inter": pa.array(it, pa.int64()),
            "union_size": pa.array(un, pa.int64()),
            "sim": pa.array(np.round(it / un, 6), pa.float64()),
            "changed": pa.array(10 * it < 9 * un, pa.bool_())})

    return agg.map_batches(finish, batch_format="pyarrow")


def quality_ensemble(docs: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     min_tokens: int = 20) -> ray.data.Dataset:
    """Multi-signal document filter in ONE text pass: (doc_id,
    reasons, keep) where reasons is a bitmask — bit 0 spam
    (spam_scores' integer rules), bit 1 too short (< min_tokens),
    bit 2 syllable-dense (10 * syllables > 25 * words, the
    unreadable-boilerplate proxy).  keep = reasons == 0.  One
    _doc_terms scan derives all three signals; no shuffle."""

    def batch(b: pa.Table) -> pa.Table:
        df = _doc_terms(b, id_col, text_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype("int64")
        if len(df):
            df = df.assign(syl=df["term"].str.count(r"[aeiouy]+"))
            cnt = df.groupby([id_col, "term"], sort=False) \
                .agg(c=("syl", "size"), syl=("syl", "first")) \
                .reset_index()
            g = cnt.groupby(id_col, sort=False)
            stats = g.agg(n=("c", "sum"), k=("c", "size"),
                          top=("c", "max"))
            stats["syl"] = (cnt["c"] * cnt["syl"]).groupby(
                cnt[id_col].to_numpy()).sum()
            stats = stats.reindex(ids, fill_value=0)
        else:
            stats = pd.DataFrame(0, index=ids,
                                 columns=["n", "k", "top", "syl"])
        n = stats["n"].to_numpy(dtype="int64")
        k = stats["k"].to_numpy(dtype="int64")
        top = stats["top"].to_numpy(dtype="int64")
        syl = stats["syl"].to_numpy(dtype="int64")
        spam = (n > 0) & ((10 * top > 3 * n) | (5 * k < n))
        short = n < min_tokens
        dense = (n > 0) & (10 * syl > 25 * n)
        reasons = (spam.astype("int64")
                   | (short.astype("int64") << 1)
                   | (dense.astype("int64") << 2))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "reasons": pa.array(reasons, pa.int64()),
            "keep": pa.array(reasons == 0, pa.bool_())})

    return docs.map_batches(batch, batch_format="pyarrow")


def entity_sentiment(docs: ray.data.Dataset, mentions: ray.data.Dataset,
                     id_col: str = "doc_id", text_col: str = "text",
                     entity_col: str = "entity",
                     num_partitions: int | None = None
                     ) -> ray.data.Dataset:
    """Entity-level sentiment rollup: each document's lexicon score
    attributes to every entity mentioned in it; per entity the doc
    count, score sum, and mean — the reputation signal a KG publishes
    next to an entity card.

    Emits (entity, n_docs, score_sum, score_mean) with mean rounded
    to 6; multiple mentions of an entity in one doc count once.

    Scale shape: doc sentiment is the existing stateless scan; the
    attribution is ONE hash join keyed on doc_id (per-doc fanout =
    mentioned entities); per-batch partials bound the final groupby
    by the entity vocabulary."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    scored = sentiment_scores(docs, id_col=id_col, text_col=text_col) \
        .select_columns([id_col, "score"])

    def dedup_mentions(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            id_col: b[id_col].to_numpy(zero_copy_only=False),
            entity_col: b[entity_col].to_numpy(zero_copy_only=False)
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    dm = mentions.map_batches(dedup_mentions, batch_format="pyarrow") \
        .groupby([id_col, entity_col]).count() \
        .select_columns([id_col, entity_col])

    j = hash_join(dm, scored, on=(id_col,),
                  num_partitions=num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            entity_col: b[entity_col].to_numpy(zero_copy_only=False),
            "s": b["score"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = df.groupby(entity_col, sort=False).agg(
            n=("s", "size"), ss=("s", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["ss"] = g["ss"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby(entity_col).aggregate(Sum("n"), Sum("ss"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({entity_col: pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "score_sum": pa.array([], pa.int64()),
                             "score_mean": pa.array([], pa.float64())})
        n = b["sum(n)"].to_numpy(zero_copy_only=False)
        ss = b["sum(ss)"].to_numpy(zero_copy_only=False)
        return pa.table({
            entity_col: b[entity_col],
            "n_docs": pa.array(n.astype(np.int64)),
            "score_sum": pa.array(ss.astype(np.int64)),
            "score_mean": pa.array(np.round(ss / n, 6), pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")
