"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms over Arrow batches:
language-ID (character n-gram heuristic), quality scoring
(length/token/stopword ratios), token counting, and document
fingerprinting (rolling hash).  No Python row loops in the hot path
except where per-string work is inherently scalar (hashing), and those
run on compiled builtins.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from aida_ray.text.stopwords import STOPWORDS

# tiny per-language character/function-word profiles for the heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "por"},
    "fr": {"le", "la", "les", "de", "et", "est", "une", "pour", "dans"},
    "zh": set(),  # detected by CJK codepoint ratio instead
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + char count (vectorized arrow kernels)."""
    text = batch[text_col]
    n_tokens = pc.add(pc.count_substring(text, " "), 1)
    n_chars = pc.utf8_length(text)
    return batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64())) \
                .append_column("n_chars_calc", pc.cast(n_chars, pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: token stats, stopword ratio, alpha ratio."""
    texts = batch[text_col].to_pylist()
    n_tok = np.empty(len(texts), dtype=np.int64)
    avg_len = np.empty(len(texts), dtype=np.float64)
    stop_ratio = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n_tok[i] = len(toks)
        avg_len[i] = sum(len(w) for w in toks) / len(toks) if toks else 0.0
        stop_ratio[i] = (sum(1 for w in toks if w.lower() in STOPWORDS)
                         / len(toks)) if toks else 0.0
    out = batch.append_column("n_tokens", pa.array(n_tok))
    out = out.append_column("avg_token_len", pa.array(avg_len))
    out = out.append_column("stopword_ratio", pa.array(stop_ratio))
    return out


class LangId:
    """Actor-pool language-ID stage (profiles built once per actor).

    Heuristic: CJK codepoint ratio decides zh; otherwise the language
    with the most function-word hits wins (ties -> 'en').
    """

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def _detect(self, text: str) -> str:
        if not text:
            return "und"
        cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
        if cjk > len(text[:400]) * 0.2:
            return "zh"
        toks = text.lower().split()[:200]
        best, best_hits = "en", 0
        for lang in ("en", "de", "es", "fr"):
            hits = sum(1 for t in toks if t in self.markers[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self._detect(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def compression_ratio_batch(batch: pa.Table,
                            text_col: str = "text") -> pa.Table:
    """zlib compression ratio per document (compressed/raw bytes) — the
    Gopher/RefinedWeb-style boilerplate-and-repetition signal: highly
    repetitive or templated text compresses far below prose.  zlib at a
    fixed level is deterministic, so the column is stable across runs
    and processes (stdlib only; rows-only check — no SQL analogue)."""
    import zlib
    ratios = []
    for t in batch[text_col].to_pylist():
        raw = t.encode("utf-8")
        ratios.append(round(len(zlib.compress(raw, 6)) / max(1, len(raw)), 6))
    return batch.append_column("compression_ratio",
                               pa.array(ratios, pa.float64()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit stable document fingerprint (md5-based; deterministic
    across processes, unlike hash())."""
    fps = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big", signed=False) >> 1
           for t in batch[text_col].to_pylist()]
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


def lang_distribution(ds: ray.data.Dataset, lang_col: str = "lang") -> ray.data.Dataset:
    """Per-language doc counts with map-side partial aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        s = pd.Series(batch[lang_col].to_pylist()).value_counts()
        return pa.table({"lang": pa.array(s.index.tolist(), pa.string()),
                         "n": pa.array(s.values, pa.int64())})

    from aida_ray.pipelines.kg import _shuffle_partitions
    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(_shuffle_partitions()).groupby("lang").sum(["n"])
    return agg.map_batches(lambda b: b.rename_columns(["lang", "n"]),
                           batch_format="pyarrow")


_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n]+"
_BPE_RE = None


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-style pre-tokenizer count: the GPT-2 pre-tokenizer's shape
    (leading-space word / number / punctuation runs) restricted to an
    RE2-compatible subset so the DuckDB oracle runs the IDENTICAL
    pattern.  Regex compiled once per worker process."""
    import re
    global _BPE_RE
    if _BPE_RE is None:
        _BPE_RE = re.compile(_BPE_PATTERN)
    counts = [len(_BPE_RE.findall(t)) for t in batch[text_col].to_pylist()]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_bpe_tokens": pa.array(counts, pa.int64()),
    })


def term_cooccurrence_npmi(docs: ray.data.Dataset,
                           terms: list[str],
                           text_col: str = "text") -> pa.Table:
    """Normalized PMI between a fixed term set over document
    co-occurrence — the corpus-statistics kernel behind AIDA's
    keyword-MI weights (SURVEY G3, ``WeightComputation.java:59-88``),
    run as a distributed aggregation instead of a KB-build join.

    Per batch: token presence per document (vectorized split +
    membership), then a |terms|²-bounded partial count matrix — the
    shuffle ships (terms² + terms + 1) × blocks tiny rows, never the
    corpus.  A single finishing task applies the NPMI formula:
    ``ln(p_ab/(p_a·p_b)) / −ln(p_ab)`` (1.0 when p_ab = 1), float64
    so the DuckDB oracle evaluates the identical expression.

    Only observed pairs (n_ab ≥ 1) are emitted, ``term_a < term_b``.
    """
    from ray.data.aggregate import Sum

    term_arr = sorted(terms)
    t_index = {t: i for i, t in enumerate(term_arr)}
    nt = len(term_arr)

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        flat = toks.combine_chunks()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vals = flat.flatten()          # offset-safe token stream
        lengths = pc.list_value_length(flat).to_numpy(
            zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(b)), lengths)
        # membership via ONE arrow kernel; only hits leave Arrow
        sel = pc.is_in(vals, value_set=pa.array(term_arr)).to_numpy(
            zero_copy_only=False)
        hit_idx = np.flatnonzero(sel)
        hit_terms = vals.take(pa.array(hit_idx)).to_pylist()
        mat = np.zeros((len(b), nt), dtype=bool)
        mat[doc_of[hit_idx],
            [t_index[v] for v in hit_terms]] = True
        co = (mat.astype("int64").T @ mat.astype("int64"))
        ii, jj = np.triu_indices(nt, k=1)
        cnt = co[ii, jj]
        keep = cnt > 0
        rows_a = [term_arr[i] for i in ii[keep]]
        rows_b = [term_arr[j] for j in jj[keep]]
        cnts = list(cnt[keep])
        # singles ride as (term, "") rows, the doc total as ("", "")
        singles = np.diag(co)
        for i, c in enumerate(singles):
            if c:
                rows_a.append(term_arr[i])
                rows_b.append("")
                cnts.append(int(c))
        rows_a.append("")
        rows_b.append("")
        cnts.append(len(b))
        return pa.table({"term_a": pa.array(rows_a, pa.string()),
                         "term_b": pa.array(rows_b, pa.string()),
                         "cnt": pa.array(cnts, pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["term_a", "term_b"]).aggregate(Sum("cnt"))
    from aida_ray.state.collect import collect_table
    t = collect_table(agg, schema=pa.schema(
        [("term_a", pa.string()), ("term_b", pa.string()),
         ("sum(cnt)", pa.int64())]))
    a = np.asarray(t["term_a"].to_pylist(), dtype=object)
    bcol = np.asarray(t["term_b"].to_pylist(), dtype=object)
    c = t["sum(cnt)"].to_numpy(zero_copy_only=False).astype("int64")
    nd = int(c[(a == "") & (bcol == "")][0])
    singles = {a[i]: c[i] for i in range(len(a))
               if bcol[i] == "" and a[i] != ""}
    pair_mask = (bcol != "") & (a != "")
    pa_arr, pb_arr, nab = a[pair_mask], bcol[pair_mask], c[pair_mask]
    n_a = np.array([singles[x] for x in pa_arr], dtype="int64")
    n_b = np.array([singles[x] for x in pb_arr], dtype="int64")
    p_ab = nab / nd
    p_a = n_a / nd
    p_b = n_b / nd
    with np.errstate(divide="ignore"):
        npmi = np.where(
            nab == nd, 1.0,
            np.log(p_ab / (p_a * p_b)) / -np.log(p_ab))
    out = pa.table({
        "term_a": pa.array(list(pa_arr)),
        "term_b": pa.array(list(pb_arr)),
        "n_a": pa.array(n_a, pa.int64()),
        "n_b": pa.array(n_b, pa.int64()),
        "n_ab": pa.array(nab, pa.int64()),
        "npmi": pa.array(npmi, pa.float64())})
    idx = pc.sort_indices(out, sort_keys=[("term_a", "ascending"),
                                          ("term_b", "ascending")])
    return out.take(idx)


def mention_contexts(docs: ray.data.Dataset, surfaces: list[str],
                     window: int = 2, id_col: str = "doc_id",
                     text_col: str = "text") -> ray.data.Dataset:
    """KWIC context extraction: every occurrence of a dictionary
    surface with ±``window`` tokens of context — the feature-
    extraction step feeding AIDA's keyphrase-context similarity
    (SURVEY C1: matches are scored by token distance inside exactly
    such windows).  Stateless map, zero shuffle; positions are
    1-based to match SQL ``generate_subscripts``."""
    surf_set = pa.array(sorted(surfaces))

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ").combine_chunks()
        vals = toks.flatten()
        lengths = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype("int64")
        doc_of = np.repeat(np.arange(len(b)), lengths)
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        pos0 = np.arange(len(doc_of)) - starts    # 0-based in doc
        sel = pc.is_in(vals, value_set=surf_set).to_numpy(
            zero_copy_only=False)
        hit = np.flatnonzero(sel)
        tok_lists = toks.to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        rows_id, rows_pos, rows_surf, rows_ctx = [], [], [], []
        for h in hit:
            d, p = int(doc_of[h]), int(pos0[h])
            w = tok_lists[d]
            rows_id.append(int(ids[d]))
            rows_pos.append(p + 1)
            rows_surf.append(w[p])
            rows_ctx.append(" ".join(
                w[max(p - window, 0):p + window + 1]))
        return pa.table({
            id_col: pa.array(rows_id, pa.int64()),
            "pos": pa.array(rows_pos, pa.int64()),
            "surface": pa.array(rows_surf, pa.string()),
            "context": pa.array(rows_ctx, pa.string())})

    return docs.map_batches(explode, batch_format="pyarrow")


def build_word_ids(docs: ray.data.Dataset,
                   text_col: str = "text") -> pa.Table:
    """Build the global word→dense-id dictionary — the KB-build side
    of the reference's ``word_ids`` table (SURVEY §1.2,
    ``README.md:421-425``; runtime encoding M15 pins it per actor).

    Distributed distinct (block-local unique, then a token-keyed
    count shuffle whose volume is the vocabulary, never the corpus),
    finished by ONE task that sorts the vocabulary and assigns
    ``ROW_NUMBER() OVER (ORDER BY word)`` ids — the same bounded-
    vocabulary assumption under which the reference holds word_ids
    in RAM per JVM (``DataAccessCache.java:32-55``)."""
    import ray as _ray

    def local_unique(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ").combine_chunks()
        return pa.table({"word": pc.unique(toks.flatten())})

    distinct = docs.map_batches(local_unique, batch_format="pyarrow") \
        .groupby("word").count()

    from aida_ray.state.collect import collect_table
    t = collect_table(distinct, schema=pa.schema(
        [("word", pa.string()), ("count()", pa.int64())]))
    words = np.sort(np.asarray(t["word"].to_pylist(), dtype=object))
    return pa.table({
        "word": pa.array(list(words), pa.string()),
        "word_id": pa.array(np.arange(1, len(words) + 1), pa.int64())})


def yules_k_batch(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Per-document lexical-diversity statistics: token count, type
    count, and Yule's characteristic K = 1e4 * (sum_t c_t^2 - N) / N^2
    (equivalently 1e4 * (sum_m m^2 V_m - N) / N^2) — the classic
    repetitiveness signal for webtext quality filtering (template/spam
    pages score high, natural prose low).

    Map-only, zero shuffle: every document lives in exactly one row so
    the per-doc type histogram is block-local.  Tokenization is the
    oracle-shared RE2 family (lower -> split on [^a-z0-9]+); empty
    docs emit (0, 0, 0.0).  K is rounded to 6 decimals to match the
    DuckDB twin.
    """
    from aida_ray.stages.tfidf import _doc_terms

    all_ids = batch[id_col].to_numpy(zero_copy_only=False).astype("int64")
    dt = _doc_terms(batch, id_col, text_col)
    if len(dt):
        c = dt.groupby(["doc_id", "term"], sort=False).size() \
            .rename("c").reset_index()
        c2 = c.c.to_numpy("int64")
        g = pd.DataFrame({"doc_id": c.doc_id, "c": c2, "c2": c2 * c2}) \
            .groupby("doc_id", sort=False) \
            .agg(n_tokens=("c", "sum"), n_types=("c", "count"),
                 s2=("c2", "sum")).reset_index()
    else:
        g = pd.DataFrame({"doc_id": [], "n_tokens": [], "n_types": [],
                          "s2": []})
    out = pd.DataFrame({"doc_id": all_ids}).merge(g, on="doc_id",
                                                  how="left")
    n = out.n_tokens.fillna(0).to_numpy("float64")
    s2 = out.s2.fillna(0).to_numpy("float64")
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.where(n > 0, 1e4 * (s2 - n) / (n * n), 0.0)
    return pa.table({
        "doc_id": pa.array(out.doc_id.to_numpy("int64")),
        "n_tokens": pa.array(out.n_tokens.fillna(0).to_numpy("int64")),
        "n_types": pa.array(out.n_types.fillna(0).to_numpy("int64")),
        "yules_k": pa.array(np.round(k, 6), pa.float64()),
    })


def vocab_js_divergence(ds: ray.data.Dataset, side_col: str,
                        text_col: str = "text",
                        top_k: int = 20) -> pa.Table:
    """Corpus-level vocabulary divergence between two partitions of a
    stream — the domain-shift / re-crawl-drift detector at
    DISTRIBUTION level (content_drift is its per-document sibling).

    Unigram distributions P (side 0) and Q (side 1) over the shared
    RE2 tokenization; per-term Jensen-Shannon contribution

        c(t) = 0.5·p·ln(p/m) + 0.5·q·ln(q/m),  m = (p+q)/2

    (natural log; a side's missing term contributes only through the
    other side — JS needs no smoothing).  Returns the ``top_k`` terms
    by contribution (ties broken on the ROUNDED value then term, so a
    SQL twin orders identically) with (term, p_1e9, q_1e9,
    contrib_1e9).

    Scale shape: one groupby over (side, term) with per-block pandas
    partials — vocabulary-bounded, never corpus-bounded; totals ride
    the same table; the driver sees only the merged vocabulary."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.tfidf import _doc_terms
    from aida_ray.state.collect import collect_table

    def partial(b: pa.Table) -> pa.Table:
        dt = _doc_terms(b, side_col, text_col)   # (doc_id=side, term)
        dt = dt.rename(columns={"doc_id": "side"})
        g = dt.groupby(["side", "term"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = collect_table(
        ds.select_columns([side_col, text_col])
          .map_batches(partial, batch_format="pyarrow")
          .groupby(["side", "term"]).aggregate(Sum("n")),
        pa.schema([("side", pa.int64()), ("term", pa.string()),
                   ("sum(n)", pa.int64())])).to_pandas() \
        .rename(columns={"sum(n)": "n"})
    piv = cnt.pivot_table(index="term", columns="side", values="n",
                          fill_value=0, aggfunc="sum")
    a = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(np.float64)
    b_ = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(np.float64)
    p = a / a.sum() if a.sum() else a
    q = b_ / b_.sum() if b_.sum() else b_
    m = (p + q) / 2.0
    with np.errstate(divide="ignore", invalid="ignore"):
        c = (0.5 * np.where(p > 0, p * np.log(p / m), 0.0)
             + 0.5 * np.where(q > 0, q * np.log(q / m), 0.0))
    df = pd.DataFrame({"term": piv.index, "p": p, "q": q, "c": c})
    df["c_r"] = np.round(df.c * 1e9)
    df = df.sort_values(["c_r", "term"],
                        ascending=[False, True]).head(top_k)
    return pa.table({
        "term": pa.array(df.term.tolist(), pa.string()),
        "p_1e9": pa.array(np.round(df.p * 1e9).astype(np.int64)),
        "q_1e9": pa.array(np.round(df.q * 1e9).astype(np.int64)),
        "contrib_1e9": pa.array(df.c_r.astype(np.int64)),
    })


_CTRL_RE = None
_ZW_RE = None


def unicode_clean_batch(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Unicode hygiene for crawled text (stateless map_batches): NFC
    normalization (composes NFD sequences mojibake-prone pipelines
    emit), zero-width character removal (ZWSP/ZWNJ/ZWJ/BOM — invisible
    chars that break tokenizers and dedup), and C0/C1 control removal
    (except tab/newline).  Emits the cleaned text plus per-doc change
    counters so a cleaning run is auditable:

        (id, clean_text, nfc_changed, n_zw, n_ctrl)

    Python's unicodedata and DuckDB's utf8proc both implement standard
    NFC, so the SQL twin is exact."""
    import re as _re
    import unicodedata

    global _CTRL_RE, _ZW_RE
    if _CTRL_RE is None:
        _CTRL_RE = _re.compile("[\x00-\x08\x0b-\x1f\x7f-\x9f]")
        _ZW_RE = _re.compile("[​‌‍﻿]")
    ids = batch[id_col]
    out_t, nfc_ch, n_zw, n_ctrl = [], [], [], []
    for t in batch[text_col].to_pylist():
        nfc = unicodedata.normalize("NFC", t)
        nfc_ch.append(nfc != t)
        zw = _ZW_RE.subn("", nfc)
        ct = _CTRL_RE.subn("", zw[0])
        n_zw.append(zw[1])
        n_ctrl.append(ct[1])
        out_t.append(ct[0])
    return pa.table({
        id_col: ids,
        "clean_text": pa.array(out_t, pa.string()),
        "nfc_changed": pa.array(nfc_ch, pa.bool_()),
        "n_zw": pa.array(n_zw, pa.int64()),
        "n_ctrl": pa.array(n_ctrl, pa.int64()),
    })
