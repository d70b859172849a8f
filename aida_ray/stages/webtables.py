"""Web-table and JSON-LD triple extraction.

Two classic KG-construction sources beyond running text (the
WebTables / schema.org line of work — public methodology):

- :func:`html_table_triples` — relational <table> markup: the header
  row names the predicates, the first column names the row subject,
  every other cell becomes one (subj, pred, obj) triple.
- :func:`jsonld_triples` — embedded ``<script
  type="application/ld+json">`` blocks: subject = ``@id`` (fallback
  ``name``), ``@type`` and every scalar property become triples.

Both are stateless parse-bound ``map_batches`` stages (the per-row
regex/json scan IS the work, like text/extract.py); output volume
tracks markup occurrences.  The HTML parsing is the same
self-defined deterministic contract as the rest of text/extract —
attribute-quoting variants beyond the contract are out of scope.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.state.collect import collect_table
from aida_ray.text.extract import _unescape

_TABLE_RE = re.compile(r"<table\b[^>]*>(.*?)</table\s*>", re.S | re.I)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr\s*>", re.S | re.I)
_CELL_RE = re.compile(r"<t[hd]\b[^>]*>(.*?)</t[hd]\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_JSONLD_RE = re.compile(
    r'<script\b[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>'
    r"(.*?)</script\s*>", re.S | re.I)


def _cell_text(cell_html: str) -> str:
    return _unescape(re.sub(r"\s+", " ",
                            _TAG_RE.sub("", cell_html)).strip())


def extract_table_rows(html: str) -> list[list[list[str]]]:
    """All tables as row-major cell-text matrices."""
    tables = []
    for tm in _TABLE_RE.finditer(html):
        rows = [[_cell_text(c) for c in _CELL_RE.findall(rm.group(1))]
                for rm in _TR_RE.finditer(tm.group(1))]
        rows = [r for r in rows if r]
        if rows:
            tables.append(rows)
    return tables


def table_triples_of(html: str) -> list[tuple[str, str, str]]:
    """(subj, pred, obj) per data cell: header row names predicates,
    first column names the subject; ragged/short rows are truncated to
    the header width, header-only tables yield nothing."""
    out = []
    for rows in extract_table_rows(html):
        header = rows[0]
        if len(header) < 2:
            continue
        for row in rows[1:]:
            if not row or not row[0]:
                continue
            subj = row[0]
            for j in range(1, min(len(header), len(row))):
                if header[j] and row[j]:
                    out.append((subj, header[j], row[j]))
    return out


def jsonld_triples_of(html: str) -> list[tuple[str, str, str]]:
    """(subj, pred, obj) per scalar JSON-LD property.  Subject is
    ``@id`` (fallback ``name``); ``@type`` emits as predicate
    ``@type``; nested objects/lists and blocks without a subject are
    skipped (a full expansion algorithm is out of scope); malformed
    JSON blocks are ignored (crawl reality)."""
    out = []
    for m in _JSONLD_RE.finditer(html):
        try:
            data = json.loads(m.group(1))
        except ValueError:
            continue
        blocks = data if isinstance(data, list) else [data]
        for blk in blocks:
            if not isinstance(blk, dict):
                continue
            subj = blk.get("@id") or blk.get("name")
            if not isinstance(subj, str) or not subj:
                continue
            for k, v in blk.items():
                if k == "@id":
                    continue
                if k == "@type" and isinstance(v, str):
                    out.append((subj, "@type", v))
                elif not k.startswith("@") and \
                        isinstance(v, (str, int, float, bool)) and \
                        not isinstance(v, bool):
                    out.append((subj, k, str(v)))
    return out


def _triples_stage(fn, id_col: str, html_col: str):
    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        out_id, subs, preds, objs = [], [], [], []
        for i, h in zip(ids, b[html_col].to_pylist()):
            if isinstance(h, bytes):
                h = h.decode("utf-8", "replace")
            for s, p, o in fn(h or ""):
                out_id.append(int(i))
                subs.append(s)
                preds.append(p)
                objs.append(o)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "subj": pa.array(subs, pa.string()),
                         "pred": pa.array(preds, pa.string()),
                         "obj": pa.array(objs, pa.string())})
    return batch


def html_table_triples(pages: ray.data.Dataset, id_col: str = "doc_id",
                       html_col: str = "html") -> ray.data.Dataset:
    """(doc_id, subj, pred, obj) from every relational <table>."""
    return pages.map_batches(_triples_stage(table_triples_of, id_col,
                                            html_col),
                             batch_format="pyarrow")


def jsonld_triples(pages: ray.data.Dataset, id_col: str = "doc_id",
                   html_col: str = "html") -> ray.data.Dataset:
    """(doc_id, subj, pred, obj) from embedded JSON-LD blocks."""
    return pages.map_batches(_triples_stage(jsonld_triples_of, id_col,
                                            html_col),
                             batch_format="pyarrow")


_ITEMSCOPE_RE = re.compile(
    r"<(\w+)[^>]*\bitemscope\b[^>]*\bitemtype\s*=\s*\"([^\"]*)\"[^>]*>",
    re.I)
_ITEMPROP_RE = re.compile(
    r"<\w+[^>]*\bitemprop\s*=\s*\"([^\"]*)\"[^>]*>(.*?)</\w+\s*>",
    re.I | re.S)


def microdata_triples_of(html: str) -> list[tuple[str, str, str]]:
    """(subj, pred, obj) per schema.org MICRODATA property — the
    third markup family next to table_triples/jsonld_triples.
    Contract: non-nested itemscopes (crawl-lenient: each itemscope
    owns the itemprops up to the next itemscope or end of document);
    subject = the scope's ``name`` property (fallback: itemtype tail
    ``#<ordinal>``); values are tag-stripped, whitespace-normalized
    inner text."""
    scopes = list(_ITEMSCOPE_RE.finditer(html))
    out = []
    for idx, m in enumerate(scopes):
        start = m.end()
        end = scopes[idx + 1].start() if idx + 1 < len(scopes) \
            else len(html)
        typ = m.group(2).rsplit("/", 1)[-1]
        props = []
        for pm in _ITEMPROP_RE.finditer(html, start, end):
            val = re.sub(r"\s+", " ", _TAG_RE.sub("", pm.group(2))) \
                .strip()
            if pm.group(1) and val:
                props.append((pm.group(1), val))
        name = next((v for k, v in props if k == "name"), None)
        subj = name if name else f"{typ}#{idx}"
        out.append((subj, "@type", typ))
        for k, v in props:
            out.append((subj, k, v))
    return out


def microdata_triples(pages: ray.data.Dataset, id_col: str = "doc_id",
                      html_col: str = "html") -> ray.data.Dataset:
    """(doc_id, subj, pred, obj) from schema.org microdata markup."""
    return pages.map_batches(_triples_stage(microdata_triples_of,
                                            id_col, html_col),
                             batch_format="pyarrow")


def table_schema_groups(pages: ray.data.Dataset, id_col: str = "doc_id",
                        html_col: str = "html") -> ray.data.Dataset:
    """Web-table schema matching (the WebTables/Octopus stitching
    step, public methodology): tables across the corpus group by
    their HEADER signature (first-row cells joined by '|'); stitching
    all same-schema tables into one relation is what turns scattered
    markup into a queryable table corpus.

    Emits (schema_sig, n_cols, n_tables, n_rows) — table and DATA-row
    (header excluded) totals per signature.

    Scale shape: per-batch partial counts collapse each block to its
    distinct signatures, so the one groupby ships schema-vocabulary
    rows, never tables."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        counts: dict[tuple[str, int], list[int]] = {}
        for h in b[html_col].to_pylist():
            if h is None:
                continue
            html = h.decode("utf-8", "replace") if isinstance(h, bytes) \
                else h
            for rows in extract_table_rows(html):
                sig = "|".join(rows[0])
                k = (sig, len(rows[0]))
                c = counts.setdefault(k, [0, 0])
                c[0] += 1
                c[1] += len(rows) - 1
        ks = list(counts)
        return pa.table({
            "schema_sig": pa.array([k[0] for k in ks], pa.string()),
            "n_cols": pa.array([k[1] for k in ks], pa.int64()),
            "t": pa.array([counts[k][0] for k in ks], pa.int64()),
            "r": pa.array([counts[k][1] for k in ks], pa.int64())})

    agg = pages.map_batches(partial, batch_format="pyarrow") \
        .groupby(["schema_sig", "n_cols"]).aggregate(Sum("t"), Sum("r"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(t)" not in b.column_names:
            return pa.table({"schema_sig": pa.array([], pa.string()),
                             "n_cols": pa.array([], pa.int64()),
                             "n_tables": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        return pa.table({"schema_sig": b["schema_sig"],
                         "n_cols": b["n_cols"].cast(pa.int64()),
                         "n_tables": b["sum(t)"].cast(pa.int64()),
                         "n_rows": b["sum(r)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def all_markup_triples(pages: ray.data.Dataset, id_col: str = "doc_id",
                       html_col: str = "html") -> ray.data.Dataset:
    """(doc_id, subj, pred, obj, src) — all three markup families
    (table / json-ld / microdata) extracted in ONE pass over the html
    column: the page is scanned once and the heavy column dies here,
    instead of three separate read+extract branches each re-shipping
    the corpus.  ``src`` tags the extractor for downstream
    provenance-weighted fusion (fuse.noisy_or_fuse)."""
    fams = (("table", table_triples_of), ("jsonld", jsonld_triples_of),
            ("microdata", microdata_triples_of))

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        did, su, pr, ob, sr = [], [], [], [], []
        for i, h in zip(ids, b[html_col].to_pylist()):
            if h is None:
                continue
            html = h.decode("utf-8", "replace") if isinstance(h, bytes) \
                else h
            for name, fn in fams:
                for s, p, o in fn(html):
                    did.append(int(i))
                    su.append(s)
                    pr.append(p)
                    ob.append(o)
                    sr.append(name)
        return pa.table({id_col: pa.array(did, pa.int64()),
                         "subj": pa.array(su, pa.string()),
                         "pred": pa.array(pr, pa.string()),
                         "obj": pa.array(ob, pa.string()),
                         "src": pa.array(sr, pa.string())})

    return pages.map_batches(batch, batch_format="pyarrow")


def predicate_alignment(extracted: ray.data.Dataset,
                        kb: ray.data.Dataset,
                        s: str = "subj", p: str = "pred",
                        o: str = "obj",
                        num_partitions: int | None = None
                        ) -> ray.data.Dataset:
    """Attribute alignment (the Octopus/schema-matching step): map
    extracted table-header predicates onto KB predicates by DISTINCT
    (subj, obj) pair-set overlap — a header whose value pairs
    reproduce a KB relation's pairs IS that relation.

    Emits (pred_e, pred_k, inter, size_e, size_k, jaccard) for pairs
    with inter >= 1; jaccard rounded to 6.

    Scale shape: both sides collapse to distinct facts, the overlap
    is one hash join keyed on (subj, obj) (per-pair fanout =
    predicates asserting that pair — vocabulary-bounded), and sizes
    are predicate-vocabulary groupbys; nothing driver-side exceeds
    the predicate vocabulary."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    def distinct_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({s: b[s].to_pandas(), p: b[p].to_pandas(),
                           o: b[o].to_pandas()}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(distinct_partial,
                              batch_format="pyarrow") \
            .groupby([s, p, o]).count() \
            .select_columns([s, p, o])

    de = dedup(extracted)
    dk = dedup(kb)

    def keyed(col: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": pc.binary_join_element_wise(
                    b[s].cast(pa.string()), b[o].cast(pa.string()),
                    "\x1f"),
                col: b[p]})
        return f

    j = hash_join(de.map_batches(keyed("pred_e"),
                                 batch_format="pyarrow"),
                  dk.map_batches(keyed("pred_k"),
                                 batch_format="pyarrow"),
                  on=("k",), num_partitions=num_partitions)

    def pair_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"pred_e": b["pred_e"].to_pandas(),
                           "pred_k": b["pred_k"].to_pandas(), "c": 1})
        g = df.groupby(["pred_e", "pred_k"], sort=False)["c"].sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    co = collect_table(
        j.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["pred_e", "pred_k"]).aggregate(Sum("c"))).to_pandas()

    def sizes(ds: ray.data.Dataset) -> dict:
        t = collect_table(ds.groupby(p).count()).to_pandas()
        return dict(zip(t[p], t["count()"])) if len(t) else {}

    sz_e = sizes(de)
    sz_k = sizes(dk)
    if co.empty:
        return ray.data.from_arrow(pa.table({
            "pred_e": pa.array([], pa.string()),
            "pred_k": pa.array([], pa.string()),
            "inter": pa.array([], pa.int64()),
            "size_e": pa.array([], pa.int64()),
            "size_k": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    inter = co["sum(c)"].to_numpy(dtype="int64")
    se = co["pred_e"].map(sz_e).to_numpy(dtype="int64")
    sk = co["pred_k"].map(sz_k).to_numpy(dtype="int64")
    return ray.data.from_arrow(pa.table({
        "pred_e": pa.array(co["pred_e"].astype(str)),
        "pred_k": pa.array(co["pred_k"].astype(str)),
        "inter": pa.array(inter, pa.int64()),
        "size_e": pa.array(se, pa.int64()),
        "size_k": pa.array(sk, pa.int64()),
        "jaccard": pa.array(np.round(inter / (se + sk - inter), 6),
                            pa.float64())}))


def _jsonld_block_triples(blk: dict, out: list) -> str | None:
    """Triples for one (possibly nested) JSON-LD node; returns the
    node's subject (for edge emission) or None if subject-less."""
    subj = blk.get("@id") or blk.get("name")
    if not isinstance(subj, str) or not subj:
        return None
    for k, v in blk.items():
        if k == "@id":
            continue
        if k == "@type" and isinstance(v, str):
            out.append((subj, "@type", v))
        elif not k.startswith("@"):
            if isinstance(v, dict):
                nested = _jsonld_block_triples(v, out)
                if nested is not None:
                    out.append((subj, k, nested))
            elif isinstance(v, (str, int, float)) and \
                    not isinstance(v, bool):
                out.append((subj, k, str(v)))
    return subj


def jsonld_nested_triples_of(html: str) -> list[tuple[str, str, str]]:
    """(subj, pred, obj) per JSON-LD property INCLUDING nested
    objects: a dict value with its own name/@id becomes an edge to
    that nested subject plus the nested node's own triples — one
    level short of full expansion (lists still skipped), the depth
    real schema.org markup uses (Person -> birthPlace -> Place).
    The flat :func:`jsonld_triples_of` is unchanged (its contract —
    nested skipped — is pinned by existing oracles)."""
    out: list[tuple[str, str, str]] = []
    for m in _JSONLD_RE.finditer(html):
        try:
            data = json.loads(m.group(1))
        except ValueError:
            continue
        blocks = data if isinstance(data, list) else [data]
        for blk in blocks:
            if isinstance(blk, dict):
                _jsonld_block_triples(blk, out)
    return out


def jsonld_nested_triples(pages: ray.data.Dataset,
                          id_col: str = "doc_id",
                          html_col: str = "html") -> ray.data.Dataset:
    """(doc_id, subj, pred, obj) from JSON-LD with nested-object
    expansion."""
    return pages.map_batches(
        _triples_stage(jsonld_nested_triples_of, id_col, html_col),
        batch_format="pyarrow")
