"""The flagship Ray-Data pipeline: pages → entity-linked triples.

    read_parquet(pages)                       # column-pruned, streaming
      → map_batches(extract_batch)            # stateless: html → text (byte-stable)
      → map_batches(NedActor, concurrency=N)  # actor pool pinning the KB
            emits (subj, pred, obj, url, warc_ts, score, sentence) rows:
              (entity, "mentionedIn",  url)   per linked mention
              (e1,     "coOccursWith", e2)    per sentence-level entity pair
      → canonicalize_entities(...)            # salted two-phase groupby (G11)
      → dedup_triples(...)                    # groupby (s,p,o) with partial agg
      → write partitioned parquet + manifests (aida_ray.io.sink)

Scale notes (the design assumptions, per SURVEY.md §4/§7.4):
  - everything upstream of the final aggregations is map-side only; the
    dictionary/keyphrase state travels once per actor via ``ray.put``;
  - per-batch partial aggregation bounds shuffle volume by
    #distinct-keys-per-batch, and head entities (countries/persons) are
    additionally salted so no single reducer key receives the whole head;
  - heavy columns (html) are dropped at the first stage; shuffles only
    ever see narrow mention/triple rows.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.kb.kb import OOKBE, KB
from aida_ray.ned.disambiguator import disambiguate_document
from aida_ray.ned.settings import DisambiguationSettings
from aida_ray.state.broadcast import resolve
from aida_ray.text.extract import extract_text

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("ms")),
    ("score", pa.float64()),
])

MENTION_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("mention", pa.string()),
    ("begin", pa.int32()),
    ("len", pa.int32()),
    ("entity", pa.string()),
    ("score", pa.float64()),
    ("sentence", pa.int32()),
])


def read_pages(path: str, need_html: bool = False) -> ray.data.Dataset:
    """Column-pruned read of the pages table (input_hint shape).

    ``need_html=True`` reads the raw html instead of the pre-extracted
    text (the text column is then derived in ``extract_batch``).
    """
    import pyarrow.dataset as pads
    first = path if isinstance(path, str) else path[0]
    schema_names = pads.dataset(first).schema.names
    cols = [c for c in ("url", "warc_ts", "lang") if c in schema_names]
    if "text" in schema_names and not need_html:
        cols.insert(2, "text")
    elif "html" in schema_names:
        cols.insert(2, "html")
    return ray.data.read_parquet(path, columns=cols)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless html→text extraction (byte-identical per url).

    If the batch already carries extracted text, it is passed through
    untouched; otherwise text is derived from html.  html is dropped so
    downstream stages never ship the heavy column.
    """
    if "text" in batch.column_names and batch["text"].null_count == 0:
        out = batch
    else:
        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        if "text" in batch.column_names:
            out = batch.set_column(batch.column_names.index("text"),
                                   "text", pa.array(texts, pa.string()))
        else:
            out = batch.append_column("text", pa.array(texts, pa.string()))
    if "html" in out.column_names:
        out = out.drop_columns(["html"])
    return out


class NedActor:
    """Actor-pool stage: per-document disambiguation with pinned KB.

    __init__ runs once per actor (KB deserialization + derived indexes);
    __call__ processes one Arrow batch of pages and emits triple rows.
    """

    def __init__(self, kb_ref, settings: DisambiguationSettings | None = None,
                 emit: str = "triples", lang_filter: str | None = None,
                 lang_route: bool = True):
        self.kb: KB = resolve(kb_ref)
        self.settings = settings or DisambiguationSettings()
        self.emit = emit
        # M2 parity (TokenizerManager.java dispatch): pages are ROUTED
        # to a per-language tokenizer by default, never dropped.  An
        # explicit lang_filter restores the restrictive behavior.
        self.lang_filter = lang_filter
        self.lang_route = lang_route
        self._settings_by_lang: dict[str, DisambiguationSettings] = {}

    def _settings_for(self, lang) -> DisambiguationSettings:
        if not self.lang_route or not lang:
            return self.settings
        code = lang.lower()[:2]
        got = self._settings_by_lang.get(code)
        if got is None:
            from dataclasses import replace
            got = replace(self.settings, language=code) \
                if code != self.settings.language else self.settings
            self._settings_by_lang[code] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        from aida_ray.state.faults import maybe_die
        maybe_die()          # fault-injection seam (no-op unless armed)
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(urls)
        tss = batch["warc_ts"].to_pylist() if "warc_ts" in batch.column_names else [None] * len(urls)

        if self.emit == "mentions":
            cols: dict[str, list] = {k: [] for k in
                                     ("url", "mention", "begin", "len",
                                      "entity", "score", "sentence")}
            for url, text, lang in zip(urls, texts, langs):
                if self.lang_filter and lang and lang != self.lang_filter:
                    continue
                for r in disambiguate_document(url, text, self.kb,
                                               self._settings_for(lang)):
                    cols["url"].append(url)
                    cols["mention"].append(r.mention)
                    cols["begin"].append(r.char_offset)
                    cols["len"].append(r.char_length)
                    cols["entity"].append(r.entity)
                    cols["score"].append(r.score)
                    cols["sentence"].append(r.sentence)
            return pa.table(
                {k: pa.array(v, MENTION_SCHEMA.field(k).type) for k, v in cols.items()})

        cols = {k: [] for k in ("subj", "pred", "obj", "url", "warc_ts", "score")}
        for url, text, lang, ts in zip(urls, texts, langs, tss):
            if self.lang_filter and lang and lang != self.lang_filter:
                continue
            results = disambiguate_document(url, text, self.kb,
                                            self._settings_for(lang))
            linked = [r for r in results if r.entity != OOKBE]
            for r in linked:
                cols["subj"].append(r.entity)
                cols["pred"].append("mentionedIn")
                cols["obj"].append(url)
                cols["url"].append(url)
                cols["warc_ts"].append(ts)
                cols["score"].append(r.score)
            # sentence-level co-occurrence triples, deduped per document
            by_sentence: dict[int, list] = {}
            for r in linked:
                by_sentence.setdefault(r.sentence, []).append(r)
            seen: set[tuple[str, str]] = set()
            for sent, rs in sorted(by_sentence.items()):
                ents = sorted({r.entity for r in rs})
                for i in range(len(ents)):
                    for j in range(i + 1, len(ents)):
                        if (ents[i], ents[j]) in seen:
                            continue
                        seen.add((ents[i], ents[j]))
                        s1 = min(r.score for r in rs if r.entity == ents[i])
                        s2 = min(r.score for r in rs if r.entity == ents[j])
                        cols["subj"].append(ents[i])
                        cols["pred"].append("coOccursWith")
                        cols["obj"].append(ents[j])
                        cols["url"].append(url)
                        cols["warc_ts"].append(ts)
                        cols["score"].append(min(s1, s2))
        return pa.table(
            {k: pa.array(v, TRIPLE_SCHEMA.field(k).type) for k, v in cols.items()})


def link_pages(pages: ray.data.Dataset, kb_ref,
               settings: DisambiguationSettings | None = None,
               emit: str = "triples",
               concurrency: int | tuple[int, int] = 4,
               batch_size: int = 64) -> ray.data.Dataset:
    """pages → extraction → NED actor pool → triple/mention rows."""
    return (pages
            .map_batches(extract_batch, batch_format="pyarrow")
            .map_batches(NedActor,
                         fn_constructor_kwargs={"kb_ref": kb_ref,
                                                "settings": settings,
                                                "emit": emit},
                         batch_format="pyarrow",
                         batch_size=batch_size,
                         concurrency=concurrency,
                         num_cpus=1))


# --------------------------------------------------------------- aggregation

def _shuffle_partitions() -> int:
    """Block count for pre-aggregation coalescing.

    The map-side partials are already reduced (one row per distinct key
    per input block), so the reduce width needs to cover the DISTINCT-
    key volume, not the corpus: half the cluster width is plenty and
    halves the per-task dispatch + sort overhead that dominates small
    shuffles (64 reduce tasks of ~80 rows each at sf0.1 were pure
    overhead).  Scales with the cluster for genuinely large key spaces."""
    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    except Exception:  # noqa: BLE001
        return 8


def normalize_entity_key(name: str) -> str:
    """Canonical entity key: unicode NFC, trimmed, spaces → underscores
    (the normalized groupby key of the north rule's canonicalization)."""
    import unicodedata
    return unicodedata.normalize("NFC", name).strip().replace(" ", "_")


def _salt_of(key_arr: pa.Array, n_salts: int,
             block_disc: int = 0) -> np.ndarray:
    # deterministic vectorized hash → salt bucket (no per-key Python).
    # ``block_disc`` varies PER BLOCK (hash of the block's first page
    # url): without it the salt is a pure function of the entity and a
    # head entity's per-block partials still converge on ONE phase-1
    # reducer — at cluster scale (100k blocks) that reducer gets 100k
    # rows while salted peers get ~100k/n_salts.  The salt only routes
    # phase-1; phase-2 merges, so the FINAL output is invariant to the
    # salt values (r5 item 3 pins this by equality test).
    from aida_ray.stages.dedup import hash_strings62
    return ((hash_strings62(key_arr) + block_disc) % n_salts) \
        .astype(np.int32)


def _default_salts() -> int:
    """Salt count sized to what the salt actually bounds: a head key's
    phase-1 input is at most n_blocks rows, and blocks scale with
    cluster width — so salts should too.  The r5 skew A/B
    (BENCH_skew_r5.json) measured a fixed n_salts=16 costing ~2× wall
    on one node (16× the phase-2 keys) for reducer-row headroom a
    32-CPU run never uses; 1 salt per ~16 CPUs keeps single-node cost
    flat and reaches 64+ salts on a 1000-CPU cluster, where 100k-block
    runs need the spreading.  Output is invariant to the salt count
    (phase-2 merges; pinned by test_skew_salted_equals_naive)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:                      # not initialized yet
        cpus = 32
    return max(2, min(64, cpus // 16))


def canonicalize_entities(triples: ray.data.Dataset,
                          n_salts: int | None = None) -> ray.data.Dataset:
    """G11: cross-document entity canonicalization.

    Two-phase salted aggregation over ``mentionedIn`` triples:
      phase 0 (map-side): per-batch partial counts per (entity, salt) —
        bounds shuffle rows by distinct-entities-per-batch;
      phase 1: groupby(entity, salt) partial sums (the salt spreads head
        entities over n_salts reducers);
      phase 2: groupby(entity) final merge — input is already tiny.

    Returns (entity, mention_count, page_count, score_sum).
    """
    if n_salts is None:
        n_salts = _default_salts()

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], "mentionedIn"))
        if t.num_rows == 0:
            return pa.table({"skey": pa.array([], pa.string()),
                             "mention_count": pa.array([], pa.int64()),
                             "page_count": pa.array([], pa.int64()),
                             "score_sum": pa.array([], pa.float64())})
        df = t.select(["subj", "obj", "score"]).to_pandas()
        df["subj"] = df["subj"].map(normalize_entity_key)
        grouped = df.groupby("subj", sort=False).agg(
            mention_count=("obj", "size"),
            page_count=("obj", "nunique"),
            score_sum=("score", "sum")).reset_index()
        from aida_ray.stages.dedup import hash_strings62
        disc = int(hash_strings62(
            pa.array([t["obj"][0].as_py()], pa.string()))[0])
        salts = _salt_of(pa.array(grouped["subj"], pa.string()), n_salts,
                         block_disc=disc)
        # pack (entity, salt) into one key — Ray's sort shuffle is far
        # faster on a single column than on multi-column string keys
        skey = grouped["subj"] + "\x1f" + salts.astype(str)
        return pa.table({
            "skey": pa.array(skey, pa.string()),
            "mention_count": pa.array(grouped["mention_count"], pa.int64()),
            "page_count": pa.array(grouped["page_count"], pa.int64()),
            "score_sum": pa.array(grouped["score_sum"], pa.float64()),
        })

    partials = triples.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None)
    # coalesce the (narrow) partials before the sort-based shuffle: the
    # sort pays per-block overhead, and partial volume is bounded by
    # distinct-keys x blocks, so a cluster-width block count is right
    # even at large inputs (~30-40% off the aggregation wall at sf0.1)
    partials = partials.repartition(_shuffle_partitions())
    phase1 = partials.groupby("skey").sum(
        ["mention_count", "page_count", "score_sum"])

    def unsalt(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(["skey", "mention_count", "page_count",
                                  "score_sum"])
        ent = pc.list_element(pc.split_pattern(b["skey"], "\x1f"), 0)
        return pa.table({"entity": ent,
                         "mention_count": b["mention_count"],
                         "page_count": b["page_count"],
                         "score_sum": b["score_sum"]})

    phase2 = phase1.map_batches(unsalt, batch_format="pyarrow") \
        .groupby("entity").sum(["mention_count", "page_count", "score_sum"])
    return phase2.map_batches(
        lambda b: b.rename_columns(
            ["entity", "mention_count", "page_count", "score_sum"]),
        batch_format="pyarrow")


def dedup_triples(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (subj, pred, obj) with support counts (SURVEY §7.4).

    Partial in-batch dedup/count first, then one groupby over the much
    smaller partials.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["subj", "pred", "obj", "score"]).to_pandas()
        g = df.groupby(["subj", "pred", "obj"], sort=False).agg(
            support=("score", "size")).reset_index()
        # single packed key: multi-column string sort keys are ~2x slower
        # through Ray's shuffle
        key = g["subj"] + "\x1f" + g["pred"] + "\x1f" + g["obj"]
        return pa.table({"key": pa.array(key, pa.string()),
                         "support": pa.array(g["support"], pa.int64())})

    partials = triples.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None)
    partials = partials.repartition(_shuffle_partitions())
    agg = partials.groupby("key").sum(["support"])
    return agg.map_batches(_unpack_triples, batch_format="pyarrow")


def _unpack_triples(batch: pa.Table) -> pa.Table:
    b = batch.rename_columns(["key", "support"])
    parts = pc.split_pattern(b["key"], "\x1f")
    return pa.table({"subj": pc.list_element(parts, 0),
                     "pred": pc.list_element(parts, 1),
                     "obj": pc.list_element(parts, 2),
                     "support": b["support"]})


def merge_triple_tables(*stores: ray.data.Dataset) -> ray.data.Dataset:
    """Incremental KG maintenance: combine already-deduped triple
    tables — e.g. the existing store read back via `read_triples` plus
    today's new-batch `dedup_triples` output — by summing support per
    (subj, pred, obj).

    Only the NEW batch ever pays the NED stage; this merge shuffles
    (distinct keys × stores) packed-key rows, never the page corpus.
    Support summation is associative, so merging any sequence of
    batches is bit-equal to the one-shot full-corpus run (asserted in
    tests/test_entry.py)."""
    def pack(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            b["subj"], b["pred"], b["obj"], "\x1f")
        return pa.table({"key": key,
                         "support": pc.cast(b["support"], pa.int64())})

    ds = stores[0]
    if len(stores) > 1:
        ds = ds.union(*stores[1:])
    partials = ds.map_batches(pack, batch_format="pyarrow") \
        .repartition(_shuffle_partitions())
    agg = partials.groupby("key").sum(["support"])
    return agg.map_batches(_unpack_triples, batch_format="pyarrow")


def read_triples(out_dir: str) -> ray.data.Dataset:
    """Read back a `run_kg` output directory (all finished partitions).

    This is the production second pass (DESIGN.md): aggregations run
    over the written triple parquet, not over a re-executed NED stage.
    """
    import os

    from aida_ray.io.sink import read_manifests
    parts = [m["partition"] for m in read_manifests(out_dir)]
    if not parts:
        raise FileNotFoundError(f"no finished partitions under {out_dir}")
    files = []
    for part in parts:
        d = os.path.join(out_dir, part)
        files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                     if f.endswith(".parquet"))
    return ray.data.read_parquet(files)


# ------------------------------------------------------------------ end-to-end

def _stub_fsspec_http() -> None:
    """Make ``import fsspec.implementations.http`` deterministic.

    aiohttp is absent in this environment, so that import raises
    ModuleNotFoundError (which Ray's path-resolution guard catches).
    Under CONCURRENT Dataset executions (run_kg's partition threads)
    the failed-import window races between threads and surfaces as a
    plain ImportError — uncaught by Ray.  Registering a minimal stub
    (Ray only uses the class as an isinstance target) removes the race;
    no-op when the real module imports."""
    import sys
    import types
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except Exception:  # noqa: BLE001
        pass

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # never instantiated — isinstance target only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def run_kg(pages_dir: str, kb, out_dir: str,
           settings: DisambiguationSettings | None = None,
           concurrency: int | tuple[int, int] = 4,
           batch_size: int = 64,
           partition_granularity: int = 1,
           resume: bool = True,
           n_kb_shards: int = 0,
           pipeline_parallelism: int = 4) -> list[dict]:
    """End-to-end: pages parquet dir → partitioned triple parquet + manifests.

    One output partition per group of ``partition_granularity`` input
    files; finished partitions (manifest present) are skipped on rerun —
    the north-rule checkpoint/resume contract.  ``n_kb_shards > 1``
    switches to the sharded keyphrase-index path
    (aida_ray.pipelines.sharded — identical output).  Returns manifests
    (in partition order).

    ``pipeline_parallelism`` partition pipelines run CONCURRENTLY
    (driver threads; each Dataset execution is independent) — a
    sequential loop pays actor-pool spawn + pipeline-fill latency per
    partition, which dominated wall time ~30× at 50 single-file
    partitions.  Each pipeline uses ``concurrency`` NED actors, so size
    pipeline_parallelism × concurrency to the cluster.  Resume
    granularity stays one partition; writes remain atomic per
    partition, so a crash mid-flight loses at most the unfinished
    partitions regardless of how many were in flight.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    from aida_ray.io.sink import config_hash, partition_done, write_partition
    from aida_ray.state.broadcast import put_kb

    _stub_fsspec_http()

    files = sorted(f for f in os.listdir(pages_dir) if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet in {pages_dir}")
    kb_ref = None if n_kb_shards > 1 else put_kb(kb)
    shard_refs = None
    if n_kb_shards > 1:
        # serialize the core KB + shards into the object store ONCE —
        # not per partition pipeline (multi-GB per put at scale)
        from aida_ray.pipelines.sharded import build_shard_refs
        shard_refs = build_shard_refs(kb, n_kb_shards)
    cfg = config_hash((settings, batch_size, n_kb_shards))

    def do_partition(g: int) -> dict | None:
        group = files[g:g + partition_granularity]
        part = f"part-{g // partition_granularity:05d}"
        if resume and partition_done(out_dir, part):
            return None
        pages = read_pages([os.path.join(pages_dir, f) for f in group])
        if n_kb_shards > 1:
            from aida_ray.pipelines.sharded import link_pages_sharded
            triples = link_pages_sharded(
                pages, kb, settings, n_shards=n_kb_shards,
                concurrency=max(1, concurrency // n_kb_shards
                                if isinstance(concurrency, int) else 1),
                batch_size=batch_size, prebuilt_refs=shard_refs)
        else:
            triples = link_pages(pages, kb_ref, settings,
                                 concurrency=concurrency,
                                 batch_size=batch_size)
        return write_partition(triples, out_dir, part, group, cfg)

    starts = list(range(0, len(files), partition_granularity))
    # cap in-flight pipelines so their actor pools can all spawn AND
    # >=2 CPUs stay free for the read/write task stages — N concurrent
    # executions each demanding `concurrency` one-CPU actors deadlock a
    # cluster with fewer than N x concurrency + 2 CPUs
    per_pipe = concurrency if isinstance(concurrency, int) \
        else max(concurrency)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    eff = max(1, min(pipeline_parallelism,
                     (cpus - 2) // max(1, per_pipe)))
    if eff <= 1:
        results = [do_partition(g) for g in starts]
    else:
        with ThreadPoolExecutor(max_workers=eff) as ex:
            results = list(ex.map(do_partition, starts))
    return [m for m in results if m is not None]
