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
