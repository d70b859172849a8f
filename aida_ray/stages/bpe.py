"""BPE tokenizer training over a document corpus, Ray-Data-shaped.

The corpus-scale piece — word counting — is one distributed
partial-count + groupby-sum (shuffle volume = vocabulary, not corpus).
The merge-learning loop then runs on the WORD-COUNT table, which is
vocabulary-sized (a 100 TB crawl still has ~10^7 distinct frequent
words after min-count pruning), so the classic Sennrich et al. (2016,
"Neural Machine Translation of Rare Words with Subword Units")
algorithm runs in one place with exact counts — the same shape every
production BPE trainer uses (count distributed, merge centrally).

Encoding (:class:`BpeEncoder`) is an actor-pool stage: merge ranks are
built once per actor, per-word encodings memoized (vocabulary ≪
corpus, so the amortized per-row cost is a dict lookup).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_WORD_RE = re.compile(r"[A-Za-z0-9']+")


def word_counts(ds: ray.data.Dataset, col: str,
                min_count: int = 2) -> pd.DataFrame:
    """Distributed (word, n) counts — per-batch Counter partials, one
    groupby-sum; pruned below ``min_count`` AFTER the global sum."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for t in b[col].to_pylist():
            c.update(_WORD_RE.findall(t.lower()))
        return pa.table({"word": pa.array(list(c.keys())),
                         "n": pa.array(list(c.values()), pa.int64())})

    out = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n")).to_pandas()
    out = out.rename(columns={"sum(n)": "n"})
    return out[out.n >= min_count].reset_index(drop=True)


def learn_bpe(ds: ray.data.Dataset, col: str, num_merges: int,
              min_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.  Deterministic:
    ties in pair frequency break lexicographically."""
    wc = word_counts(ds, col, min_count=min_count)
    vocab = {tuple(w) + ("</w>",): int(n)
             for w, n in zip(wc.word, wc.n)}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # highest count wins; ties break to the lexicographically
        # smallest pair (deterministic across runs and blockings)
        top = max(pairs.values())
        best_pair = min(p for p, n in pairs.items() if n == top)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


class BpeEncoder:
    """Actor-pool encoder: (doc) → BPE token count + tokens.  Merge
    ranks built once per actor; per-word results memoized."""

    def __init__(self, merges: list[tuple[str, str]], col: str = "text",
                 id_col: str = "doc_id"):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.col = col
        self.id_col = id_col
        self._memo: dict[str, list[str]] = {}

    def _encode_word(self, w: str) -> list[str]:
        toks = self._memo.get(w)
        if toks is not None:
            return toks
        sym = list(w) + ["</w>"]
        while len(sym) > 1:
            ranked = [(self.ranks.get((sym[i], sym[i + 1]), 1 << 30), i)
                      for i in range(len(sym) - 1)]
            r, i = min(ranked)
            if r >= 1 << 30:
                break
            sym[i:i + 2] = [sym[i] + sym[i + 1]]
        self._memo[w] = sym
        return sym

    def __call__(self, b: pa.Table) -> pa.Table:
        counts = np.empty(len(b), dtype=np.int64)
        for j, t in enumerate(b[self.col].to_pylist()):
            n = 0
            for w in _WORD_RE.findall(t.lower()):
                n += len(self._encode_word(w))
            counts[j] = n
        return pa.table({self.id_col: b[self.id_col],
                         "n_bpe_tokens": pa.array(counts)})


def bpe_token_counts(ds: ray.data.Dataset,
                     merges: list[tuple[str, str]],
                     col: str = "text", id_col: str = "doc_id",
                     concurrency: int = 4) -> ray.data.Dataset:
    return ds.select_columns([id_col, col]).map_batches(
        BpeEncoder, fn_constructor_args=(merges, col, id_col),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
