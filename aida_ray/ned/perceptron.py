"""Statistical NER: averaged-perceptron BIO sequence tagger (M7).

The reference combines a CRF tagger (ner/taggers/StanfordNER.java) with
the dictionary trie inside NERManager; Stanford's models cannot be
shipped here, so this is the deterministic statistical stand-in: a
classic averaged structured perceptron (Collins 2002) over BIO tags
with greedy left-to-right decoding and a prev-tag feature.  Training
is fully deterministic (fixed feature hashing, fixed epoch order, no
RNG), so retries and actor restarts reproduce identical models.

Usage shape (A1-style actor state): train once per job on gold TSV
(``train_from_conll``), broadcast the weights via ``ray.put``, pin per
actor, tag inside ``map_batches``.  Tagged spans merge with
dictionary/manual mentions through the same ``hybrid_merge`` rules as
the OOD tagger.
"""

from __future__ import annotations

from collections import defaultdict

from aida_ray.ned.doc import Mention
from aida_ray.text.tokenizer import Token, tokenize

TAGS = ("O", "B", "I")


def _shape(w: str) -> str:
    out = []
    for c in w[:4]:
        out.append("X" if c.isupper() else "x" if c.islower()
                   else "d" if c.isdigit() else c)
    return "".join(out)


def _features(words: list[str], i: int, prev_tag: str) -> list[str]:
    w = words[i]
    lw = w.lower()
    prev_w = words[i - 1].lower() if i > 0 else "<s>"
    next_w = words[i + 1].lower() if i + 1 < len(words) else "</s>"
    feats = [
        "bias",
        "w=" + lw,
        "shape=" + _shape(w),
        "suf3=" + lw[-3:],
        "pre1=" + lw[:1],
        "istitle=" + str(w[:1].isupper()),
        "isupper=" + str(w.isupper()),
        "isdigit=" + str(w[:1].isdigit()),
        "first=" + str(i == 0),
        "prev=" + prev_w,
        "next=" + next_w,
        "ptag=" + prev_tag,
        "ptag+istitle=" + prev_tag + "_" + str(w[:1].isupper()),
        "prev+w=" + prev_w + "_" + lw,
    ]
    return feats


class PerceptronNER:
    """Averaged perceptron over BIO tags; greedy decode."""

    def __init__(self):
        # weights[feature][tag] = float
        self.weights: dict[str, dict[str, float]] = {}

    # ------------------------------------------------------------ decode
    def _score(self, feats: list[str]) -> dict[str, float]:
        scores = dict.fromkeys(TAGS, 0.0)
        for f in feats:
            wf = self.weights.get(f)
            if wf:
                for tag, w in wf.items():
                    scores[tag] += w
        return scores

    def tag(self, words: list[str]) -> list[str]:
        prev = "O"
        out = []
        for i in range(len(words)):
            scores = self._score(_features(words, i, prev))
            # deterministic argmax: score desc, then fixed TAGS order
            best = max(TAGS, key=lambda t: (scores[t], -TAGS.index(t)))
            if best == "I" and prev == "O":
                best = "B"          # BIO validity
            out.append(best)
            prev = best
        return out

    # ------------------------------------------------------------- train
    def train(self, sentences: list[tuple[list[str], list[str]]],
              epochs: int = 5) -> "PerceptronNER":
        """Collins-style training with weight averaging; sentence order
        fixed (no shuffling — determinism beats the marginal accuracy)."""
        totals: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))
        stamps: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
        step = 0

        def upd(feat: str, tag: str, delta: float) -> None:
            wf = self.weights.setdefault(feat, {})
            cur = wf.get(tag, 0.0)
            totals[feat][tag] += (step - stamps[feat][tag]) * cur
            stamps[feat][tag] = step
            wf[tag] = cur + delta

        for _epoch in range(epochs):
            for words, gold in sentences:
                prev = "O"
                for i in range(len(words)):
                    feats = _features(words, i, prev)
                    scores = self._score(feats)
                    pred = max(TAGS, key=lambda t: (scores[t], -TAGS.index(t)))
                    if pred != gold[i]:
                        for f in feats:
                            upd(f, gold[i], 1.0)
                            upd(f, pred, -1.0)
                    step += 1
                    prev = gold[i]   # gold history (teacher forcing)
        # average
        for f, wf in self.weights.items():
            for tag, cur in wf.items():
                totals[f][tag] += (step - stamps[f][tag]) * cur
                wf[tag] = totals[f][tag] / step if step else 0.0
        return self

    # ------------------------------------------------------- mention API
    def find_mentions(self, text: str,
                      tokens: list[Token] | None = None) -> list[Mention]:
        """BIO spans → Mention list (char offsets from the tokens)."""
        tokens = tokens if tokens is not None else tokenize(text)
        words = [t.text for t in tokens]
        tags = self.tag(words)
        out: list[Mention] = []
        i = 0
        while i < len(tokens):
            if tags[i] != "B":
                i += 1
                continue
            j = i
            while j + 1 < len(tokens) and tags[j + 1] == "I" \
                    and tokens[j + 1].sentence == tokens[i].sentence:
                j += 1
            out.append(Mention(
                mention=text[tokens[i].begin:tokens[j].end],
                char_offset=tokens[i].begin,
                char_length=tokens[j].end - tokens[i].begin,
                start_token=tokens[i].token_id,
                end_token=tokens[j].token_id,
                sentence=tokens[i].sentence,
            ))
            i = j + 1
        return out


def conll_to_bio(docs) -> list[tuple[list[str], list[str]]]:
    """ConllDoc list → per-sentence (words, BIO tags) training pairs."""
    out: list[tuple[list[str], list[str]]] = []
    for d in docs:
        tokens = tokenize(d.text)
        tags = ["O"] * len(tokens)
        spans = [(m.begin, m.begin + m.length) for m in d.mentions]
        for lo, hi in spans:
            first = True
            for i, t in enumerate(tokens):
                if t.begin >= lo and t.end <= hi:
                    tags[i] = "B" if first else "I"
                    first = False
        # split by sentence
        cur_s, words, ts = -1, [], []
        for t, tag in zip(tokens, tags):
            if t.sentence != cur_s:
                if words:
                    out.append((words, ts))
                words, ts = [], []
                cur_s = t.sentence
            words.append(t.text)
            ts.append(tag)
        if words:
            out.append((words, ts))
    return out


def train_from_conll(kb, n_docs: int = 300, seed: int = 42,
                     epochs: int = 5) -> PerceptronNER:
    """Train on the synthetic CoNLL-style train split (deterministic)."""
    from aida_ray.pipelines.conformance import generate_conll_corpus
    from aida_ray.sources.conll_tsv import parse_conll_tsv, train_dev_test_split
    docs = train_dev_test_split(
        parse_conll_tsv(generate_conll_corpus(kb, n_docs, seed)))["train"]
    return PerceptronNER().train(conll_to_bio(docs), epochs=epochs)
