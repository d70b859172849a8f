"""ACE-style NEL evaluation client — reference getAidaNEL.py parity.

The reference ships a standalone evaluation client
(/root/reference/getAidaNEL.py:42-102) that streams token-per-line
sentences at the /service/disambiguate endpoint and scores best-entity
decisions against gold mention spans keyed in WORD-INDEX coordinates.
This module re-implements that client's exact semantics on top of the
in-process request surface (aida_ray/service.py):

* input format: token-per-line text file, blank line = sentence end
  (client :85-100); sentence ids map to ``aNosNo`` keys via a sidecar
  line file (:15-22); gold mentions live in a TSV of
  ``surface \\t entity \\t aNosNo \\t start \\t end`` (:25-38).
* char-offset → word-index conversion is the client's own arithmetic,
  REPRODUCED VERBATIM including its quirks
  (``len(sent[0:offset-1].split(' '))`` — the -1 rides the preceding
  space; offset-0 mentions would mis-map, so like the client's data
  our fixtures never start a mention at offset 0):  :63-65, :74-76.
* scoring: a mention with a bestEntity counts when the gold entity
  equals the UNQUOTED wiki-url tail (spaces, not underscores — the
  client compares against ``unquote(url)`` :61-68); a mention WITHOUT
  a bestEntity counts when gold says NIL (:72-79).  The final metric
  is ``rightPredict / len(gold)`` (:102).
"""

from __future__ import annotations

from urllib.parse import unquote

from aida_ray.kb.kb import KB

_WIKI = "http://en.wikipedia.org/wiki/"


def parse_token_file(text: str) -> list[str]:
    """Token-per-line → sentences, joined by single spaces (the client
    accumulates ``word + ' '`` and closes on the blank line)."""
    sents, cur = [], []
    for line in text.splitlines():
        word = line.strip().split("\t")[0]
        if word:
            cur.append(word)
        else:
            sents.append(" ".join(cur))
            cur = []
    if cur:
        sents.append(" ".join(cur))
    return sents


def parse_gold(text: str) -> dict[str, str]:
    """entMen2aNosNoid.txt → {aNosNo\\tstart\\tend: entity} (client
    :29-38; the surface column is kept out of the key like there)."""
    gold = {}
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        surface, entity, anosno, start, end = line.split("\t")[:5]
        gold[f"{anosno}\t{start}\t{end}"] = entity
    return gold


def client_word_span(sent: str, offset: int, length: int) -> tuple[int, int]:
    """The client's char→word-index arithmetic, verbatim (:63-65)."""
    start = len(sent[0:offset - 1].split(" "))
    end = start + len(sent[offset:offset + length - 1].split(" "))
    return start, end


def score_sentence(sent: str, anosno: str, response: dict,
                   gold: dict[str, str]) -> int:
    """rightPredict contribution of one sentence (client :56-80)."""
    right = 0
    meta = response.get("entityMetadata", {})
    for m in response.get("mentions", []):
        start, end = client_word_span(sent, m["offset"], m["length"])
        key = f"{anosno}\t{start}\t{end}"
        best = m.get("bestEntity")
        if best:
            url = unquote(meta.get(best["kbIdentifier"], {}).get("url", ""))
            tail = url.split(_WIKI)[1] if _WIKI in url else ""
            if gold.get(key) == tail:
                right += 1
        else:
            if gold.get(key) == "NIL":
                right += 1
    return right


def evaluate_nel(token_text: str, sentid_lines: str, gold_text: str,
                 kb: KB, params: dict | None = None) -> dict:
    """Full client run, in-process: returns {right, total, accuracy}.

    ``params`` are extra /disambiguate request fields (the client
    posts only text — same default here)."""
    from aida_ray.service import process_request
    sents = parse_token_file(token_text)
    ids = [ln.strip() for ln in sentid_lines.splitlines() if ln.strip()]
    gold = parse_gold(gold_text)
    right = 0
    for lineno, sent in enumerate(sents):
        resp = process_request({**(params or {}), "text": sent}, kb)
        if "ERROR" in resp:
            continue
        right += score_sentence(sent, ids[lineno], resp, gold)
    total = len(gold)
    return {"right": right, "total": total,
            "accuracy": right / total if total else 0.0}


def fixture_eval_inputs() -> tuple[str, str, str]:
    """Deterministic ACE-shaped fixture over the test KB (freshly
    authored, client file formats): two sentences, five gold mentions
    covering a correct link, a deliberately-wrong gold (the pipeline
    resolves the song, gold names the region), a correct NIL, a
    missed non-NIL, and a correct multiword link — accuracy has real
    headroom (3/5), like the client's own runs."""
    sents = ["When Page played Kashmir at Knebworth it rained .",
             "The crowd loved Kashmir and the Les Paul solo ."]
    token_text = "\n".join("\n".join(s.split(" ")) + "\n" for s in sents)
    sentid_lines = "a0s0\na0s1\n"
    gold_text = "\n".join([
        "Page\tJimmy Page\ta0s0\t1\t2",
        "Kashmir\tKashmir\ta0s0\t3\t4",          # pipeline: the song
        "Knebworth\tKnebworth Festival\ta0s0\t5\t6",
        "Kashmir\tNIL\ta0s1\t3\t4",              # nulled -> NIL right
        "Les Paul\tLes Paul\ta0s1\t6\t8",        # nulled -> missed
    ])
    return token_text, sentid_lines, gold_text


def evaluate_nel_distributed(token_text: str, sentid_lines: str,
                             gold_text: str, kb, concurrency: int = 2
                             ) -> dict:
    """Same metric with sentences fanned out through the
    serve_requests actor stage (the corpus-scale path): requests ride
    a Dataset, scoring is a stateless map over responses, and only the
    (right, n) partial sums reach the driver."""
    import json

    import pyarrow as pa

    import ray
    from aida_ray.service import serve_requests

    sents = parse_token_file(token_text)
    ids = [ln.strip() for ln in sentid_lines.splitlines() if ln.strip()]
    gold = parse_gold(gold_text)
    reqs = pa.table({
        "request_id": pa.array(range(len(sents)), pa.int64()),
        "request": pa.array([json.dumps({"text": s}) for s in sents],
                            pa.string())})
    resp = serve_requests(ray.data.from_arrow(reqs), kb,
                          concurrency=concurrency)
    gref = ray.put((sents, ids, gold))

    def score(b: pa.Table) -> pa.Table:
        ss, ii, gg = ray.get(gref)
        r = 0
        for rid, rj in zip(b["request_id"].to_pylist(),
                           b["response"].to_pylist()):
            d = json.loads(rj)
            if "ERROR" not in d:
                r += score_sentence(ss[rid], ii[rid], d, gg)
        return pa.table({"right": pa.array([r], pa.int64())})

    parts = resp.map_batches(score, batch_format="pyarrow").to_pandas()
    right = int(parts["right"].sum())
    total = len(gold)
    return {"right": right, "total": total,
            "accuracy": right / total if total else 0.0}
