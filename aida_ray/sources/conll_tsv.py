"""AIDA-collection TSV reader / writer (SURVEY S2 / S9).

Format (reference PreparedInput.java:161-304; fixture
testdata/preparedinput/preparedinputtest.tsv):

    -DOCSTART- (<docid>)[\\t<yyyy-mm-dd>]
    <token>[\\tB|I\\t<mention>\\t<gold_entity|--NME-->[\\t<NER>[\\t<count>]]]
    (blank line = sentence break)

The reader yields one record per document with reconstructed text
(tokens joined by single spaces, sentences by newline), mention spans
with char offsets into that text, and gold entities.  The writer is the
exact inverse (round-trip tested).  As a Ray source, parse TSV shards
inside ``map_batches`` over ``read_text`` lines grouped per document —
here we parse a whole file (the conformance corpora are small).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ConllMention:
    mention: str
    begin: int          # char offset into reconstructed text
    length: int
    gold_entity: str    # --NME-- for out-of-kb
    ner: str = ""


@dataclass
class ConllDoc:
    doc_id: str
    date: str
    text: str
    mentions: list[ConllMention] = field(default_factory=list)


def parse_conll_tsv(content: str) -> list[ConllDoc]:
    docs: list[ConllDoc] = []
    cur_id, cur_date = None, ""
    parts: list[str] = []          # text pieces
    pos = 0
    mentions: list[ConllMention] = []
    open_mention: list | None = None  # [surface, begin, gold, ner, parts]

    def close_mention() -> None:
        nonlocal open_mention
        if open_mention is not None:
            surface = " ".join(open_mention[4])
            mentions.append(ConllMention(surface, open_mention[1],
                                         len(surface), open_mention[2],
                                         open_mention[3]))
            open_mention = None

    def flush_doc() -> None:
        nonlocal parts, pos, mentions, cur_id, cur_date
        close_mention()
        if cur_id is not None:
            docs.append(ConllDoc(cur_id, cur_date, "".join(parts).rstrip("\n"),
                                 list(mentions)))
        parts, mentions = [], []
        pos = 0

    at_line_start = True
    for line in content.split("\n"):
        if line.startswith("-DOCSTART-"):
            flush_doc()
            rest = line[len("-DOCSTART-"):].strip()
            cur_date = ""
            if "\t" in rest:
                rest, cur_date = rest.split("\t", 1)
            cur_id = rest.strip().strip("()")
            at_line_start = True
            continue
        if cur_id is None:
            continue
        if line == "":
            close_mention()
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
                pos += 1
            at_line_start = True
            continue
        cols = line.split("\t")
        token = cols[0]
        if not at_line_start:
            parts.append(" ")
            pos += 1
        at_line_start = False
        tok_begin = pos
        parts.append(token)
        pos += len(token)
        if len(cols) >= 4 and cols[1] in ("B", "I"):
            ner = cols[4] if len(cols) > 4 else ""
            if cols[1] == "B":
                close_mention()
                open_mention = [cols[2], tok_begin, cols[3], ner, [token]]
            elif open_mention is not None:
                open_mention[4].append(token)
        else:
            close_mention()
    flush_doc()
    return docs


def write_conll_tsv(docs: list[ConllDoc]) -> str:
    """Inverse of parse_conll_tsv (whitespace tokens, sentence = line)."""
    out: list[str] = []
    for d in docs:
        header = f"-DOCSTART- ({d.doc_id})"
        if d.date:
            header += f"\t{d.date}"
        out.append(header)
        spans = sorted(d.mentions, key=lambda m: m.begin)
        si = 0
        for line_no, sentence in enumerate(d.text.split("\n")):
            pos = sum(len(ln) + 1 for ln in d.text.split("\n")[:line_no])
            for token in sentence.split(" "):
                if not token:
                    pos += 1
                    continue
                tok_begin = pos
                tag = ""
                while si < len(spans) and \
                        spans[si].begin + spans[si].length < tok_begin:
                    si += 1
                if si < len(spans):
                    m = spans[si]
                    if tok_begin == m.begin:
                        tag = f"\tB\t{m.mention}\t{m.gold_entity}\t{m.ner}"
                    elif m.begin < tok_begin < m.begin + m.length:
                        tag = f"\tI\t{m.mention}\t{m.gold_entity}\t{m.ner}"
                out.append(token + tag)
                pos += len(token) + 1
            out.append("")
        if out[-1] == "":
            out.pop()
        out.append("")
    return "\n".join(out).rstrip("\n") + "\n"


def conll_docs_to_tables(docs: list[ConllDoc]):
    """(docs_table, gold_table) arrow tables for pipeline input."""
    import pyarrow as pa
    pages = pa.table({
        "url": pa.array([f"conll://{d.doc_id}" for d in docs], pa.string()),
        "text": pa.array([d.text for d in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
    })
    g_url, g_m, g_b, g_l, g_e = [], [], [], [], []
    for d in docs:
        for m in d.mentions:
            g_url.append(f"conll://{d.doc_id}")
            g_m.append(m.mention); g_b.append(m.begin)
            g_l.append(m.length); g_e.append(m.gold_entity)
    gold = pa.table({
        "url": pa.array(g_url, pa.string()),
        "mention": pa.array(g_m, pa.string()),
        "begin": pa.array(g_b, pa.int32()),
        "len": pa.array(g_l, pa.int32()),
        "entity": pa.array(g_e, pa.string()),
    })
    return pages, gold


def train_dev_test_split(docs: list[ConllDoc]) -> dict[str, list[ConllDoc]]:
    """CoNLL-YAGO proportions (CoNLLReader.java:47-67: 1393 docs,
    train 1-946 / dev 947-1162 / testb 1163-1393)."""
    n = len(docs)
    a = round(n * 946 / 1393)
    b = round(n * 1162 / 1393)
    return {"train": docs[:a], "dev": docs[a:b], "testb": docs[b:]}
