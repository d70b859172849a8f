"""XML format parsers, keyphrase extractor, metrics, SimpleGreedy."""

import pyarrow as pa

from aida_ray.ned.keyphrases import extract_keyphrases
from aida_ray.sources.xml_formats import parse_alto, parse_nyt, parse_tei
from aida_ray.stages.metrics import StageMetrics, merge_metric_tables


def test_parse_nyt():
    xml = """<nitf><head><hedline><hl1>Big News &amp; More</hl1></hedline></head>
    <body><block class="full_text"><p>First para.</p><p>Second  para.</p></block>
    </body></nitf>"""
    title, body = parse_nyt(xml)
    assert title == "Big News & More"
    assert body == "First para.\nSecond para."


def test_parse_tei():
    xml = """<TEI><teiHeader><fileDesc><titleStmt><title>Doc Title</title>
    </titleStmt></fileDesc></teiHeader><text><body><p>Alpha beta.</p>
    <p>Gamma.</p></body></text></TEI>"""
    title, body = parse_tei(xml)
    assert title == "Doc Title"
    assert body == "Alpha beta.\nGamma."


def test_parse_alto():
    xml = """<alto><Layout><TextLine><String CONTENT="Hello"/>
    <String CONTENT="world"/></TextLine><TextLine>
    <String CONTENT="second"/></TextLine></Layout></alto>"""
    _, body = parse_alto(xml)
    assert body == "Hello world\nsecond"


def test_keyphrase_extractor():
    text = ("Yesterday Led Zeppelin played at the Knebworth Festival with "
            "Robert Plant of the United Kingdom on 4 August 1979.")
    phrases = extract_keyphrases(text)
    assert "Led Zeppelin" in phrases
    assert "Knebworth Festival" in phrases
    assert "Robert Plant of the United Kingdom" in phrases
    assert "4 August 1979" in phrases
    # deterministic
    assert phrases == extract_keyphrases(text)


def test_stage_metrics():
    m = StageMetrics()
    m.inc("DOCUMENTS_PROCESSED", 3)
    m.inc("MENTIONS_TOTAL", 10)
    with m.timer("ned"):
        pass
    t1 = m.snapshot_and_reset()
    m.inc("DOCUMENTS_PROCESSED", 2)
    t2 = m.snapshot_and_reset()
    merged = merge_metric_tables([t1, t2])
    assert merged["DOCUMENTS_PROCESSED"] == 5.0
    assert merged["MENTIONS_TOTAL"] == 10.0
    assert any(k.startswith("time_ms:ned") for k in merged)


def test_simple_greedy(fixture_kb):
    from aida_ray.ned.disambiguator import disambiguate_document
    from aida_ray.ned.settings import cocktail_party_settings
    text = "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."
    res = {r.mention: r for r in disambiguate_document(
        "d", text, fixture_kb, cocktail_party_settings(algorithm="simple_greedy"))}
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Kashmir"].entity == "Kashmir_(song)"
    assert res["Les Paul"].entity == "--OOKBE--"


def test_parse_spiegel():
    """SpiegelPreparatorInputFormat.java:15-84: titel/vorspann/kurztitel/
    absatz/beschriftung text parts, artikel-id doc id."""
    from aida_ray.sources.xml_formats import parse_spiegel, spiegel_doc_id
    xml = """<artikel>
      <artikel-id>sp-1999-42</artikel-id>
      <kurztitel>Kurz</kurztitel>
      <titel>Der grosse Titel</titel>
      <vorspann>Ein Vorspann text.</vorspann>
      <absatz>Erster Absatz hier.</absatz>
      <absatz>Zweiter   Absatz.</absatz>
      <beschriftung>Bild eins</beschriftung>
      <ignored>nicht dabei</ignored>
    </artikel>"""
    title, body = parse_spiegel(xml)
    assert title == "Der grosse Titel"
    assert body.split("\n") == ["Kurz", "Ein Vorspann text.",
                                "Erster Absatz hier.", "Zweiter Absatz.",
                                "Bild eins"]
    assert "nicht dabei" not in body
    assert spiegel_doc_id(xml) == "sp-1999-42"


def test_parse_robust04():
    """Robust04PreparatorInputFormat.java:42-59: DOCNO id; text = all
    tags stripped."""
    from aida_ray.sources.xml_formats import parse_robust04, robust04_doc_id
    xml = ("<DOC><DOCNO>FBIS3-10082</DOCNO><HT>x</HT>"
           "<TEXT>Some body text here.</TEXT></DOC>")
    title, body = parse_robust04(xml)
    assert title == ""
    assert "Some body text here." in body
    assert "FBIS3-10082" in body        # DOCNO chars survive tag-stripping
    assert robust04_doc_id(xml) == "FBIS3-10082"


def test_xml_dispatch_all_formats():
    from aida_ray.sources.xml_formats import PARSERS, parse_xml
    assert set(PARSERS) == {"nyt", "tei", "alto", "spiegel", "robust04"}
    t, b = parse_xml("<DOC><DOCNO>d1</DOCNO>hello</DOC>", "robust04")
    assert "hello" in b


def test_pos_keyphrase_grammar():
    """KeyphraseExtractor.java NP grammar port: nounPhraseIN catches
    'University of California'; dates; proper-noun runs."""
    from aida_ray.ned.keyphrases import extract_keyphrases_pos
    text = ("Jimmy Page of Led Zeppelin played at the University of "
            "California on 17 August 2026.")
    got = extract_keyphrases_pos(text)
    assert "University of California" in got      # nounPhraseIN
    assert "17 August 2026" in got                # date regex
    assert any("Led Zeppelin" in p for p in got)  # NNP run
    # deterministic
    assert got == extract_keyphrases_pos(text)


def test_result_json_shape(fixture_kb):
    """S8/M17: reference result-JSON shape (README.md:198-288) — format
    version, annotatedText weave, entityMetadata, mentions with
    bestEntity scores, allTypes."""
    import json

    from aida_ray.io.result_json import to_result_json
    from aida_ray.ned.disambiguator import disambiguate_document
    from aida_ray.ned.doc import manual_filter
    from aida_ray.ned.settings import cocktail_party_settings
    kb = fixture_kb
    text = "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."
    cleaned, _ = manual_filter(text)
    res = disambiguate_document(
        "d", text, kb, cocktail_party_settings(algorithm="cocktail_party"))
    d = json.loads(to_result_json("d", cleaned, res, kb))
    assert d["formatVersion"] == "2.3"
    assert d["annotatedText"].startswith("When [[YAGO:Jimmy_Page|Page]]")
    assert d["originalText"] == cleaned
    assert d["allEntities"] == ["YAGO:Jimmy_Page", "YAGO:Kashmir_(song)",
                                "YAGO:Knebworth_Festival"]
    meta = d["entityMetadata"]["YAGO:Jimmy_Page"]
    assert meta["readableRepr"] == "Jimmy Page"
    assert meta["knowledgebase"] == "YAGO"
    assert 0.0 < meta["importance"] < 1.0
    best = d["mentions"][0]["bestEntity"]
    assert best["kbIdentifier"] == "YAGO:Jimmy_Page"
    assert best["disambiguationScore"] == "0.89471"   # golden score
    ookbe = [m for m in d["mentions"] if m["name"] == "Les Paul"][0]
    assert ookbe["bestEntity"] is None
    # deterministic serialization
    assert to_result_json("d", cleaned, res, kb) == \
        to_result_json("d", cleaned, res, kb)


def test_html_writer(fixture_kb):
    """S7: HtmlGenerator-style annotated HTML — anchors for linked
    mentions, span for OOKBE, escaped text."""
    from aida_ray.io.result_json import to_html
    from aida_ray.ned.disambiguator import disambiguate_document
    from aida_ray.ned.doc import manual_filter
    from aida_ray.ned.settings import cocktail_party_settings
    kb = fixture_kb
    text = "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."
    cleaned, _ = manual_filter(text)
    res = disambiguate_document(
        "d", text, kb, cocktail_party_settings(algorithm="cocktail_party"))
    html_out = to_html("d", cleaned, res, kb)
    assert '<a href="http://en.wikipedia.org/wiki/Jimmy%20Page"' in html_out
    assert ">Page</a>" in html_out
    assert '<span class="ookbe">Les Paul</span>' in html_out
    assert html_out.startswith("<!DOCTYPE html>")
    assert to_html("d", cleaned, res, kb) == html_out   # deterministic


def test_run_kg_sharded_chain(ray_session, tmp_path):
    """run_kg with n_kb_shards>1 drives the chain topology end-to-end
    and produces the same triples as the single-KB run."""
    import pandas as pd

    from aida_ray.kb.synth import synth_kb
    from aida_ray.pipelines.corpus import write_corpus
    from aida_ray.pipelines.kg import read_triples, run_kg
    kb = synth_kb(100, seed=42)
    dirs = write_corpus(str(tmp_path / "c"), kb, 30, n_shards=2)

    def run(out, shards):
        ms = run_kg(dirs["pages"], kb, str(tmp_path / out),
                    concurrency=2, batch_size=16, n_kb_shards=shards)
        assert ms, "expected fresh partitions"
        df = read_triples(str(tmp_path / out)).to_pandas()
        df["score"] = df["score"].round(9)
        df["warc_ts"] = df["warc_ts"].astype(str)
        return df.sort_values(["subj", "pred", "obj", "url"]).reset_index(drop=True)

    single = run("single", 0)
    sharded = run("sharded", 3)
    assert single.equals(sharded)


def test_warc_gz_members_roundtrip(ray_session, tmp_path):
    """Per-record gzip members (the .warc.gz convention) parse to the
    same rows as the plain container; a single-member stream over the
    whole file decodes through the same path."""
    import gzip

    from aida_ray.sources.warc import (parse_warc_bytes, read_warc,
                                       warc_record, write_warc_file,
                                       write_warc_gz_file)
    recs = [warc_record(f"http://x/{i}", 1767225600 + i,
                        f"body {i}".encode()) for i in range(7)]
    write_warc_file(str(tmp_path / "a" / "p.warc"), recs)
    write_warc_gz_file(str(tmp_path / "b" / "p.warc.gz"), recs)
    plain = read_warc(str(tmp_path / "a"),
                      rec_types=("conversion",)).to_pandas()
    gz = read_warc(str(tmp_path / "b"),
                   rec_types=("conversion",)).to_pandas()
    assert plain.equals(gz) and len(gz) == 7
    single = gzip.compress(b"".join(recs))
    t = parse_warc_bytes(single)
    assert t.num_rows == 7


def test_warc_cdx_random_access(tmp_path):
    from aida_ray.sources.warc import (fetch_warc_record, warc_record,
                                       write_warc_gz_with_index)
    recs = [warc_record(f"http://x/{i}", 1767225600 + i,
                        f"payload number {i}".encode())
            for i in range(9)]
    p = str(tmp_path / "s.warc.gz")
    rows = write_warc_gz_with_index(p, recs)
    assert len(rows) == 9
    # sidecar exists, one line per record
    with open(p + ".cdx") as f:
        lines = f.read().splitlines()
    assert len(lines) == 9
    url, ts, off, ln = lines[4].rsplit(" ", 3)
    assert url == "http://x/4"
    t = fetch_warc_record(p, int(off), int(ln))
    assert t.num_rows == 1
    assert t["payload"][0].as_py() == b"payload number 4"
    # offsets are disjoint and cover the file
    import os as _os
    assert rows[-1]["offset"] + rows[-1]["length"] == _os.path.getsize(p)


def test_sitemap_gz(ray_session, tmp_path):
    """Gzipped sitemaps (.xml.gz, the standard for large sites) parse
    identically to plain XML."""
    import gzip
    import os

    from aida_ray.sources.sitemap import read_sitemaps, write_sitemap_file
    a, b = tmp_path / "a", tmp_path / "b"
    os.makedirs(a)
    os.makedirs(b)
    write_sitemap_file(str(a / "s.xml"),
                       [f"http://h/{i}" for i in range(5)])
    with open(a / "s.xml", "rb") as f:
        raw = f.read()
    with open(b / "s.xml.gz", "wb") as f:
        f.write(gzip.compress(raw, mtime=0))
    pa_ = read_sitemaps(str(a)).to_pandas().drop(columns=["source"])
    pb = read_sitemaps(str(b)).to_pandas().drop(columns=["source"])
    assert pa_.equals(pb)


def test_pdf_text_roundtrip():
    from aida_ray.sources.pdftext import extract_pdf_text, make_simple_pdf
    lines = ["hello world of pdf", "second line here",
             "third (with) parens \\ backslash"]
    for compress in (True, False):
        pdf = make_simple_pdf(lines, compress)
        assert pdf[:5] == b"%PDF-"
        assert extract_pdf_text(pdf) == "\n".join(lines)


def test_pdf_text_third_party_goldens():
    """Real TeX/docbook PDFs extract readable text (stream walk +
    Flate + TJ kerning-gap spacing)."""
    import os

    import pytest as _pytest

    from aida_ray.sources.pdftext import extract_pdf_text
    path = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
    if not os.path.exists(path):
        _pytest.skip("no third-party PDF on this host")
    with open(path, "rb") as f:
        txt = extract_pdf_text(f.read())
    assert len(txt) > 10_000
    assert "Shared MIME-info Database" in txt
    assert "Thomas Leonard" in txt


def test_pdf_rejects_non_pdf():
    import pytest as _pytest

    from aida_ray.sources.pdftext import extract_pdf_text
    with _pytest.raises(ValueError, match="PDF"):
        extract_pdf_text(b"not a pdf")


def test_pdf_quote_ops_line_attribution():
    """ADVICE r4: ' and " move to the next line BEFORE showing their
    operand — the shown string must land on the NEW line."""
    import zlib as _z

    from aida_ray.sources.pdftext import extract_pdf_text
    content = (b"BT /F1 12 Tf 72 720 Td (first line) Tj "
               b"(second line) ' "
               b"3 0 (third line) \" ET")
    body = _z.compress(content)
    obj4 = (b"<< /Filter /FlateDecode /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream")
    pdf = (b"%PDF-1.4\n4 0 obj\n" + obj4 + b"\nendobj\n"
           b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    assert extract_pdf_text(pdf) == "first line\nsecond line\nthird line"


def test_pdf_large_stream_dictionary():
    """ADVICE r4: a stream dictionary larger than the old 600-byte
    lookback window must still get /Length + /FlateDecode detection
    (the scan now bounds at the enclosing 'obj' token)."""
    import zlib as _z

    from aida_ray.sources.pdftext import extract_pdf_text
    content = b"BT /F1 12 Tf 72 720 Td (big dict text) Tj ET"
    # compressed payload ending in EOL bytes: the EOL-trim fallback
    # would corrupt it, so extraction only works if /Length is seen
    body = _z.compress(content)
    assert len(body) < 600
    pad = b"/Metadata (" + b"x" * 900 + b") "
    obj = (b"<< " + pad + b"/Filter /FlateDecode /Length "
           + str(len(body)).encode() + b" >>\nstream\n" + body
           + b"\nendstream")
    pdf = (b"%PDF-1.4\n4 0 obj\n" + obj + b"\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == "big dict text"
