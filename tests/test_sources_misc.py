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
