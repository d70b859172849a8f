"""Unit tests: robots_compliance, sniff_mime, entity_sentiment."""

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_robots_compliance_rates(ray_session):
    from aida_ray.stages.links import robots_compliance
    urls = _ds(pa.table({"url": [
        "http://a.com/private/x", "http://a.com/pub/y",
        "http://b.com/private/z"]}))
    got = robots_compliance(urls, [("a.com", "/private/")]) \
        .to_pandas().set_index("host")
    assert got.loc["a.com", "n_blocked"] == 1
    assert got.loc["a.com", "n_crawled"] == 2
    assert got.loc["a.com", "rate"] == 0.5
    assert got.loc["b.com", "n_blocked"] == 0   # no rule for b.com


def test_sniff_mime_signatures(ray_session):
    from aida_ray.stages.multimodal import sniff_mime
    payloads = [b"%PDF-1.4 blah", b"\x89PNG\r\n\x1a\nrest",
                b"\xff\xd8\xffdata", b"GIF89a;", b"<html><p>",
                b"PK\x03\x04zip", b"RIFFwav", b"\x00garbage", b""]
    t = _ds(pa.table({
        "doc_id": pa.array(list(range(len(payloads))), pa.int64()),
        "payload": pa.array(payloads, pa.binary())}))
    got = sniff_mime(t).to_pandas().sort_values("doc_id")
    assert list(got["mime"]) == [
        "application/pdf", "image/png", "image/jpeg", "image/gif",
        "text/html", "application/zip", "audio/wav",
        "application/octet-stream", "application/octet-stream"]
    assert got.iloc[0]["n_bytes"] == 13


def test_entity_sentiment_rollup(ray_session):
    from aida_ray.stages.webstats import entity_sentiment
    docs = _ds(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["good good", "bad"]}))          # scores +6, -3
    mentions = _ds(pa.table({
        "doc_id": pa.array([1, 1, 1, 2], pa.int64()),
        "entity": ["X", "X", "Y", "X"]}))        # X dup in doc 1
    got = entity_sentiment(docs, mentions).to_pandas() \
        .set_index("entity")
    assert got.loc["X", "n_docs"] == 2
    assert got.loc["X", "score_sum"] == 3        # 6 + (-3), dup once
    assert got.loc["X", "score_mean"] == 1.5
    assert got.loc["Y", "score_sum"] == 6
