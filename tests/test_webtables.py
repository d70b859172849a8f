import pyarrow as pa

from aida_ray.stages.webtables import (extract_table_rows,
                                       jsonld_triples_of,
                                       table_triples_of)


def test_extract_table_rows_basic():
    h = ("<table><tr><th>a</th><th>b</th></tr>"
         "<tr><td>x</td><td>1 &amp; 2</td></tr></table>")
    assert extract_table_rows(h) == [[["a", "b"], ["x", "1 & 2"]]]


def test_table_triples_header_and_ragged():
    h = ("<table><tr><th>name</th><th>pop</th><th>cc</th></tr>"
         "<tr><td>rome</td><td>3</td><td>it</td></tr>"
         "<tr><td>oslo</td><td>1</td></tr>"          # ragged, truncated
         "<tr><td></td><td>9</td><td>xx</td></tr>"   # no subject, skipped
         "</table>")
    assert table_triples_of(h) == [
        ("rome", "pop", "3"), ("rome", "cc", "it"), ("oslo", "pop", "1")]


def test_table_triples_header_only_and_one_column():
    assert table_triples_of("<table><tr><th>a</th><th>b</th></tr></table>") == []
    assert table_triples_of(
        "<table><tr><th>a</th></tr><tr><td>x</td></tr></table>") == []
    assert table_triples_of("no tables here") == []


def test_table_triples_multiple_tables_and_nested_markup():
    h = ("<table><tr><th>k</th><th>v</th></tr>"
         "<tr><td><b>s1</b></td><td>o1</td></tr></table>"
         "<table><tr><th>k</th><th>w</th></tr>"
         "<tr><td>s2</td><td>o2</td></tr></table>")
    assert table_triples_of(h) == [("s1", "v", "o1"), ("s2", "w", "o2")]


def test_jsonld_triples_subject_rules():
    h = ('<script type="application/ld+json">'
         '{"@id": "e1", "@type": "Person", "name": "Ann", "age": 3,'
         ' "tags": [1, 2], "nested": {"a": 1}, "flag": true,'
         ' "@context": "c"}</script>')
    assert jsonld_triples_of(h) == [
        ("e1", "@type", "Person"), ("e1", "name", "Ann"), ("e1", "age", "3")]
    # fallback subject = name when @id missing
    h2 = ('<script type="application/ld+json">'
          '{"name": "Bob", "job": "dev"}</script>')
    assert jsonld_triples_of(h2) == [("Bob", "name", "Bob"),
                                     ("Bob", "job", "dev")]


def test_jsonld_lenient_on_malformed_and_lists():
    assert jsonld_triples_of(
        '<script type="application/ld+json">{broken</script>') == []
    h = ('<script type="application/ld+json">'
         '[{"@id": "a", "x": 1}, {"no_subject": 1}, 5]</script>')
    assert jsonld_triples_of(h) == [("a", "x", "1")]


def test_dataset_stages(ray_session):
    import ray.data
    from aida_ray.stages.webtables import html_table_triples, jsonld_triples
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "html": pa.array([
            b"<table><tr><th>n</th><th>p</th></tr>"
            b"<tr><td>s</td><td>o</td></tr></table>",
            b'<script type="application/ld+json">{"@id":"e","k":"v"}'
            b"</script>"])})
    ds = ray.data.from_arrow(t).repartition(2)
    tt = html_table_triples(ds).to_pandas()
    assert [tuple(r) for r in tt.itertuples(index=False)] == [
        (1, "s", "p", "o")]
    jt = jsonld_triples(ds).to_pandas()
    assert [tuple(r) for r in jt.itertuples(index=False)] == [
        (2, "e", "k", "v")]
