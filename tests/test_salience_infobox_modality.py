"""Entity salience, infobox extraction, modality tagging."""

import pyarrow as pa

import ray.data

from aida_ray.stages.infobox import infobox_attributes, parse_infoboxes
from aida_ray.stages.modality import sentence_modality, tag_modality
from aida_ray.stages.salience import doc_salience, entity_salience


# --------------------------------------------------------- salience

def test_salience_tf_and_position():
    got = dict((m, (tf, fs, sc)) for m, tf, fs, sc in doc_salience(
        "Acme opened . Beta praised Acme . Acme grew ."))
    assert got["Acme"] == (3, 0, 4.0)
    assert got["Beta"] == (1, 1, 1.5)


def test_salience_multiword_and_skip():
    got = doc_salience("New York grew . The city thrived .")
    assert got == [("New York", 1, 0, 2.0)]


def test_salience_stage(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["Acme opened . Acme grew ."])}))
    out = entity_salience(ds).to_pandas()
    assert out.iloc[0]["score"] == 3.0


# ---------------------------------------------------------- infobox

def test_infobox_basic():
    txt = ("intro {{Infobox company | name = Acme Corp | founded = "
           "1987 | hq = [[Paris]] }} outro")
    assert parse_infoboxes(txt) == [
        ("company", "name", "Acme Corp"),
        ("company", "founded", "1987"),
        ("company", "hq", "Paris")]


def test_infobox_link_label_and_nested_template():
    txt = ("{{Infobox person | born = [[Paris|the capital]] | "
           "height = {{convert|180|cm}} tall }}")
    got = parse_infoboxes(txt)
    assert ("person", "born", "the capital") in got
    assert ("person", "height", "tall") in got


def test_infobox_pipe_inside_link_does_not_split():
    txt = "{{Infobox x | a = [[b|c]] | d = e }}"
    assert parse_infoboxes(txt) == [("x", "a", "c"), ("x", "d", "e")]


def test_infobox_empty_and_keyless_skipped():
    txt = "{{Infobox x | a = | justtext | b = ok }}"
    assert parse_infoboxes(txt) == [("x", "b", "ok")]


def test_infobox_multiple_blocks():
    txt = "{{Infobox a | k = v }} mid {{Infobox b | k2 = v2 }}"
    assert parse_infoboxes(txt) == [("a", "k", "v"), ("b", "k2", "v2")]


def test_infobox_key_normalization():
    txt = "{{Infobox x | Birth Place = Rome }}"
    assert parse_infoboxes(txt) == [("x", "birth_place", "Rome")]


def test_infobox_stage(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "text": pa.array(["{{Infobox c | n = V }}"])}))
    out = infobox_attributes(ds).to_pandas()
    assert out.values.tolist() == [[5, "c", "n", "V"]]


# --------------------------------------------------------- modality

def test_modality_classes():
    assert tag_modality("acme did not buy beta".split()) == (
        "neg", "not", "asserted", "")
    assert tag_modality("acme may buy beta".split()) == (
        "pos", "", "uncertain", "may")
    assert tag_modality("acme never allegedly paid".split()) == (
        "neg", "never", "uncertain", "allegedly")
    assert tag_modality("acme bought beta".split()) == (
        "pos", "", "asserted", "")


def test_modality_stage_per_sentence(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "text": pa.array(["Acme bought Beta . Acme never paid ."])}))
    out = sentence_modality(ds).to_pandas()
    assert list(out["polarity"]) == ["pos", "neg"]
    assert list(out["sent_idx"]) == [0, 1]
