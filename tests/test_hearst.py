import pyarrow as pa

from aida_ray.stages.hearst import _extract_row, hearst_isa


def test_all_pattern_families():
    assert _extract_row("metals such as copper, tin and zinc shine") == [
        ("copper", "metals", "such_as"), ("tin", "metals", "such_as"),
        ("zinc", "metals", "such_as")]
    assert _extract_row("such birds as crows or ravens") == [
        ("crows", "birds", "such_n_as"), ("ravens", "birds", "such_n_as")]
    assert _extract_row("bronze, or other alloys") == [
        ("bronze", "alloys", "or_other")]
    assert _extract_row("paris, rome and other capitals") == [
        ("paris", "capitals", "and_other"), ("rome", "capitals", "and_other")]
    assert _extract_row("tools, including hammers") == [
        ("hammers", "tools", "including")]
    assert _extract_row("games, especially chess and go") == [
        ("chess", "games", "especially"), ("go", "games", "especially")]


def test_case_insensitive_and_no_match():
    assert _extract_row("Fruits SUCH AS Apples") == [
        ("apples", "fruits", "such_as")]
    assert _extract_row("nothing of interest") == []
    assert _extract_row("") == []
    # "such as" needs a hypernym word before it
    assert _extract_row("such as oranges") == []


def test_adversarial_joiner_words():
    # trailing joiner must not become a hyponym
    got = _extract_row("cities such as york and leeds")
    assert ("and", "cities", "such_as") not in got
    assert got == [("york", "cities", "such_as"),
                   ("leeds", "cities", "such_as")]
    # "or other" must not double-fire the and_other family
    got = _extract_row("iron or other metals")
    assert got == [("iron", "metals", "or_other")]


def test_multiple_matches_per_doc():
    got = _extract_row(
        "metals such as iron are mined; drinks, including tea are poured")
    assert ("iron", "metals", "such_as") in got
    assert ("tea", "drinks", "including") in got
    assert len(got) == 2


def test_hearst_isa_dataset(ray_session):
    import ray.data
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["metals such as iron rust",
                          "no pattern here",
                          "rome and other capitals"], pa.string())})
    out = hearst_isa(ray.data.from_arrow(t).repartition(2)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out.doc_id) == [1, 3]
    assert list(out.hypo) == ["iron", "rome"]
    assert list(out.hyper) == ["metals", "capitals"]
    assert list(out.pattern) == ["such_as", "and_other"]
