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


def test_acronym_pairs_rules():
    from aida_ray.stages.hearst import acronym_pairs
    assert acronym_pairs("the World Health Organization (WHO) said") == \
        [("WHO", "World Health Organization")]
    # initials mismatch
    assert acronym_pairs("annual strategy review (ZQX)") == []
    # too few preceding words
    assert acronym_pairs("AB CD (ABCD)") == []
    # short form must contain an uppercase and start with a letter
    assert acronym_pairs("some long text here (abcd)") == []
    assert acronym_pairs("one (1AB) two") == []
    # multiple definitions in one doc
    got = acronym_pairs("Central Bank (CB) met the World Trade Org (WTO)")
    assert got == [("CB", "Central Bank"), ("WTO", "World Trade Org")]


def test_acronym_definitions_dataset(ray_session):
    import ray.data
    from aida_ray.stages.hearst import acronym_definitions
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["United Nations (UN) session", "no acronyms"],
                         pa.string())})
    out = acronym_definitions(ray.data.from_arrow(t).repartition(2)) \
        .to_pandas()
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, "UN", "United Nations")]


def test_quote_attributions():
    from aida_ray.stages.hearst import quote_attributions
    assert quote_attributions(
        '"it works," said Jane Doe today') == [
        ("Jane Doe", "it works", "after")]
    assert quote_attributions('Li said: "done"') == [
        ("Li", "done", "before")]
    # speaker must be capitalized; lowercase does not match
    assert quote_attributions('"x," said nobody') == []
    # both frames in one document
    got = quote_attributions('"a," said Ann. Bo said: "b"')
    assert ("Ann", "a", "after") in got and ("Bo", "b", "before") in got
    assert quote_attributions("no quotes") == []


def test_quotes_dataset(ray_session):
    import ray.data
    from aida_ray.stages.hearst import quotes
    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(['"up," said Cy Young'], pa.string())})
    out = quotes(ray.data.from_arrow(t)).to_pandas()
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (7, "Cy Young", "up", "after")]
