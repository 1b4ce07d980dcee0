"""Port of the reference's AllNamesStrategyTest goldens
(AllNamesStrategyTest.java:20-57) + Resource accessor tests."""

from sociallink_ray.functions import names as nm


def _test_resource():
    names = (
        ["test_name"] * 4 + ["test_name2"] * 3 + ["test_name3"] * 2
        + ["test_name4"] + ["test_name5"] * 6
    )
    attributes = {
        nm.ATTRIBUTE_NAME: names,
        nm.ATTRIBUTE_GIVEN_NAME: ["test_name5"],
    }
    return nm.Resource("test", attributes)


def test_all_names_query_goldens():
    r = _test_resource()
    assert nm.all_names_query(r) == "('test_name') | ('test_name2') | ('test_name3')"
    assert nm.all_names_query(r, 0) == "('test_name') | ('test_name2') | ('test_name3')"
    assert nm.all_names_query(r, 1) == "('test_name') | ('test_name2')"
    assert nm.all_names_query(r, 2) == "'test_name'"
    assert nm.all_names_query(r, 3) == "'test_name'"


def test_all_names_keys():
    r = _test_resource()
    assert nm.all_names_keys(r) == ["test_name", "test_name2", "test_name3"]
    assert nm.all_names_keys(r, 2) == ["test_name"]


def test_clean_resource_id_and_topic():
    r = nm.Resource("http://kb.example/resource/John_Smith_(Musician)")
    assert r.clean_resource_id == "John Smith"
    assert r.topic == "Musician"
    r2 = nm.Resource("http://kb.example/resource/Plain_Name")
    assert r2.clean_resource_id == "Plain Name"
    assert r2.topic == ""
    r3 = nm.Resource("no-resource-prefix")
    assert r3.clean_resource_id == ""


def test_person_last_first_swap():
    r = nm.Resource(
        "http://kb.example/resource/Doe_John",
        {
            nm.ATTRIBUTE_NAME: ["Doe, John", "Doe, John", "j"],
            nm.ATTRIBUTE_TYPE: [nm.ALIGNMENTS_PERSON],
        },
    )
    counts = nm.compile_names(r)
    assert counts["john doe"] == 2
    assert "j" not in counts  # <3 chars dropped
    assert counts["doe john"] == 1  # from clean id


def test_type_and_death_predicates():
    p = nm.Resource("x", {nm.ATTRIBUTE_TYPE: [nm.ALIGNMENTS_PERSON]})
    assert p.is_person and not p.is_company and not p.is_other
    o = nm.Resource("x", {})
    assert o.is_other
    d = nm.Resource("x", {nm.ONTO + "deathDate": ["1900-01-01"]})
    assert d.is_dead
    alive = nm.Resource("x", {nm.ATTRIBUTE_NAME: ["a"]})
    assert not alive.is_dead


def test_strict_strategies():
    r = nm.Resource(
        "http://kb.example/resource/Acme_(Company)",
        {nm.ATTRIBUTE_NAME: ["Acme Corp", "Acme Corp", "Acme"]},
    )
    assert nm.strict_name(r) == "Acme Corp"
    assert nm.strict_with_topic(r) == "Acme Corp Company"


def test_strict_quotes():
    r = nm.Resource(
        "http://kb.example/resource/Acme_(Company)",
        {nm.ATTRIBUTE_NAME: ["Acme Corp", "Acme Corp", "Acme"]},
    )
    assert nm.strict_quotes_query(r) == '"Acme Corp"'


def test_levenshtein():
    assert nm.levenshtein("kitten", "sitting") == 3
    assert nm.levenshtein("", "ab") == 2
    assert nm.levenshtein("same", "same") == 0
    assert nm.levenshtein("abc", "abd") == 1


def test_no_quotes_dupes_basic():
    r = nm.Resource(
        "http://kb.example/resource/John_Smith",
        {
            nm.ATTRIBUTE_NAME: [
                "John Smith", "Johnny", "J.S.", "Smith, John",
                "The Honourable John Smith",
            ]
        },
    )
    # sorted shortest-first; ", " names skipped; clean-id match sets contains
    assert nm.no_quotes_dupes_query(r) == (
        "(J.S.) OR (Johnny) OR (John Smith) OR (The Honourable John Smith)"
    )


def test_no_quotes_dupes_appends_clean_id_when_missing():
    r = nm.Resource(
        "http://kb.example/resource/Acme",
        {nm.ATTRIBUTE_NAME: ["Acme Corporation"]},
    )
    assert nm.no_quotes_dupes_query(r) == "(Acme Corporation) OR (Acme)"


def test_no_quotes_dupes_single_unparenthesized():
    r = nm.Resource(
        "http://kb.example/resource/Acme_Inc",
        {nm.ATTRIBUTE_NAME: ["Acme Inc"]},
    )
    assert nm.no_quotes_dupes_query(r) == "Acme Inc"


def test_no_quotes_dupes_budget_and_short_names():
    long_name = "x" * 195
    r = nm.Resource(
        "http://kb.example/resource/Foobar",
        {nm.ATTRIBUTE_NAME: [long_name, "Foobar", "Ab "]},
    )
    # long name skipped by the 200-char budget (skip, not break);
    # "Ab " skipped by trimmed length <= 3; single appended name -> bare
    assert nm.no_quotes_dupes_query(r) == "Foobar"
