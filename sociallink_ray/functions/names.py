"""KB-entity model + name/query compilation kernels.

Re-expresses the reference's ``DBpediaResource`` attribute accessors
(reference: alignments/.../DBpediaResource.java:59-167) and the five
query-assembly strategies (query/index/AllNamesStrategy.java:38-144,
query/StrictStrategy.java:16-46, query/StrictQuotesStrategy.java,
query/StrictWithTopicStrategy.java, query/NoQuotesDupesStrategy.java:16-63,
factory query/QueryAssemblyStrategyFactory.java:28-41).

In the Ray engine a "query" is not a Postgres tsquery string but the
list of normalized name keys probed against the broadcast inverted
index; ``*_keys`` functions return those. ``all_names_query`` keeps the
reference's literal string format so the golden tests from
AllNamesStrategyTest.java:20-57 carry over verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .textnorm import normalize_fullname

# Attribute URIs (DBpediaResource.java:19-58)
ONTO = "http://dbpedia.org/ontology/"
PROP = "http://dbpedia.org/property/"
WD = "http://www.wikidata.org/entity/"
ALIGN = "http://alignments.futuro.media/ontology#"

ATTRIBUTE_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
ATTRIBUTE_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
ATTRIBUTE_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"
ATTRIBUTE_NAME = "http://xmlns.com/foaf/0.1/name"
ATTRIBUTE_GIVEN_NAME = "http://xmlns.com/foaf/0.1/givenName"
ATTRIBUTE_SURNAME = "http://xmlns.com/foaf/0.1/surname"
ATTRIBUTE_ABSTRACT = ONTO + "abstract"
ALIGNMENTS_PERSON = ALIGN + "Person"
ALIGNMENTS_ORGANISATION = ALIGN + "Organisation"

DEAD_PERSON_ATTRIBUTES = (
    ONTO + "deathDate", WD + "P570", ONTO + "deathPlace", WD + "P20",
    ONTO + "deathCause", WD + "P509", ONTO + "causeOfDeath", ONTO + "deathYear",
)
DEAD_COMPANY_ATTRIBUTES = (
    ONTO + "extinctionYear", ONTO + "extinctionDate", ONTO + "closingYear",
    PROP + "defunct", PROP + "close", PROP + "closed",
)

_TOPIC_RE = re.compile(r".+_\([A-Za-z_]+\)$")
_TOPIC_STRICT_RE = re.compile(r".+_\([A-Za-z]+\)$")
_QID_RE = re.compile(r"Q[0-9]+$")


@dataclass
class Resource:
    """KB entity: id + predicate->values map (DBpediaResource.java:59-65)."""

    identifier: str
    attributes: dict[str, list[str]] = field(default_factory=dict)

    def prop(self, key: str) -> list[str]:
        return list(self.attributes.get(key) or [])

    @property
    def names(self) -> list[str]:
        return self.prop(ATTRIBUTE_NAME)

    @property
    def labels(self) -> list[str]:
        return self.prop(ATTRIBUTE_LABEL)

    @property
    def given_names(self) -> list[str]:
        return self.prop(ATTRIBUTE_GIVEN_NAME)

    @property
    def surnames(self) -> list[str]:
        return self.prop(ATTRIBUTE_SURNAME)

    def has_property(self, rel: str, value: str) -> bool:
        return value in (self.attributes.get(rel) or ())

    @property
    def is_person(self) -> bool:  # DBpediaResource.java:87-89
        return self.has_property(ATTRIBUTE_TYPE, ALIGNMENTS_PERSON)

    @property
    def is_company(self) -> bool:  # :91-93
        return self.has_property(ATTRIBUTE_TYPE, ALIGNMENTS_ORGANISATION)

    @property
    def is_other(self) -> bool:  # :95-97
        return not (self.is_person or self.is_company)

    @property
    def is_dead(self) -> bool:  # :99-111
        return any(a in self.attributes for a in DEAD_PERSON_ATTRIBUTES) or any(
            a in self.attributes for a in DEAD_COMPANY_ATTRIBUTES
        )

    def _id_from_resource_id(self) -> str:  # :144-151
        loc = self.identifier.rfind("resource/")
        if loc == -1:
            return ""
        return self.identifier[loc + len("resource/"):]

    @property
    def clean_resource_id(self) -> str:  # :126-132
        filtered = self._id_from_resource_id()
        if _TOPIC_RE.match(filtered):
            filtered = filtered[: filtered.rfind("_(")]
        return filtered.replace("_", " ")

    @property
    def topic(self) -> str:  # :134-142
        filtered = self._id_from_resource_id()
        if not _TOPIC_STRICT_RE.match(filtered):
            return ""
        return filtered[filtered.rfind("_(") + 2 : -1].replace("_", " ")


# --- AllNamesStrategy (AllNamesStrategy.java:38-144) ----------------------

NAMES_THRESHOLD = 3


def _cleaned_up_name(name: str) -> str:
    """Quote a name, collapsing whitespace/apostrophe runs to one space
    (AllNamesStrategy.java:127-144)."""
    out = ["'"]
    ws = False
    for ch in name:
        if ch.isspace() or ch == "'":
            if not ws:
                ws = True
                out.append(" ")
            continue
        ws = False
        out.append(ch)
    out.append("'")
    return "".join(out)


def compile_names(resource: Resource, exclude_shortest: int = 0) -> dict[str, int]:
    """Name -> multiplicity map (AllNamesStrategy.java:69-117): names +
    labels + clean id (unless a wikidata Q-id); lowercased/trimmed; <3
    chars dropped; person ``Last, First`` swapped (3+ parts dropped);
    given-name-only / surname-only forms dropped; the ``exclude_shortest``
    shortest names removed (the strategy's constructor knob — NOT the
    per-retry ``option``, which only shrinks the name budget;
    AllNamesStrategy.java:18,103-117)."""
    exclude_names = exclude_shortest
    names = resource.names + resource.labels
    given = [n.lower() for n in resource.given_names]
    sur = [n.lower() for n in resource.surnames]
    clean_id = resource.clean_resource_id
    if clean_id and not _QID_RE.fullmatch(clean_id):
        names.append(clean_id)

    counts: dict[str, int] = {}
    is_person = resource.is_person
    for name in names:
        name = name.strip().lower()
        if len(name) < 3:
            continue
        if is_person and ", " in name:
            parts = name.split(", ")
            if len(parts) > 2:
                continue
            name = parts[1] + " " + parts[0]
        if name in given or name in sur:
            continue
        counts[name] = counts.get(name, 0) + 1

    if exclude_names > 0:
        if len(counts) <= exclude_names:
            return {}
        by_len = sorted(counts.keys(), key=len)
        for key in by_len[:exclude_names]:
            del counts[key]
    return counts


def all_names_query(
    resource: Resource, option: int = 0, exclude_shortest: int = 0
) -> str:
    """Reference-format query string (AllNamesStrategy.java:38-67);
    golden cases from AllNamesStrategyTest.java:20-57. ``option`` is the
    retry-widening rung: it narrows the budget ``remaining`` but not the
    compiled name set."""
    counts = compile_names(resource, exclude_shortest)
    excl = exclude_shortest + option
    # stable sort by multiplicity desc (Java sort is stable on insertion order)
    ordered = sorted(counts.items(), key=lambda kv: -kv[1])
    remaining = min(NAMES_THRESHOLD - excl, max(len(ordered) - excl, 0))
    if not ordered:
        return _cleaned_up_name(resource.clean_resource_id)
    if len(ordered) == 1 or remaining < 2:
        return _cleaned_up_name(ordered[0][0])
    parts = []
    for name, _ in ordered:
        parts.append(_cleaned_up_name(name))
        remaining -= 1
        if remaining == 0:
            break
    return "(" + ") | (".join(parts) + ")"


def all_names_keys(resource: Resource, option: int = 0) -> list[str]:
    """Index-probe keys for the broadcast inverted index: the same names
    AllNamesStrategy would query, normalized with ``normalize_fullname``
    (the engine's replacement for the Postgres tsquery round-trip)."""
    counts = compile_names(resource)
    ordered = sorted(counts.items(), key=lambda kv: -kv[1])
    remaining = min(NAMES_THRESHOLD - option, max(len(ordered) - option, 0))
    if not ordered:
        key = normalize_fullname(resource.clean_resource_id)
        return [key] if key else []
    if len(ordered) == 1 or remaining < 2:
        return [normalize_fullname(ordered[0][0])]
    keys = []
    for name, _ in ordered[: max(remaining, 1)]:
        keys.append(normalize_fullname(name))
    return keys


def strict_name(resource: Resource) -> str:
    """Most frequent non-``Last, First`` name (StrictStrategy.java:16-46)."""
    names = resource.names
    clean_id = resource.clean_resource_id
    if clean_id:
        names.append(clean_id)
    counts: dict[str, int] = {}
    is_person = resource.is_person
    for name in names:
        if is_person and ", " in name:
            continue
        counts[name] = counts.get(name, 0) + 1
    max_key, max_count = None, 0
    for key, cnt in counts.items():
        if cnt > max_count:
            max_count, max_key = cnt, key
    return clean_id if max_key is None else max_key


def strict_with_topic(resource: Resource) -> str:
    """Strict name + ``topic`` disambiguator when present
    (StrictWithTopicStrategy.java:11-23)."""
    name = strict_name(resource)
    topic = resource.topic
    return f"{name} {topic}" if topic else name


def strict_quotes_query(resource: Resource) -> str:
    """Strict name wrapped in double quotes — an exact-phrase query
    (StrictQuotesStrategy.java:10-16)."""
    return '"' + strict_name(resource) + '"'


def levenshtein(a: str, b: str) -> int:
    """Plain edit distance (insert/delete/substitute, all cost 1) —
    the semantics of the reference's utils LevenshteinDistance used by
    NoQuotesDupesStrategy.java:25."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


NO_QUOTES_BUDGET = 200


def no_quotes_dupes_query(resource: Resource) -> str:
    """Length-capped OR-list of names (NoQuotesDupesStrategy.java:16-63):
    names sorted shortest-first (stable); a name containing ``", "`` or
    <=3 chars trimmed is skipped; a name that would push the builder past
    200 chars (+6 for the ``") OR ("`` glue) is skipped but NOT a loop
    break; the clean resource id is appended iff no accepted name equals
    it or sits within Levenshtein distance 1 of it (or nothing was
    accepted at all). Single-name queries are unparenthesized."""
    names = sorted(resource.names, key=len)
    clean_id = resource.clean_resource_id
    parts: list[str] = []
    contains = False
    appended = 0
    length = 0  # StringBuilder length in the reference

    for name in names:
        if clean_id == name or levenshtein(name.strip(), clean_id.strip()) <= 1:
            contains = True
        if ", " in name or len(name.strip()) <= 3:
            continue
        if length + len(name) + 6 > NO_QUOTES_BUDGET:
            continue
        if not name:
            appended += 1
            continue
        appended += 1
        if parts:
            length += 6  # ") OR ("
        parts.append(name)
        length += len(name)

    if length == 0 or not contains:
        appended += 1
        if clean_id:
            if parts:
                length += 6
            parts.append(clean_id)
            length += len(clean_id)

    body = ") OR (".join(parts)
    if appended == 1:
        return body
    return "(" + body + ")"
