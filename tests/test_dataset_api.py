"""Legacy processor options: useNamespaces + outputForm + format on the
toRDF/fromRDF entry points (JsonLdProcessor.java:407-487,525-561;
RDFDataset.java:396-457). Pure-core — no Spark session needed."""

from __future__ import annotations

import pytest

from jsonld_spark.core.context import JsonLdOptions
from jsonld_spark.core.dataset import RdfDataset, from_rdf, to_rdf
from jsonld_spark.core.errors import JsonLdError

DOC = {"@context": {"ex": "http://ex.org/",
                    "name": "http://ex.org/name"},
       "@id": "http://ex.org/a", "name": "Alice"}


def test_use_namespaces_harvests_context_prefixes():
    ds = to_rdf(DOC, JsonLdOptions(use_namespaces=True))
    assert ds.get_namespaces() == {"ex": "http://ex.org/"}
    # "" prefix maps back to @vocab in the usable context; note the
    # reference's getPrefixes never emits @vocab (its parseContext
    # @vocab branch is dead code, Context.java:858-880) — replicated
    ds2 = RdfDataset()
    ds2.parse_context({"@vocab": "http://v/"})
    assert ds2.get_context() == {}
    ds2.set_namespace("", "http://v/")
    assert ds2.get_context() == {"@vocab": "http://v/"}


def test_use_namespaces_off_by_default():
    assert to_rdf(DOC).get_namespaces() == {}


def test_format_nquads_serializes_sorted():
    nq = to_rdf(DOC, JsonLdOptions(format="application/n-quads"))
    assert nq == '<http://ex.org/a> <http://ex.org/name> "Alice" .\n'
    with pytest.raises(JsonLdError) as e:
        to_rdf(DOC, JsonLdOptions(format="text/turtle"))
    assert e.value.code == JsonLdError.UNKNOWN_FORMAT


def test_callback_receives_dataset():
    got = to_rdf(DOC, callback=lambda ds: len(ds.quads))
    assert got == 1


def test_from_rdf_string_default_nquads():
    out = from_rdf('<http://ex.org/a> <http://ex.org/name> "Alice" .\n')
    assert out == [{"@id": "http://ex.org/a",
                    "http://ex.org/name": [{"@value": "Alice"}]}]
    with pytest.raises(JsonLdError) as e:
        from_rdf("x", JsonLdOptions(format="text/turtle"))
    assert e.value.code == JsonLdError.UNKNOWN_FORMAT


def test_output_form_compacted_uses_harvested_namespaces():
    ds = to_rdf(DOC, JsonLdOptions(use_namespaces=True))
    out = from_rdf(ds, JsonLdOptions(output_form="compacted"))
    assert out == {"@context": {"ex": "http://ex.org/"},
                   "@id": "ex:a", "ex:name": "Alice"}


def test_output_form_flattened_and_expanded():
    ds = to_rdf(DOC, JsonLdOptions(use_namespaces=True))
    flat = from_rdf(ds, JsonLdOptions(output_form="flattened"))
    assert flat["@graph"] == [{"@id": "ex:a", "ex:name": "Alice"}]
    exp = from_rdf(ds, JsonLdOptions(output_form="expanded"))
    assert exp == from_rdf(ds)


def test_output_form_unknown_is_typed_error():
    ds = to_rdf(DOC)
    with pytest.raises(JsonLdError) as e:
        from_rdf(ds, JsonLdOptions(output_form="bogus"))
    assert e.value.code == "unknown error"


def test_from_rdf_rejects_unreadable_input():
    with pytest.raises(JsonLdError) as e:
        from_rdf(42)
    assert e.value.code == JsonLdError.INVALID_INPUT


def test_normalize_entry_point():
    from jsonld_spark.core.dataset import RdfDataset, normalize
    doc = {"@context": {"p": "http://e/p"}, "p": {"p": "leaf"}}
    nq = normalize(doc, JsonLdOptions(format="application/nquads"))
    assert nq == ('_:c14n0 <http://e/p> "leaf" .\n'
                  '_:c14n1 <http://e/p> _:c14n0 .\n')
    ds = normalize(doc)
    assert isinstance(ds, RdfDataset) and len(ds.quads) == 2
    assert {q.subj for q in ds.quads} == {"_:c14n0", "_:c14n1"}
    with pytest.raises(JsonLdError) as e:
        normalize(doc, JsonLdOptions(format="text/turtle"))
    assert e.value.code == JsonLdError.UNKNOWN_FORMAT
