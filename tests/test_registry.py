"""RDF parser registry (SURVEY.md §2.1 S7)."""

import pytest

from jsonld_spark.core.registry import (get_rdf_parser, parse_rdf,
                                        register_rdf_parser,
                                        remove_rdf_parser)


def test_nquads_registered_by_default():
    quads = parse_rdf('<http://s> <http://p> "o" .\n')
    assert len(quads) == 1 and quads[0].pred == "http://p"


def test_register_and_remove_custom_format():
    calls = []

    def parser(text):
        calls.append(text)
        return []

    register_rdf_parser("application/x-test", parser)
    assert parse_rdf("payload", "application/x-test") == []
    assert calls == ["payload"]
    remove_rdf_parser("application/x-test")
    with pytest.raises(ValueError):
        get_rdf_parser("application/x-test")
