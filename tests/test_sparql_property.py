"""Property-based round-trip for the SPARQL text parser: render a
random query AST to SPARQL source, parse it back, and the compiled
pattern structures must match exactly. Parser-level only (no Spark) —
execution equivalence is pinned by test_sparql.py against the algebra.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from jsonld_spark.operators.kg import RDF_TYPE
from jsonld_spark.operators.sparql import _Parser

EX = "http://example.org/"

_local = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,6}", fullmatch=True)
_var = st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True)
# literal content: printable minus quote/backslash (escaping is covered
# by the explicit tests; the property targets structure, not escapes)
_lit = st.text(
    st.characters(min_codepoint=32, max_codepoint=126,
                  blacklist_characters="'\"\\"),
    min_size=0, max_size=12)


@st.composite
def _term(draw, allow_literal=True):
    kind = draw(st.sampled_from(
        ["var", "iri", "pname"] + (["lit", "num"] if allow_literal else [])))
    if kind == "var":
        v = draw(_var)
        return "?" + v, "?" + v
    if kind == "iri":
        loc = draw(_local)
        return f"<{EX}{loc}>", EX + loc
    if kind == "pname":
        loc = draw(_local)
        return "ex:" + loc, EX + loc
    if kind == "num":
        n = draw(st.integers(0, 10 ** 6))
        return str(n), str(n)
    s = draw(_lit)
    return "'" + s + "'", s


@st.composite
def _predicate(draw):
    kind = draw(st.sampled_from(["var", "iri", "a", "path"]))
    if kind == "var":
        v = draw(_var)
        return "?" + v, "?" + v
    if kind == "a":
        return "a", RDF_TYPE
    if kind == "iri":
        loc = draw(_local)
        return "ex:" + loc, EX + loc
    # a one-operator path: base IRI plus ^ prefix or +*? suffix
    loc = draw(_local)
    op = draw(st.sampled_from(["^", "+", "*", "?"]))
    if op == "^":
        return f"^ex:{loc}", f"^<{EX}{loc}>"
    return f"ex:{loc}{op}", f"<{EX}{loc}>{op}"


@st.composite
def _pattern(draw):
    s_txt, s_val = draw(_term(allow_literal=False))
    p_txt, p_val = draw(_predicate())
    o_txt, o_val = draw(_term())
    return f"{s_txt} {p_txt} {o_txt} .", (s_val, p_val, o_val)


@given(st.lists(_pattern(), min_size=1, max_size=5),
       st.booleans())
@settings(max_examples=200, deadline=None)
def test_parser_roundtrip(pats, use_select_star):
    body = "\n        ".join(txt for txt, _ in pats)
    want = [tup for _, tup in pats]
    sel = "*" if use_select_star else "?q"
    q = _Parser(
        f"PREFIX ex: <{EX}> SELECT {sel} WHERE {{ {body} }}").parse()
    assert q.where.patterns == want


@given(st.lists(st.tuples(_var, st.one_of(st.none(), _lit)),
                min_size=1, max_size=3, unique_by=lambda t: t[0]))
@settings(max_examples=100, deadline=None)
def test_values_roundtrip(cells):
    vars_txt = " ".join("?" + v for v, _ in cells)
    row_txt = " ".join("UNDEF" if val is None else "'" + val + "'"
                       for _, val in cells)
    q = _Parser(
        f"SELECT * WHERE {{ ?s ?p ?o VALUES ({vars_txt}) "
        f"{{ ({row_txt}) }} }}").parse()
    assert q.where.values == [{v: val for v, val in cells}]


@given(st.text(
    alphabet="SELECT WHERE{}()[]?ab_;<>:'\".|^+*/!=&#\n\t 0123456789",
    min_size=0, max_size=80))
@settings(max_examples=500, deadline=None)
def test_parser_never_crashes(text):
    """Arbitrary input must parse or raise a typed error — never an
    unhandled exception class, never a hang."""
    from jsonld_spark.operators.sparql import (SparqlSyntaxError,
                                               SparqlUnsupportedError)
    try:
        _Parser(text).parse()
    except (SparqlSyntaxError, SparqlUnsupportedError, ValueError):
        pass


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_unicode(text):
    from jsonld_spark.operators.sparql import (SparqlSyntaxError,
                                               SparqlUnsupportedError)
    try:
        _Parser("SELECT * WHERE { " + text).parse()
    except (SparqlSyntaxError, SparqlUnsupportedError, ValueError):
        pass


_FUZZ_WORDS = [
    "SELECT", "ASK", "WHERE", "OPTIONAL", "FILTER", "EXISTS", "NOT",
    "MINUS", "UNION", "BIND", "VALUES", "GROUP", "BY", "AS", "ORDER",
    "HAVING", "LIMIT", "DISTINCT", "COUNT", "STRLEN", "UCASE",
    "sameTerm", "{", "}", "(", ")", "||", "&&", "!", ".", ";", "=",
    "?a", "?b", "?k", "<http://x/p>", "'lit'", "1", "*", "UNDEF",
]


@given(st.lists(st.sampled_from(_FUZZ_WORDS), min_size=0, max_size=24))
@settings(max_examples=400, deadline=None)
def test_parser_never_crashes_keyword_soup(words):
    """Keyword-level fuzz: random sequences of real SPARQL tokens
    reach deep grammar paths (nested OPTIONAL, expression-embedded
    EXISTS, GROUP BY expressions) that character soup rarely hits —
    still only typed errors, never a crash or hang."""
    from jsonld_spark.operators.sparql import (SparqlSyntaxError,
                                               SparqlUnsupportedError)
    try:
        _Parser(" ".join(words)).parse()
    except (SparqlSyntaxError, SparqlUnsupportedError, ValueError):
        pass
