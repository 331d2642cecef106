"""SPARQL 1.1 text front-end over the relational KG algebra.

The reference library (jsonld-java) stops at RDF dataset production —
it has no query language. This engine's query surface (``kg.bgp_match``
/ ``construct`` / ``ask`` / ``describe`` and the path algebra) covers
the SPARQL algebra programmatically; this module adds the missing
user-facing layer: parse SPARQL *query text* and compile it onto those
operators, so a user can run the same query string here that they
would hand to any SPARQL endpoint over the reference's output.

Supported subset (each construct maps 1:1 onto an existing operator,
so the compiled plan is identical to the hand-written call):

* ``PREFIX`` / ``BASE`` prologue, ``a`` == ``rdf:type``
* ``SELECT [DISTINCT] ?v ... | * | (expr AS ?alias)`` with
  ``GROUP BY`` / ``HAVING`` / ``ORDER BY`` (vars, ``ASC/DESC(expr)``,
  bracketted or builtin-call expression conditions) / ``LIMIT`` /
  ``OFFSET``
  and the SPARQL aggregates ``COUNT / SUM / AVG / MIN / MAX /
  SAMPLE / GROUP_CONCAT`` (GROUP_CONCAT is made deterministic by
  sorting the group's values — SPARQL leaves the order undefined);
  aggregates may appear directly inside HAVING constraints (hidden
  aggregate columns, dropped after the filter)
* ``ASK`` / ``CONSTRUCT { template } WHERE`` / ``DESCRIBE <node>``
* triple patterns with ``;`` / ``,`` predicate-object lists,
  property-path predicates (``^ / | + * ?`` and ``!`` negated sets
  — the full kg_path grammar), ``GRAPH <g>|?g { ... }``
* ``OPTIONAL { ... }`` — single- and multi-pattern groups (a
  multi-pattern group is evaluated as a unit per SPARQL leftjoin:
  its patterns inner-join among themselves, then the joined group
  left-joins the solutions); group-scoped ``FILTER`` inside the
  OPTIONAL body — SPARQL leftjoin's expr argument: a filter over
  group variables pre-filters the group, one referencing OUTER
  variables conditions the left join itself (compiled as the
  join's residual condition; over nullable shared variables it
  raises); an OPTIONAL body
  that is a ``{ A } UNION { B }`` block compiles to
  LeftJoin(rest, Union(A, B)) — a shared join variable must be
  bound by every branch (else a typed error); nested
  ``OPTIONAL { ... }`` members inside an OPTIONAL body (any depth,
  UNION bodies allowed inside) compile to a recursive left-join
  tree evaluated as a unit — a variable bound only by an inner
  OPTIONAL is nullable in the group's solutions, so using it as
  the outer join key raises the same typed error, and a body that
  is ONLY a nested OPTIONAL (no required part) raises;
  ``BIND (expr AS ?v)`` members inside an OPTIONAL body (SPARQL
  Extend over the group's solutions, applied before the group's
  FILTERs, UNION bodies allowed) — a bind variable may evaluate
  to null, so using it as the outer join key raises too;
  ``FILTER [NOT] EXISTS`` / ``MINUS`` / ``VALUES`` members inside
  an OPTIONAL body (the full group compiles through a recursive
  ``bgp_match`` on the optional side — a rejected group row leaves
  the optional variables null instead of dropping the outer
  solution; a negation member referencing an OUTER-only variable
  raises, as correlation would need a conditional left join);
  subqueries as OPTIONAL-body members, including a subquery as the
  ONLY member (the attach-an-aggregate idiom: the subquery's
  solution set seeds the group) — a subquery-bound variable outside
  the subquery's own nullable set is provably non-null and accepted
  as the outer join key
* ``FILTER expr`` (compiled to a Spark SQL boolean — the same string
  ``bgp_match(filters=...)`` takes); ``[NOT] EXISTS { ... }`` may be
  EMBEDDED in the expression (``FILTER(?a = 'x' || EXISTS {...})``,
  ``!EXISTS`` too) — each occurrence compiles to a marker left join
  against the group's distinct shared-key set (EXISTS as a value in
  a boolean expression cannot be a semi/anti join); standalone
  ``FILTER [NOT] EXISTS { ... }`` keeps the semi/anti-join plan,
  ``MINUS { ... }``, ``VALUES`` (both forms, ``UNDEF`` wildcards,
  in-group AND the trailing ValuesClause after solution modifiers),
  ``BIND (expr AS ?v)``; a [NOT] EXISTS / MINUS body that is a
  ``{ A } UNION { B }`` block: NOT EXISTS and MINUS distribute over
  UNION (per-branch anti joins — exact); EXISTS is an OR, planned as
  marker left joins against each branch's distinct key set
* a WHERE clause that is entirely ``{ BGP } UNION { BGP } ...``
  compiles to ``bgp_union``; ``CONSTRUCT`` over such a UNION
  instantiates the template per branch and unions the graphs;
  UNION branches accept group-scoped ``FILTER`` members (applied to
  the branch's solutions BEFORE the null-padding union — a filter
  referencing a variable the branch does not bind raises typed, as
  the variable is out of scope there per SPARQL); term-metadata
  builtins in branch filters and over union-bound variables work in
  the complete-union SELECT/ASK/CONSTRUCT/DESCRIBE forms (each
  branch emits the metadata of the vars it binds; a non-binding
  branch pads null — LANG of unbound is a type error → NULL) and
  reject typed in group-body/inline unions
* ``FROM <g>`` / ``FROM NAMED <g>`` dataset clauses (§13.2) in all
  four query forms — one pushed graph-column ``isin`` filter.
  Supported scopes: FROM alone (patterns match the merged default
  graph; GRAPH clauses refuse typed) and FROM NAMED alone (every
  pattern must sit inside GRAPH); FROM + FROM NAMED together
  refuses (two scan scopes); subqueries reject dataset clauses per
  the SubSelect grammar
* ``[NOT] EXISTS`` / ``MINUS`` bodies accept FULL group bodies:
  nested ``FILTER [NOT] EXISTS`` / ``MINUS`` (the double-negation /
  forall idiom), ``BIND``, ``VALUES``, inner ``OPTIONAL``, and
  UNION bodies WITH per-branch filters and BINDs (Extend
  distributes over Union) — compiled through a recursive
  ``bgp_match``; a nested member referencing an OUTER variable
  raises typed (correlation through nesting), and a variable shared
  with the outer solutions that the body binds only through an
  inner OPTIONAL / non-rename BIND / UNDEF-able VALUES raises typed
  (the equality join would diverge from substitution semantics)
* ``REGEX`` / ``REPLACE`` flags ``i`` / ``s`` / ``m`` (Java inline
  ``(?ism)``) and ``q`` (literal pattern → substring containment /
  plain replace; ``iq`` folds case); ``x`` refuses — Java's ``(?x)``
  treats ``#`` as a comment, silently diverging from fn:matches;
  ``SUM/AVG(DISTINCT expr)`` aggregate the distinct value multiset
* SPARQL 1.1 subqueries ``{ SELECT ... }`` as group members —
  compiled bottom-up (§18.2.2) and joined to the group's solutions
  on the shared variables (``bgp_match``'s ``solution_joins``); a
  scalar aggregate subquery (no GROUP BY — the ``MAX``-argmax idiom)
  joins disjoint via broadcast. Subqueries projecting possibly-
  unbound variables used as join keys raise rather than mis-join.
  Subqueries are also accepted inside ``FILTER [NOT] EXISTS`` and
  ``MINUS`` bodies (each compiles independently — substitution does
  not descend into subqueries, so a subquery-only variable shared
  with the outer solutions raises typed instead of being wrongly
  constrained)
* blank nodes in patterns: ``_:label``, ``[]`` and
  ``[ p1 o1 ; p2 o2 ]`` property lists (nesting allowed) compile to
  non-distinguished variables + desugared patterns (``SELECT *``
  does not project them); template blank nodes raise
* term-test builtins LANG / DATATYPE / isIRI / isLiteral / isBlank /
  LANGMATCHES / sameTerm over the quad frame's kind/lang/datatype
  columns
  (``bgp_match(meta_vars=...)``), plus STRBEFORE / STRAFTER /
  ENCODE_FOR_URI / MD5 / SHA1 / SHA256/384/512 and IRI()/URI()
  (identity on the stored lexical IRI — enables skolem templates)
* dateTime accessors YEAR / MONTH / DAY / HOURS / MINUTES / SECONDS
  (§17.4.5) over the stored lexical form via ``try_cast`` — a
  malformed lexical value is a SPARQL type error → NULL, never a
  task-failing ANSI cast error; SECONDS returns whole seconds

Deviations / limits (all raise a clear error, never mis-execute):
SERVICE, nested GRAPH, subqueries inside expression-embedded EXISTS
(and any body mixing UNION with other members, subqueries included,
raises the UNION-mixed error),
a variable referenced in SELECT / FILTER / BIND but never bound in
its scope (SPARQL evaluates it as a per-solution type error, usually
yielding an empty result; this engine refuses typed rather than
silently returning nothing),
nondeterministic builtins (NOW / UUID / STRUUID / RAND / BNODE — a
retried Spark task would re-evaluate them, breaking reproducibility),
TZ / TIMEZONE (lexical forms carry no normalized offset), STRLANG /
STRDT, and FROM combined with FROM NAMED or GRAPH
are not supported. A UNION block mixed
with other group members compiles to Join(Union(branches), rest) via
a solution join (a variable not bound by every branch is nullable;
using one as the join key, or in a term-metadata builtin, raises).
ASK over any group shape — including OPTIONAL / BIND / subqueries /
inline UNION — compiles through the SELECT machinery under
``limit(1)``. Expression
translation casts a variable compared against a numeric literal to
``double``, and ``xsd:integer(?v)``-style constructors cast
explicitly (SPARQL compares typed values; the triples frame stores
lexical forms — a bare var-to-var comparison is lexicographic).
GROUP BY and projected DISTINCT likewise group/dedup on the LEXICAL
value: with ``meta_vars`` the solution set keeps literals differing
only in language/datatype as distinct TERMS, but a subsequent
``GROUP BY ?o`` merges them into one lexical group (project
``(LANG(?o) AS ?l)`` and group by both to group by term).
Plain SELECT defaults to set semantics (the engine-wide documented
deviation; pass ``distinct_solutions=False`` for bag semantics on
pre-deduplicated warehouse tables).

Reference for the algebra mapping: SPARQL 1.1 Query, §18 (algebra),
§8 (negation), §10.2 (VALUES). Reference parity anchor: the triples
these queries run over are produced per jsonld-java's
``core/RDFDataset.java`` quad model (see operators/materialize.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F

from .kg import META_SUFFIXES, RDF_TYPE, _expr_identifiers, \
    _optional_entry_vars as _kg_optional_entry_vars, ask as _ask, \
    bgp_match, bgp_union, construct, describe, describe_nodes

_META_SUFFIXES = tuple(META_SUFFIXES)

__all__ = ["sparql_query", "SparqlSyntaxError", "SparqlUnsupportedError"]


def _join_values_tables(a: list[dict], b: list[dict]) -> list[dict]:
    """SPARQL joins multiple VALUES blocks in one group (each is an
    inline solution table): compatible rows (equal on shared vars,
    UNDEF = wildcard that takes the other side's binding) merge;
    incompatible pairs drop. Literal tables are tiny — pure Python."""
    if not a:
        return b
    if not b:
        return a
    out: list[dict] = []
    for r1 in a:
        for r2 in b:
            ok = all(r1[v] is None or r2[v] is None or r1[v] == r2[v]
                     for v in set(r1) & set(r2))
            if ok:
                merged = dict(r1)
                for v, val in r2.items():
                    if merged.get(v) is None:
                        merged[v] = val
                out.append(merged)
    return out


class SparqlSyntaxError(ValueError):
    """The query text does not parse under the SPARQL grammar."""


class SparqlUnsupportedError(NotImplementedError):
    """Legal SPARQL outside this front-end's compiled subset."""


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z_0-9]*)
  | (?P<STRING3>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"
      |'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<NUMBER>(?:\d+\.\d*[eE][+-]?\d+|\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>[A-Za-z_][A-Za-z_0-9.-]*?:
      (?:[A-Za-z_0-9](?:[A-Za-z_0-9.-]*[A-Za-z_0-9-])?)?
      |:(?:[A-Za-z_0-9](?:[A-Za-z_0-9.-]*[A-Za-z_0-9-])?)?)
  | (?P<NAME>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<OP>\^\^|&&|\|\||!=|<=|>=|[{}()\[\];.,*/|^+?!=<>-])
""", re.VERBOSE)

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# blank-node labels in patterns compile to variables with this prefix:
# non-distinguished per SPARQL — joined where repeated, never projected
# by SELECT *
_BNODE_VAR_PREFIX = "_bn_"

_KEYWORDS = {
    "select", "distinct", "reduced", "where", "optional", "filter",
    "union", "minus", "exists", "not", "values", "bind", "as", "graph",
    "construct", "ask", "describe", "prefix", "base", "group", "by",
    "having", "order", "asc", "desc", "limit", "offset", "undef", "in",
    "a", "true", "false", "from", "named",
}


@dataclass
class _Tok:
    kind: str          # IRIREF VAR STRING LANGTAG NUMBER PNAME NAME OP KW EOF
    value: str
    pos: int


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if m is None:
            raise SparqlSyntaxError(
                f"unexpected character {text[i]!r} at offset {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        val = m.group()
        if kind == "STRING3":
            kind = "STRING"
        if kind == "NAME" and val.lower() in _KEYWORDS:
            toks.append(_Tok("KW", val.lower(), m.start()))
        else:
            toks.append(_Tok(kind, val, m.start()))
    toks.append(_Tok("EOF", "", len(text)))
    return toks


def _unquote(s: str) -> str:
    if s.startswith('"""') or s.startswith("'''"):
        body = s[3:-3]
    else:
        body = s[1:-1]
    return body.encode("raw_unicode_escape").decode("unicode_escape") \
        if "\\" in body else body


# ---------------------------------------------------------------------------
# Parsed structures
# ---------------------------------------------------------------------------

@dataclass
class _Group:
    """One GroupGraphPattern, flattened to the algebra's argument
    shape (matches bgp_match's keyword surface)."""
    patterns: list[tuple] = field(default_factory=list)
    optional: list[tuple] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)
    not_exists: list[list[tuple]] = field(default_factory=list)
    exists: list[list[tuple]] = field(default_factory=list)
    minus: list[list[tuple]] = field(default_factory=list)
    values: list[dict] = field(default_factory=list)
    binds: list[tuple[str, str]] = field(default_factory=list)
    # FILTERs whose expression embeds [NOT] EXISTS markers:
    # {'expr': sql, 'markers': [(name, group_entry, negated), ...]}
    filter_exists: list[dict] = field(default_factory=list)
    union_branches: list[list[tuple]] | None = None
    # per-branch group-scoped FILTERs (parallel to union_branches):
    # applied to the branch's solutions BEFORE null-padding/union
    union_branch_filters: list[list[str]] | None = None
    # UNION blocks mixed with other group members: each entry is one
    # { A } UNION { B } ... block's branch list, compiled to a
    # solution join — algebra Join(Union(A, B), rest-of-group)
    inline_unions: list[list[list[tuple]]] = field(default_factory=list)
    # parallel per-block, per-branch FILTER lists for inline_unions
    inline_union_filters: list[list[list[str]]] = field(
        default_factory=list)
    subqueries: list["_Query"] = field(default_factory=list)


@dataclass
class _Body:
    """Parsed members of an OPTIONAL / [NOT] EXISTS / MINUS group
    body (what ``_filtered_body`` returns)."""
    pats: list[tuple] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)
    union: list[list[tuple]] | None = None
    # per-branch FILTERs parallel to ``union`` (None when none)
    union_branch_filters: list[list[str]] | None = None
    nested: list = field(default_factory=list)
    binds: list[tuple[str, str]] = field(default_factory=list)
    not_exists: list = field(default_factory=list)
    exists: list = field(default_factory=list)
    minus: list = field(default_factory=list)
    values: list[dict] = field(default_factory=list)
    subqueries: list = field(default_factory=list)


@dataclass
class _Query:
    form: str                       # select | ask | construct | describe
    where: _Group | None = None
    select: list[tuple[str | None, str]] | None = None  # (sql_expr|None=var, name)
    select_star: bool = False
    distinct: bool = True
    group_by: list[str] = field(default_factory=list)
    having: list[str] = field(default_factory=list)
    having_aggs: list[tuple] = field(default_factory=list)  # (alias, spec)
    order_by: list[tuple[str, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    template: list[tuple] | None = None
    describe_node: str | None = None
    describe_nodes: list[str] | None = None
    describe_var: str | None = None
    aggregates: list[tuple[Any, str]] = field(default_factory=list)
    post_values: list[dict] = field(default_factory=list)
    # dataset clauses: FROM <g> (default-graph merge) / FROM NAMED <g>
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_AGG_FUNCS = {"count", "sum", "avg", "min", "max", "sample",
              "group_concat"}


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self._anon_bn = 0
        # patterns produced by desugaring [ p o ] blank-node property
        # lists; drained into the enclosing triples block
        self._bn_buf: list[tuple] = []
        # inside a HAVING constraint, aggregate calls are legal: they
        # compile to hidden aggregate columns on the current query
        self._having_q = None
        # variables whose term metadata (kind/lang/datatype columns)
        # the compiled expressions reference — LANG(?x) etc.; passed
        # to bgp_match(meta_vars=...) at compile time
        self.meta_vars: set[str] = set()
        # [NOT] EXISTS embedded in a FILTER expression: allowed only
        # while a group-level FILTER is being parsed (the flag), each
        # occurrence allocating a marker (name, group_entry, negated)
        # that bgp_match(filter_exists=...) materializes as a boolean
        # column the expression references
        self._allow_exists = False
        self._exists_markers: list[tuple[str, object, bool]] = []
        self._fx_n = 0

    # -- token helpers ----------------------------------------------------
    def _peek(self, ahead: int = 0) -> _Tok:
        j = min(self.i + ahead, len(self.toks) - 1)
        return self.toks[j]

    def _next(self) -> _Tok:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def _expect(self, kind: str, value: str | None = None) -> _Tok:
        t = self._next()
        if t.kind != kind or (value is not None and t.value != value):
            want = value or kind
            raise SparqlSyntaxError(
                f"expected {want!r}, got {t.value!r} at offset {t.pos}")
        return t

    def _at_kw(self, *words: str) -> bool:
        t = self._peek()
        return t.kind == "KW" and t.value in words

    def _eat_kw(self, *words: str) -> bool:
        if self._at_kw(*words):
            self._next()
            return True
        return False

    # -- terms ------------------------------------------------------------
    def _expand_pname(self, pname: str, pos: int) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(
                f"undeclared prefix {pfx!r}: at offset {pos}")
        return self.prefixes[pfx] + local

    _SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")

    def _iri(self, t: _Tok) -> str:
        if t.kind == "IRIREF":
            iri = t.value[1:-1]
            if self.base and not iri.startswith("_:") \
                    and not self._SCHEME_RE.match(iri):
                # RFC 3986 resolution (what every SPARQL engine does),
                # not string concatenation
                from urllib.parse import urljoin
                return urljoin(self.base, iri)
            return iri
        if t.kind == "PNAME":
            return self._expand_pname(t.value, t.pos)
        raise SparqlSyntaxError(
            f"expected IRI, got {t.value!r} at offset {t.pos}")

    def _term(self, position: str) -> str:
        """One subject/object/graph term → the algebra's string form
        (``?var`` kept, IRIs expanded without brackets, literals as
        their lexical value)."""
        t = self._next()
        if t.kind == "VAR":
            return "?" + t.value[1:]
        if t.kind == "PNAME" and t.value.startswith("_:"):
            # blank-node label: per SPARQL a non-distinguished variable
            # (never projected by SELECT *); one variable per label, so
            # repeated uses within the query join as the spec requires
            return "?" + _BNODE_VAR_PREFIX + t.value[2:]
        if t.kind in ("IRIREF", "PNAME"):
            return self._iri(t)
        if t.kind == "STRING":
            val = _unquote(t.value)
            # @lang / ^^datatype tags don't change the stored lexical
            # form in the single obj_value column — consume and drop
            if self._peek().kind == "LANGTAG":
                self._next()
            elif self._peek().kind == "OP" and self._peek().value == "^^":
                self._next()
                self._iri(self._next())
            return val
        if t.kind == "NUMBER":
            return t.value
        if t.kind == "OP" and t.value in ("-", "+") \
                and self._peek().kind == "NUMBER":
            num = self._next().value
            return num if t.value == "+" else "-" + num
        if t.kind == "KW" and t.value in ("true", "false"):
            return t.value
        if t.kind == "OP" and t.value == "[":
            if self._peek().kind == "OP" and self._peek().value == "]":
                # anonymous blank node []: a fresh non-distinguished
                # variable
                self._next()
                self._anon_bn += 1
                return f"?{_BNODE_VAR_PREFIX}anon{self._anon_bn}"
            # [ p o ; ... ] blank-node property list: desugars to a
            # fresh non-distinguished variable + buffered patterns
            return self._bnode_property_list()
        raise SparqlSyntaxError(
            f"bad {position} term {t.value!r} at offset {t.pos}")

    # -- property paths ---------------------------------------------------
    def _predicate(self) -> str:
        """Predicate position: a variable, ``a``, a plain IRI, or a
        property-path expression. Paths are re-rendered with full
        ``<iri>`` tokens — the exact grammar ``kg_path`` parses."""
        t = self._peek()
        if t.kind == "VAR":
            self._next()
            return "?" + t.value[1:]
        if t.kind == "KW" and t.value == "a":
            self._next()
            return RDF_TYPE
        text, is_path = self._path_alt()
        if not is_path:
            return text[1:-1]            # plain IRI → bare (fast path)
        return text

    def _path_alt(self) -> tuple[str, bool]:
        s, p = self._path_seq()
        parts, is_path = [s], p
        while self._peek().kind == "OP" and self._peek().value == "|":
            self._next()
            s2, _ = self._path_seq()
            parts.append(s2)
            is_path = True
        return "|".join(parts), is_path

    def _path_seq(self) -> tuple[str, bool]:
        s, p = self._path_post()
        parts, is_path = [s], p
        while self._peek().kind == "OP" and self._peek().value == "/":
            self._next()
            s2, _ = self._path_post()
            parts.append(s2)
            is_path = True
        return "/".join(parts), is_path

    def _path_post(self) -> tuple[str, bool]:
        s, p = self._path_prim()
        t = self._peek()
        if t.kind == "OP" and t.value in ("+", "*", "?"):
            self._next()
            return s + t.value, True
        return s, p

    def _path_prim(self) -> tuple[str, bool]:
        t = self._peek()
        if t.kind == "OP" and t.value == "^":
            self._next()
            s, _ = self._path_prim()
            return "^" + s, True
        if t.kind == "OP" and t.value == "!":
            self._next()
            return "!" + self._path_negset(), True
        if t.kind == "OP" and t.value == "(":
            self._next()
            s, _ = self._path_alt()
            self._expect("OP", ")")
            return "(" + s + ")", True
        return "<" + self._iri(self._next()) + ">", False

    def _path_negset(self) -> str:
        t = self._peek()
        if t.kind == "OP" and t.value == "(":
            self._next()
            members = [self._path_neg_member()]
            while self._peek().kind == "OP" and self._peek().value == "|":
                self._next()
                members.append(self._path_neg_member())
            self._expect("OP", ")")
            return "(" + "|".join(members) + ")"
        return self._path_neg_member()

    def _path_neg_member(self) -> str:
        if self._peek().kind == "OP" and self._peek().value == "^":
            self._next()
            return "^<" + self._iri(self._next()) + ">"
        return "<" + self._iri(self._next()) + ">"

    # -- triples block ----------------------------------------------------
    def _triples_block(self, graph: str | None) -> list[tuple]:
        """Subject (predicate object (, object)*)(; ...)* with optional
        trailing '.'; returns 3- or 4-tuples (graph term appended)."""
        pats: list[tuple] = []
        subj = self._term("subject")
        if self._bn_buf and subj.startswith("?" + _BNODE_VAR_PREFIX) \
                and self._peek().kind == "OP" \
                and self._peek().value in (".", "}"):
            # TriplesSameSubject = blankNodePropertyList with an empty
            # outer property list: { [ p o ] . } — the desugared
            # patterns ARE the block
            if self._peek().value == ".":
                self._next()
            for bp in self._bn_buf:
                pats.append(bp + (graph,) if graph is not None else bp)
            self._bn_buf.clear()
            return pats
        while True:
            pred = self._predicate()
            while True:
                obj = self._term("object")
                if graph is not None:
                    pats.append((subj, pred, obj, graph))
                else:
                    pats.append((subj, pred, obj))
                if self._peek().kind == "OP" and self._peek().value == ",":
                    self._next()
                    continue
                break
            if self._peek().kind == "OP" and self._peek().value == ";":
                self._next()
                # a ';' directly before '.' or '}' is legal trailing
                if (self._peek().kind == "OP"
                        and self._peek().value in (".", "}")):
                    break
                continue
            break
        if self._peek().kind == "OP" and self._peek().value == ".":
            self._next()
        # drain patterns desugared from [ p o ] property lists parsed
        # inside this block (they scope to the same graph)
        for bp in self._bn_buf:
            pats.append(bp + (graph,) if graph is not None else bp)
        self._bn_buf.clear()
        return pats

    def _bnode_property_list(self) -> str:
        """``[`` already consumed, non-empty body: a blank-node
        property list ``[ p1 o1 ; p2 o2 , o3 ]`` — desugars to a
        fresh non-distinguished variable plus buffered
        (var, p, o) patterns the enclosing triples block drains.
        Nests (an object may itself be a property list)."""
        self._anon_bn += 1
        var = f"?{_BNODE_VAR_PREFIX}anon{self._anon_bn}"
        while True:
            pred = self._predicate()
            while True:
                obj = self._term("object")
                self._bn_buf.append((var, pred, obj))
                if self._peek().kind == "OP" \
                        and self._peek().value == ",":
                    self._next()
                    continue
                break
            if self._peek().kind == "OP" and self._peek().value == ";":
                self._next()
                if self._peek().kind == "OP" \
                        and self._peek().value == "]":
                    break
                continue
            break
        self._expect("OP", "]")
        return var

    def _graphify(self, pats: list[tuple], gterm: str) -> list[tuple]:
        """Home a GRAPH body's patterns into the graph term. Path
        predicates are fine under BOTH constant and variable graphs —
        a variable graph runs one per-graph closure over every named
        graph in a single job (``kg_path(g_col=...)``)."""
        out = []
        for pat in pats:
            if len(pat) == 4:
                raise SparqlUnsupportedError(
                    "nested GRAPH clauses are not supported — flatten "
                    "to one graph level")
            out.append(pat + (gterm,))
        return out

    def _plain_bgp(self) -> list[tuple]:
        """'{' triples* '}' with only triple patterns inside — the
        body shape of EXISTS / MINUS / UNION branches."""
        self._expect("OP", "{")
        pats: list[tuple] = []
        while not (self._peek().kind == "OP" and self._peek().value == "}"):
            if self._peek().kind == "EOF":
                raise SparqlSyntaxError("unterminated group")
            if self._at_kw("graph"):
                self._next()
                g = self._term("graph")
                inner = self._plain_bgp()
                pats += self._graphify(inner, g)
                continue
            t = self._peek()
            if (t.kind == "KW" and t.value in (
                    "optional", "bind", "values", "minus", "union",
                    "filter", "select")) \
                    or (t.kind == "OP" and t.value == "{"):
                raise SparqlUnsupportedError(
                    f"{t.value.upper()} inside this group body is not "
                    "supported — only triple patterns and GRAPH "
                    "blocks here; restructure with the construct at "
                    "the outer group level")
            pats += self._triples_block(None)
        self._next()
        return pats

    def _union_branch(self, allow_meta: bool = True
                      ) -> tuple[list[tuple], list[str]]:
        """One UNION branch at WHERE level: triple patterns, GRAPH
        blocks, and group-scoped FILTERs (applied to the branch's
        solutions before the null-padding union — SPARQL scopes a
        branch FILTER to the branch group). A branch FILTER may
        reference only variables the branch itself binds: an outer
        variable is out of scope there per SPARQL (always unbound →
        the filter errors every row), so we reject it typed instead
        of silently emptying the branch. ``allow_meta=False`` (unions
        inside group bodies / mixed with other members, where the
        compile paths cannot thread meta_vars) rejects
        LANG()/DATATYPE()-family references typed."""
        self._expect("OP", "{")
        pats: list[tuple] = []
        filters: list[str] = []
        while not (self._peek().kind == "OP" and self._peek().value == "}"):
            if self._peek().kind == "EOF":
                raise SparqlSyntaxError("unterminated union branch")
            if self._at_kw("graph"):
                self._next()
                g = self._term("graph")
                pats += self._graphify(self._plain_bgp(), g)
            elif self._eat_kw("filter"):
                if self._at_kw("exists") or self._at_kw("not"):
                    raise SparqlUnsupportedError(
                        "FILTER [NOT] EXISTS inside a UNION branch is "
                        "not supported — lift it to the outer group")
                filters.append(self._expression())
            elif self._peek().kind == "OP" and self._peek().value == ".":
                self._next()
            elif (self._peek().kind == "KW" and self._peek().value in (
                    "optional", "bind", "values", "minus", "union",
                    "select")) \
                    or (self._peek().kind == "OP"
                        and self._peek().value == "{"):
                raise SparqlUnsupportedError(
                    f"{self._peek().value.upper()} inside a UNION "
                    "branch is not supported — only triple patterns, "
                    "GRAPH blocks, and plain FILTERs here")
            else:
                pats += self._triples_block(None)
        self._next()
        if filters and not pats:
            raise SparqlUnsupportedError(
                "a UNION branch with only FILTERs has no patterns to "
                "filter — add a triple pattern")
        bound = {t[1:] for p in pats for t in p if t.startswith("?")}
        for expr in filters:
            loose = _expr_identifiers(expr) - bound
            # term-metadata identifiers over branch-bound vars are
            # fine where the compile path threads meta_vars (complete
            # unions in SELECT/ASK/CONSTRUCT/DESCRIBE); group-body and
            # inline unions cannot, so they reject typed
            meta_refs = {x for x in loose
                         if any(x.endswith(sfx) for sfx in META_SUFFIXES)
                         and x.rsplit("__", 1)[0] in bound}
            if meta_refs and not allow_meta:
                raise SparqlUnsupportedError(
                    "LANG()/DATATYPE()/isIRI()-family builtins inside "
                    "this UNION branch's FILTER are not supported "
                    "here — lift the test to the outer group")
            loose -= meta_refs
            if loose:
                raise SparqlUnsupportedError(
                    f"UNION-branch FILTER references {sorted(loose)} "
                    "not bound in that branch — an outer variable is "
                    "out of scope inside a branch group per SPARQL; "
                    "move the FILTER to the outer group")
        return pats, filters

    def _union_block(self, allow_meta: bool = True
                     ) -> tuple[list[list[tuple]], list[list[str]]]:
        """``{ A } UNION { B } ...`` (first '{' NOT yet consumed):
        one or more branches with their per-branch FILTER lists."""
        pair = self._union_branch(allow_meta)
        branches, bfilters = [pair[0]], [pair[1]]
        while self._at_kw("union"):
            self._next()
            pair = self._union_branch(allow_meta)
            branches.append(pair[0])
            bfilters.append(pair[1])
        return branches, bfilters

    @staticmethod
    def _reject_branch_meta(bfilters: list[list[str]],
                            where: str) -> None:
        """Inline unions' compile path cannot thread meta_vars into
        bgp_union — reject term-metadata branch-filter references
        typed instead of crashing on an unresolved column."""
        for fl in bfilters:
            for expr in fl:
                if any(any(x.endswith(s) for s in META_SUFFIXES)
                       for x in _expr_identifiers(expr)):
                    raise SparqlUnsupportedError(
                        "LANG()/DATATYPE()/isIRI()-family builtins in "
                        "a UNION-branch FILTER are not supported "
                        f"{where} — lift the test to the outer group")

    def _filtered_body(self, label: str, allow_union: bool = False,
                       allow_optional: bool = False) -> "_Body":
        """A group body that may mix triple patterns (incl. GRAPH)
        with group-scoped FILTER expressions — the body shape of
        OPTIONAL / [NOT] EXISTS / MINUS groups. With ``allow_union``
        a ``{ A } UNION { B }`` block is accepted (``union`` field:
        branch pattern lists); with ``allow_optional`` (OPTIONAL
        bodies) nested ``OPTIONAL { ... }`` members parse recursively
        (``nested`` field, in the ``bgp_match(optional=...)`` entry
        forms), plus ``BIND (expr AS ?v)``, ``FILTER [NOT] EXISTS``,
        ``MINUS`` and ``VALUES`` members (``binds`` / ``not_exists`` /
        ``exists`` / ``minus`` / ``values`` fields)."""
        self._expect("OP", "{")
        b = _Body()
        pats, filters = b.pats, b.filters
        union: list[list[tuple]] | None = None
        nested, binds = b.nested, b.binds
        while not (self._peek().kind == "OP" and self._peek().value == "}"):
            if self._peek().kind == "EOF":
                raise SparqlSyntaxError(f"unterminated {label} group")
            if self._eat_kw("filter"):
                if self._at_kw("exists") or self._at_kw("not"):
                    if not allow_optional:
                        raise SparqlUnsupportedError(
                            f"FILTER [NOT] EXISTS inside {label} is "
                            "not supported — lift it to the outer "
                            "group")
                    if self._eat_kw("not"):
                        self._expect("KW", "exists")
                        b.not_exists.append(
                            self._group_entry("NOT EXISTS"))
                    else:
                        self._next()
                        b.exists.append(self._group_entry("EXISTS"))
                    continue
                filters.append(self._expression())
            elif self._at_kw("graph"):
                self._next()
                gterm = self._term("graph")
                pats += self._graphify(self._plain_bgp(), gterm)
            elif self._peek().kind == "OP" and self._peek().value == ".":
                self._next()
            elif (allow_optional and self._peek().kind == "OP"
                    and self._peek().value == "{"
                    and self._peek(1).kind == "KW"
                    and self._peek(1).value == "select"):
                # SPARQL 1.1 subquery as an OPTIONAL-body member:
                # compiled bottom-up later, joined to the group's
                # solutions on the shared variables
                self._next()
                self._next()
                b.subqueries.append(self._parse_select(sub=True))
                self._expect("OP", "}")
            elif (allow_union and self._peek().kind == "OP"
                    and self._peek().value == "{"):
                branches, bfilters = self._union_block(allow_meta=False)
                if len(branches) == 1:
                    # a plain nested group inlines; its FILTERs are
                    # group-scoped and reference only branch-bound
                    # vars, so they join the body's filters
                    pats += branches[0]
                    filters += bfilters[0]
                elif union is not None:
                    raise SparqlUnsupportedError(
                        f"multiple UNION blocks inside one {label} "
                        "group are not supported — merge the branches "
                        "into one UNION")
                else:
                    union = branches
                    if any(bfilters):
                        b.union_branch_filters = bfilters
            elif allow_optional and self._at_kw("optional"):
                self._next()
                nested.append(self._optional_entry())
            elif allow_optional and self._eat_kw("bind"):
                self._expect("OP", "(")
                bexpr = self._expression()
                self._expect("KW", "as")
                bvar = self._expect("VAR").value[1:]
                self._expect("OP", ")")
                binds.append((bvar, bexpr))
            elif allow_optional and self._eat_kw("minus"):
                b.minus.append(self._group_entry("MINUS"))
            elif allow_optional and self._eat_kw("values"):
                vrows = self._values_clause()
                joined = _join_values_tables(b.values, vrows)
                if not vrows or (b.values and not joined):
                    # an empty inline table (or an empty JOIN of two
                    # tables) admits no solution — FILTER(false)
                    b.filters.append("false")
                b.values = joined
            elif (self._peek().kind == "KW"
                  and self._peek().value in ("optional", "bind",
                                             "values", "minus",
                                             "union")) \
                    or (self._peek().kind == "OP"
                        and self._peek().value == "{"):
                raise SparqlUnsupportedError(
                    f"{self._peek().value.upper()} inside a {label} "
                    "group is not supported — only triple patterns, "
                    "GRAPH blocks, and plain FILTERs; restructure "
                    "with the construct at the outer group level")
            else:
                pats += self._triples_block(None)
        self._next()
        extras = (nested or binds or b.not_exists or b.exists
                  or b.minus or b.values)
        # a UNION body takes FILTERs and BINDs over its solutions;
        # any other member beside it is unsupported
        if union is not None and (pats or nested or b.not_exists
                                  or b.exists or b.minus or b.values
                                  or b.subqueries):
            raise SparqlUnsupportedError(
                f"UNION mixed with other members inside one {label} "
                "group is not supported — lift the patterns into each "
                "branch, or move them outside the group")
        # triple patterns or a subquery seed the group's solutions;
        # everything else only transforms them
        seeded = bool(pats) or bool(b.subqueries)
        if extras and not seeded and union is None:
            raise SparqlUnsupportedError(
                f"a {label} group whose body has no triple pattern "
                "or subquery has no required part to left-join the "
                "group against — add one, or restructure at the "
                "outer level")
        if not seeded and union is None:
            raise SparqlSyntaxError(f"empty {label} group")
        b.union = union
        return b

    def _optional_entry(self) -> tuple | list | dict:
        """Parse one OPTIONAL body (recursively: nested OPTIONALs,
        UNION bodies, BIND, [NOT] EXISTS, MINUS and VALUES members
        allowed) into the ``bgp_match(optional=...)`` entry forms: a
        single pattern tuple, a pattern list (group), or a dict with
        'patterns' / 'filters' / 'union' / 'optional' / 'binds' /
        'not_exists' / 'exists' / 'minus' / 'values' keys."""
        b = self._filtered_body(
            "OPTIONAL", allow_union=True, allow_optional=True)
        extras = {k: v for k, v in (
            ("optional", b.nested), ("binds", b.binds),
            ("not_exists", b.not_exists), ("exists", b.exists),
            ("minus", b.minus), ("values", b.values),
            ("subqueries", b.subqueries),
            ("filters", b.filters),
            ("branch_filters", b.union_branch_filters)) if v}
        if b.union is not None:
            return {"union": b.union, **extras}
        extras.pop("branch_filters", None)
        if not extras:
            return b.pats[0] if len(b.pats) == 1 else b.pats
        return {"patterns": b.pats, **extras}

    @staticmethod
    def _entry_has_subqueries(entry) -> bool:
        """True if a group-entry dict carries (possibly nested)
        un-compiled subquery ASTs — those compile only through the
        optional-entry / negation-entry compilers, never through the
        embedded-EXISTS marker path or a UNION body."""
        if isinstance(entry, dict):
            if entry.get("subqueries"):
                return True
            return any(
                _Parser._entry_has_subqueries(i)
                for k in ("optional", "not_exists", "exists", "minus")
                for i in entry.get(k, []))
        return False

    def _group_entry(self, label: str) -> list | dict:
        b = self._filtered_body(label, allow_union=True,
                                allow_optional=True)
        # (union + subqueries in one body is unreachable here:
        # _filtered_body already raises "UNION mixed with other
        # members" for that shape)
        if b.union is not None:
            entry: dict = {"union": b.union}
            if b.filters:
                entry["filters"] = b.filters
            if b.union_branch_filters:
                entry["branch_filters"] = b.union_branch_filters
            if b.binds:
                # BIND over a union body: Extend distributes over
                # Union — each expanded branch entry carries it
                entry["binds"] = b.binds
            return entry
        extras = {k: v for k, v in (
            ("optional", b.nested), ("binds", b.binds),
            ("not_exists", b.not_exists), ("exists", b.exists),
            ("minus", b.minus), ("values", b.values),
            ("filters", b.filters),
            ("subqueries", b.subqueries)) if v}
        if not extras:
            return b.pats
        return {"patterns": b.pats, **extras}

    # -- group graph pattern ----------------------------------------------
    def _group(self) -> _Group:
        self._expect("OP", "{")
        g = _Group()
        if self._peek().kind == "OP" and self._peek().value == "{" \
                and not (self._peek(1).kind == "KW"
                         and self._peek(1).value == "select"):
            # UNION form: { BGP } UNION { BGP } ... — or a single
            # nested plain group, which is equivalent to inlining
            branches, bfilters = self._union_block()
            if len(branches) > 1:
                if (self._peek().kind == "OP"
                        and self._peek().value == "}"):
                    self._next()
                    g.union_branches = branches
                    if any(bfilters):
                        g.union_branch_filters = bfilters
                    return g
                # other members follow the UNION block: compiles to
                # Join(Union(branches), rest) via a solution join
                self._reject_branch_meta(
                    bfilters, "in a UNION mixed with other members")
                g.inline_unions.append(branches)
                g.inline_union_filters.append(bfilters)
            else:
                # a single nested plain group inlines; its branch
                # FILTERs reference only branch-bound vars, so they
                # commute with the join and join the group's filters
                g.patterns += branches[0]
                g.filters += bfilters[0]
        while not (self._peek().kind == "OP" and self._peek().value == "}"):
            t = self._peek()
            if t.kind == "EOF":
                raise SparqlSyntaxError("unterminated group")
            if self._eat_kw("optional"):
                # single pattern → tuple (plain left join); several →
                # list = OPTIONAL group evaluated as a unit; with
                # group-scoped FILTERs → dict form; a UNION body →
                # union-dict form (LeftJoin(rest, Union(A, B)));
                # nested OPTIONALs → dict with an 'optional' key
                # (recursive bgp_match on the optional side)
                g.optional.append(self._optional_entry())
            elif self._eat_kw("filter"):
                if self._at_kw("exists"):
                    self._next()
                    g.exists.append(self._group_entry("EXISTS"))
                elif (self._at_kw("not")
                        and self._peek(1).kind == "KW"
                        and self._peek(1).value == "exists"):
                    self._next()
                    self._next()
                    g.not_exists.append(self._group_entry("NOT EXISTS"))
                else:
                    # a FILTER expression may EMBED [NOT] EXISTS
                    # tests (markers compiled to boolean columns);
                    # a pure boolean expression stays in g.filters
                    self._allow_exists = True
                    start = len(self._exists_markers)
                    fexpr = self._expression()
                    self._allow_exists = False
                    new = self._exists_markers[start:]
                    if new:
                        del self._exists_markers[start:]
                        g.filter_exists.append(
                            {"expr": fexpr, "markers": new})
                    else:
                        g.filters.append(fexpr)
            elif self._eat_kw("minus"):
                g.minus.append(self._group_entry("MINUS"))
            elif self._eat_kw("values"):
                vrows = self._values_clause()
                joined = _join_values_tables(g.values, vrows)
                if not vrows or (g.values and not joined):
                    # empty inline table / empty join: no solutions
                    g.filters.append("false")
                g.values = joined
            elif self._eat_kw("bind"):
                self._expect("OP", "(")
                expr = self._expression()
                self._expect("KW", "as")
                var = self._expect("VAR").value[1:]
                self._expect("OP", ")")
                g.binds.append((var, expr))
            elif self._eat_kw("graph"):
                gterm = self._term("graph")
                g.patterns += self._graphify(self._plain_bgp(), gterm)
            elif t.kind == "OP" and t.value == "{":
                if self._peek(1).kind == "KW" \
                        and self._peek(1).value == "select":
                    # SPARQL 1.1 subquery: evaluated independently
                    # (bottom-up), joined to the group's solutions on
                    # the shared variables
                    self._next()
                    self._next()
                    g.subqueries.append(self._parse_select(sub=True))
                    self._expect("OP", "}")
                    continue
                # nested group / UNION block after other members
                branches, bfilters = self._union_block()
                if len(branches) == 1:
                    # a single nested plain group joins by inlining
                    # (branch FILTERs commute — see the leading form)
                    g.patterns += branches[0]
                    g.filters += bfilters[0]
                else:
                    self._reject_branch_meta(
                        bfilters, "in a UNION mixed with other members")
                    g.inline_unions.append(branches)
                    g.inline_union_filters.append(bfilters)
                continue
            elif t.kind == "OP" and t.value == ".":
                self._next()
            else:
                g.patterns += self._triples_block(None)
        self._next()
        return g

    def _values_clause(self) -> list[dict]:
        """Both VALUES forms → list of {var: value|None} rows."""
        t = self._peek()
        if t.kind == "VAR":
            var = self._next().value[1:]
            self._expect("OP", "{")
            rows = []
            while not (self._peek().kind == "OP"
                       and self._peek().value == "}"):
                rows.append({var: self._values_cell()})
            self._next()
            return rows
        self._expect("OP", "(")
        vars_: list[str] = []
        while self._peek().kind == "VAR":
            vars_.append(self._next().value[1:])
        self._expect("OP", ")")
        self._expect("OP", "{")
        rows = []
        while not (self._peek().kind == "OP" and self._peek().value == "}"):
            self._expect("OP", "(")
            row = {}
            for v in vars_:
                row[v] = self._values_cell()
            self._expect("OP", ")")
            rows.append(row)
        self._next()
        return rows

    def _values_cell(self) -> str | None:
        if self._eat_kw("undef"):
            return None
        t = self._next()
        if t.kind == "OP" and t.value in ("-", "+") \
                and self._peek().kind == "NUMBER":
            num = self._next().value
            return num if t.value == "+" else "-" + num
        if t.kind == "STRING":
            val = _unquote(t.value)
            if self._peek().kind == "LANGTAG":
                self._next()
            elif self._peek().kind == "OP" and self._peek().value == "^^":
                self._next()
                self._iri(self._next())
            return val
        if t.kind in ("IRIREF", "PNAME"):
            return self._iri(t)
        if t.kind == "NUMBER":
            return t.value
        if t.kind == "KW" and t.value in ("true", "false"):
            return t.value
        raise SparqlSyntaxError(
            f"bad VALUES cell {t.value!r} at offset {t.pos}")

    # -- expressions → Spark SQL ------------------------------------------
    # Precedence: || < && < (=,!=,<,>,<=,>=,IN) < (+,-) < (*,/) < unary
    def _expression(self) -> str:
        return self._expr_or()

    def _expr_or(self) -> str:
        s = self._expr_and()
        while self._peek().kind == "OP" and self._peek().value == "||":
            self._next()
            s = f"({s} OR {self._expr_and()})"
        return s

    def _expr_and(self) -> str:
        s = self._expr_rel()
        while self._peek().kind == "OP" and self._peek().value == "&&":
            self._next()
            s = f"({s} AND {self._expr_rel()})"
        return s

    _REL_OPS = {"=", "!=", "<", ">", "<=", ">="}

    def _expr_rel(self) -> str:
        left, lkind = self._expr_add()
        t = self._peek()
        if t.kind == "OP" and t.value in self._REL_OPS:
            op = self._next().value
            right, rkind = self._expr_add()
            # SPARQL compares typed values; the frame stores lexical
            # strings — cast the var side when the other side is
            # numeric. try_cast, not cast: the session runs ANSI
            # mode, where a malformed lexical value would THROW and
            # fail the whole (retried) task; SPARQL calls it a type
            # error and drops the solution (NULL comparison → false)
            if lkind == "var" and rkind == "num":
                left = f"try_cast({left} as double)"
            elif rkind == "var" and lkind == "num":
                right = f"try_cast({right} as double)"
            return f"({left} {op} {right})"
        if self._at_kw("in") or (self._at_kw("not")
                                 and self._peek(1).kind == "KW"
                                 and self._peek(1).value == "in"):
            neg = self._eat_kw("not")
            self._expect("KW", "in")
            self._expect("OP", "(")
            items = []
            while not (self._peek().kind == "OP"
                       and self._peek().value == ")"):
                if items:
                    self._expect("OP", ",")
                items.append(self._expr_add()[0])
            self._next()
            if not items:
                # legal SPARQL: IN with an empty ExpressionList is
                # false (NOT IN true) — Spark SQL's `IN ()` is a
                # parse error, so emit the constant directly
                return "true" if neg else "false"
            kw = "NOT IN" if neg else "IN"
            return f"({left} {kw} ({', '.join(items)}))"
        return left

    def _expr_add(self) -> tuple[str, str]:
        s, k = self._expr_mul()
        while self._peek().kind == "OP" and self._peek().value in ("+", "-"):
            op = self._next().value
            s2, _ = self._expr_mul()
            s, k = f"({s} {op} {s2})", "expr"
        return s, k

    def _expr_mul(self) -> tuple[str, str]:
        s, k = self._expr_unary()
        while self._peek().kind == "OP" and self._peek().value in ("*", "/"):
            op = self._next().value
            s2, _ = self._expr_unary()
            s, k = f"({s} {op} {s2})", "expr"
        return s, k

    def _exists_marker(self, negated: bool) -> tuple[str, str]:
        """One [NOT] EXISTS { ... } occurrence inside a FILTER
        expression → a fresh boolean marker column reference."""
        if not self._allow_exists:
            raise SparqlUnsupportedError(
                "[NOT] EXISTS is only supported inside group-level "
                "FILTER expressions — restructure the query")
        # the flag must NOT leak into the EXISTS body: an embedded
        # EXISTS inside the body's own FILTER would otherwise hoist
        # its marker to the OUTER filter and leave an unresolvable
        # column in the inner group — raise typed instead
        self._allow_exists = False
        try:
            entry = self._group_entry(
                "NOT EXISTS" if negated else "EXISTS")
        finally:
            self._allow_exists = True
        if self._entry_has_subqueries(entry):
            # the marker-join path has no subquery compile hook —
            # refuse rather than silently dropping the subquery
            raise SparqlUnsupportedError(
                "subqueries inside an expression-embedded [NOT] "
                "EXISTS are not supported — use a standalone "
                "FILTER [NOT] EXISTS or lift the subquery")
        name = f"_fx{self._fx_n}"
        self._fx_n += 1
        self._exists_markers.append((name, entry, negated))
        return f"`{name}`", "expr"

    def _expr_unary(self) -> tuple[str, str]:
        t = self._peek()
        if t.kind == "KW" and t.value == "exists":
            self._next()
            return self._exists_marker(False)
        if t.kind == "KW" and t.value == "not" \
                and self._peek(1).kind == "KW" \
                and self._peek(1).value == "exists":
            self._next()
            self._next()
            return self._exists_marker(True)
        if t.kind == "OP" and t.value == "!":
            self._next()
            s, _ = self._expr_unary()
            return f"(NOT {s})", "expr"
        if t.kind == "OP" and t.value == "-":
            self._next()
            s, k = self._expr_unary()
            # a negated numeric literal stays "num" so the var-side
            # cast heuristic still fires for ?x > -5
            return (f"-{s}", "num") if k == "num" else (f"(- {s})", "expr")
        if t.kind == "OP" and t.value == "+":
            self._next()
            return self._expr_unary()
        return self._expr_primary()

    # SPARQL builtin → Spark SQL function (same arity, same position)
    _FUNC_MAP = {
        "str": "cast({0} as string)", "strlen": "length({0})",
        "ucase": "upper({0})", "lcase": "lower({0})",
        "contains": "contains({0}, {1})",
        "strstarts": "startswith({0}, {1})",
        "strends": "endswith({0}, {1})",
        "substr": None,  # handled: SPARQL is 1-based like Spark substring
        "concat": None, "abs": None, "ceil": "ceiling({0})",
        "floor": None, "round": None, "coalesce": None, "if": None,
        # SPARQL REPLACE is fn:replace = REGEX-based, not literal
        "replace": "regexp_replace({0}, {1}, {2})",
        # STRBEFORE/STRAFTER return '' when the needle is absent;
        # with an empty needle instr() = 1, giving '' / the whole
        # string — exactly the fn:substring-before/-after contract
        "strbefore": "(CASE WHEN instr({0}, {1}) > 0 THEN "
                     "substring({0}, 1, instr({0}, {1}) - 1) "
                     "ELSE '' END)",
        "strafter": "(CASE WHEN instr({0}, {1}) > 0 THEN "
                    "substring({0}, instr({0}, {1}) + length({1})) "
                    "ELSE '' END)",
        # url_encode is form-encoding (space → '+'); ENCODE_FOR_URI
        # wants %20 — literal '+' is already %2B-escaped, so the
        # replace is unambiguous
        # url_encode is java.net form-encoding; fn:encode-for-uri
        # differs on three code points: space ('+' vs %20), '~'
        # (unreserved, must stay raw) and '*' (reserved, must encode)
        "encode_for_uri": "replace(replace(replace(url_encode({0}), "
                          "'+', '%20'), '%7E', '~'), '*', '%2A')",
        "md5": None, "sha1": None,
        "sha256": "sha2({0}, 256)", "sha384": "sha2({0}, 384)",
        "sha512": "sha2({0}, 512)",
        # the triples frame stores IRIs as plain strings, so IRI(x)
        # is the identity on the lexical value (no base resolution —
        # the engine's IRIs are absolute); enables the documented
        # skolem-template idiom BIND(IRI(CONCAT(...)) AS ?node)
        "iri": "{0}", "uri": "{0}",
        # SPARQL §17.4.5 dateTime accessors: xsd:dateTime literals are
        # stored as their lexical form, so each accessor try_casts the
        # string to a timestamp first — a malformed lexical form yields
        # NULL (the SPARQL type-error contract: a FILTER comparison
        # then drops the solution). try_cast, not cast: the session
        # runs ANSI mode, where a plain cast of a bad string THROWS —
        # one dirty literal would fail the whole (retried) task.
        # Deviation: SECONDS returns whole seconds (an integer), not
        # the fraction-carrying xsd:decimal of fn:seconds-from-dateTime.
        "year": "year(try_cast({0} as timestamp))",
        "month": "month(try_cast({0} as timestamp))",
        "day": "day(try_cast({0} as timestamp))",
        "hours": "hour(try_cast({0} as timestamp))",
        "minutes": "minute(try_cast({0} as timestamp))",
        "seconds": "second(try_cast({0} as timestamp))",
    }

    # refused with a reason, never mis-executed: a retried Spark task
    # re-evaluates its expressions, so a nondeterministic builtin would
    # give two executions of the SAME task different answers — results
    # would not be reproducible (and exactly-once sinks would diverge)
    _NONDETERMINISTIC = ("now", "rand", "uuid", "struuid", "bnode")

    def _expr_primary(self) -> tuple[str, str]:
        t = self._next()
        if t.kind == "VAR":
            return f"`{t.value[1:]}`", "var"
        if t.kind == "NUMBER":
            return t.value, "num"
        if t.kind == "STRING":
            lit = _unquote(t.value).replace("\\", "\\\\").replace("'", "\\'")
            if self._peek().kind == "LANGTAG":
                self._next()
            elif self._peek().kind == "OP" and self._peek().value == "^^":
                self._next()
                self._iri(self._next())
            return f"'{lit}'", "str"
        if t.kind in ("IRIREF", "PNAME"):
            iri = self._iri(t)
            if self._peek().kind == "OP" and self._peek().value == "(":
                # XSD cast constructor, e.g. xsd:integer(?n)
                sqlt = self._XSD_CASTS.get(iri)
                if sqlt is None:
                    raise SparqlUnsupportedError(
                        f"constructor <{iri}>() is not a supported "
                        "XSD cast")
                self._next()
                arg = self._expression()
                self._expect("OP", ")")
                # a failed constructor cast is a SPARQL type
                # error (solution drops) — under ANSI a plain cast
                # would throw and fail the task
                return f"try_cast({arg} as {sqlt})", "expr"
            return "'" + iri.replace("'", "\\'") + "'", "str"
        if t.kind == "KW" and t.value in ("true", "false"):
            return t.value, "expr"
        if t.kind == "OP" and t.value == "(":
            # no re-wrap: every binary combinator parenthesizes its
            # own result, so source parens add nothing but noise
            s = self._expression()
            self._expect("OP", ")")
            return s, "expr"
        if t.kind == "NAME" and t.value.lower() in _AGG_FUNCS \
                and self._having_q is not None:
            # aggregate inside a HAVING constraint: compile to a
            # hidden aggregate column (dropped after the filter)
            spec = self._agg_spec_after_name(t.value.lower())
            hq = self._having_q
            for alias, sp in hq.having_aggs:
                if sp == spec:
                    return f"`{alias}`", "expr"
            alias = f"_h_agg_{len(hq.having_aggs)}"
            hq.having_aggs.append((alias, spec))
            return f"`{alias}`", "expr"
        if t.kind == "NAME" or (t.kind == "KW" and t.value == "bound"):
            return self._builtin_call(t)
        raise SparqlSyntaxError(
            f"bad expression token {t.value!r} at offset {t.pos}")

    _XSD = "http://www.w3.org/2001/XMLSchema#"
    _XSD_CASTS = {
        _XSD + "integer": "bigint", _XSD + "long": "bigint",
        _XSD + "int": "int", _XSD + "decimal": "decimal(38,18)",
        _XSD + "double": "double", _XSD + "float": "float",
        _XSD + "string": "string", _XSD + "boolean": "boolean",
        _XSD + "date": "date", _XSD + "dateTime": "timestamp",
    }

    def _regex_flags(self, arg: str, label: str) -> str:
        """Validate a REGEX()/REPLACE() flags argument (XPath
        fn:matches flags): must be a string literal over i/s/m/q.
        i/s/m map to Java's inline ``(?ism)`` embedded flags (Spark
        RLIKE / regexp_replace run java.util.regex); ``q`` (literal
        pattern) is handled by the callers. XPath's ``x`` is NOT
        supported: Java's (?x) additionally treats ``#`` as a
        comment-to-end-of-line marker, silently diverging from
        fn:matches on any pattern containing ``#``."""
        m = re.fullmatch(r"'([a-zA-Z]*)'", arg)
        if m is None:
            raise SparqlUnsupportedError(
                f"{label}() flags must be a plain string literal")
        flags = m.group(1)
        bad = sorted(set(flags) - set("ismq"))
        if bad:
            raise SparqlUnsupportedError(
                f"{label}() flag(s) {bad} are not supported — "
                "i/s/m/q only")
        return flags

    def _builtin_call(self, t: _Tok) -> tuple[str, str]:
        name = t.value.lower()
        self._expect("OP", "(")
        if name == "bound":
            var = self._expect("VAR").value[1:]
            self._expect("OP", ")")
            return f"(`{var}` IS NOT NULL)", "expr"
        args = []
        while not (self._peek().kind == "OP" and self._peek().value == ")"):
            args.append(self._expression())
            if self._peek().kind == "OP" and self._peek().value == ",":
                self._next()
        self._next()
        if name == "regex":
            if len(args) not in (2, 3):
                raise SparqlSyntaxError("REGEX() takes 2 or 3 arguments")
            if len(args) == 3:
                flags = self._regex_flags(args[2], "REGEX")
                if not flags:
                    return f"({args[0]} RLIKE {args[1]})", "expr"
                if "q" in flags:
                    # 'q' (XPath fn:matches): the pattern is a literal
                    # string, so the match is substring containment;
                    # 'iq' folds case first
                    s, p = args[0], args[1]
                    if "i" in flags:
                        s, p = f"lower({s})", f"lower({p})"
                    return f"(instr({s}, {p}) > 0)", "expr"
                return (f"({args[0]} RLIKE concat('(?{flags})', "
                        f"{args[1]}))", "expr")
            return f"({args[0]} RLIKE {args[1]})", "expr"
        if name in ("datatype", "lang", "isiri", "isuri", "isliteral",
                    "isblank"):
            # term-metadata builtins: compile onto the
            # {var}__kind/__lang/__datatype columns bgp_match emits
            # for meta_vars (the argument must be a plain variable)
            m = re.fullmatch(r"`(\w+)`", args[0]) if args else None
            if m is None:
                raise SparqlUnsupportedError(
                    f"{name.upper()}() takes a plain variable "
                    "argument in this subset")
            v = m.group(1)
            self.meta_vars.add(v)
            if name == "lang":
                # LANG of a non-literal is a SPARQL type error → NULL
                # here, so a FILTER comparison drops the solution
                # (mirrors the DATATYPE branch below)
                return (f"(CASE WHEN `{v}__kind` = 'literal' THEN "
                        f"coalesce(`{v}__lang`, '') ELSE NULL END)",
                        "expr")
            if name == "datatype":
                # lang-tagged → rdf:langString; plain literal →
                # declared datatype or xsd:string; IRI/bnode → null
                # (SPARQL type error: the solution drops in FILTER)
                return (
                    f"(CASE WHEN `{v}__lang` IS NOT NULL THEN "
                    f"'{_RDF_NS}langString' WHEN `{v}__kind` = "
                    f"'literal' THEN coalesce(`{v}__datatype`, "
                    f"'{self._XSD}string') ELSE NULL END)", "expr")
            kind = {"isiri": "iri", "isuri": "iri",
                    "isliteral": "literal", "isblank": "bnode"}[name]
            return f"(`{v}__kind` = '{kind}')", "expr"
        if name == "sameterm":
            # sameTerm(A, B): identical RDF terms — lexical value plus
            # kind/lang/datatype metadata all equal (null-safe on the
            # metadata: two plain literals share lang=NULL). An
            # unbound argument is a SPARQL type error: `=` yields
            # NULL and the FILTER drops the solution.
            if len(args) != 2:
                raise SparqlSyntaxError("SAMETERM takes 2 arguments")
            ms = [re.fullmatch(r"`(\w+)`", a) for a in args]
            if not all(ms):
                raise SparqlUnsupportedError(
                    "SAMETERM() takes plain variable arguments in "
                    "this subset")
            a, b = (m.group(1) for m in ms)
            self.meta_vars.add(a)
            self.meta_vars.add(b)
            return (f"(`{a}` = `{b}` AND `{a}__kind` <=> `{b}__kind` "
                    f"AND `{a}__lang` <=> `{b}__lang` AND "
                    f"`{a}__datatype` <=> `{b}__datatype`)", "expr")
        if name == "langmatches":
            if len(args) != 2:
                raise SparqlSyntaxError("LANGMATCHES takes 2 arguments")
            a, b = args
            return (
                f"(CASE WHEN {b} = '*' THEN {a} <> '' ELSE "
                f"(lower({a}) = lower({b}) OR "
                f"startswith(lower({a}), lower({b}) || '-')) END)",
                "expr")
        if name == "replace" and len(args) > 4:
            raise SparqlSyntaxError("REPLACE() takes at most 4 arguments")
        if name == "replace" and len(args) == 4:
            flags = self._regex_flags(args[3], "REPLACE")
            if not flags:
                return (f"regexp_replace({args[0]}, {args[1]}, "
                        f"{args[2]})", "expr")
            if "q" in flags:
                # 'q': pattern AND replacement are literal strings
                # (XPath fn:replace with q) — plain substring replace
                if flags != "q":
                    raise SparqlUnsupportedError(
                        "REPLACE() flag 'q' cannot combine with "
                        "regex flags")
                return (f"replace({args[0]}, {args[1]}, {args[2]})",
                        "expr")
            return (f"regexp_replace({args[0]}, concat('(?{flags})', "
                    f"{args[1]}), {args[2]})", "expr")
        tmpl = self._FUNC_MAP.get(name)
        if name in self._FUNC_MAP:
            if tmpl is None:
                return f"{name}({', '.join(args)})", "expr"
            return tmpl.format(*args), "expr"
        if name in self._NONDETERMINISTIC:
            raise SparqlUnsupportedError(
                f"{name.upper()}() is nondeterministic — a retried "
                "Spark task would re-evaluate it to a different value, "
                "so results would not be reproducible; bind the value "
                "once in the driver and pass it as a constant instead")
        if name in ("tz", "timezone"):
            raise SparqlUnsupportedError(
                f"{name.upper()}() is not supported — the engine "
                "stores xsd:dateTime lexical forms without timezone "
                "normalization (the session runs in UTC)")
        raise SparqlUnsupportedError(
            f"builtin {name.upper()}() is not in the compiled subset")

    # -- aggregates / select list -----------------------------------------
    def _select_item(self) -> tuple:
        """One SELECT item → ('var', name) | ('agg', Column, alias) |
        ('expr', sql, alias)."""
        t = self._peek()
        if t.kind == "VAR":
            self._next()
            return ("var", t.value[1:])
        if t.kind == "OP" and t.value == "(":
            self._next()
            item = self._agg_or_expr()
            self._expect("KW", "as")
            alias = self._expect("VAR").value[1:]
            self._expect("OP", ")")
            return item + (alias,)
        raise SparqlSyntaxError(
            f"bad SELECT item {t.value!r} at offset {t.pos}")

    def _agg_or_expr(self) -> tuple:
        t = self._peek()
        if t.kind == "NAME" and t.value.lower() in _AGG_FUNCS:
            name = self._next().value.lower()
            return ("agg", self._agg_spec_after_name(name))
        return ("expr", self._expression())

    def _agg_spec_after_name(self, name: str) -> tuple:
        """Aggregate call body after its NAME token: '(' [DISTINCT]
        expr|'*' [; SEPARATOR=str] ')' -> (name, arg, distinct, sep)."""
        self._expect("OP", "(")
        distinct = self._eat_kw("distinct")
        sep = " "   # SPARQL 1.1 §18.5.1.7: default separator is a space
        if self._peek().kind == "OP" and self._peek().value == "*":
            self._next()
            arg = None
        else:
            arg = self._expression()
        if name == "group_concat" and self._peek().kind == "OP" \
                and self._peek().value == ";":
            self._next()
            w = self._next()       # SEPARATOR keyword (as NAME)
            if w.kind != "NAME" or w.value.lower() != "separator":
                raise SparqlSyntaxError(
                    f"expected SEPARATOR at offset {w.pos}")
            self._expect("OP", "=")
            sep = _unquote(self._expect("STRING").value)
        self._expect("OP", ")")
        return (name, arg, distinct, sep)

    # -- query forms -------------------------------------------------------
    def parse(self) -> _Query:
        while True:
            if self._eat_kw("prefix"):
                p = self._expect("PNAME")
                if not p.value.endswith(":"):
                    raise SparqlSyntaxError(
                        f"bad prefix declaration at offset {p.pos}")
                iri = self._expect("IRIREF").value[1:-1]
                self.prefixes[p.value[:-1]] = iri
            elif self._eat_kw("base"):
                self.base = self._expect("IRIREF").value[1:-1]
            else:
                break
        if self._eat_kw("select"):
            q = self._parse_select()
        elif self._eat_kw("ask"):
            q = _Query(form="ask")
            self._dataset_clause(q)
            self._eat_kw("where")
            q.where = self._group()
        elif self._eat_kw("construct"):
            q = _Query(form="construct")
            if self._at_kw("where") or self._at_kw("from"):
                # CONSTRUCT WHERE { ... } shorthand: the template IS
                # the (plain-BGP) where clause
                self._dataset_clause(q)
                self._expect("KW", "where")
                pats = self._plain_bgp()
                q.template = [p[:3] for p in pats]
                q.where = _Group(patterns=pats)
            else:
                q.template = self._plain_bgp()
                self._dataset_clause(q)
                self._expect("KW", "where")
                q.where = self._group()
        elif self._eat_kw("describe"):
            q = _Query(form="describe")
            if self._peek().kind == "VAR":
                q.describe_var = self._next().value[1:]
                self._dataset_clause(q)
                self._eat_kw("where")
                q.where = self._group()
            else:
                nodes = [self._iri(self._next())]
                while self._peek().kind in ("IRIREF", "PNAME"):
                    nodes.append(self._iri(self._next()))
                self._dataset_clause(q)
                if len(nodes) == 1:
                    q.describe_node = nodes[0]
                else:
                    q.describe_nodes = nodes
        else:
            t = self._peek()
            raise SparqlSyntaxError(
                f"expected SELECT/ASK/CONSTRUCT/DESCRIBE, got "
                f"{t.value!r} at offset {t.pos}")
        if self._peek().kind != "EOF":
            t = self._peek()
            raise SparqlSyntaxError(
                f"trailing input {t.value!r} at offset {t.pos}")
        return q

    def _dataset_clause(self, q: _Query) -> None:
        """FROM <g> / FROM NAMED <g> dataset clauses (SPARQL §13.2):
        FROM graphs merge into the default graph, FROM NAMED graphs
        are the named-graph set. Stored on the query; the executor
        applies them as pushed graph-column filters."""
        while self._eat_kw("from"):
            t = self._next()
            if t.kind == "KW" and t.value == "named":
                q.from_named.append(self._iri(self._next()))
            else:
                q.from_graphs.append(self._iri(t))

    def _parse_select(self, sub: bool = False) -> _Query:
        q = _Query(form="select")
        if self._eat_kw("distinct"):
            q.distinct = True
        elif self._eat_kw("reduced"):
            q.distinct = False
        if self._peek().kind == "OP" and self._peek().value == "*":
            self._next()
            q.select_star = True
        else:
            items = []
            while self._peek().kind == "VAR" or (
                    self._peek().kind == "OP"
                    and self._peek().value == "("):
                items.append(self._select_item())
            if not items:
                raise SparqlSyntaxError("empty SELECT list")
            q.select = items
        if self._at_kw("from"):
            if sub:
                raise SparqlSyntaxError(
                    "FROM/FROM NAMED are not allowed in a subquery "
                    "(SPARQL SubSelect has no dataset clause)")
            self._dataset_clause(q)
        self._eat_kw("where")
        q.where = self._group()
        if self._eat_kw("group"):
            self._expect("KW", "by")
            while True:
                if self._peek().kind == "VAR":
                    q.group_by.append(self._next().value[1:])
                elif self._peek().kind == "OP" \
                        and self._peek().value == "(":
                    # GROUP BY (expr AS ?v): per SPARQL §18.2.4.1 the
                    # key expression binds ?v — desugared to a BIND
                    # (Extend happens before Group in the algebra)
                    self._next()
                    gexpr = self._expression()
                    self._expect("KW", "as")
                    gvar = self._expect("VAR").value[1:]
                    self._expect("OP", ")")
                    # the key var is NOT in scope inside the WHERE
                    # group (SPARQL binds it at the Group step); the
                    # BIND desugaring would make a WHERE filter see it
                    # — refuse rather than diverge from the spec's
                    # type-error-drops-everything behavior
                    refs = [f for f in q.where.filters
                            if gvar in _expr_identifiers(f)]
                    refs += [fe["expr"] for fe in q.where.filter_exists
                             if gvar in _expr_identifiers(fe["expr"])]
                    if refs:
                        raise SparqlUnsupportedError(
                            f"GROUP BY key ?{gvar} is referenced by a "
                            "WHERE-group FILTER, where SPARQL has it "
                            "out of scope — rename the key or move "
                            "the filter to HAVING")
                    q.where.binds.append((gvar, gexpr))
                    q.group_by.append(gvar)
                elif (self._peek().kind == "NAME"
                        and self._peek(1).kind == "OP"
                        and self._peek(1).value == "("):
                    raise SparqlUnsupportedError(
                        "a bare expression GROUP BY key is not "
                        "supported — name it: GROUP BY (expr AS ?k)")
                else:
                    break
            if not q.group_by:
                raise SparqlSyntaxError("empty GROUP BY")
        if self._eat_kw("having"):
            self._having_q = q
            q.having.append(self._expression())
            while self._peek().kind == "OP" and self._peek().value == "(":
                q.having.append(self._expression())
            self._having_q = None
        if self._eat_kw("order"):
            self._expect("KW", "by")
            while True:
                t = self._peek()
                if self._eat_kw("asc") or self._eat_kw("desc"):
                    desc = t.value == "desc"
                    self._expect("OP", "(")
                    expr = self._expression()
                    self._expect("OP", ")")
                    q.order_by.append((expr, desc))
                elif t.kind == "VAR":
                    self._next()
                    q.order_by.append((f"`{t.value[1:]}`", False))
                elif t.kind == "OP" and t.value == "(":
                    # bare BrackettedExpression order condition
                    self._next()
                    expr = self._expression()
                    self._expect("OP", ")")
                    q.order_by.append((expr, False))
                elif t.kind == "NAME" and self._peek(1).kind == "OP" \
                        and self._peek(1).value == "(":
                    # bare BuiltInCall order condition,
                    # e.g. ORDER BY STRLEN(?a)
                    q.order_by.append((self._expression(), False))
                else:
                    break
            if not q.order_by:
                raise SparqlSyntaxError("empty ORDER BY")
        while True:     # LIMIT/OFFSET accept either order
            if self._eat_kw("limit"):
                q.limit = self._nonneg_int("LIMIT")
            elif self._eat_kw("offset"):
                q.offset = self._nonneg_int("OFFSET")
            else:
                break
        if self._eat_kw("values"):
            # trailing ValuesClause (SPARQL grammar rule [28]):
            # joined to the FINAL results, after solution modifiers
            q.post_values = self._values_clause()
        return q

    def _nonneg_int(self, what: str) -> int:
        t = self._expect("NUMBER")
        if not t.value.isdigit():
            raise SparqlSyntaxError(
                f"{what} takes a non-negative integer, got {t.value!r} "
                f"at offset {t.pos}")
        return int(t.value)


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------

def _entry_patterns(entry):
    """All pattern tuples inside an optional/negation entry (dicts
    recurse through union branches, nested bodies, and subqueries)."""
    if isinstance(entry, dict):
        for br in entry.get("union", []):
            yield from br
        yield from entry.get("patterns", [])
        for k in ("not_exists", "exists", "minus", "optional"):
            for e in entry.get(k, []):
                yield from _entry_patterns(e)
        for sq in entry.get("subqueries", []):
            yield from _query_patterns(sq)
    elif entry and isinstance(entry[0], (list, tuple)):
        yield from entry
    elif entry:
        yield entry


def _group_patterns(g: "_Group"):
    yield from g.patterns
    for br in (g.union_branches or []):
        yield from br
    for blk in g.inline_unions:
        for br in blk:
            yield from br
    for e in (list(g.not_exists) + list(g.exists) + list(g.minus)
              + list(g.optional)):
        yield from _entry_patterns(e)
    for fe in g.filter_exists:
        for _name, entry, _neg in fe["markers"]:
            yield from _entry_patterns(entry)
    for sq in g.subqueries:
        yield from _query_patterns(sq)


def _query_patterns(q: "_Query"):
    if q.where is not None:
        yield from _group_patterns(q.where)


def _apply_dataset_clause(triples: DataFrame, q: "_Query",
                          g_col: str) -> DataFrame:
    """FROM / FROM NAMED (SPARQL §13.2) as pushed graph-column
    filters. Exactly-supported scopes: FROM alone (the query's
    patterns all match the default graph = merge of the FROM graphs;
    GRAPH clauses would need the separate named scope → typed error)
    and FROM NAMED alone (every pattern carries a GRAPH term; a
    pattern outside GRAPH would match the EMPTY default graph →
    typed error instead of silently returning nothing)."""
    if g_col not in triples.columns:
        raise SparqlUnsupportedError(
            "FROM/FROM NAMED need a named-graph column on the "
            "triples frame")
    if q.from_graphs and q.from_named:
        raise SparqlUnsupportedError(
            "combining FROM and FROM NAMED is not supported — the "
            "default and named scopes would need separate scans; "
            "split the query")
    pats = list(_query_patterns(q))
    if q.from_graphs:
        if any(len(p) == 4 for p in pats):
            raise SparqlUnsupportedError(
                "FROM together with GRAPH clauses is not supported — "
                "use FROM NAMED for named-graph matching")
        return triples.where(F.col(g_col).isin(q.from_graphs))
    if any(len(p) == 3 for p in pats):
        raise SparqlUnsupportedError(
            "FROM NAMED without FROM leaves the default graph empty — "
            "a pattern outside GRAPH can never match; wrap it in "
            "GRAPH or add FROM")
    return triples.where(F.col(g_col).isin(q.from_named))


def _agg_column(spec: tuple, alias: str, all_cols: list[str]) -> Any:
    name, arg, distinct, sep = spec
    col = F.expr(arg) if arg is not None else None
    if name == "count":
        if col is None:
            if distinct:
                # COUNT(DISTINCT *) = distinct SOLUTIONS: the struct
                # must cover only distinguished variables — a
                # non-distinguished blank-node column (_bn_*) or a
                # {var}__kind/__lang/__datatype metadata column would
                # overcount (two rows differing only there are ONE
                # solution)
                sol_cols = [c for c in all_cols
                            if not c.startswith(_BNODE_VAR_PREFIX)
                            and not any(c.endswith(sfx)
                                        for sfx in _META_SUFFIXES)]
                return F.countDistinct(
                    F.struct(*[F.col(c) for c in sol_cols])).alias(alias)
            return F.count(F.lit(1)).alias(alias)
        return (F.countDistinct(col) if distinct
                else F.count(col)).alias(alias)
    if col is None:
        raise SparqlSyntaxError(f"{name.upper()}(*) is not SPARQL")
    if name in ("sum", "avg"):
        if distinct:
            # SUM/AVG(DISTINCT expr) — aggregate over the distinct
            # VALUE multiset per SPARQL 18.5.1
            col = F.expr(
                f"{name}(DISTINCT try_cast(({arg}) as double))")
        else:
            # try_cast: one dirty literal must not fail the whole
            # aggregate job under ANSI. Documented deviation: strict
            # SPARQL errors the WHOLE aggregate when any value
            # errors (unbound result); this engine skips the dirty
            # value (SQL NULL-skip), the behavior every SQL oracle
            # shares and the one a 100 TB corpus needs
            col = getattr(F, name)(F.expr(
                f"try_cast(({arg}) as double)"))
    elif name in ("min", "max"):
        col = getattr(F, name)(col)   # DISTINCT is a no-op for MIN/MAX
    elif name == "sample":
        # SAMPLE is implementation-defined; min() makes it deterministic
        # (and DISTINCT a no-op)
        col = F.min(col)
    elif name == "group_concat":
        inner = (F.collect_set if distinct else F.collect_list)(col)
        # SPARQL leaves concatenation order undefined; sorting makes
        # the result deterministic (and distributable — no global order)
        col = F.array_join(F.array_sort(inner), sep)
    return col.alias(alias)


def _pattern_var_names(pats: list) -> set[str]:
    vs: set[str] = set()
    for p in pats:
        for t in p:
            if isinstance(t, str) and t.startswith("?"):
                vs.add(t[1:])
    return vs


def _subquery_proj_vars(sq: "_Query") -> set[str]:
    """The variable names a subquery's solution set projects."""
    if sq.select_star:
        # the full in-scope variable set of the subquery's group:
        # pattern vars, everything nullable (optional/binds/UNDEF
        # values), plus VALUES vars, union vars, inner-subquery vars
        g = sq.where
        vs = _pattern_var_names(g.patterns) | _group_nullable(g)
        for row in g.values:
            vs |= set(row)
        for branches in ([g.union_branches] if g.union_branches
                         else []) + g.inline_unions:
            vs |= set().union(*[_pattern_var_names(b)
                                for b in branches])
        for isq in g.subqueries:
            vs |= _subquery_proj_vars(isq)
        for opt in g.optional:
            vs |= _opt_entry_vars(opt)
        return vs
    return {item[-1] for item in (sq.select or [])}


def _opt_entry_vars(opt) -> set[str]:
    """Every variable an OPTIONAL entry can bind. Delegates to the
    engine's collector (patterns / union / nested optionals / binds /
    values / compiled solution_joins — kept in ONE place) and adds the
    parser-only ``subqueries`` key, recursing so inner entries'
    subqueries are seen too."""
    vs = _kg_optional_entry_vars(opt)
    if isinstance(opt, dict):
        for sq in opt.get("subqueries", []):
            vs |= _subquery_proj_vars(sq)
        for inner in opt.get("optional", []):
            vs |= _opt_entry_vars(inner)
    return vs


def _group_nullable(g: _Group) -> set[str]:
    """Variables that may be unbound (null) in the group's solutions:
    introduced by OPTIONAL, an UNDEF VALUES cell, or BIND. Used to
    decide whether a subquery's projected variables are safe join
    keys (nullable keys raise in bgp_match's solution join)."""
    req = _pattern_var_names(g.patterns)
    nul: set[str] = set()
    if g.union_branches:
        # bgp_union pads a variable missing from a branch with null —
        # any var not bound by EVERY branch may be unbound
        per_branch = [_pattern_var_names(b) for b in g.union_branches]
        nul |= set.union(*per_branch) - set.intersection(*per_branch)
    for branches in g.inline_unions:
        per_branch = [_pattern_var_names(b) for b in branches]
        nul |= set.union(*per_branch) - set.intersection(*per_branch)
    for opt in g.optional:
        nul |= _opt_entry_vars(opt) - req
    for var, _ in g.binds:
        nul.add(var)
    for row in g.values:
        for v, val in row.items():
            if val is None and v not in req:
                nul.add(v)
    return nul


def _compile_subqueries(triples: DataFrame, g: _Group, cols: dict,
                        distinct_solutions: bool,
                        meta_vars: frozenset = frozenset()
                        ) -> tuple[list[dict] | None, set[str]]:
    """Compile a group's subqueries bottom-up (SPARQL 1.1 §18.2.2)
    and its inline UNION blocks (a UNION mixed with other group
    members) into bgp_match solution-join entries. Returns (entries,
    nullable variable names they may contribute)."""
    if not g.subqueries and not g.inline_unions:
        return None, set()
    entries: list[dict] = []
    nul: set[str] = set()
    for sq in g.subqueries:
        sdf, snul, scalar = _compile_select(
            triples, sq, cols, distinct_solutions, meta_vars=meta_vars)
        entries.append({"df": sdf, "nullable": snul,
                        "allow_disjoint": scalar})
        nul |= snul
    for bi, branches in enumerate(g.inline_unions):
        # UNION mixed with other group members: the union's solution
        # set joins the rest of the group on the shared variables
        # (algebra Join(Union(...), rest)). A variable not bound by
        # EVERY branch is nullable — bgp_match raises (typed) if such
        # a variable is a join key, per its unbound-compatibility
        # policy for solution joins
        per_branch = [_pattern_var_names(b) for b in branches]
        bad = (set(meta_vars) & set.union(*per_branch)) \
            - _pattern_var_names(g.patterns)
        if bad:
            raise SparqlUnsupportedError(
                "LANG()/DATATYPE()/isIRI()-family builtins over the "
                f"UNION-bound variable(s) {sorted(bad)} are not "
                "supported — bind the variable in a required triple "
                "pattern outside the UNION")
        bf = g.inline_union_filters[bi] \
            if bi < len(g.inline_union_filters) else None
        udf = bgp_union(triples, branches,
                        branch_filters=bf if bf and any(bf) else None,
                        **cols)
        unul = set.union(*per_branch) - set.intersection(*per_branch)
        entries.append({"df": udf, "nullable": unul})
        nul |= unul
    return entries, nul


def _compile_body_entries(triples: DataFrame, entries: list | None,
                          cols: dict, distinct_solutions: bool,
                          meta_vars: frozenset = frozenset()
                          ) -> list | None:
    """ONE recursive compiler for every group-body entry list —
    OPTIONAL entries and [NOT] EXISTS / MINUS entries alike. Each
    dict entry's nested-body keys ('optional', 'not_exists',
    'exists', 'minus') recurse through this same function, and an
    un-compiled 'subqueries' AST list is popped and compiled
    bottom-up (SPARQL §18.2.2 — substitution does not descend into
    subqueries, so each compiles independently of the outer
    solutions; kg.bgp_match refuses, typed, a subquery-only variable
    shared with the outer query) into bgp_match solution-join
    entries AT EVERY NESTING LEVEL. A single compiler, not one per
    entry kind: a per-kind copy that misses a nested key silently
    drops the subquery — wrong results, not an error (the bug a
    review pass found in the two-compiler version). Entries without
    subqueries or nested bodies pass through unchanged; kg.bgp_match
    additionally raises on any dict entry still carrying an unknown
    key, so a future compile gap fails loudly."""
    if not entries:
        return None
    out = []
    for entry in entries:
        if isinstance(entry, dict) and (
                entry.get("subqueries")
                or any(entry.get(k) for k in
                       ("optional", "not_exists", "exists", "minus"))):
            entry = dict(entry)
            for k in ("optional", "not_exists", "exists", "minus"):
                if entry.get(k):
                    entry[k] = _compile_body_entries(
                        triples, entry[k], cols, distinct_solutions,
                        meta_vars)
            sqs = entry.pop("subqueries", None)
            if sqs:
                sj = list(entry.get("solution_joins") or [])
                for sq in sqs:
                    sdf, snul, scalar = _compile_select(
                        triples, sq, cols, distinct_solutions,
                        meta_vars=meta_vars)
                    sj.append({"df": sdf, "nullable": snul,
                               "allow_disjoint": scalar})
                entry["solution_joins"] = sj
        out.append(entry)
    return out


def _post_values_join(df: DataFrame, rows: list[dict],
                      nullable: set[str]) -> DataFrame:
    """Trailing VALUES clause (SPARQL 18.2.4.3): joined BEFORE
    projection and the solution modifiers — the caller applies it to
    the pre-projection solution frame (non-aggregate queries) or the
    grouped frame after HAVING (aggregate queries). Same
    compatible-bindings semantics as bgp_match's in-group VALUES
    branch (kg.py — kept in sync by hand; a semantics change there
    must be mirrored here): UNDEF cells and possibly-unbound result
    variables are compatible with anything; variables new to the
    result extend it. Always a broadcast — VALUES tables are literal
    and tiny."""
    vvars: list[str] = []
    for row in rows:
        vvars += [v for v in row if v not in vvars]
    spark = df.sparkSession
    vdf = spark.createDataFrame(
        [tuple(row.get(v) for v in vvars) for row in rows],
        ", ".join(f"`{v}` string" for v in vvars))
    shared = [v for v in vvars if v in df.columns]
    order = list(df.columns) + [v for v in vvars if v not in df.columns]
    if not shared:
        return df.crossJoin(F.broadcast(vdf)).select(*order)
    undef = any(row.get(v) is None for row in rows for v in shared)
    if not undef and not (set(shared) & nullable):
        return df.join(F.broadcast(vdf), shared).select(*order)
    vdf2 = vdf.select(*[F.col(v).alias(f"_v_{v}") for v in vvars])
    cond = None
    for v in shared:
        c = F.col(f"_v_{v}").isNull() | (F.col(f"_v_{v}") == F.col(v))
        if v in nullable:
            c = c | F.col(v).isNull()
        cond = c if cond is None else (cond & c)
    out = df.join(F.broadcast(vdf2), cond)
    for v in shared:
        if v in nullable:
            out = out.withColumn(
                v, F.coalesce(F.col(v), F.col(f"_v_{v}")))
    for v in vvars:
        if v not in shared:
            out = out.withColumnRenamed(f"_v_{v}", v)
    return out.drop(*[f"_v_{v}" for v in shared]).select(*order)


def _compile_select(triples: DataFrame, q: _Query, cols: dict,
                    distinct_solutions: bool,
                    meta_vars: frozenset = frozenset()
                    ) -> tuple[DataFrame, set[str], bool]:
    """Compile a (sub)SELECT to (solutions DataFrame, nullable
    projected variables, is_scalar) — is_scalar marks an aggregate
    query with no GROUP BY, which produces exactly one row (the
    scalar-subquery idiom; joined disjoint via broadcast)."""
    g = q.where
    sj, sub_nul = _compile_subqueries(triples, g, cols,
                                      distinct_solutions, meta_vars)
    if g.union_branches is not None:
        if g.optional or g.filters or g.not_exists or g.exists \
                or g.minus or g.values or g.binds or g.subqueries \
                or g.filter_exists:
            raise SparqlUnsupportedError(
                "UNION mixed with other clauses is not supported")
        uvars = set().union(*[_pattern_var_names(b)
                              for b in g.union_branches])
        df = bgp_union(triples, g.union_branches,
                       branch_filters=g.union_branch_filters,
                       meta_vars=(set(meta_vars) & uvars) or None,
                       **cols)
    else:
        gvars = _pattern_var_names(g.patterns) | _group_nullable(g)
        df = bgp_match(triples, g.patterns,
                       optional=_compile_body_entries(
                           triples, g.optional, cols,
                           distinct_solutions, meta_vars),
                       not_exists=_compile_body_entries(
                           triples, g.not_exists, cols,
                           distinct_solutions),
                       exists=_compile_body_entries(
                           triples, g.exists, cols, distinct_solutions),
                       minus=_compile_body_entries(
                           triples, g.minus, cols, distinct_solutions),
                       filters=g.filters or None, values=g.values or None,
                       binds=g.binds or None,
                       filter_exists=g.filter_exists or None,
                       distinct_solutions=distinct_solutions,
                       solution_joins=sj,
                       meta_vars=(set(meta_vars) & gvars) or None,
                       **cols)
    nullable = (_group_nullable(g) | sub_nul)
    out_nul: set[str] = set()
    scalar = False
    has_agg = any(item[0] == "agg" for item in (q.select or []))
    # trailing VALUES joins BEFORE projection and solution modifiers
    # (SPARQL 18.2.4.3: after aggregation+HAVING, before Project /
    # Distinct / OrderBy / Slice). Non-aggregate queries join the
    # full solution frame here; aggregate queries join the grouped
    # frame after HAVING below.
    if q.post_values and not (q.group_by or has_agg):
        df = _post_values_join(df, q.post_values, nullable)
        nullable |= {v for row in q.post_values for v in row
                     if any(r.get(v) is None for r in q.post_values)}
    agg_out_order: list[str] | None = None
    having_handled = False
    if q.group_by or has_agg or q.having_aggs:
        if q.select_star:
            raise SparqlSyntaxError("SELECT * with GROUP BY is not SPARQL")
        scalar = has_agg and not q.group_by
        aggs, out_order, post_exprs = [], [], []
        for item in q.select:
            if item[0] == "agg":
                aggs.append(_agg_column(item[1], item[2], df.columns))
                out_order.append(item[2])
                name, arg = item[1][0], item[1][1]
                # COUNT is never null; other aggregates are null on an
                # empty (scalar) input or an all-null nullable arg
                if name != "count" and (scalar or (
                        arg and any(x in nullable
                                    for x in _expr_identifiers(arg)))):
                    out_nul.add(item[2])
            elif item[0] == "var":
                if item[1] not in q.group_by:
                    raise SparqlSyntaxError(
                        f"?{item[1]} is projected but neither grouped "
                        "nor aggregated")
                out_order.append(item[1])
                if item[1] in nullable:
                    out_nul.add(item[1])
            else:
                # (expr AS ?x) beside aggregates: a projection over
                # the grouped frame — may reference group keys and
                # earlier SELECT aliases (SPARQL's in-scope rule);
                # anything else surfaces as an unresolved column
                refs = _expr_identifiers(item[1])
                bad = [x for x in refs
                       if x in set(df.columns) - set(q.group_by)]
                if bad:
                    raise SparqlSyntaxError(
                        f"(… AS ?{item[2]}) references ungrouped "
                        f"variables {sorted(bad)} — aggregate them "
                        "or add them to GROUP BY")
                post_exprs.append((item[2], item[1]))
                out_order.append(item[2])
                out_nul.add(item[2])
        # aggregates referenced only by HAVING become hidden columns,
        # computed with the visible ones and dropped by the final
        # projection after the HAVING filter runs
        hidden = [_agg_column(spec, alias, df.columns)
                  for alias, spec in q.having_aggs]
        if aggs or hidden:
            all_aggs = aggs + hidden
            df = df.groupBy(*q.group_by).agg(*all_aggs) if q.group_by \
                else df.agg(*all_aggs)
        else:
            # GROUP BY with no aggregate in SELECT: one row per group
            df = df.select(*q.group_by).distinct()
        for alias, sql in post_exprs:
            df = df.withColumn(alias, F.expr(sql))
        if hidden:
            # HAVING must see the hidden aggregate columns — filter
            # here, then project them away
            for h in q.having:
                df = df.where(F.expr(h))
            having_handled = True
        df = df.select(*out_order)
        agg_out_order = out_order
    elif q.select and not q.select_star:
        out_cols = []
        for item in q.select:
            if item[0] == "var":
                out_cols.append(F.col(item[1]))
                if item[1] in nullable:
                    out_nul.add(item[1])
            elif item[0] == "expr":
                out_cols.append(F.expr(item[1]).alias(item[2]))
                # conservative: an arbitrary expression may evaluate
                # to null even over bound inputs
                out_nul.add(item[2])
            else:  # pragma: no cover — has_agg branch above catches
                raise AssertionError
        df = df.select(*out_cols)
        if q.distinct and distinct_solutions:
            df = df.distinct()
    else:
        # SELECT * projects only named variables — blank-node-label
        # variables and {var}__kind/__lang/__datatype term-metadata
        # columns drop out here (dedup afterwards: distinct solutions
        # may collapse once they go)
        drop = [c for c in df.columns
                if c.startswith(_BNODE_VAR_PREFIX)
                or c.endswith(_META_SUFFIXES)]
        if drop:
            df = df.select(*[c for c in df.columns if c not in drop])
            if distinct_solutions:
                df = df.distinct()
        out_nul = {v for v in df.columns if v in nullable}
    if not having_handled:
        for h in q.having:
            df = df.where(F.expr(h))
    if q.post_values and agg_out_order is not None:
        # aggregate path: VALUES joins the grouped frame after HAVING,
        # then the spec's Project re-applies (new VALUES variables do
        # not survive an explicit select list)
        df = _post_values_join(df, q.post_values, out_nul)
        df = df.select(*agg_out_order)
    if q.order_by:
        df = df.orderBy(*[F.expr(e).desc() if d else F.expr(e).asc()
                          for e, d in q.order_by])
    if q.offset is not None:
        df = df.offset(q.offset)
    if q.limit is not None:
        df = df.limit(q.limit)
    return df, {v for v in out_nul if v in df.columns}, scalar


def sparql_query(triples: DataFrame, query: str,
                 s_col: str = "subj", p_col: str = "pred",
                 o_col: str = "obj_value", g_col: str = "graph",
                 distinct_solutions: bool = True) -> DataFrame | bool:
    """Parse SPARQL query text and run it over the triples frame.

    SELECT / CONSTRUCT / DESCRIBE return a DataFrame (one column per
    projected variable); ASK returns a bool (same contract as
    ``kg.ask``). See the module docstring for the supported subset.
    The compiled plan is exactly what the equivalent hand-written
    ``bgp_match`` / ``construct`` / ``bgp_union`` call produces — the
    front-end adds no operators, so all the algebra's scale behavior
    (pushed-down constants, broadcast VALUES, null-mask OPTIONAL
    branches, Catalyst join ordering) carries over verbatim.
    """
    from pyspark.errors import AnalysisException
    try:
        return _sparql_dispatch(triples, query, s_col, p_col, o_col,
                                g_col, distinct_solutions)
    except AnalysisException as exc:
        klass = ""
        try:
            klass = exc.getCondition() or ""
        except Exception:
            pass
        if not klass:
            try:
                klass = exc.getErrorClass() or ""
            except Exception:
                pass
        if "UNRESOLVED_COLUMN" in klass:
            # a query referencing a variable that is never bound in
            # scope (SELECT projection, FILTER, BIND, negation body):
            # SPARQL evaluates an unbound-variable expression as a
            # type error per solution (often yielding an empty
            # result); this engine raises a CLEAR error instead of
            # silently returning nothing — same contract as every
            # other out-of-subset construct. Documented deviation.
            raise SparqlUnsupportedError(
                "the query references a variable that is never bound "
                "in its scope (see the unresolved column below) — "
                "SPARQL would treat it as a per-solution type error; "
                "this engine refuses, typed, rather than silently "
                f"returning an empty/null result: {exc}"
            ) from exc
        raise


def _sparql_dispatch(triples: DataFrame, query: str,
                     s_col: str, p_col: str, o_col: str, g_col: str,
                     distinct_solutions: bool) -> DataFrame | bool:
    parser = _Parser(query)
    q = parser.parse()
    meta_vars = frozenset(parser.meta_vars)
    cols = dict(s_col=s_col, p_col=p_col, o_col=o_col, g_col=g_col)
    if q.from_graphs or q.from_named:
        triples = _apply_dataset_clause(triples, q, g_col)
    if q.form == "describe":
        if q.describe_var is not None:
            # one group compiler for every WHERE shape (union,
            # subqueries, body entries, filter_exists, meta): wrap
            # the group in a select-star query exactly like the ASK
            # path — a hand copy of _compile_select's bgp_match call
            # here drifted behind it repeatedly (review finding)
            sq = _Query(form="select", where=q.where,
                        select_star=True, distinct=False)
            sol, _, _ = _compile_select(triples, sq, cols,
                                        distinct_solutions,
                                        meta_vars=meta_vars)
            if q.describe_var not in sol.columns:
                raise SparqlSyntaxError(
                    f"DESCRIBE ?{q.describe_var}: variable is not "
                    "bound by the WHERE clause")
            return describe_nodes(
                triples, sol.select(q.describe_var).where(
                    F.col(q.describe_var).isNotNull()),
                node_col=q.describe_var,
                s_col=s_col, p_col=p_col, o_col=o_col)
        if q.describe_nodes is not None:
            ndf = triples.sparkSession.createDataFrame(
                [(n,) for n in q.describe_nodes], "node string")
            return describe_nodes(triples, ndf, s_col=s_col,
                                  p_col=p_col, o_col=o_col)
        return describe(triples, q.describe_node,
                        s_col=s_col, p_col=p_col, o_col=o_col)
    g = q.where
    if q.form == "ask":
        if g.binds or g.optional or g.subqueries or g.inline_unions \
                or g.filter_exists:
            # General group shapes (BIND / OPTIONAL / subqueries /
            # inline UNION blocks / expression-embedded EXISTS)
            # compile through the SELECT
            # machinery and probe emptiness. OPTIONAL or BIND alone
            # cannot change an existence answer, but a group FILTER
            # or join over their variables can, so the full group
            # semantics must run; distinct is skipped (existence
            # needs no dedup exchange) and limit(1) short-circuits
            # the scan via Catalyst's LocalLimit pushdown.
            sq = _Query(form="select", where=g, select_star=True,
                        distinct=False, limit=1)
            df, _, _ = _compile_select(triples, sq, cols,
                                       distinct_solutions=False,
                                       meta_vars=meta_vars)
            return bool(df.take(1))
        if g.union_branches is not None:
            # ASK over a UNION: true iff any branch matches
            # (short-circuits branch by branch)
            bfs = g.union_branch_filters \
                or [[] for _ in g.union_branches]
            return any(
                _ask(triples, b, filters=bf or None,
                     meta_vars=(set(meta_vars)
                                & _pattern_var_names(b)) or None,
                     **cols)
                for b, bf in zip(g.union_branches, bfs))
        return _ask(triples, g.patterns,
                    not_exists=_compile_body_entries(
                        triples, g.not_exists, cols, distinct_solutions),
                    exists=_compile_body_entries(
                        triples, g.exists, cols, distinct_solutions),
                    minus=_compile_body_entries(
                        triples, g.minus, cols, distinct_solutions),
                    filters=g.filters or None, values=g.values or None,
                    # intersect with the outer group's own vars: a
                    # meta var referenced only inside a negation BODY
                    # is served by the body's compile, and passing it
                    # here would raise never-bound (same rule as the
                    # SELECT path)
                    meta_vars=(set(meta_vars)
                               & (_pattern_var_names(g.patterns)
                                  | _group_nullable(g))) or None,
                    **cols)
    if q.form == "construct":
        # blank-node labels in the template (SPARQL §16.2): minted as
        # a fresh deterministic node per solution by construct().
        # Template labels are scoped to the template (§19.6) — one
        # that also appears in the WHERE clause shadows that
        # (independent) non-distinguished variable rather than
        # joining with it
        tmpl_mint = {term[1:] for tri in q.template for term in tri
                     if term.startswith("?" + _BNODE_VAR_PREFIX)}
        if g.union_branches:
            # CONSTRUCT over UNION: instantiate the template once per
            # branch and union the constructed graphs (a graph is a
            # triple SET — the final distinct dedups across branches).
            # Template variables need not be bound by every branch;
            # per SPARQL an unbound template slot skips that triple.
            outs = []
            cbfs = g.union_branch_filters \
                or [[] for _ in g.union_branches]
            for branch, bf in zip(g.union_branches, cbfs):
                bvars = _pattern_var_names(branch) | tmpl_mint
                tmpl = [t for t in q.template
                        if all(not term.startswith("?")
                               or term[1:] in bvars for term in t)]
                if tmpl:
                    outs.append(construct(
                        triples, branch, tmpl,
                        mint_vars=tmpl_mint or None,
                        filters=bf or None,
                        meta_vars=(set(meta_vars)
                                   & _pattern_var_names(branch)) or None,
                        **cols))
            if not outs:
                raise SparqlSyntaxError(
                    "CONSTRUCT over UNION: no template triple is fully "
                    "bound by any branch")
            df = outs[0]
            for o in outs[1:]:
                df = df.unionByName(o)
            return df.distinct()
        csj, _ = _compile_subqueries(triples, g, cols,
                                     distinct_solutions, meta_vars)
        cvars = _pattern_var_names(g.patterns) | _group_nullable(g)
        return construct(triples, g.patterns, q.template,
                         optional=_compile_body_entries(
                             triples, g.optional, cols,
                             distinct_solutions, meta_vars),
                         not_exists=_compile_body_entries(
                             triples, g.not_exists, cols,
                             distinct_solutions),
                         exists=_compile_body_entries(
                             triples, g.exists, cols,
                             distinct_solutions),
                         minus=_compile_body_entries(
                             triples, g.minus, cols,
                             distinct_solutions),
                         filters=g.filters or None,
                         values=g.values or None, binds=g.binds or None,
                         filter_exists=g.filter_exists or None,
                         solution_joins=csj,
                         meta_vars=(set(meta_vars) & cvars) or None,
                         mint_vars=tmpl_mint or None, **cols)
    # SELECT
    df, _, _ = _compile_select(triples, q, cols, distinct_solutions,
                               meta_vars=meta_vars)
    return df
