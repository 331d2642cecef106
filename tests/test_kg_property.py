"""Property-based check: bgp_match (joins over the triples DataFrame)
against a naive in-memory pattern matcher on random small graphs. One
Spark call per case keeps the suite fast; hypothesis drives the graph
and pattern shapes, including OPTIONAL and NOT EXISTS."""

from __future__ import annotations

from itertools import product

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jsonld_spark.operators.kg import bgp_match

SUBJECTS = ["s0", "s1", "s2", "s3"]
PREDS = ["p0", "p1", "p2"]
OBJECTS = ["o0", "o1", "s0", "s1"]


def naive_solutions(triples, patterns):
    """All variable bindings satisfying every (s, p, o) pattern —
    brute force over the candidate term universe."""
    vars_: list[str] = []
    for pat in patterns:
        for t in pat:
            if t.startswith("?") and t[1:] not in vars_:
                vars_.append(t[1:])
    universe = sorted({x for tr in triples for x in tr})
    sols = set()
    for combo in product(universe, repeat=len(vars_)):
        b = dict(zip(vars_, combo))
        ok = all(
            tuple(b.get(t[1:], t) if t.startswith("?") else t
                  for t in pat) in triples
            for pat in patterns)
        if ok:
            sols.add(tuple(b[v] for v in vars_))
    return vars_, sols


triple_st = st.tuples(st.sampled_from(SUBJECTS), st.sampled_from(PREDS),
                      st.sampled_from(OBJECTS))


def pattern_st(n_vars: int):
    term = st.one_of(
        st.sampled_from([f"?v{i}" for i in range(n_vars)]),
        st.sampled_from(SUBJECTS + PREDS + OBJECTS))
    return st.tuples(term, term, term)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=14),
       patterns=st.lists(pattern_st(2), min_size=1, max_size=2))
def test_bgp_match_equals_naive(spark, triples, patterns):
    vars_, want = naive_solutions(triples, patterns)
    if not vars_:
        return  # all-constant patterns: bgp_match returns no columns
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(df, patterns)
    except ValueError:
        # disconnected patterns are rejected by design; the naive
        # matcher would happily produce the cartesian product
        return
    rows = got_df.collect()
    cols = got_df.columns
    got = {tuple(r[c] for c in cols) for r in rows}
    # align column order: naive order is first-appearance across
    # patterns, same rule bgp_match uses
    assert cols == vars_
    assert got == want


def naive_optional(sols, vars_, triples, opt):
    """Extend each solution (which may contain None = unbound, from an
    earlier OPTIONAL) with one OPTIONAL pattern per SPARQL leftjoin:
    an optional row is compatible when it agrees on every shared var
    the solution BINDS; a shared var the solution left unbound takes
    the optional row's value (bind-once); unmatched rows get nulls."""
    opt_vars = []
    for t in opt:
        if t.startswith("?") and t[1:] not in vars_ \
                and t[1:] not in opt_vars:
            opt_vars.append(t[1:])
    # distinct bindings the optional pattern produces
    opt_rows = set()
    for tr in triples:
        b = {}
        ok = True
        for t, x in zip(opt, tr):
            if t.startswith("?"):
                if t[1:] in b and b[t[1:]] != x:
                    ok = False
                    break
                b[t[1:]] = x
            elif t != x:
                ok = False
                break
        if ok:
            opt_rows.add(tuple(sorted(b.items())))
    out = set()
    for sol in sols:
        sb = dict(zip(vars_, sol))
        exts = set()
        for row in opt_rows:
            rb = dict(row)
            if all(sb[k] is None or sb[k] == v
                   for k, v in rb.items() if k in sb):
                exts.add(tuple(
                    (sb[v] if sb[v] is not None else rb.get(v))
                    for v in vars_)
                    + tuple(rb.get(v) for v in opt_vars))
        if not exts:
            exts = {sol + tuple(None for _ in opt_vars)}
        out |= exts
    return out, vars_ + opt_vars


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), opt=pattern_st(3), ne=pattern_st(3))
def test_bgp_optional_not_exists_equals_naive(spark, triples, req, opt, ne):
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    df = spark.createDataFrame(
        sorted(triples) * 2,  # duplicated rows must not multiply
        "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(df, [req], optional=[opt], not_exists=[[ne]])
    except ValueError:
        return  # disconnected optional/group rejected by design
    want, all_vars = naive_optional(sols, vars_, triples, opt)
    # NOT EXISTS under substitution semantics: a shared var the
    # solution left unbound (null) stays FREE inside the group, so the
    # group matches iff some group solution agrees on the solution's
    # BOUND shared vars (all-unbound: matches iff the group matches at
    # all)
    ne_vars, ne_sols = naive_solutions(triples, [ne])
    shared = [v for v in ne_vars if v in all_vars]
    keep = set()
    for sol in want:
        sb = dict(zip(all_vars, sol))
        hit = any(all(sb[v] is None or sb[v] == ns[ne_vars.index(v)]
                      for v in shared)
                  for ns in ne_sols)
        if not hit:
            keep.add(sol)
    got = {tuple(r[c] for c in got_df.columns) for r in got_df.collect()}
    assert got_df.columns == all_vars
    assert got == keep


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), opt1=pattern_st(3), opt2=pattern_st(4))
def test_bgp_sequential_optional_equals_naive(spark, triples, req,
                                              opt1, opt2):
    """Sequential OPTIONALs under SPARQL unbound-compatibility: when
    opt2 shares a variable opt1 introduced (nullable), a solution
    where opt1 didn't match joins opt2 on its remaining bound shared
    vars and binds the unbound one from opt2's row (bind-once)."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(df, [req], optional=[opt1, opt2])
    except ValueError:
        return  # disconnected optional rejected by design
    want, all_vars = naive_optional(sols, vars_, triples, opt1)
    want, all_vars = naive_optional(want, all_vars, triples, opt2)
    got = {tuple(r[c] for c in got_df.columns) for r in got_df.collect()}
    assert got_df.columns == all_vars
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), opt=pattern_st(3), g=pattern_st(3))
def test_bgp_exists_minus_nullable_shared_equals_naive(spark, triples,
                                                       req, opt, g):
    """EXISTS/MINUS over a variable an OPTIONAL may leave unbound:
    EXISTS keeps a solution iff the group matches on its BOUND shared
    vars (unbound = free, substitution semantics); MINUS additionally
    keeps any solution whose shared vars are ALL unbound (disjoint
    bound domains, §8.3.3)."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")
    try:
        kept_ex = bgp_match(df, [req], optional=[opt], exists=[[g]])
        kept_mi = bgp_match(df, [req], optional=[opt], minus=[[g]])
    except ValueError:
        return  # disconnected optional/group rejected by design
    want, all_vars = naive_optional(sols, vars_, triples, opt)
    g_vars, g_sols = naive_solutions(triples, [g])
    shared = [v for v in g_vars if v in all_vars]
    if not shared:
        return  # exists raises for disjoint groups; covered elsewhere
    ex_want, mi_want = set(), set()
    for sol in want:
        sb = dict(zip(all_vars, sol))
        hit = any(all(sb[v] is None or sb[v] == ns[g_vars.index(v)]
                      for v in shared)
                  for ns in g_sols)
        if hit:
            ex_want.add(sol)
        all_unbound = all(sb[v] is None for v in shared)
        if all_unbound or not any(
                all(sb[v] is None or sb[v] == ns[g_vars.index(v)]
                    for v in shared)
                and any(sb[v] is not None for v in shared)
                for ns in g_sols):
            mi_want.add(sol)
    got_ex = {tuple(r[c] for c in kept_ex.columns)
              for r in kept_ex.collect()}
    got_mi = {tuple(r[c] for c in kept_mi.columns)
              for r in kept_mi.collect()}
    assert got_ex == ex_want
    assert got_mi == mi_want


values_row_st = st.fixed_dictionaries(
    {}, optional={"v0": st.one_of(st.none(), st.sampled_from(OBJECTS)),
                  "tag": st.sampled_from(["t1", "t2"])})


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2),
       vrows=st.lists(values_row_st, min_size=1, max_size=3))
def test_bgp_values_equals_naive(spark, triples, req, vrows):
    """VALUES semantics vs a naive model: each solution joins every
    compatible VALUES row (shared var equal, or UNDEF/absent = wild);
    new variables extend, absent cells bind null."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    vvars: list[str] = []
    for row in vrows:
        vvars += [v for v in row if v not in vvars]
    if not vvars:
        return
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")
    got_df = bgp_match(df, [req], values=vrows)
    shared = [v for v in vvars if v in vars_]
    new = [v for v in vvars if v not in vars_]
    want = set()
    for sol in sols:
        sb = dict(zip(vars_, sol))
        for row in vrows:
            if all(row.get(v) is None or row.get(v) == sb[v]
                   for v in shared):
                want.add(sol + tuple(row.get(v) for v in new))
    got = {tuple(r[c] for c in got_df.columns) for r in got_df.collect()}
    assert got_df.columns == vars_ + new
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), g=pattern_st(2))
def test_bgp_exists_minus_equal_naive(spark, triples, req, g):
    """EXISTS keeps exactly the solutions NOT EXISTS drops; MINUS
    matches NOT EXISTS when variables are shared and is a no-op when
    domains are disjoint (SPARQL §8.3.3)."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")
    g_vars, g_sols = naive_solutions(triples, [g])
    shared = [v for v in g_vars if v in vars_]
    if shared:
        try:
            kept_ne = bgp_match(df, [req], not_exists=[[g]])
            kept_ex = bgp_match(df, [req], exists=[[g]])
        except ValueError:
            return
        ne = {tuple(r) for r in kept_ne.collect()}
        ex = {tuple(r) for r in kept_ex.collect()}
        assert ne | ex == sols and not (ne & ex)
        mi = {tuple(r) for r in bgp_match(df, [req], minus=[[g]]).collect()}
        assert mi == ne
    else:
        # disjoint domains: MINUS removes nothing; NOT EXISTS raises
        mi = {tuple(r) for r in bgp_match(df, [req], minus=[[g]]).collect()}
        assert mi == sols
        with pytest.raises(ValueError):
            bgp_match(df, [req], not_exists=[[g]])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), g1=pattern_st(3), g2=pattern_st(3))
def test_bgp_optional_group_equals_naive(spark, triples, req, g1, g2):
    """A multi-pattern OPTIONAL group left-joins as a UNIT: the naive
    model joins the group's patterns first (same brute-force matcher),
    then extends each required solution with compatible group rows, or
    all-null group vars when none match — never a half-bound row."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    gvars, gsols = naive_solutions(triples, [g1, g2])
    shared = [v for v in gvars if v in vars_]
    new = [v for v in gvars if v not in vars_]
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(df, [req], optional=[[g1, g2]])
    except ValueError:
        # disconnected group patterns / group sharing no var with the
        # required side are rejected by design
        return
    want = set()
    for sol in sols:
        sb = dict(zip(vars_, sol))
        exts = set()
        for gs in gsols:
            gb = dict(zip(gvars, gs))
            if all(gb[v] == sb[v] for v in shared):
                exts.add(sol + tuple(gb[v] for v in new))
        want |= exts if exts else {sol + (None,) * len(new)}
    assert got_df.columns == vars_ + new
    got = {tuple(r) for r in got_df.collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), g=pattern_st(4))
def test_correlated_not_exists_equals_naive(spark, triples, req, g):
    """Correlated group filter under SPARQL substitution semantics:
    drop a solution iff some group row agrees on the shared vars AND
    satisfies the comparison against the solution's outer binding.
    (String comparison on both sides — Spark SQL '>' and Python '>'
    are both lexicographic here.)"""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    gvars, gsols = naive_solutions(triples, [g])
    shared = [v for v in gvars if v in vars_]
    gonly = [v for v in gvars if v not in vars_]
    if not shared or not gonly:
        return  # need an equi key and a group-only var for the filter
    x, y = vars_[0], gonly[0]
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")
    got_df = bgp_match(
        df, [req],
        not_exists=[{"patterns": [g], "filters": [f"{y} > {x}"]}])
    want = set()
    for sol in sols:
        sb = dict(zip(vars_, sol))
        hit = any(
            all(dict(zip(gvars, gs))[v] == sb[v] for v in shared)
            and dict(zip(gvars, gs))[y] > sb[x]
            for gs in gsols)
        if not hit:
            want.add(sol)
    got = {tuple(r) for r in got_df.collect()}
    assert got == want


def _naive_union_rows(triples, branches):
    """Union of branch solution-binding dicts — a var absent from a
    branch is absent from its rows (SPARQL unbound)."""
    rows = set()
    for branch in branches:
        for tr in triples:
            b = {}
            ok = True
            for t, x in zip(branch, tr):
                if t.startswith("?"):
                    if t[1:] in b and b[t[1:]] != x:
                        ok = False
                        break
                    b[t[1:]] = x
                elif t != x:
                    ok = False
                    break
            if ok:
                rows.add(tuple(sorted(b.items())))
    return rows


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), b1=pattern_st(3), b2=pattern_st(3))
def test_bgp_optional_union_equals_naive(spark, triples, req, b1, b2):
    """OPTIONAL { {A} UNION {B} } = LeftJoin(sols, Union(A, B)): a
    solution extends with every compatible union row (agreement on the
    shared vars); no compatible row leaves the union-only vars null.
    The engine raises when a shared join var is not bound by every
    branch (an unbound null key would never match) — skipped here."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    df = spark.createDataFrame(
        sorted(triples) * 2,  # duplicated rows must not multiply
        "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(df, [req],
                           optional=[{"union": [[b1], [b2]]}])
    except ValueError:
        return  # disconnected / not-bound-by-every-branch: by design
    uvars = []
    for branch in (b1, b2):
        for t in branch:
            if t.startswith("?") and t[1:] not in vars_ \
                    and t[1:] not in uvars:
                uvars.append(t[1:])
    rows = _naive_union_rows(triples, [[*b1], [*b2]])
    want = set()
    for sol in sols:
        sb = dict(zip(vars_, sol))
        exts = set()
        for row in rows:
            rb = dict(row)
            if all(sb[k] == v for k, v in rb.items() if k in sb):
                exts.add(tuple(sb[v] for v in vars_)
                         + tuple(rb.get(v) for v in uvars))
        if not exts:
            exts = {sol + tuple(None for _ in uvars)}
        want |= exts
    got = {tuple(r[c] for c in got_df.columns) for r in got_df.collect()}
    assert got_df.columns == vars_ + uvars
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), greq=pattern_st(3), ginner=pattern_st(4))
def test_bgp_nested_optional_equals_naive(spark, triples, req, greq,
                                          ginner):
    """OPTIONAL { G OPTIONAL { I } } vs the naive model: the group's
    solutions are G's matches extended by I per leftjoin (naive_optional
    — inner vars null when I fails), and each required solution extends
    with compatible group rows on the vars the SOLUTION binds, or all-
    null group vars when none match. The engine raises when an outer
    join key is bound only by the inner optional — skipped here."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    gvars, gsols = naive_solutions(triples, [greq])
    df = spark.createDataFrame(
        sorted(triples) * 2,  # duplicated rows must not multiply
        "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(
            df, [req],
            optional=[{"patterns": [greq], "optional": [ginner]}])
    except ValueError:
        return  # disconnected / inner-bound-join-key: typed by design
    grows, gallvars = naive_optional(gsols, gvars, triples, ginner)
    new = [v for v in gallvars if v not in vars_]
    want = set()
    for sol in sols:
        sb = dict(zip(vars_, sol))
        exts = set()
        for gr in grows:
            gb = dict(zip(gallvars, gr))
            if all(gb[v] == sb[v] for v in gallvars if v in sb):
                exts.add(sol + tuple(gb[v] for v in new))
        want |= exts if exts else {sol + (None,) * len(new)}
    assert got_df.columns == vars_ + new
    got = {tuple(r) for r in got_df.collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), greq=pattern_st(3), neg=pattern_st(4))
def test_bgp_optional_body_not_exists_equals_naive(spark, triples, req,
                                                   greq, neg):
    """NOT EXISTS inside an OPTIONAL body vs the naive model: the
    negation filters the GROUP's solutions (a rejected group row
    leaves the optional vars null), then the surviving group rows
    left-join the required solutions."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    gvars, gsols = naive_solutions(triples, [greq])
    nvars, nsols = naive_solutions(triples, [neg])
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(
            df, [req],
            optional=[{"patterns": [greq],
                       "not_exists": [[neg]]}])
    except ValueError:
        return  # disconnected / outer-correlated: typed by design
    shared_gn = [v for v in nvars if v in gvars]
    kept = set()
    for gs in gsols:
        gb = dict(zip(gvars, gs))
        hit = any(all(ns[nvars.index(v)] == gb[v] for v in shared_gn)
                  for ns in nsols)
        if not hit:
            kept.add(gs)
    new = [v for v in gvars if v not in vars_]
    want = set()
    for sol in sols:
        sb = dict(zip(vars_, sol))
        exts = set()
        for gs in kept:
            gb = dict(zip(gvars, gs))
            if all(gb[v] == sb[v] for v in gvars if v in sb):
                exts.add(sol + tuple(gb[v] for v in new))
        want |= exts if exts else {sol + (None,) * len(new)}
    assert got_df.columns == vars_ + new
    got = {tuple(r) for r in got_df.collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), b1=pattern_st(3), b2=pattern_st(3))
def test_group_union_negation_equals_naive(spark, triples, req, b1, b2):
    """UNION bodies in NOT EXISTS / EXISTS / MINUS against the naive
    model: NOT EXISTS{A∪B} drops a solution hit by EITHER branch;
    EXISTS keeps solutions hit by either branch, exactly once (bag
    correctness); MINUS removes on a hit from any branch that shares
    a variable (a disjoint-domain branch removes nothing, §8.3.3)."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    df = spark.createDataFrame(
        sorted(triples), "subj string, pred string, obj_value string")

    def hits(sol, branch):
        gvars, gsols = naive_solutions(triples, [branch])
        shared = [v for v in gvars if v in vars_]
        sb = dict(zip(vars_, sol))
        return shared, any(
            all(dict(zip(gvars, gs))[v] == sb[v] for v in shared)
            for gs in gsols)

    for kind in ("not_exists", "exists", "minus"):
        try:
            got_df = bgp_match(df, [req],
                               **{kind: [{"union": [[b1], [b2]]}]})
        except ValueError:
            continue  # branch shares no var (raises by design)
        want = set()
        for sol in sols:
            s1, h1 = hits(sol, b1)
            s2, h2 = hits(sol, b2)
            if kind == "minus":
                h1, h2 = h1 and bool(s1), h2 and bool(s2)
            hit = h1 or h2
            if (kind == "exists") == hit:
                want.add(sol)
        got = [tuple(r) for r in got_df.collect()]
        assert len(got) == len(set(got)), kind  # no row multiplication
        assert set(got) == want, kind


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), opt=pattern_st(3))
def test_bgp_optional_correlated_filter_equals_naive(spark, triples,
                                                     req, opt):
    """SPARQL LeftJoin(Ω1, Ω2, expr) with expr comparing an OUTER
    variable against a group variable: the engine compiles the filter
    into the left join's residual condition; the naive model applies
    expr to each merged solution and falls back to unbound when no
    compatible-and-passing row exists. When the picked 'outer' var
    happens to also be bound by the optional pattern the filter
    degrades to a group-only pre-filter — both paths must agree with
    the same naive model."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    opt_only = []
    for t in opt:
        if t.startswith("?") and t[1:] not in vars_ \
                and t[1:] not in opt_only:
            opt_only.append(t[1:])
    if not opt_only:
        return  # no group-only variable: nothing correlated to test
    ov, gv = vars_[0], opt_only[0]
    fexpr = f"`{gv}` > `{ov}`"
    df = spark.createDataFrame(
        sorted(triples) * 2,  # duplicated rows must not multiply
        "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(
            df, [req],
            optional=[{"patterns": [opt], "filters": [fexpr]}])
    except ValueError:
        return  # disconnected optional rejected by design
    # naive LeftJoin with expr over the merged binding
    opt_rows = set()
    for tr in triples:
        b, ok = {}, True
        for t, x in zip(opt, tr):
            if t.startswith("?"):
                if t[1:] in b and b[t[1:]] != x:
                    ok = False
                    break
                b[t[1:]] = x
            elif t != x:
                ok = False
                break
        if ok:
            opt_rows.add(tuple(sorted(b.items())))
    want = set()
    for sol in sols:
        sb = dict(zip(vars_, sol))
        exts = set()
        for row in opt_rows:
            rb = dict(row)
            if not all(sb[k] == v for k, v in rb.items() if k in sb):
                continue
            merged = {**sb, **rb}
            if merged[gv] > merged[ov]:  # ASCII string compare = Spark
                exts.add(tuple(merged[v] for v in vars_ + opt_only))
        if not exts:
            exts = {sol + tuple(None for _ in opt_only)}
        want |= exts
    cols = got_df.columns
    got = {tuple(r[c] for c in cols) for r in got_df.collect()}
    assert cols == vars_ + opt_only
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), body=pattern_st(3), sub=pattern_st(3))
def test_not_exists_body_solution_join_equals_naive(spark, triples,
                                                    req, body, sub):
    """NOT EXISTS whose body is a required pattern JOINED with a
    subquery solution set (bgp_match solution_joins inside the
    negation entry): the naive model materializes the body as
    join(body-pattern solutions, subquery solutions) on the shared
    vars, then drops outer solutions with a compatible body row.
    Subquery-only vars shared with the outer solutions refuse typed
    (substitution does not descend into subqueries) — those sampled
    shapes return early via the ValueError guard."""
    vars_, sols = naive_solutions(triples, [req])
    if not vars_:
        return
    bvars, bsols = naive_solutions(triples, [body])
    svars, ssols = naive_solutions(triples, [sub])
    if not svars:
        return
    subdf = spark.createDataFrame(
        [tuple(s) for s in ssols] or [tuple(None for _ in svars)],
        ", ".join(f"`{v}` string" for v in svars))
    if not ssols:
        subdf = subdf.limit(0)
    df = spark.createDataFrame(
        sorted(triples) * 2,
        "subj string, pred string, obj_value string")
    try:
        got_df = bgp_match(
            df, [req],
            not_exists=[{"patterns": [body],
                         "solution_joins": [{"df": subdf,
                                             "nullable": set()}]}])
    except ValueError:
        return  # disconnected / subquery-only-shared shapes refuse
    # naive: body rows = join(bsols, ssols) on shared body/sub vars
    shared_bs = [v for v in bvars if v in svars]
    brows = []
    for bs in bsols:
        bb = dict(zip(bvars, bs))
        for ss in ssols:
            sb = dict(zip(svars, ss))
            if all(bb[v] == sb[v] for v in shared_bs):
                brows.append({**bb, **sb})
    shared_ob = [v for v in vars_ if v in set(bvars) | set(svars)]
    want = set()
    for sol in sols:
        ob = dict(zip(vars_, sol))
        if not any(all(ob[v] == br[v] for v in shared_ob)
                   for br in brows):
            want.add(sol)
    got = {tuple(r[c] for c in got_df.columns)
           for r in got_df.collect()}
    assert got_df.columns == vars_
    assert got == want
