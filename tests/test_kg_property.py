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
    """Extend each solution with one OPTIONAL pattern per bgp_match's
    documented semantics (left join on shared vars, distinct optional
    bindings, null where unmatched)."""
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
            if all(sb[k] == v for k, v in rb.items() if k in sb):
                exts.add(tuple(rb.get(v) for v in opt_vars))
        if not exts:
            exts = {tuple(None for _ in opt_vars)}
        for e in exts:
            out.add(sol + e)
    return out, vars_ + opt_vars


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(triples=st.sets(triple_st, min_size=1, max_size=12),
       req=pattern_st(2), opt=pattern_st(3), ne=pattern_st(2))
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
    # NOT EXISTS: drop solutions where ne matches under the solution's
    # bindings of the shared vars (null shared vars never match)
    ne_vars, ne_sols = naive_solutions(triples, [ne])
    shared = [v for v in ne_vars if v in all_vars]
    keep = set()
    for sol in want:
        sb = dict(zip(all_vars, sol))
        hit = any(all(sb[v] is not None
                      and sb[v] == ns[ne_vars.index(v)] for v in shared)
                  for ns in ne_sols)
        if not hit:
            keep.add(sol)
    got = {tuple(r[c] for c in got_df.columns) for r in got_df.collect()}
    assert got_df.columns == all_vars
    assert got == keep
