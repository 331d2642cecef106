"""Knowledge-graph query and inference over the triples DataFrame.

The reference (jsonld-java) stops at producing/consuming RDF; a KG
engine also has to QUERY it (SPARQL-style basic graph patterns) and
ENTAIL over it (RDFS subclass/subproperty/domain/range). Both are
re-expressed Spark-first here:

* ``bgp_match`` — a conjunctive triple-pattern query is nothing but a
  chain of equi-joins over filtered scans of the triples table, which
  is exactly what Catalyst optimizes best: constant terms become
  pushed-down parquet filters (partition pruning when the table is
  partitioned by predicate, the standard warehouse layout), join order
  and broadcast-vs-shuffle are AQE's call per pattern selectivity.
* ``rdfs_closure`` — the ontology (schema) is corpus-INDEPENDENT and
  small (10^3-10^5 rows for real ontologies), so its transitive
  closure is computed once driver-side and applied to the 100 TB fact
  table as broadcast-join expansions: one pass, no fixpoint over the
  data. The classic trap — iterating rdfs9 over the full triple table
  — is avoided by closing the schema first (closure(schema) applied
  once is equivalent to the RDFS fixpoint for these rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SUB_CLASS = RDFS + "subClassOf"
SUB_PROP = RDFS + "subPropertyOf"
DOMAIN = RDFS + "domain"
RANGE = RDFS + "range"


def _pattern_step(triples: DataFrame, pat: tuple[str, str, str], i: int,
                  pos_cols: tuple[str, str, str]) -> tuple[DataFrame,
                                                           list[str]]:
    """One triple pattern → (filtered projection, its variable names)."""
    if len(pat) != 3:
        raise ValueError(f"pattern {i} must be (s, p, o), got {pat!r}")
    step = triples
    rename: dict[str, str] = {}
    for term, col in zip(pat, pos_cols):
        if term.startswith("?"):
            var = term[1:]
            if not var:
                raise ValueError(f"pattern {i}: bare '?' term")
            if var in rename.values():
                # same var twice in one pattern: equality filter
                prev = next(c for c, v in rename.items() if v == var)
                step = step.where(F.col(col) == F.col(prev))
            else:
                rename[col] = var
        else:
            step = step.where(F.col(col) == term)
    return (step.select(*[F.col(c).alias(v) for c, v in rename.items()]),
            list(rename.values()))


def bgp_match(triples: DataFrame, patterns: list[tuple[str, str, str]],
              optional: list[tuple[str, str, str]] | None = None,
              s_col: str = "subj", p_col: str = "pred",
              o_col: str = "obj_value") -> DataFrame:
    """Match a SPARQL-style basic graph pattern: ``patterns`` is a list
    of (subject, predicate, object) terms where a term starting with
    ``?`` is a variable and anything else a constant. Returns one
    column per variable (first-appearance order), one row per binding.
    ``optional`` patterns are SPARQL OPTIONAL clauses: each left-joins
    on its shared variables, binding its new variables where it
    matches and null where it doesn't (rows are never dropped).

    Plan shape: each pattern is a filtered projection of the triples
    scan — constants become pushed-down filters (``PushedFilters`` on
    the parquet scan; predicate partition pruning when the table is
    laid out that way) — and patterns sharing a variable join on it.
    Join ORDER is left to Catalyst/AQE: selective patterns produce
    small sides that AQE converts to broadcast joins at runtime.
    Patterns (required or optional) that share no variable with what
    came before would be a cartesian product; that is almost always a
    query bug at scale, so it raises instead of silently exploding.
    """
    if not patterns:
        raise ValueError("empty pattern list")
    pos_cols = (s_col, p_col, o_col)
    out: DataFrame | None = None
    bound: list[str] = []
    for i, pat in enumerate(patterns):
        step, step_vars = _pattern_step(triples, pat, i, pos_cols)
        if out is None:
            out, bound = step, step_vars
            continue
        shared = [v for v in step_vars if v in bound]
        if not shared:
            raise ValueError(
                f"pattern {i} shares no variable with earlier patterns "
                "— a cartesian product; reorder or constrain the query")
        out = out.join(step, shared)
        bound += [v for v in step_vars if v not in bound]
    # required bindings are set-distinct BEFORE optionals so an input
    # with duplicate triples cannot multiply optional matches
    out = out.select(*bound).distinct()
    for i, pat in enumerate(optional or []):
        step, step_vars = _pattern_step(triples, pat, i, pos_cols)
        shared = [v for v in step_vars if v in bound]
        new = [v for v in step_vars if v not in bound]
        if not shared:
            raise ValueError(
                f"optional pattern {i} shares no variable with the "
                "required patterns — a cartesian product")
        if new:
            step = step.dropDuplicates(step_vars)
        out = out.join(step, shared, "left")
        bound += new
    return out.select(*bound)


def _driver_closure(edges: list[tuple[str, str]]) -> set[tuple[str, str]]:
    """Transitive closure of small (sub, sup) edge list — plain BFS per
    node; the schema is bounded (see rdfs_closure), so O(V·E) is fine
    driver-side."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out: set[tuple[str, str]] = set()
    for start in adj:
        seen: set[str] = set()
        stack = list(adj[start])
        while stack:
            n = stack.pop()
            if n in seen or n == start:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        out.update((start, s) for s in seen)
    return out


def rdfs_closure(triples: DataFrame, schema: DataFrame,
                 s_col: str = "subj", p_col: str = "pred",
                 o_col: str = "obj_value", kind_col: str | None = "obj_kind",
                 max_schema_rows: int = 1_000_000) -> DataFrame:
    """RDFS entailment (rules rdfs2/3/5/7/9/11) of ``triples`` under
    ``schema``: returns the ENTAILED triples (subj, pred, obj) —
    distinct, not already required to be absent from the input.

    * rdfs7: (p subPropertyOf* q), (s p o)        → (s q o)
    * rdfs2: (p domain D), (s p o)                → (s type D)
    * rdfs3: (p range R), (s p o), o an IRI       → (o type R)
    * rdfs9/11: (x type C), (C subClassOf* D)     → (x type D)

    Scale contract: the schema is an ontology — its size does not grow
    with the corpus — so its subPropertyOf/subClassOf TRANSITIVE
    closures are computed driver-side (bounded by ``max_schema_rows``,
    typed error above: an oversized "schema" is a modelling bug, not a
    partitioning problem) and every application to the fact table is a
    single broadcast equi-join. Domain/range are pre-composed with the
    property closure driver-side too (if p ⊑ q and q has domain D then
    p implies D), so the data passes are: one join for rdfs7, one for
    rdfs2, one for rdfs3, and the type triples (original + derived)
    join the class closure once for rdfs9 — a fixed 4-join DAG over
    the big table, no data-side fixpoint, equivalent to the RDFS
    fixpoint because the schema closure is exact.

    ``kind_col`` (when present) gates rdfs3 to IRI objects — literals
    have no types. Pass ``None`` if the triples frame has no kind
    column (every object treated as a node).
    """
    n = schema.limit(max_schema_rows + 1).count()
    if n > max_schema_rows:
        raise ValueError(
            f"schema has >{max_schema_rows} rows — not an ontology; "
            "rdfs_closure broadcasts the closed schema by design")
    rows = [(r[0], r[1], r[2])
            for r in schema.select(s_col, p_col, o_col).collect()]
    sub_prop = [(s, o) for s, p, o in rows if p == SUB_PROP]
    sub_cls = [(s, o) for s, p, o in rows if p == SUB_CLASS]
    prop_clo = {(a, b) for a, b in sub_prop} | _driver_closure(sub_prop)
    cls_clo = {(a, b) for a, b in sub_cls} | _driver_closure(sub_cls)
    # compose domain/range through the property closure: p ⊑* q carries
    # q's domain/range down to p
    dom = {(s, o) for s, p, o in rows if p == DOMAIN}
    rng = {(s, o) for s, p, o in rows if p == RANGE}
    dom |= {(p, d) for p, q in prop_clo for q2, d in dom if q2 == q}
    rng |= {(p, r) for p, q in prop_clo for q2, r in rng if q2 == q}

    spark = triples.sparkSession

    def _edge_df(pairs: set[tuple[str, str]], a: str, b: str) -> DataFrame:
        return spark.createDataFrame(
            sorted(pairs) or [("", "")], f"{a} string, {b} string"
        ).where(F.col(a) != "")

    sel = [F.col(s_col).alias("subj"), F.col(p_col).alias("pred"),
           F.col(o_col).alias("obj")]
    facts = triples.select(
        *sel, *([F.col(kind_col).alias("_kind")] if kind_col else
                [F.lit("iri").alias("_kind")]))

    # rdfs7: super-property expansion
    sp = _edge_df(prop_clo, "p_sub", "p_sup")
    ent7 = (facts.join(F.broadcast(sp), facts.pred == sp.p_sub)
            .select("subj", F.col("p_sup").alias("pred"), "obj", "_kind"))
    # rdfs2/3 over original facts (ent7 facts are covered because dom/rng
    # were composed through the property closure)
    dm = _edge_df(dom, "p_dom", "cls")
    ent2 = (facts.join(F.broadcast(dm), facts.pred == dm.p_dom)
            .select("subj", F.lit(RDF_TYPE).alias("pred"),
                    F.col("cls").alias("obj")))
    rg = _edge_df(rng, "p_rng", "cls")
    ent3 = (facts.where(F.col("_kind") == "iri")
            .join(F.broadcast(rg), facts.pred == rg.p_rng)
            .select(F.col("obj").alias("subj"),
                    F.lit(RDF_TYPE).alias("pred"),
                    F.col("cls").alias("obj")))
    # rdfs9/11: all type triples (asserted + just derived) × class closure
    types = (facts.where(F.col("pred") == RDF_TYPE)
             .select("subj", "pred", "obj")
             .unionByName(ent2).unionByName(ent3)
             .unionByName(ent7.where(F.col("pred") == RDF_TYPE)
                          .select("subj", "pred", "obj")))
    cc = _edge_df(cls_clo, "c_sub", "c_sup")
    ent9 = (types.join(F.broadcast(cc), types.obj == cc.c_sub)
            .select("subj", "pred", F.col("c_sup").alias("obj")))

    return (ent7.select("subj", "pred", "obj")
            .unionByName(ent2).unionByName(ent3).unionByName(ent9)
            .distinct())


def property_path(triples: DataFrame, pred: str,
                  s_col: str = "subj", p_col: str = "pred",
                  o_col: str = "obj_value",
                  max_rounds: int = 20) -> DataFrame:
    """SPARQL property path ``pred+``: every (src, dst) pair connected
    by a directed path of one or more ``pred`` edges. Unlike
    ``rdfs_closure`` — whose transitive relations live in a SMALL
    schema closed driver-side — this closes a relation inside the fact
    table itself (deployment hierarchies, part-of chains, reply-to
    threads), so the closure runs data-side.

    Iterative doubling: after round r the path set holds every pair up
    to 2^r hops, so a diameter-D relation converges in ceil(log2 D)
    rounds — each one self-equi-join + distinct, lineage-cut so round
    r+1 reads a materialized table instead of replaying r rounds of
    joins. Cycles are safe: reflexive pairs are dropped each round and
    ``distinct`` caps growth at |V|². ``max_rounds=20`` spans paths of
    10^6 hops; a relation that has not converged by then raises rather
    than silently truncating. Output size is the real scale bound —
    O(V·D) for hierarchies (fine for taxonomy/thread shapes, the
    intended use), O(V²) for dense cyclic relations (don't).
    """
    from ..session import cut_lineage
    edges = (triples.where(F.col(p_col) == pred)
             .select(F.col(s_col).alias("src"), F.col(o_col).alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    paths = cut_lineage(edges)
    n = paths.count()
    for _ in range(max_rounds):
        hop = (paths.alias("a")
               .join(paths.alias("b"), F.col("a.dst") == F.col("b.src"))
               .select(F.col("a.src").alias("src"),
                       F.col("b.dst").alias("dst")))
        grown = cut_lineage(paths.unionByName(hop)
                            .where(F.col("src") != F.col("dst"))
                            .distinct())
        m = grown.count()
        if m == n:
            return grown
        paths, n = grown, m
    raise RuntimeError(
        f"property_path: no fixpoint after {max_rounds} doubling rounds "
        f"(paths of 2^{max_rounds} hops) — relation too deep or growing "
        "pathologically; raise max_rounds only if that is expected")
