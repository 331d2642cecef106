"""Distributed RDF canonicalization (SURVEY.md §2 T14, §3.3 Spark trace).

The reference (``core/NormalizeUtils.java:35-203``) is a sequential
fixpoint over ALL blank nodes of the dataset. Its hash-first-degree
values are *component-local* (a bnode's hash depends only on its own
quads), so the distributed plan is:

1. **bnode components** — blank nodes co-occurring in a quad are
   connected; connected components via the same iterative min-label
   propagation used for entity linking (each round one shuffle,
   ``localCheckpoint`` to cut lineage). In pipeline output bnode labels
   are doc-prefixed, so components are doc-local and tiny — the fixpoint
   converges in one or two rounds.
2. **per-component exact canonicalization** — repartition by component,
   then a ``mapInPandas`` kernel runs the verbatim pure-core algorithm
   (``core/normalize.canonical_namer``: URGNA2012-lineage SHA-1
   hashing + SJT permutation search) per component, embarrassingly
   parallel and batched (many doc-sized components per Arrow batch).
3. **deterministic global renumber** — components ordered by their
   canonical-form hash get disjoint ``_:c14n`` label ranges via a
   fully-distributed two-phase prefix sum (``prefix_offsets``: range
   partition → per-partition totals collected to the driver → parallel
   partition-local cumsum). Labels are a pure function of graph
   content — never of task scheduling.

Output-label note: for a single bnode component (every normalize
fixture; any single document) labels match the reference exactly. For
multi-component datasets the reference would interleave label numbers
across components in global sorted-hash order — a sequential coupling
that is also quadratic-prone when many documents share identical
structure (equal first-degree hashes force hashPaths). Our numbering is
canonical and deterministic (isomorphic inputs → identical output
multiset) but may permute label *numbers* across components relative to
a single-node run; per-component canonical forms are identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.normalize import canonical_namer, rename_quads
from ..core.nquads import quad_to_nquad
from ..core.rdf import Quad
from ..session import cut_lineage
from .linking import connected_components

QUAD_COLS = ["doc_id", "graph", "subj", "pred", "obj_kind", "obj_value",
             "obj_datatype", "obj_lang"]

_CANON_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in QUAD_COLS]
    + [T.StructField("component", T.StringType()),
       T.StructField("comp_hash", T.StringType()),
       T.StructField("n_labels", T.LongType())])


def _bnode_mentions() -> F.Column:
    """Distinct blank-node labels mentioned by a quad (subj, obj, graph)."""
    is_b = [F.when(F.col("subj").startswith("_:"), F.col("subj")),
            F.when(F.col("obj_kind") == "bnode", F.col("obj_value")),
            F.when(F.col("graph").startswith("_:"), F.col("graph"))]
    arr = F.array_compact(F.array(*is_b))
    return F.array_distinct(arr)


def bnode_components(triples: DataFrame, max_iter: int = 50) -> DataFrame:
    """(bnode, component) for every blank node in the dataset; bnodes
    co-occurring in a quad share a component. Star edges to the first
    mention keep the edge list linear in quad count."""
    mentions = triples.select(_bnode_mentions().alias("bs")) \
                      .where(F.size("bs") > 0)
    multi = mentions.where(F.size("bs") > 1)
    edges = multi.select(F.element_at("bs", 1).alias("src"),
                         F.explode(F.slice("bs", 2, 1 << 30)).alias("dst"))
    cc = connected_components(edges, max_iter=max_iter)
    singles = (mentions.select(F.explode("bs").alias("node")).distinct()
               .join(cc, "node", "left_anti")
               .withColumn("component", F.col("node")))
    return cc.unionByName(singles)


def _canonize_group(doc_ids: list, quads: list[Quad], component: str,
                    out: dict) -> None:
    """Canonicalize one component's quads into the output column lists."""
    import hashlib
    namer = canonical_namer(quads)
    renamed = rename_quads(quads, namer)
    # sha256 (not the algorithm's SHA-1): this hash only orders components
    # for the global renumber, and sha256 is reproducible in SQL oracles
    comp_hash = hashlib.sha256("".join(
        sorted(quad_to_nquad(q) + "\n" for q in renamed)).encode()).hexdigest()
    n = len(renamed)
    out["doc_id"].extend(doc_ids)
    out["graph"].extend(q.graph for q in renamed)
    out["subj"].extend(q.subj for q in renamed)
    out["pred"].extend(q.pred for q in renamed)
    out["obj_kind"].extend(q.obj_kind for q in renamed)
    out["obj_value"].extend(q.obj_value for q in renamed)
    out["obj_datatype"].extend(q.obj_datatype for q in renamed)
    out["obj_lang"].extend(q.obj_lang for q in renamed)
    out["component"].extend([component] * n)
    out["comp_hash"].extend([comp_hash] * n)
    out["n_labels"].extend([namer.counter] * n)


def _canonize_partition(batches):
    """mapInPandas kernel: the partition holds complete components
    (guaranteed by repartition('component')); regroup across Arrow
    batches in-Python and canonicalize each component. Components are
    doc-sized, so output columns accumulate in plain lists across the
    whole partition — one output DataFrame, not one per group (per-group
    DataFrame construction dominated an applyInPandas variant ~10×)."""
    pdfs = list(batches)
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True)
    out: dict[str, list] = {c: [] for c in _CANON_SCHEMA.fieldNames()}
    for component, g in pdf.groupby("component", sort=False):
        quads = [Quad(r.graph, r.subj, r.pred, r.obj_kind, r.obj_value,
                      r.obj_datatype, r.obj_lang) for r in g.itertuples()]
        _canonize_group(list(g["doc_id"]), quads, component, out)
    yield pd.DataFrame(out)


def prefix_offsets(df: DataFrame, order_cols: list[str], value_col: str,
                   offset_col: str = "_offset") -> DataFrame:
    """Distributed exclusive prefix sum: adds ``offset_col`` = sum of
    ``value_col`` over all rows strictly before this one in
    ``order_cols`` order.

    A global no-``partitionBy`` window would collapse the table into one
    task (the round-1 scale bug); instead:

    1. ``repartitionByRange(order_cols)`` — global order across
       partitions — then materialize to PIN the sampled range bounds
       (re-execution could re-sample differently between the two reads);
    2. per-partition totals → driver (one row per partition, ~10³ rows
       at any scale) → cumulative partition base offsets;
    3. partition-local cumulative sum (window partitioned by partition
       id — every partition runs in parallel) + base offset.
    """
    spark = df.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism, 1)
    ranged = cut_lineage(df.repartitionByRange(n_part, *order_cols)
                         .withColumn("_pid", F.spark_partition_id()))
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_t")) \
                   .collect()
    base: dict[int, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        base[r["_pid"]] = acc
        acc += int(r["_t"])
    if base:
        base_map = F.create_map(*[F.lit(x) for kv in base.items()
                                  for x in kv])
        base_off = F.coalesce(base_map[F.col("_pid")], F.lit(0))
    else:  # empty input: no partitions materialized any rows
        base_off = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_cols) \
              .rowsBetween(Window.unboundedPreceding, -1)
    local = F.coalesce(F.sum(value_col).over(w), F.lit(0).cast("long"))
    return (ranged
            .withColumn(offset_col, (local + base_off).cast("long"))
            .drop("_pid"))


def _shift_label(col: F.Column, offset: F.Column) -> F.Column:
    return F.when(
        col.startswith("_:c14n"),
        F.concat(F.lit("_:c14n"),
                 F.substring(col, 7, 1000).cast("long") + offset)
    ).otherwise(col)


def canonicalize_triples(triples: DataFrame,
                         max_iter: int = 50) -> DataFrame:
    """Triples → canonical triples: every blank-node label replaced by a
    deterministic ``_:c14n{n}`` label, unique across the whole dataset.
    Quads without blank nodes pass through untouched (no shuffle)."""
    # the input lineage (typically the full expand+toRDF UDF stage) is
    # referenced several times below — materialize it exactly once.
    # cut_lineage uses a reliable checkpoint when the session has a
    # checkpoint dir (executor loss mid-job doesn't kill an hour-long
    # run), else executor-local blocks.
    triples = cut_lineage(triples)
    has_b = F.size(_bnode_mentions()) > 0
    plain = triples.where(~has_b)
    bquads = triples.where(has_b)

    comps = bnode_components(bquads, max_iter=max_iter)
    # every bnode of a quad maps to the same component — join on the first
    keyed = (bquads.withColumn("_b0", F.element_at(_bnode_mentions(), 1))
             .join(comps.withColumnRenamed("node", "_b0"), "_b0")
             .drop("_b0"))

    # the kernel output is read twice (per-component offsets + the final
    # join side) — materialize so the canonicalization pass runs once
    canon = cut_lineage(keyed.repartition("component")
                        .mapInPandas(_canonize_partition, _CANON_SCHEMA))

    # deterministic disjoint label ranges: order components by canonical
    # hash; one row per component, but at 10^12 docs that is ~10^12 rows
    # — the prefix sum is fully distributed (no single-partition window)
    # and the offset join is a plain shuffled join (AQE may still pick a
    # broadcast at small scale; never forced)
    per_comp = (canon.select("component", "comp_hash", "n_labels").distinct())
    offsets = prefix_offsets(per_comp, ["comp_hash", "component"],
                             "n_labels").select("component", "_offset")

    shifted = canon.join(offsets, "component")
    for c in ("graph", "subj", "obj_value"):
        shifted = shifted.withColumn(c, _shift_label(F.col(c),
                                                     F.col("_offset")))
    return (shifted.select(*QUAD_COLS)
            .unionByName(plain.select(*QUAD_COLS)))
