"""Entity linking: connected components over equivalence edges.

No reference analogue (SURVEY.md §2.3 "Joins"): merges coreferent
IRIs/blank nodes (e.g. ``owl:sameAs`` edges, media_ref↔doc links) by
computing connected components with iterative min-label propagation —
a driver fixpoint loop of joins/aggregations, each round a shuffle,
with ``localCheckpoint`` to cut lineage (SURVEY.md §4 item 2).

Scale notes: plain min-label propagation converges in O(diameter)
rounds — fine for the short equivalence chains real KG data produces
(doc-local bnode cliques, sameAs runs). For adversarially long chains
the large-star/small-star scheme (Kiveris et al. 2014, "Connected
Components in MapReduce and Beyond") converges in O(log² n) rounds at
the cost of two shuffles per round — worth swapping in only if label
propagation fails to converge within ``max_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 50,
                         checkpoint_every: int = 5) -> DataFrame:
    """edges(src,dst) → (node, component) where component = min node id
    reachable. Node ids must be orderable (long or string)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
             .where(F.col("src").isNotNull() & F.col("dst").isNotNull()) \
             .dropDuplicates()
    # undirected: keep both directions once
    sym = e.unionByName(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst"))).dropDuplicates()
    sym = sym.localCheckpoint(eager=True)
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .persist())
    for i in range(max_iter):
        # message passing: each node offers its label to its neighbors
        msgs = (sym.join(labels, sym.src == labels.node)
                .select(F.col("dst").alias("node"),
                        F.col("component").alias("cand")))
        mins = msgs.groupBy("node").agg(F.min("cand").alias("cand"))
        stepped = (labels.join(mins, "node", "left")
                   .select("node",
                           F.least("component",
                                   F.coalesce("cand", "component"))
                            .alias("component"),
                           (F.col("cand") < F.col("component"))
                           .alias("_changed")))
        # pointer jumping (path halving): also adopt the label OF my
        # label — rounds drop from O(diameter) to O(log diameter)
        ptr = stepped.select(F.col("node").alias("component"),
                             F.col("component").alias("_jump"))
        new_labels = (stepped.join(ptr, "component", "left")
                      .select("node",
                              F.least(F.col("component"),
                                      F.coalesce("_jump", "component"))
                               .alias("component"),
                              (F.col("_changed")
                               | (F.col("_jump") < F.col("component")))
                              .alias("_changed")))
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            # cache each round: the convergence check populates the
            # cache, the next round (or the caller) reads it
            new_labels = new_labels.persist()
        changed = new_labels.where("_changed").limit(1).count()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "component")


def link_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Rewrite subj/obj IRIs to their component-canonical IRI.
    ``components``: (node, component) — broadcast when small, else two
    shuffled left joins on subj and obj."""
    c_subj = components.select(F.col("node").alias("subj"),
                               F.col("component").alias("_subj_canon"))
    c_obj = components.select(F.col("node").alias("obj_value"),
                              F.col("component").alias("_obj_canon"))
    out = (triples
           .join(F.broadcast(c_subj), "subj", "left")
           .join(F.broadcast(c_obj), "obj_value", "left"))
    return (out
            .withColumn("subj", F.coalesce("_subj_canon", "subj"))
            .withColumn("obj_value",
                        F.when(F.col("obj_kind") == "iri",
                               F.coalesce("_obj_canon", "obj_value"))
                        .otherwise(F.col("obj_value")))
            .drop("_subj_canon", "_obj_canon"))
