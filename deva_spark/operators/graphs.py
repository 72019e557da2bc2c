"""Iterative graph operators on edge DataFrames.

The reference resolves near-duplicate *pairs* but never groups them into
clusters (`/root/reference/deva/utils/simhash.py:247-341` answers only
point lookups); a real dedup funnel needs pairs -> connected components ->
one canonical survivor per component. This module supplies that last step
as a distributed min-label propagation over DataFrame joins.

Scale notes (100 TB corpus, ~1e9 near-dup edges):
- Each iteration is one shuffle join (edges x labels on node id) plus a
  groupBy min — both partition on the node id, so AQE can reuse the
  exchange. No driver-side collection of nodes or edges ever happens;
  the only actions are one-row convergence probes.
- Iterations needed = graph diameter. Near-dup components are dense and
  shallow (dup clusters are cliques or near-cliques), so propagation
  converges in a handful of rounds; ``max_iter`` bounds adversarial
  chains. For pathological long-path graphs the published alternating
  large-star/small-star algorithm (Kiveris et al., "Connected Components
  in MapReduce and Beyond") halves path lengths per round — documented
  here as the upgrade path; plain propagation is the right default for
  dedup-shaped graphs.
- Per-iteration ``persist`` breaks lineage growth (without it the plan
  re-derives every prior round each time) and the previous round's cache
  is released eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(node, component)`` where ``component`` is the minimum node
    id in the node's component — a deterministic canonical representative
    (the dedup survivor convention: keep the smallest doc id).

    Adaptive, like ``windows.global_positions``: the edge list is the
    *near-dup pair set*, orders of magnitude smaller than the corpus that
    produced it. Below ``driver_threshold`` edges it is collected and
    solved with union-find on the driver (one job total — iterative
    propagation would pay per-round job latency on trivial data); above
    it, distributed min-label propagation: every node starts labeled with
    itself, each round takes the min of its own and its neighbors'
    labels, stopping when a round changes nothing (cheap ``limit(1)``
    existence probe, not a full count).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.persist()
    n_edges = sym.count()
    if n_edges <= driver_threshold:
        try:
            return _driver_union_find(sym)
        finally:
            sym.unpersist()
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("comp")).persist()
    try:
        for _ in range(max_iter):
            nbr_min = (
                sym.join(
                    labels.select(F.col("node").alias("b"), F.col("comp").alias("nc")),
                    "b",
                )
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("nc").alias("nbr_min"))
            )
            stepped = (
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.col("comp").alias("_old"),
                    F.least(
                        F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))
                    ).alias("comp"),
                )
                .persist()
            )
            changed = stepped.filter(F.col("comp") < F.col("_old")).limit(1).count()
            labels.unpersist()
            labels = stepped
            if changed == 0:
                break
        return labels.select("node", "comp")
    finally:
        sym.unpersist()


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Small-graph path: union-find with min-id roots over the collected
    (already symmetrized, already persisted) edge list. The collect is
    bounded by ``driver_threshold`` rows of two longs — driver-side by
    design, not by accident."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in sym.collect():
        a, b = row["a"], row["b"]
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        parent.setdefault(a, find(a))
        parent.setdefault(b, find(b))
    out = [(n, find(n)) for n in parent]
    schema = sym.select(
        F.col("a").alias("node"), F.col("a").alias("comp")
    ).schema
    return sym.sparkSession.createDataFrame(out, schema)


def canonical_assignments(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "doc_id",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Near-dup pairs -> per-doc cluster assignment with a canonical flag.

    Output: ``(doc_id, cluster_id, is_canonical)`` for every doc that
    appears in at least one pair; ``is_canonical`` marks the single
    survivor (min id) of each cluster. Docs in no pair are trivially
    their own cluster and are omitted (anti-join the corpus against this
    result to keep them, which avoids materializing the identity mapping
    for the un-duplicated bulk of a 100 TB corpus).
    """
    comp = connected_components(
        pairs, src=id_a, dst=id_b, max_iter=max_iter, driver_threshold=driver_threshold
    )
    return comp.select(
        F.col("node").alias(out_id),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )
