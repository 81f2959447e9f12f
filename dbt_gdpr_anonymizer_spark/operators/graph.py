"""Graph operators over edge lists — connected components for dedup
clustering.

No reference equivalent (tabodino/dbt-gdpr-anonymizer has no graph ops);
LLM-pipeline extension surface. Pairwise near-dup output (A~B, B~C) is not
yet a dedup decision: keeping "the lower id of each pair" can drop every
member of a chain. The right unit is the CONNECTED COMPONENT of the
similarity graph — keep one representative per component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.caching import track_caches

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    checkpoint: bool = False,
    max_driver_edges: int = 0,
) -> DataFrame:
    """Connected components by synchronous min-label propagation.

    Every node starts labeled with its own id; each round sets
    ``label(v) = min(label(v), min over neighbors u of label(u))`` using the
    PREVIOUS round's labels (synchronous — deterministic and engine-
    reproducible, which is what lets the registry oracle unroll the same
    rounds in SQL). After ``iters`` rounds, labels are exact for every
    component whose diameter is at most ``iters``; near-dup components are
    near-cliques (diameter 1-2), so the default 4 has slack. Components
    converge to their minimum member id.

    Each round is one join + one map-side-partial min aggregation — the
    per-round cost of the classic large-scale formulations (large-star /
    small-star of Kiveris et al., which add per-round re-wiring to cut the
    ROUND COUNT to O(log n) for high-diameter graphs; for bounded-diameter
    similarity graphs plain propagation in a fixed round budget is the
    cheaper plan). For big graphs pass ``checkpoint=True`` to materialize
    labels per round (``localCheckpoint``) so lineage — and the replay cost
    of a lost executor — stays flat instead of growing one join per round.

    Output: (node, component) for every node incident to an edge.

    Plan-shape note: round k references round k-1's labels TWICE (own label
    + neighbor lookup), so without materialization the logical plan doubles
    per round — 2^iters copies of the edge-producing subplan, which for an
    expensive edge source (a near-dup join) is a stage explosion long
    before the data is big. Both the bidirected edge list and each round's
    labels are therefore persisted: downstream rounds see a cached leaf,
    the plan stays O(iters), and each cache materializes exactly once when
    the final action runs.
    """
    # Persist the DIRECTED edge projection, not the bidirected union: the
    # union references the caller's edge plan twice, and for an expensive
    # edge source (a near-dup join) an uncached double-scan costs a full
    # extra pass before any round runs.
    cached: list[DataFrame] = []
    ed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    cached.append(ed)
    if max_driver_edges:
        # Small-graph fast path: near-dup graphs are usually TINY relative
        # to the corpus (the expensive part is finding the edges, not
        # clustering them) — iters × (join + agg) rounds on a few hundred
        # edges is pure stage-scheduling overhead. limit(k+1) bounds what
        # can ever reach the driver (the k-means model-state precedent:
        # bounded driver state, never corpus-sized); if the edge set fits,
        # run exact union-find driver-side — O(E α(E)), no rounds, and
        # identical output to converged min-label propagation (component =
        # min member id). Past the bound, fall through to the distributed
        # rounds unchanged.
        head = ed.limit(max_driver_edges + 1).collect()
        if len(head) <= max_driver_edges:
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            for row in head:
                ra, rb = find(row["a"]), find(row["b"])
                if ra != rb:
                    # union by MIN id so labels match min-propagation
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            nodes = sorted({r["a"] for r in head} | {r["b"] for r in head})
            spark = edges.sparkSession
            # Schema is derived from the actual edge id type so string /
            # int32 node ids round-trip with the same dtype the distributed
            # path would produce (which preserves the source column types).
            from pyspark.sql.types import StructField, StructType

            id_type = ed.schema["a"].dataType
            out = spark.createDataFrame(
                [(n, find(n)) for n in nodes],
                StructType(
                    [
                        StructField("node", id_type, False),
                        StructField("component", id_type, False),
                    ]
                ),
            )
            return track_caches(out, *cached)
    # Measured note (r5): pre-partitioning + persisting `bi` on the join
    # key to reuse one edge shuffle across rounds was tried and REVERTED —
    # the extra materialization cost more than the saved exchanges (4.1s →
    # 6.2s at sf0.1), and AQE does not reuse a cached DF's partitioning
    # for exchange elimination here. The cheap ed-cache + per-round
    # exchange below is the faster plan under AQE.
    bi = ed.unionByName(ed.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        bi.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iters):
        # min(own label, min over neighbor labels) written as one
        # min-of-union aggregation: a single map-side-partial shuffle per
        # round, vs the textbook join + agg + left-join (three). Semantics
        # identical and still synchronous — both branches read round k-1.
        nbr = bi.join(labels, bi["b"] == labels["node"]).select(
            F.col("a").alias("node"), "label"
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # localCheckpoint also truncates the LINEAGE (replay after executor
        # loss restarts from the checkpoint, not the source) at the cost of
        # writing label snapshots; plain persist keeps lineage but is free
        # until memory pressure. Either one flattens the plan.
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
        else:
            labels = labels.persist()
            cached.append(labels)
    # tracked on the result so release_caches() can free the edge cache and
    # every round's label cache once the caller has consumed the output
    return track_caches(
        labels.select("node", F.col("label").alias("component")), *cached
    )
