"""Road-network topology: way graph construction + connected components.

The reference streams entities and leaves graph analysis to downstream
routers (osmium-tool has no network pass; OSRM/Valhalla preprocessors
rebuild the graph per run). At engine scale the graph IS a DataFrame:
consecutive ref pairs of every way are edges, and "routing islands" —
components disconnected from the main road network, the classic map-QA
defect — fall out of the same alternating large-star/small-star CC
machinery the dedup pipeline uses (operators/dedup.dup_clusters,
Kiveris et al. 2014), so the whole analysis is a handful of shuffles on
the edge set, no driver-side graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def way_edges(ways: DataFrame, id_col: str = "id", refs_col: str = "refs") -> DataFrame:
    """Undirected edge list from way geometry: one (u, v) row per
    consecutive ref pair, self-loops dropped (a doubled node contributes
    no connectivity). Pure Column math — slice/zip_with/explode inside
    codegen, one pass over the way table."""
    refs = F.col(refs_col)
    pairs = F.zip_with(
        F.slice(refs, 1, F.greatest(F.size(refs) - 1, F.lit(0))),
        F.slice(refs, 2, F.greatest(F.size(refs) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("u"), b.alias("v")),
    )
    return (
        ways.filter(F.size(refs) >= 2)
        .select(F.explode(pairs).alias("e"))
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def network_components(
    ways: DataFrame, id_col: str = "id", refs_col: str = "refs"
) -> DataFrame:
    """Label every node of the way network with its connected component
    (component_id = the component's minimum node id) and the component's
    node count — `component_size 1..k` ORDER BY size surfaces routing
    islands directly.

    Nodes referenced by some way but in no 2+-node path (single-ref ways,
    pure self-loops) are singleton components. Scale shape: edge
    construction is one pass; CC is the O(log^2 n)-round large/small-star
    loop on a monotonically shrinking edge set; the size join is one
    hash-agg + broadcast-sized join per component frame.

    Returns (node_id, component_id, component_size).
    """
    from .dedup import dup_clusters

    edges = way_edges(ways, id_col=id_col, refs_col=refs_col)
    universe = (
        ways.select(F.explode(F.col(refs_col)).alias("id")).distinct()
    )
    labeled = dup_clusters(edges, a="u", b="v", ids=universe)
    sizes = labeled.groupBy("cluster_id").agg(
        F.count("*").alias("component_size")
    )
    return labeled.join(sizes, "cluster_id").select(
        F.col("id").alias("node_id"),
        F.col("cluster_id").alias("component_id"),
        "component_size",
    )
