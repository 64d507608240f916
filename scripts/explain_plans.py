"""Emit formatted physical plans for the engine's key operators to
PLANS.md — the pushdown/codegen evidence trail (scan pruning,
PushedFilters, whole-stage codegen spans, join strategies).

Usage: python scripts/explain_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def capture_explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import numpy as np

    from pyspark.sql import functions as F

    from osmium_tool_spark.functions.geometry import Extract
    from osmium_tool_spark.operators.pipeline import image_extract_tile
    from osmium_tool_spark.operators.similarity import knn_cellring
    from osmium_tool_spark.operators.tags_filter import tags_filter
    from osmium_tool_spark.session import get_spark
    from osmium_tool_spark.sources import testdata as td
    from osmium_tool_spark.sources.images import synth_images

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")

    sections = []

    # 1. flagship pipeline over a parquet image table: expect PushedFilters
    # on fmt/caption, ReadSchema limited to the 3 needed columns, one
    # codegen span scan->cell->explode
    tbl = "/tmp/explain_images"
    if not os.path.exists(os.path.join(tbl, "_SUCCESS")):
        synth_images(spark, 10_000, partitions=4).write.mode("overwrite").parquet(tbl)
    imgs = spark.read.parquet(tbl)
    r = 800_000_000
    tiles = image_extract_tile(
        imgs,
        ["n/fmt=png,jpeg", "n/caption=caption*"],
        [Extract.bbox(0, -60, -45, 80, 60),
         Extract.polygon(1, [np.array([(r, 0), (0, r), (-r, 0), (0, -r), (r, 0)], np.int64)])],
        cell_res=8,
    )
    sections.append(("Flagship image_extract_tile (parquet scan)", capture_explain(tiles)))

    # 2. tags-filter -R: predicate fully pushed into the plan
    ents = td.entities(spark, "/root/testdata/sf0.001")
    tf = tags_filter(ents, ["n/type=MEDIUM", "w/priority=1-URGENT"], omit_referenced=True)
    sections.append(("tags-filter -R (predicate bank)", capture_explain(tf)))

    # 3. kNN cell-ring: equi-join on cell ids + windowed top-k
    nodes = td.nodes_from_part(spark, "/root/testdata/sf0.001")
    knn = knn_cellring(nodes, nodes.filter(F.col("id") % 97 == 0), res=6, ring=2, k=5)
    sections.append(("kNN cell-ring expansion", capture_explain(knn)))

    # 4. renumber id assignment (distributed zipWithIndex): the round-1
    # verdict's top fix. MUST show: one balanced range Exchange feeding the
    # checkpoint, then ONLY a BroadcastHashJoin + Project — no Window, no
    # per-type (<=3 partition) exchange anywhere
    from osmium_tool_spark.functions.sortkeys import id_sort_key
    from osmium_tool_spark.functions.zipindex import dense_index

    ways = td.ways_from_orders(spark, "/root/testdata/sf0.001")
    fresh = nodes.unionByName(ways).select("type", "id").distinct()
    mapping = dense_index(fresh, [id_sort_key(F.col("id"))], part_col="type")
    sections.append(
        ("renumber id assignment via dense_index (no single-partition window)",
         capture_explain(mapping))
    )

    # 5. validate_order: per-partition lag + tiny boundary stitch; the only
    # Window over the full data partitions on __pid (balanced), the global
    # Window runs over n_partitions aggregate rows only
    from osmium_tool_spark.operators.sort_merge import validate_order

    hist = td.history_from_events(spark, "/root/testdata/sf0.001").withColumn(
        "seq", F.col("changeset")
    )
    sections.append(
        ("validate_order (range-partitioned lag + boundary stitch)",
         capture_explain(validate_order(hist)))
    )

    # 6. multimodal frame sampling: MUST be pure Column math — no
    # ArrowEvalPython/MapInPandas nodes anywhere (sequence+posexplode in
    # whole-stage codegen)
    from osmium_tool_spark.operators.multimodal import sample_frames
    from osmium_tool_spark.sources.images import synth_images_from_documents

    imgs = synth_images_from_documents(spark, "/root/testdata/sf0.001")
    sections.append(
        ("multimodal sample_frames (zero Python)",
         capture_explain(sample_frames(imgs, every_n=7)))
    )

    # 7. exact ann_topk (round-4 pre-reduce): MUST show Scan -> MapInPandas
    # (per-partition local top-k) -> WindowGroupLimit Partial -> ONE
    # Exchange carrying only partitions x queries x k candidate rows ->
    # Final window. The corpus never reaches the exchange.
    from osmium_tool_spark.operators.similarity import ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 97 == 0)
    sections.append(
        ("exact ann_topk (per-partition pre-top-k, candidates-only exchange)",
         capture_explain(ann_topk(emb, q, k=5)))
    )

    # 8. .osc section logic (round-4): ONE Exchange total —
    # rangepartitioning(__b) — satisfying the lag window's clustering;
    # no hashpartitioning exchange may appear
    from osmium_tool_spark.functions.sortkeys import canonical_sort
    from osmium_tool_spark.sinks.osmxml import change_sections

    ch = td.nodes_from_part(spark, "/root/testdata/sf0.001").withColumn(
        "version", (F.col("id") % 4 + 1).cast("int")
    ).withColumn("visible", F.col("id") % 7 != 0)
    staged, _n, _last = change_sections(canonical_sort(ch), 4)
    sections.append(
        (".osc change_sections (bucket-local lag, one range exchange)",
         capture_explain(staged))
    )

    # 9. decontamination: distinct eval-gram set must BROADCAST; corpus
    # side is explode -> BroadcastHashJoin -> hash-agg on doc id
    from osmium_tool_spark.operators.text import contamination_flags

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    sections.append(
        ("decontaminate (broadcast eval grams + keyed join)",
         capture_explain(contamination_flags(docs, bench, n=3)))
    )

    # 10. BM25 top-k: query-term side must BROADCAST (the corpus-sized
    # postings never shuffle for the join); the rank<=k filter must compile
    # to WindowGroupLimit so each map task emits <= queries x k rows.
    from osmium_tool_spark.operators.retrieval import bm25_topk, tokens

    qset = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 8), " ").alias("qtext"),
    )
    sections.append(
        ("bm25_topk (broadcast query terms + WindowGroupLimit)",
         capture_explain(bm25_topk(docs, qset, k=10)))
    )

    # 11. zonal_stats over JVM-PIP polygons: the whole containment test is
    # inside WholeStageCodegen (no Python node for <=64-segment polygons)
    # and the aggregate is ONE partial/final HashAggregate pair keyed by
    # extract_id — map-side combine caps each task's exchange at <=500 rows.
    from osmium_tool_spark.operators.tiles import zonal_stats

    pts = td.nodes_from_part(spark, "/root/testdata/sf0.001").withColumn(
        "size", (F.col("id") % 50).cast("long")
    )
    r2 = 999_999_999
    dia = Extract.polygon(
        0, [np.array([(r2, 0), (0, r2), (-r2, 0), (0, -r2), (r2, 0)], np.int64)]
    )
    sections.append(
        ("zonal_stats (codegen PIP -> one hash-agg pair on extract_id)",
         capture_explain(
             zonal_stats(pts, [dia, Extract.bbox(1, -120.0, -60.0, 45.5, 70.25)],
                         measures={"sum_size": F.sum("size")}, payload_cols=["size"])
         ))
    )

    # 12. semantic_dedup: ONE hash exchange on cid feeding
    # FlatMapGroupsInPandas (the per-cluster gram kernel); the pandas-UDF
    # centroid assignment (ArrowEvalPython) runs pre-shuffle.
    from osmium_tool_spark.operators.similarity import semantic_dedup, train_ivf_centroids

    cents = train_ivf_centroids(emb, n_centroids=4)
    sections.append(
        ("semantic_dedup (one cid exchange -> per-cluster gram kernel)",
         capture_explain(semantic_dedup(emb, threshold=0.35, centroids=cents)))
    )

    # 13. many-polygon spatial join: candidates come from an EQUI-join on
    # the cell id (no cross product / no BroadcastNestedLoopJoin anywhere);
    # the index side is a MapInPandas over the polygon table, the verify
    # stage one FlatMapGroupsInPandas after a hash exchange on poly_id.
    from osmium_tool_spark.operators.spatial_join import spatial_join

    kk = F.col("id")
    cx = (kk * 2654435761) % 3_200_000_000 - 1_600_000_000
    cy = (kk * 2246822519) % 1_600_000_000 - 800_000_000
    rr = 50_000_000 + (kk % 5) * 10_000_000

    def ptc(x, y):
        return F.struct(x.cast("long").alias("x"), y.cast("long").alias("y"))

    polys = spark.range(600).select(
        kk.alias("poly_id"),
        F.array(F.array(ptc(cx + rr, cy), ptc(cx, cy + rr), ptc(cx - rr, cy),
                        ptc(cx, cy - rr), ptc(cx + rr, cy))).alias("rings"),
    )
    sections.append(
        ("spatial_join 600 polygons (cell equi-join, no cross product)",
         capture_explain(spatial_join(nodes.select("id", "lon", "lat"), polys, res=6)))
    )

    # 14. cluster_assign: ZERO exchanges — centroid literals inlined, the
    # argmax is array_max over structs inside one WholeStageCodegen span.
    from osmium_tool_spark.operators.similarity import cluster_assign

    cents8 = emb.filter(F.col("vec_id") % 61 == 0).select(
        F.col("vec_id").alias("cluster_id"), "embedding"
    )
    sections.append(
        ("cluster_assign (zero-shuffle codegen argmax)",
         capture_explain(cluster_assign(emb, cents8)))
    )

    # 15. lm_quality_score: the bigram/context/vocab model frames must all
    # BROADCAST (charset^2-bounded); the only corpus-keyed exchange is the
    # final per-doc HashAggregate pair.
    from osmium_tool_spark.operators.text import lm_quality_score

    sections.append(
        ("lm_quality_score (broadcast charset^2 model, one doc-keyed agg)",
         capture_explain(lm_quality_score(docs)))
    )

    # 16. hybrid_rrf: union of two WindowGroupLimit-capped rankings ->
    # hash agg -> final WindowGroupLimit; every frame is queries x K sized.
    from osmium_tool_spark.operators.retrieval import rrf_fuse

    lex = bm25_topk(docs, qset, k=20)
    vec = ann_topk(emb, q, k=20).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    sections.append(
        ("hybrid_rrf (rank-frame union + agg + WindowGroupLimit)",
         capture_explain(rrf_fuse([lex, vec], k=10)))
    )

    # 17. grid_cluster label assignment: counts = ONE partial/final
    # HashAggregate pair over the points; the CC loop runs on the dense-
    # cell frame; the final label join is an equi-join on the cell key.
    from osmium_tool_spark.operators.spatial_join import grid_cluster

    sections.append(
        ("grid_cluster (one corpus agg + cell-graph CC + key equi-join)",
         capture_explain(grid_cluster(nodes, res=5, min_pts=4)))
    )

    # 18. density_surface: rasterize agg pair -> explode(9) on the CELL
    # frame -> re-agg; no join bigger than the occupied-cell frame.
    from osmium_tool_spark.operators.tiles import density_surface

    sections.append(
        ("density_surface (cell-frame scatter convolution)",
         capture_explain(density_surface(nodes, res=5)))
    )

    # 19. pack_sequences: the running sum windows over hashpartitioning
    # (packer, n_packers-way — balanced by construction); no
    # SinglePartition exchange may appear.
    from osmium_tool_spark.operators.curation import pack_sequences

    sections.append(
        ("pack_sequences (packer-partitioned cumsum windows)",
         capture_explain(pack_sequences(docs, capacity=256, n_packers=8)))
    )

    # 20. way_length_m: ONE corpus exchange pair (posexplode -> ref
    # equi-join -> way-keyed re-agg); the haversine fold is a codegen'd
    # higher-order function over the per-way array — no UDF, no window.
    from osmium_tool_spark.operators.export import way_length_m
    from osmium_tool_spark.schema import NODE as _NODE
    from osmium_tool_spark.schema import WAY as _WAY

    ways_f = ents.filter(F.col("type") == _WAY)
    nodes_f = ents.filter(F.col("type") == _NODE)
    sections.append(
        ("way_length_m (locations_join + sequential codegen fold)",
         capture_explain(way_length_m(ways_f, nodes_f)))
    )

    # 21. tile_buffer_assign: map-only — projection + explode over <=9
    # when-structs; ZERO Exchange nodes may appear.
    from osmium_tool_spark.operators.tiles import tile_buffer_assign

    sections.append(
        ("tile_buffer_assign (map-only buffered vector-tile cut)",
         capture_explain(tile_buffer_assign(
             nodes.select("id", "lon", "lat"), res=5, buffer=5_000_000)))
    )

    # 22. shard_manifest: the running byte sum windows over
    # hashpartitioning(prefix) — 4^prefix_res streams, NO SinglePartition
    # exchange; everything else is codegen'd cell/offset math.
    from osmium_tool_spark.operators.curation import shard_manifest

    imgs_geo = nodes.select(
        F.col("id").alias("image_id"), "lon", "lat",
        (F.col("id") % 1000 + 64).alias("n_bytes"),
    )
    sections.append(
        ("shard_manifest (per-prefix windows, z-order shard cuts)",
         capture_explain(shard_manifest(imgs_geo, target_bytes=1 << 20,
                                        res=10, prefix_res=3)))
    )

    # 23. polygon_rasterize: banded-edge equi-join — expect ONE
    # repartition exchange on (pid, cy), ONE shuffled hash join on the
    # same key, ONE partial/final aggregate pair for the parity count;
    # the raycast decimal products stay inside codegen (no UDF, no
    # cross join, no window).
    from osmium_tool_spark.operators.tiles import polygon_rasterize

    def _pt(x, y):
        return F.struct(x.cast("long").alias("x"), y.cast("long").alias("y"))

    _k = F.col("id")
    _cx = (_k * 2654435761) % 3_200_000_000 - 1_600_000_000
    _cy = (_k * 2246822519) % 1_600_000_000 - 800_000_000
    _r = F.lit(40_000_000)
    polys = spark.range(16).select(
        _k.alias("poly_id"),
        F.array(F.array(
            _pt(_cx + _r, _cy), _pt(_cx, _cy + _r), _pt(_cx - _r, _cy),
            _pt(_cx, _cy - _r), _pt(_cx + _r, _cy),
        )).alias("rings"),
    )
    sections.append(
        ("polygon_rasterize (banded-edge join, decimal raycast parity agg)",
         capture_explain(polygon_rasterize(polys, res=9)))
    )

    # 24. render_density_tiles: one partial/final HashAggregate pair
    # (the corpus rasterize), shift/mask tile coords in codegen, ONE
    # exchange on (tile_ix, tile_iy), FlatMapGroupsInPandas for the
    # PNG encode (group size bounded at 4^tile_shift pixels).
    from osmium_tool_spark.operators.tiles import render_density_tiles

    sections.append(
        ("render_density_tiles (bounded-group PNG tile encode)",
         capture_explain(render_density_tiles(
             nodes.select("lon", "lat"), res=8, tile_shift=5)))
    )

    # 25. contour_segments: rasterize HashAggregate pair -> explode(4)
    # on the CELL frame -> corner-pivot aggregate pair -> 16-case
    # projection + explode; no join, no window, no UDF.
    from osmium_tool_spark.operators.tiles import contour_segments

    sections.append(
        ("contour_segments (cell scatter -> corner pivot -> case table)",
         capture_explain(contour_segments(nodes, res=5, threshold=2.5)))
    )

    # 26. segment_tile_assign: map-only like tile_buffer_assign — a
    # projection, two bounded Generate (explode) nodes, and the
    # decimal(31,0) separating-axis predicate in one codegen span;
    # ZERO Exchange nodes may appear.
    from osmium_tool_spark.operators.tiles import segment_tile_assign

    segs_in = nodes.select(
        F.col("id").alias("way_id"), F.lit(1).alias("seq"),
        F.col("lon").alias("x1"), F.col("lat").alias("y1"),
        (F.col("lon") + 100_000).alias("x2"), (F.col("lat") + 70_000).alias("y2"),
    )
    sections.append(
        ("segment_tile_assign (map-only exact segment->tile cut)",
         capture_explain(segment_tile_assign(segs_in, res=7)))
    )

    # 27. snap_points: padded-cover candidate equi-join on (cx, cy) —
    # ONE join, then ONE partial/final ObjectHashAggregate pair
    # (min(struct) per point); the decimal projection math and the
    # double conversions stay codegen'd. No window over candidates.
    from osmium_tool_spark.operators.spatial_join import snap_points

    pts_in = nodes.select(
        F.col("id").alias("point_id"), "lon", "lat"
    )
    sections.append(
        ("snap_points (map-matching: padded-cover join + min-struct argmin)",
         capture_explain(snap_points(pts_in, segs_in.select(
             "way_id", "seq", "x1", "y1", "x2", "y2"), res=7,
             max_dist=5_000_000)))
    )

    # 28. round-4j surfaces — all zero-shuffle projections or a single
    # keyed exchange; what to check: ONE codegen'd Project for the
    # scalar encoders (hilbert/geo_split/slippy/hexbin), the single
    # window+explode pair for resample_track, the locations-join
    # exchange + codegen fold for way_polyline, and the lone
    # hashpartitioning exchange feeding each applyInPandas sink.
    from osmium_tool_spark.functions.cells import hilbert_cell, quadkey_col, slippy_tile_cols
    from osmium_tool_spark.operators.curation import geo_buffered_split
    from osmium_tool_spark.operators.export import way_polylines
    from osmium_tool_spark.operators.hexbin import hexbin_counts
    from osmium_tool_spark.operators.network import network_components
    from osmium_tool_spark.operators.trajectory import resample_track
    from osmium_tool_spark.sinks.mvt import write_mvt_tiles

    sections.append(
        ("hilbert_cell encode (single codegen Project, linear state chain)",
         capture_explain(nodes.select(
             "id", hilbert_cell(F.col("lon"), F.col("lat"), 12).alias("hc"))))
    )
    sections.append(
        ("geo_buffered_split (zero-shuffle projection, 8 neighbor hashes)",
         capture_explain(geo_buffered_split(nodes, res=6, id_col="id")))
    )
    _tx, _ty = slippy_tile_cols(F.col("lon"), F.col("lat"), 10)
    sections.append(
        ("slippy tile + quadkey (projection)",
         capture_explain(nodes.select("id", _tx.alias("tx"), _ty.alias("ty"))
                         .select("id", quadkey_col(F.col("tx"), F.col("ty"), 10)
                                 .alias("qk"))))
    )
    sections.append(
        ("hexbin (projection + one hash-agg pair)",
         capture_explain(hexbin_counts(nodes, w=50_000_000, h=86_602_540)))
    )
    sections.append(
        ("way_polyline (locations-join exchange + codegen fold)",
         capture_explain(way_polylines(ways, nodes, divisor=100)))
    )
    sections.append(
        ("resample_track (one window exchange + bounded explode)",
         capture_explain(resample_track(
             nodes.select(F.col("id").alias("key"),
                          (F.col("id") * 1000).alias("ts"),
                          F.col("lon").alias("x"), F.col("lat").alias("y")),
             step=7000)))
    )
    sections.append(
        ("network_components edge pass (codegen explode; CC rounds iterate)",
         capture_explain(network_components(ways)))
    )
    sections.append(
        ("write_mvt_tiles (one keyed exchange into the encode kernel)",
         capture_explain(write_mvt_tiles(nodes, res=5)))
    )

    # round-4k sketches + image-training ops
    from osmium_tool_spark.operators.multimodal import (
        alignment_scores,
        aspect_bucket_batches,
    )
    from osmium_tool_spark.operators.sketches import (
        cm_build,
        cm_lookup,
        hist_bins,
        hist_quantiles,
        hll_distinct,
    )

    vals = spark.range(1, 100_001).select(
        (F.col("id") % 64).alias("g"),
        ((F.col("id") * 2654435761) % 65536).alias("v"),
    )
    sections.append(
        ("hll_distinct (ONE partial/final HashAggregate pair per stage; "
         "state = groups x 2^p registers, no distinct expand)",
         capture_explain(hll_distinct(vals, ["g"], "v", p=10, hash="portable")))
    )
    cm = cm_build(vals, "v", d=3, w=512, hash="portable")
    qs = spark.range(200).select(F.col("id").alias("v"))
    sections.append(
        ("cm_lookup (counts side BROADCAST — the corpus never re-enters "
         "at query time)",
         capture_explain(cm_lookup(cm, qs, "v", 3, 512, "portable")))
    )
    hb = hist_bins(vals, ["g"], "v", 0.0, 65536.0, 1024)
    sections.append(
        ("hist_quantiles (hash-agg pair to <=bins rows per group, then "
         "windows over the BIN table only)",
         capture_explain(hist_quantiles(hb, ["g"], 0.0, 65536.0, 1024, [0.5, 0.9])))
    )
    imgs4k = spark.range(1, 50_001).select(
        F.col("id").alias("image_id"),
        (64 + (F.col("id") * 37) % 448).cast("int").alias("w"),
        (64 + (F.col("id") * 53) % 448).cast("int").alias("h"),
    )
    sections.append(
        ("aspect_bucket_batches (range Exchange + BroadcastHashJoins, NO "
         "Window — the per-bucket ordinal is the zipindex prefix-sum)",
         capture_explain(aspect_bucket_batches(
             imgs4k, [(512, 512), (576, 448), (448, 576)], batch_size=16)))
    )
    pairs = spark.range(1, 10_001).select(
        F.col("id"),
        F.transform(F.sequence(F.lit(1), F.lit(64)),
                    lambda i: (F.xxhash64(F.col("id"), i) % 1000) / 500.0).alias("va"),
        F.transform(F.sequence(F.lit(1), F.lit(64)),
                    lambda i: (F.xxhash64(F.col("id"), i, i) % 1000) / 500.0).alias("vb"),
    )
    sections.append(
        ("alignment_scores (pure projection — no Exchange, the fold stays "
         "in codegen)",
         capture_explain(alignment_scores(pairs, "va", "vb")))
    )
    from osmium_tool_spark.operators.curation import epoch_shuffle
    from osmium_tool_spark.operators.sketches import bloom_build, bloom_probe

    bstate = bloom_build(vals, "v", k=4, m_bits=1 << 15, hash="portable")
    sections.append(
        ("bloom_probe (state side BROADCAST — <= m/32 rows; the corpus "
         "never re-enters at probe time, same shape as cm_lookup)",
         capture_explain(bloom_probe(bstate, qs, "v", 4, 1 << 15, "portable")))
    )
    sections.append(
        ("epoch_shuffle (ONE Exchange keyed by shard + per-shard Window "
         "sort — num_shards independent sorts, never a global one)",
         capture_explain(epoch_shuffle(
             spark.range(1, 50_001).select(F.col("id").alias("doc_id")),
             "doc_id", epoch=3, num_shards=64)))
    )
    from osmium_tool_spark.operators.sketches import bloom_semijoin

    bcorpus = spark.range(1, 100_001).select(F.col("id"))
    bkeys = spark.range(1, 5_001).select((F.col("id") * 7).alias("id"))
    sections.append(
        ("bloom_semijoin (k BroadcastHashJoin word-lookups PRE-FILTER the "
         "corpus map-side; only maybe-members reach the exact semi-join "
         "exchange)",
         capture_explain(bloom_semijoin(bcorpus, bkeys, "id", k=4,
                                        m_bits=1 << 15)))
    )
    from osmium_tool_spark.operators.curation import domain_cap

    urls = spark.range(1, 50_001).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://site"), (F.col("id") % 97).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"),
    )
    sections.append(
        ("domain_cap (codegen regex projections + ONE window keyed by "
         "domain with map-side WindowGroupLimit — hot-domain skew bounded "
         "before the exchange)",
         capture_explain(domain_cap(urls, "url", cap=5)))
    )
    from osmium_tool_spark.operators.tiles import polygon_overlap as _po

    kk2 = F.col("id")
    _cx = (kk2 * 2654435761) % 3_200_000_000 - 1_600_000_000
    _cy = (kk2 * 2246822519) % 1_600_000_000 - 800_000_000
    _rr = 30_000_000 + (kk2 % 5) * 10_000_000

    def _pt2(x, y):
        return F.struct(x.cast("long").alias("x"), y.cast("long").alias("y"))

    _polys = spark.range(64).select(
        kk2.alias("poly_id"),
        F.array(F.array(_pt2(_cx + _rr, _cy), _pt2(_cx, _cy + _rr),
                        _pt2(_cx - _rr, _cy), _pt2(_cx, _cy - _rr),
                        _pt2(_cx + _rr, _cy))).alias("rings"),
    )
    sections.append(
        ("polygon_overlap (two independent rasterizations meet in ONE "
         "cell-key equi-join + hash-agg — no polygon x polygon pairing)",
         capture_explain(_po(_polys, _polys, res=8, id_a="id_a", id_b="id_b")))
    )

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(
            "# PLANS — physical-plan evidence (generated by scripts/explain_plans.py)\n\n"
            "What to look for: `PushedFilters`/`ReadSchema` on scans (pruning),\n"
            "`WholeStageCodegen` spans (JVM hot path), broadcast/shuffle choices\n"
            "on joins, and partial `HashAggregate` pairs (map-side combine).\n\n"
            "Round-2 scale-fix evidence (verdict findings 1-3):\n\n"
            "- **renumber id assignment** (section below): the per-type\n"
            "  `Window.partitionBy(type)` row_number — which serialized the whole\n"
            "  mapping through <=3 tasks — is GONE. The plan is one balanced range\n"
            "  Exchange into a checkpoint, then BroadcastHashJoin + Project; no\n"
            "  Window operator at all (functions/zipindex.py: sorted\n"
            "  monotonically_increasing_id stamp + driver prefix-sum offsets).\n"
            "  tags_count's rank uses the same helper.\n"
            "- **validate_order** (section below): the full-data Window partitions\n"
            "  on the physical partition id (`hashpartitioning(__pid, n)` —\n"
            "  balanced); the ONE `SinglePartition` exchange in its plan feeds the\n"
            "  boundary stitch and carries exactly n_partitions aggregated rows\n"
            "  (one first/last pair per range partition) — driver-scale by\n"
            "  construction, independent of table size.\n"
        )
        for title, text in sections:
            f.write(f"\n## {title}\n\n```\n{text}\n```\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
