"""Mimics the driver's correctness gate: every queries() entry runs at
sf0.001 and, where an oracle exists, matches DuckDB row-for-row
(order-insensitive, column names sorted).  Slower full check at sf0.01
happens in the driver; this keeps the contract green in-repo."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
    # rows-only ops are known and intentional (non-SQL-expressible:
    # LSH/simhash randomness, threshold class flips, iterative/global
    # algorithms, seeded generators)
    assert set(QUERIES) - set(ORACLES) == {
        "minhash_pairs", "simhash_groups", "simhash_neardup",
        "polygonize", "a_star", "viewshed", "terrain",
        "embedding_neardup", "semantic_dedup",
        # PQ codebook/ADC arithmetic has no SQL twin; encode bit-parity
        # vs numpy, recall floor, and rerank==exact are pytest-pinned
        "pq_topk",
        # composed IVF-PQ: two stacked k-means artifacts, no SQL twin;
        # encode replay, recall, rerank==exact, and partitioning
        # invariance are pytest-pinned
        "ivfpq_topk",
        # PCA eigendecomposition has no SQL twin; train==numpy,
        # projection replay, and reduced-space self-query are
        # pytest-pinned
        "pca_ann",
        # ring variant is oracle-backed inside the "knn" union; this
        # standalone entry keeps the bench series comparable across
        # rounds
        "knn_ring",
        # iterative PageRank composition; extraction branches are
        # pytest goldens, pagerank itself oracle-backed separately
        "link_graph",
        # HITS normalized mutual recursion; numpy power-iteration
        # pinned in pytest
        "hits",
        # salted==plain equality is pytest-asserted; the entry exists
        # to benchmark the skewed-host path, not to re-prove results
        "host_cap_salted",
        # distinct-host HLL sketch has no SQL twin; extraction branches
        # are pytest goldens, host-window top-k oracle-backed (host_cap)
        "anchor_text",
        # sequential merge training has no SQL twin; pinned against an
        # independent reference trainer + round-trip invariant in pytest
        "bpe",
        # GD training loop has no SQL twin; numpy step-equality and the
        # no-UDF/no-exchange scoring plan are pytest-asserted
        "quality_clf",
        # DCT/codec path has no SQL twin; codec invariance, jitter
        # bounds and brute-force band parity are pytest-asserted
        "phash_neardup",
        # FFT/codec path has no SQL twin; gain invariance, noise
        # bounds and planted recall are pytest-asserted
        "audio_neardup",
        # GIF/DCT path has no SQL twin; planted recall, subset clips
        # and frame-order invariance are pytest-asserted
        "video_neardup",
        # EM training has no SQL twin; pinned step-for-step against an
        # independent reference trainer + brute-force Viterbi in pytest
        "unigram",
        # sequential likelihood-merge training has no SQL twin; pinned
        # against a recount-from-scratch reference trainer in pytest
        "wordpiece",
        # binary PDF format path has no SQL twin; rows self-check
        # (match column) and spec + real-pdfTeX fixtures are pytest-pinned
        "pdf_extract",
        # KMV estimates are deterministic given xxhash64 but not
        # SQL-replicable; accuracy + union==build pytest-pinned
        "kmv_overlap",
        # recursive KD median fit has no SQL twin; balance, salting,
        # driver==distributed parity and plan pins are pytest-asserted
        "spatial_part",
        # per-target k x k kriging solves have no SQL twin; brute-force
        # OK parity, exactness-at-known and constant-field reproduction
        # are pytest-asserted (test_spatialstats.py)
        "krige",
        # Douglas-Peucker recursion has no SQL twin; the kernel is
        # pinned against a recursive reference implementation and the
        # rings it runs on are oracle-backed in vector_metrics/clip_tiles
        "simplify_rings",
        # PNG tile bytes have no SQL twin; every row self-checks through
        # decode_png and pixel-exact reassembly is pytest-asserted
        # (test_xyz_tiles.py); the heatmap field is oracle-backed (kde/
        # contour share its construction)
        "xyz_tiles",
        # Strahler's per-node inflow aggregation has no recursive-SQL
        # twin; pinned against a recursive textbook reference
        # (test_hydrology.py); direction + accumulation inputs are
        # oracle-backed in the flow slot
        "streams",
        # PD filling's fixpoint (min over escape paths of path-max)
        # has no bounded SQL twin; scalar-loop reference parity in
        # test_hydrology.py; the input field is oracle-backed
        "fill",
    }


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    assert len(rows) >= 0
    if name not in ORACLES:
        assert len(rows) > 0  # rows-only check
        return
    res = ddb.sql(ORACLES[name])
    ocols = res.columns
    orows = res.fetchall()
    assert sorted(c.lower() for c in cols) == sorted(c.lower() for c in ocols), (
        f"{name}: column mismatch {cols} vs {ocols}"
    )
    assert len(rows) == len(orows), f"{name}: row count {len(rows)} vs {len(orows)}"
    got = _rowset([c.lower() for c in cols], rows)
    want = _rowset([c.lower() for c in ocols], orows)
    mism = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
    assert got == want, f"{name}: first mismatches {[(got[i], want[i]) for i in mism[:3]]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None


def test_reference_parity_namespace():
    """Every name the reference re-exports at top level
    (xrspatial/__init__.py:1-40) resolves on our package too."""
    import xarray_spatial_spark as xs

    ref_names = [
        "aspect", "bump", "binary", "box_plot", "head_tail_breaks",
        "maximum_breaks", "percentiles", "std_mean", "diagnose",
        "equal_interval", "natural_breaks", "quantile", "reclassify",
        "curvature", "mean", "hillshade", "arvi", "evi", "nbr", "ndvi",
        "savi", "sipi", "a_star_search", "perlin", "allocation",
        "direction", "euclidean_distance", "great_circle_distance",
        "manhattan_distance", "proximity", "slope", "generate_terrain",
        "viewshed", "zonal_apply", "crop", "trim", "zonal_crosstab",
        "regions", "zonal_stats", "suggest_zonal_canvas",
    ]
    for name in ref_names:
        assert callable(getattr(xs, name)), name
    assert set(ref_names) <= set(xs.__all__)
