"""Image-caption pair mining: html.extract_images +
multimodal.image_text_pairs (the LAION-shape pipeline)."""

import numpy as np
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.html import extract_images
from xarray_spatial_spark.operators.multimodal import (
    encode_ppm,
    image_text_pairs,
)

PAGE = (
    '<img src="http://cdn.example.com/a.jpg" alt="A red fox jumps">'
    "<img src='/img/b.png' alt='Tower &amp; bridge' width=\"640\" height='480'>"
    '<img src="c.gif" alt="local cat photo">'
    '<img alt="no src at all">'
    '<img src="data:image/gif;base64,R0lGOD==" alt="inline pixel art">'
    '<img src="http://cdn.example.com/t.gif" alt="tracking beacon" width="1" height="1">'
    '<img src="http://cdn.example.com/s.jpg" alt="ok">'
)


def test_extract_images_goldens(spark):
    df = spark.createDataFrame([("http://site.com/blog/post.html", PAGE)],
                               "url string, html string")
    got = df.select(extract_images(
        F.col("html"), F.col("url")).alias("imgs")).collect()[0].imgs
    by_src = {r.src: r for r in got}
    # no-src and data: tags dropped; 5 survive
    assert len(got) == 5
    assert by_src["http://cdn.example.com/a.jpg"].alt == "A red fox jumps"
    b = by_src["http://site.com/img/b.png"]
    assert (b.alt, b.width, b.height) == ("Tower & bridge", 640, 480)
    assert "http://site.com/blog/c.gif" in by_src
    assert by_src["http://cdn.example.com/a.jpg"].width is None


def test_pairs_dedup_and_gates(spark):
    pages = spark.createDataFrame(
        [("http://site.com/1", PAGE),
         ("http://site.com/2", PAGE),  # same template page: same pairs
         ("http://site.com/3",
          '<img src="http://cdn.example.com/a.jpg" alt="A red fox jumps">')],
        "url string, html string")
    pairs = image_text_pairs(pages).collect()
    by = {(r.img_url, r.caption): r for r in pairs}
    # tracking pixel and the 2-char alt "ok" are gone
    assert all(c != "tracking beacon" and c != "ok" for _, c in by)
    fox = by[("http://cdn.example.com/a.jpg", "A red fox jumps")]
    assert fox.n_embeds == 3
    assert fox.page_url == "http://site.com/1"  # deterministic min
    assert ("http://site.com/img/b.png", "Tower & bridge") in by


def test_pairs_join_media_and_quality_gate(spark):
    rng = np.random.default_rng(3)
    textured = encode_ppm(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    flat = encode_ppm(np.full((64, 64, 3), 128, dtype=np.uint8))
    pages = spark.createDataFrame(
        [("http://s.com/p",
          '<img src="http://c.com/good.ppm" alt="textured scene photo">'
          '<img src="http://c.com/flat.ppm" alt="a flat gray fill">'
          '<img src="http://c.com/missing.ppm" alt="never fetched one">')],
        "url string, html string")
    media = spark.createDataFrame(
        [("http://c.com/good.ppm", bytearray(textured)),
         ("http://c.com/flat.ppm", bytearray(flat))],
        "url string, payload binary")
    got = image_text_pairs(pages, media=media).collect()
    assert [(r.img_url, r.caption) for r in got] == [
        ("http://c.com/good.ppm", "textured scene photo")]
    assert got[0].width == 64 and got[0].px_std > 4.0
    # gate off: flat fill survives, missing stays inner-join-dropped
    raw = image_text_pairs(pages, media=media, quality_gate=False)
    assert raw.count() == 2


def test_pairs_scan_stage_prefilter(spark):
    """caption/tracking gates run before the dedup exchange: the
    pre-aggregation side of the plan carries the length filter."""
    pages = spark.createDataFrame([("http://s.com/p", PAGE)],
                                  "url string, html string")
    plan = image_text_pairs(pages)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "length" in plan and "Aggregate" in plan


OG_PAGE = (
    '<meta property="og:title" content="A scenic mountain lake">'
    '<meta content="Long curated description of the lake" property="og:description">'
    '<meta property="og:image" content="/hero.jpg">'
    '<meta property="og:type" content="article">'
    '<img src="/hero.jpg" alt="lake photograph here">'
)


def test_og_metadata(spark):
    from xarray_spatial_spark.functions.html import og_metadata

    df = spark.createDataFrame(
        [("http://m.com/p", OG_PAGE), ("http://m.com/q", "<html></html>")],
        "url string, html string")
    got = df.select(og_metadata(F.col("html")).alias("og")).collect()
    og = got[0].og
    assert og.title == "A scenic mountain lake"
    assert og.description == "Long curated description of the lake"
    assert og.image == "/hero.jpg" and og.type == "article"
    assert got[1].og.title is None and got[1].og.image is None


def test_og_pairs_channel(spark):
    pages = spark.createDataFrame([("http://m.com/p", OG_PAGE)],
                                  "url string, html string")
    plain = image_text_pairs(pages)
    assert plain.count() == 1  # alt channel only
    both = image_text_pairs(pages, include_og=True).collect()
    by = {(r.img_url, r.caption) for r in both}
    assert ("http://m.com/hero.jpg",
            "Long curated description of the lake") in by
    assert ("http://m.com/hero.jpg", "lake photograph here") in by
    assert len(both) == 2


def test_jsonld_blocks(spark):
    from xarray_spatial_spark.functions.html import jsonld_blocks

    page = ('<script type="application/ld+json">{"@type":"Article"}'
            '</script><script>var x=1;</script>'
            "<script type='application/ld+json'>{\"@type\":\"Recipe\"}</script>")
    df = spark.createDataFrame([(page,)], "html string")
    got = df.select(jsonld_blocks(F.col("html")).alias("b")).collect()[0].b
    assert got == ['{"@type":"Article"}', '{"@type":"Recipe"}']
    # composes with from_json declaratively
    typed = df.select(F.explode(jsonld_blocks(F.col("html"))).alias("j")) \
        .select(F.from_json("j", "`@type` string").alias("s")) \
        .select(F.col("s.`@type`").alias("t")).collect()
    assert [r.t for r in typed] == ["Article", "Recipe"]
