"""corpus_funnel: the per-stage attrition report is the pipeline's
own arithmetic — every count must equal the stage-by-stage filters of
prepare_corpus, and the whole gate funnel must stay window-free."""

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import corpus, dedup
from xarray_spatial_spark.functions import text as tx
from xarray_spatial_spark.functions.url import url_host

STOP_LEAD = (
    "the shape of the data and that of the run is what we see here "
)


def _docs(spark):
    rows = []
    for i in range(120):
        body = f"alpha beta gamma delta token{i % 37} " * 12
        text = (STOP_LEAD + body) if i % 5 != 4 else "x " * 8
        rows.append((i, f"http://h{i % 4}.example.com/p/{i}", text))
    # planted byte-identical copies of every 6th doc
    for i in range(0, 120, 6):
        rows.append((1000 + i, f"http://dup.example.com/c/{i}", rows[i][2]))
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def _funnel_map(df, **kw):
    out = corpus.corpus_funnel(df, min_words=30, **kw).collect()
    assert [r.stage_idx for r in sorted(out, key=lambda r: r.stage_idx)] == \
        list(range(len(out)))
    return {r.stage: r.n_kept for r in out}


def test_funnel_matches_stagewise_filters(spark):
    d = _docs(spark)
    m = _funnel_map(d)
    kept = d.filter(tx.gopher_keep(F.col("text"), min_words=30))
    assert m["input"] == d.count()
    assert m["gopher"] == kept.count()
    assert m["dedup"] == dedup.distinct_by_text(kept).count()


def test_funnel_final_equals_prepare_corpus(spark):
    d = _docs(spark).select("doc_id", "text")
    m = _funnel_map(d)
    assert m["dedup"] == corpus.prepare_corpus(d, min_words=30).count()


def test_funnel_host_cap_bites(spark):
    d = _docs(spark)
    m = _funnel_map(d, host_cap_k=3, url_col="url")
    surv = dedup.distinct_by_text(
        d.filter(tx.gopher_keep(F.col("text"), min_words=30)))
    expect = (
        surv.groupBy(url_host(F.col("url")).alias("h"))
        .count()
        .agg(F.sum(F.least(F.col("count"), F.lit(3))))
        .collect()[0][0]
    )
    assert m["host_cap"] == expect
    assert m["host_cap"] < m["dedup"]  # the cap must actually bite here
    # and matches the real host_cap stage's row count
    capped = corpus.host_cap(
        surv.withColumn("_q", tx.quality_score(F.col("text"))),
        k=3, score_col="_q",
    )
    assert m["host_cap"] == capped.count()


def test_funnel_c4_and_lang_variants(spark):
    d = _docs(spark).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit("\nshort line\n{ } code")))
        .otherwise(F.col("text")),
    ).select("doc_id", "text")
    m = _funnel_map(d, c4=True)
    assert list(m) == ["input", "c4", "gopher", "dedup"]
    assert m["dedup"] == corpus.prepare_corpus(d, min_words=30,
                                               c4=True).count()
    m2 = _funnel_map(d, lang="en")
    assert list(m2) == ["input", "gopher", "lang", "dedup"]
    assert m2["dedup"] == corpus.prepare_corpus(d, min_words=30,
                                                lang="en").count()
    assert m2["lang"] <= m2["gopher"]


def test_funnel_plan_window_free(spark):
    d = _docs(spark)
    fun = corpus.corpus_funnel(d, min_words=30)
    plan = fun._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # one shuffle for the distinct-hash aggregate, one single-partition
    # gather of the final 1-row aggregate — never text bytes
    assert plan.count("Exchange") <= 2


def test_funnel_host_cap_needs_url(spark):
    with pytest.raises(ValueError):
        corpus.corpus_funnel(_docs(spark), host_cap_k=3)
