"""URL trap mining (url_template/trap_candidates) + nofollow-aware
link extraction (extract_followed_links / link_edges followed_only)."""

from pyspark.sql import functions as F

from xarray_spatial_spark.functions import url as uf


def test_url_template_goldens(spark):
    cases = [
        ("http://a.com/cal/2024/05/17", "a.com/cal/N/N/N"),
        ("http://A.com/Item9?b=2&a=1#frag", "a.com/itemN?a&b"),
        ("http://s.com/sess/deadbeef0badcafe/x", "s.com/sess/H/x"),
        ("http://s.com/hex/abc123/x", "s.com/hex/abcN/x"),  # short hex: no H
        ("http://q.com/", "q.com/"),
        ("http://q.com", "q.com/"),
        ("http://q.com/p?x=1&x=2", "q.com/p?x&x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.t for r in df.select(
        uf.url_template(F.col("url")).alias("t")).collect()]
    assert got == [t for _, t in cases]


def test_trap_candidates_flags_the_calendar(spark):
    rows = (
        [(f"http://trap.com/cal/2020/{m:02d}/{d:02d}",)
         for m in range(1, 13) for d in range(1, 29)]       # 336 distinct
        + [("http://ok.com/about",)] * 500                   # dup url: 1 distinct
        + [(f"http://ok.com/post/{i}",) for i in range(50)]  # under threshold
    )
    df = spark.createDataFrame(rows, "url string")
    got = uf.trap_candidates(df, max_urls_per_template=300).collect()
    assert [(r.host, r.template, r.n_urls) for r in got] == [
        ("trap.com", "trap.com/cal/N/N/N", 336)]
    # threshold respected: everything flagged at 0
    all_t = uf.trap_candidates(df, max_urls_per_template=0)
    assert all_t.count() == 3


def test_extract_followed_links(spark):
    html = (
        '<a href="/keep1">k</a>'
        '<a rel="nofollow" href="/drop1">d</a>'
        '<a href="/drop2" rel="ugc">d</a>'
        '<A REL="external sponsored" HREF="/drop3">d</A>'
        '<a rel="external" href="/keep2">k</a>'
        '<a rel="nofollowish" href="/keep3">word-boundary</a>'
    )
    df = spark.createDataFrame([("http://h.com/p/q", html)],
                               "url string, html string")
    followed = df.select(uf.extract_followed_links(
        F.col("html"), F.col("url")).alias("ls")).collect()[0].ls
    assert followed == ["http://h.com/keep1", "http://h.com/keep2",
                        "http://h.com/keep3"]
    everything = df.select(uf.extract_links(
        F.col("html"), F.col("url")).alias("ls")).collect()[0].ls
    assert len(everything) == 6


def test_link_edges_followed_only(spark):
    html = '<a href="http://x.com/a">a</a><a rel="nofollow" href="http://x.com/b">b</a>'
    df = spark.createDataFrame([("http://h.com/", html)],
                               "url string, html string")
    assert uf.link_edges(df).count() == 2
    got = uf.link_edges(df, followed_only=True).collect()
    assert [(r.src, r.dst) for r in got] == [("http://h.com/", "http://x.com/a")]


def test_trap_plan_no_raw_urls_in_final_exchange(spark):
    df = spark.createDataFrame([("http://a.com/1",)], "url string")
    plan = uf.trap_candidates(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "pythonUDF" not in plan


def test_canonical_aliases_full_chain(spark):
    """page -> rel=canonical -> redirect -> normalized form collapse
    into one cluster with a deterministic canonical representative."""
    pages = spark.createDataFrame(
        [("http://a.com/post?utm_source=x",
          '<link rel="canonical" href="http://a.com/post-canon">'),
         ("http://a.com/post-canon", "<html>n</html>"),
         ("http://b.com/solo", "<html>n</html>"),
         ("http://evil.com/steal",
          '<link rel="canonical" href="http://victim.com/page">')],
        "url string, html string")
    redirects = spark.createDataFrame(
        [("http://a.com/post-canon", "http://a.com/final")],
        "src string, dst string")
    got = {r.url: r.canonical_url
           for r in uf.canonical_aliases(pages, redirects=redirects).collect()}
    # the whole a.com chain resolves to one representative
    chain = ["http://a.com/post?utm_source=x", "http://a.com/post-canon",
             "http://a.com/final", "http://a.com/post"]
    reps = {got[u] for u in chain if u in got}
    assert len(reps) == 1
    rep = reps.pop()
    assert rep in ("http://a.com/final", "http://a.com/post",
                   "http://a.com/post-canon")
    # representative is an edge TARGET, and stable across runs
    assert rep == min("http://a.com/final http://a.com/post "
                      "http://a.com/post-canon".split())
    # cross-host canonical ignored by default: evil.com stays its own
    assert got["http://evil.com/steal"] == "http://evil.com/steal"
    assert got["http://b.com/solo"] == "http://b.com/solo"
    # cross-host canonical honored when asked
    loose = {r.url: r.canonical_url for r in uf.canonical_aliases(
        pages, redirects=redirects, same_host_only=False).collect()}
    assert loose["http://evil.com/steal"] == "http://victim.com/page"
