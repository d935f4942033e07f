"""HTML -> Markdown converter goldens (functions/html.py:
html_to_markdown / markdown_of).

Structure coverage per construct, nesting/numbering (the stack-machine
cases Catalyst can't carry), malformed-markup totality, and the
distributed Arrow path on binary payloads.
"""

import random

from pyspark.sql import functions as F

from xarray_spatial_spark.functions.html import html_to_markdown, markdown_of


def test_headings_and_paragraphs():
    md = markdown_of("<h1>Top</h1><p>one</p><h2>Sub</h2><p>two</p>")
    assert md == "# Top\n\none\n\n## Sub\n\ntwo"


def test_heading_levels():
    for n in range(1, 7):
        assert markdown_of(f"<h{n}>t</h{n}>") == "#" * n + " t"


def test_nested_lists_and_ol_numbering():
    md = markdown_of(
        "<ul><li>a<ul><li>x</li><li>y</li></ul></li><li>b</li></ul>"
        "<ol><li>one</li><li>two</li><li>three</li></ol>")
    assert md == ("- a\n  - x\n  - y\n- b\n\n"
                  "1. one\n2. two\n3. three")


def test_adjacent_lists_do_not_merge():
    md = markdown_of("<ul><li>a</li></ul><ul><li>b</li></ul>")
    assert md == "- a\n\n- b"


def test_links_images_emphasis_code():
    md = markdown_of(
        '<p>See <a href="https://e.com/p">the page</a> and '
        '<img src="i.png" alt="pic"> with <b>bold</b> <em>em</em> '
        "<code>c()</code></p>")
    assert md == ("See [the page](https://e.com/p) and ![pic](i.png) "
                  "with **bold** *em* `c()`")


def test_unsafe_urls_scrubbed():
    assert markdown_of('<a href="javascript:x()">t</a>') == "[t]()"
    assert markdown_of('<img src="data:text/html;x" alt="a">') == "![a]()"


def test_pre_fences_and_entity_decode():
    md = markdown_of("<pre>if a &lt; b:\n    f(a &amp; b)</pre>")
    assert md == "```\nif a < b:\n    f(a & b)\n```"
    assert markdown_of("<p>AT&amp;T &gt; &quot;x&quot;</p>") == 'AT&T > "x"'


def test_blockquote_nesting():
    md = markdown_of(
        "<blockquote>outer<blockquote>inner</blockquote></blockquote>")
    assert md == "> outer\n> > inner"


def test_table_with_header_separator():
    md = markdown_of(
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b|c</td></tr><tr><td>only</td></tr></table>")
    assert md == ("| h1 | h2 |\n|" + " --- |" * 2 +
                  "\n| a | b\\|c |\n| only |  |")


def test_implicit_tr_td_closes():
    md = markdown_of("<table><tr><td>a<td>b<tr><td>c</table>")
    assert md == "| a | b |\n| --- | --- |\n| c |  |"


def test_script_style_comments_dropped():
    md = markdown_of(
        "<script>var s='<p>no</p>';</script><!-- <p>no</p> -->"
        "<style>p{color:red}</style><p>yes</p>")
    assert md == "yes"


def test_br_and_hr():
    assert markdown_of("<p>a<br>b</p><hr><p>c</p>") == "a\nb\n\n---\n\nc"


def test_whitespace_collapse():
    assert markdown_of("<p>  a \t\n  b  </p>") == "a b"


def test_malformed_never_raises_and_flushes_at_eof():
    assert markdown_of("</li></ul><p>y<li>z") == "y\n\n- z"
    assert markdown_of("<b>open") == "**open"
    random.seed(3)
    tags = ["<ul>", "</ul>", "<ol>", "</ol>", "<li>", "</li>", "<table>",
            "</table>", "<tr>", "</tr>", "<td>", "<th>", "<pre>", "</pre>",
            "<b>", "</b>", '<a href="x">', "</a>", "<blockquote>",
            "</blockquote>", "<h3>", "</h3>", "<p>", "</p>", "txt ",
            "&amp; ", '<img src="y">', "<br>", "<hr>", "<script>",
            "</script>", "<", ">", "</", "<x", "&#"]
    for _ in range(2000):
        s = "".join(random.choice(tags)
                    for _ in range(random.randint(0, 50)))
        markdown_of(s)  # totality: must not raise


def test_none_and_empty():
    assert markdown_of("") == ""
    assert markdown_of(None) == ""


def test_distributed_binary_payloads(spark):
    rows = [
        (1, "<h1>T</h1><p>body &amp; soul</p>".encode()),
        (2, "<ol><li>x</li><li>y</li></ol>".encode()),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {r["id"]: r["md"] for r in df.select(
        "id", html_to_markdown(F.col("html")).alias("md")).collect()}
    assert got[1] == "# T\n\nbody & soul"
    assert got[2] == "1. x\n2. y"
    assert got[3] is None


def test_string_column_matches_local(spark):
    pages = ["<h2>a</h2><ul><li>i</li></ul>",
             "<p>plain</p>", "<table><tr><td>z</td></tr></table>"]
    df = spark.createDataFrame([(p,) for p in pages], "html string")
    got = [r["md"] for r in
           df.select(html_to_markdown(F.col("html")).alias("md")).collect()]
    assert got == [markdown_of(p) for p in pages]
