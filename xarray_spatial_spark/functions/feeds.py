"""RSS/Atom feed discovery + parsing — the third crawl-discovery
channel beside hyperlink extraction (url.py:link_edges) and sitemaps
(robots.py:sitemap_refs/sitemap_entries).  News/blog hosts surface
fresh URLs through feeds long before a recrawl would find them, so a
production frontier polls feeds for exactly the freshness the
revisit scheduler (frontier.py) optimizes for.

Both halves are pure scan-stage Catalyst (codegen regexes over the
page/feed bodies — no Python in the plan, no exchange):

- :func:`feed_links` finds ``<link rel="alternate"
  type="application/rss+xml|atom+xml" href=...>`` advertisements in
  crawled HTML heads (both attribute orders, self-closing tags) and
  resolves relative hrefs against the page URL with the same RFC 3986
  resolver hyperlink extraction uses.
- :func:`feed_entries` parses fetched feed bodies: RSS 2.0
  ``<item>`` (title/link/guid/pubDate, CDATA unwrapped) and Atom
  ``<entry>`` (title/id/link@href with rel=alternate preference,
  published/updated) into one unified row shape, with a best-effort
  parsed timestamp (RFC 822 and ISO 8601 forms via try_to_timestamp —
  unparseable dates stay NULL, never raise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.url import (
    _resolve_link,
    url_host,
    url_path,
)

_LINK_TAG_RE = "(?is)<link\\b[^>]*>"
_FEED_TYPE_RE = "(?i)type\\s*=\\s*[\"']?application/(rss|atom)\\+xml"
_ALT_REL_RE = "(?i)rel\\s*=\\s*[\"']?alternate"
_HREF_ATTR_RE = "(?i)href\\s*=\\s*[\"']([^\"']+)[\"']"


def _unwrap(text: Column) -> Column:
    """Strip an optional CDATA wrapper, trim, decode the XML entities
    that appear in feed URLs/titles ('' stays NULL)."""
    t = F.regexp_replace(text, "(?s)^\\s*<!\\[CDATA\\[(.*?)\\]\\]>\\s*$", "$1")
    t = F.trim(t)
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'")):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.nullif(t, F.lit(""))


def feed_links(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """One row per advertised feed: every input column (minus the
    html payload) plus ``feed_url`` (absolute) and ``feed_kind``
    ('rss'/'atom').  Pages without feed links emit nothing."""
    page = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    tags = F.regexp_extract_all(page, F.lit(_LINK_TAG_RE), F.lit(0))
    feedy = F.filter(
        tags,
        lambda t: t.rlike(_FEED_TYPE_RE) & t.rlike(_ALT_REL_RE)
        & t.rlike(_HREF_ATTR_RE),
    )
    base = F.col(url_col)
    scheme = F.lower(
        F.regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = url_host(base)
    path = url_path(base)
    base_dir = F.when(
        path.rlike("/"), F.regexp_replace(path, "/[^/]*$", "")
    ).otherwise(F.lit(""))
    out = df.select(
        *[c for c in df.columns if c != html_col],
        F.explode(feedy).alias("_tag"),
    )
    href = _unwrap(F.regexp_extract(F.col("_tag"), _HREF_ATTR_RE, 1))
    return out.select(
        *[c for c in df.columns if c != html_col],
        _resolve_link(href, scheme, host, base_dir).alias("feed_url"),
        F.lower(
            F.regexp_extract(F.col("_tag"), _FEED_TYPE_RE, 1)
        ).alias("feed_kind"),
    ).filter(F.col("feed_url").isNotNull())


def _field(block: Column, tag: str) -> Column:
    return _unwrap(
        F.regexp_extract(block, f"(?is)<{tag}[^>]*>(.*?)</{tag}>", 1))


def _atom_link(block: Column) -> Column:
    """First <link> with rel="alternate" (or no rel at all) wins —
    Atom feeds also carry rel=self/edit links that are NOT the entry
    URL."""
    links = F.regexp_extract_all(block, F.lit(_LINK_TAG_RE), F.lit(0))
    cand = F.filter(
        links,
        lambda t: t.rlike(_ALT_REL_RE) | ~t.rlike("(?i)rel\\s*="),
    )
    first = F.element_at(
        F.when(F.size(cand) > 0, cand).otherwise(links), F.lit(1))
    return _unwrap(F.regexp_extract(first, _HREF_ATTR_RE, 1))


def feed_entries(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Fetched feed bodies -> one row per item/entry: every input
    column (minus the body) plus ``loc`` (the entry URL), ``title``,
    ``entry_id`` (guid / atom id), ``published`` (raw string) and
    ``published_ts`` (best-effort parse; NULL when unparseable), and
    ``kind`` ('rss'/'atom').  Rows without a resolvable loc drop."""
    body = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))
    is_atom = body.rlike("(?is)<feed[\\s>]")
    blocks = F.when(
        is_atom,
        F.expr(
            f"regexp_extract_all(cast({xml_col} as string),"
            " '(?is)<entry[^>]*>(.*?)</entry>', 1)"),
    ).otherwise(
        F.expr(
            f"regexp_extract_all(cast({xml_col} as string),"
            " '(?is)<item[^>]*>(.*?)</item>', 1)"),
    )
    keep = [c for c in df.columns if c != xml_col]
    exploded = df.withColumn("_atom", is_atom).select(
        *keep, "_atom", F.explode(blocks).alias("_b"))
    b = F.col("_b")
    loc = F.when(F.col("_atom"), _atom_link(b)).otherwise(_field(b, "link"))
    published = F.when(
        F.col("_atom"),
        F.coalesce(_field(b, "published"), _field(b, "updated")),
    ).otherwise(_field(b, "pubDate"))
    # RFC 822 names GMT/UT/UTC zones by letter and leads with a
    # weekday; the Spark >= 3 parser takes only numeric offsets and
    # 'E' is formatting-only, so normalize both away in the string
    rfc = F.regexp_replace(
        F.regexp_replace(published, "^[A-Za-z]{3},\\s*", ""),
        "\\s+(GMT|UTC|UT)\\s*$", " +0000")
    ts = F.coalesce(
        F.try_to_timestamp(published),
        F.try_to_timestamp(rfc, F.lit("dd MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(rfc, F.lit("d MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(published,
                           F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )
    return exploded.select(
        *keep,
        loc.alias("loc"),
        _field(b, "title").alias("title"),
        F.when(F.col("_atom"), _field(b, "id"))
        .otherwise(_field(b, "guid")).alias("entry_id"),
        published.alias("published"),
        ts.alias("published_ts"),
        F.when(F.col("_atom"), F.lit("atom"))
        .otherwise(F.lit("rss")).alias("kind"),
    ).filter(F.col("loc").isNotNull())
