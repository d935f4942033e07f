"""HTML page-metadata extraction — pure Catalyst regexes.

The head-of-page signals a crawl-curation pipeline keys on beside the
body text: title, meta description, canonical URL, declared charset,
and the robots noindex/nofollow meta flags.  All `regexp_extract`
over the (possibly binary) html column — codegen, scan-stage, no
Python at any scale.

Scope: the common attribute orders real markup uses (name/content in
either order, single or double quotes, case-insensitive).  A full
HTML5 tree parser is out of scope by design — these are signals, not
a DOM; the regexes are documented and golden-tested per branch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_Q = "[\"']"


def _page(html: Column) -> Column:
    return F.coalesce(html.cast("string"), F.lit(""))


def _meta_content(page: Column, name: str) -> Column:
    """<meta name=X content=Y> with either attribute order."""
    a = F.regexp_extract(
        page,
        f"(?is)<meta\\s[^>]*name\\s*=\\s*{_Q}?{name}{_Q}?[^>]*"
        f"content\\s*=\\s*{_Q}([^\"']*){_Q}",
        1,
    )
    b = F.regexp_extract(
        page,
        f"(?is)<meta\\s[^>]*content\\s*=\\s*{_Q}([^\"']*){_Q}[^>]*"
        f"name\\s*=\\s*{_Q}?{name}{_Q}?",
        1,
    )
    return F.when(a != "", a).otherwise(b)


def page_title(html: Column) -> Column:
    t = F.regexp_extract(_page(html), "(?is)<title[^>]*>(.*?)</title>", 1)
    return F.nullif(F.trim(F.regexp_replace(t, "\\s+", " ")), F.lit(""))


def meta_description(html: Column) -> Column:
    return F.nullif(_meta_content(_page(html), "description"), F.lit(""))


def canonical_url(html: Column) -> Column:
    p = _page(html)
    a = F.regexp_extract(
        p,
        f"(?is)<link\\s[^>]*rel\\s*=\\s*{_Q}canonical{_Q}[^>]*"
        f"href\\s*=\\s*{_Q}([^\"']*){_Q}",
        1,
    )
    b = F.regexp_extract(
        p,
        f"(?is)<link\\s[^>]*href\\s*=\\s*{_Q}([^\"']*){_Q}[^>]*"
        f"rel\\s*=\\s*{_Q}canonical{_Q}",
        1,
    )
    return F.nullif(F.when(a != "", a).otherwise(b), F.lit(""))


def declared_charset(html: Column) -> Column:
    """<meta charset=X> or the http-equiv Content-Type charset."""
    p = _page(html)
    a = F.regexp_extract(
        p, f"(?is)<meta\\s[^>]*charset\\s*=\\s*{_Q}?([a-zA-Z0-9_-]+)", 1)
    return F.nullif(F.lower(a), F.lit(""))


def robots_meta(html: Column) -> Column:
    """struct(noindex, nofollow) from <meta name=robots>."""
    c = F.lower(_meta_content(_page(html), "robots"))
    return F.struct(
        c.rlike("(^|[ ,])noindex($|[ ,])").alias("noindex"),
        c.rlike("(^|[ ,])nofollow($|[ ,])").alias("nofollow"),
    )


def page_metadata(html: Column) -> Column:
    """One struct with every signal — select it once, Catalyst prunes
    the fields downstream consumers don't read."""
    return F.struct(
        page_title(html).alias("title"),
        meta_description(html).alias("description"),
        canonical_url(html).alias("canonical"),
        declared_charset(html).alias("charset"),
        robots_meta(html).alias("robots"),
    )
