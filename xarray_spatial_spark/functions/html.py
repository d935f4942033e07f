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


# ---------------------------------------------------------------------------
# main-content extraction (boilerplate removal)
# ---------------------------------------------------------------------------

# Subtrees that are never content: dropped wholesale before block
# segmentation so a 200 kB inline script can't masquerade as a long
# text block.
_NONCONTENT_RE = (
    "(?is)<(script|style|noscript|template|svg|head)\\b[^>]*>.*?</\\1\\s*>"
)
_COMMENT_RE = "(?s)<!--.*?-->"
# Block-level boundaries: the page splits into candidate text blocks
# at these tags (open or close).  Inline markup (<a>, <b>, <span>, …)
# stays inside a block so per-block link density can be measured.
_BLOCK_TAG_RE = (
    "(?i)</?(?:p|div|main|article|section|header|footer|nav|aside|"
    "ul|ol|li|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|h[1-6]|"
    "blockquote|pre|figure|figcaption|form|fieldset|details|summary|"
    "br|hr)\\b[^>]*>"
)
_ANCHOR_TEXT_RE = "(?is)<a\\b[^>]*>(.*?)</a>"
_INLINE_TAG_RE = "<[^>]*>"


def _unescape_entities(c: Column) -> Column:
    """The five named entities + nbsp that dominate real markup.
    ``&amp;`` must decode LAST or ``&amp;lt;`` would double-decode."""
    for ent, ch in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _block_text(b: Column) -> Column:
    t = F.regexp_replace(b, _INLINE_TAG_RE, " ")
    return _unescape_entities(F.trim(F.regexp_replace(t, "\\s+", " ")))


def _block_link_chars(b: Column) -> Column:
    """Character count of text living inside <a>…</a> within the
    block — the numerator of jusText/boilerpipe link density."""
    anchors = F.regexp_extract_all(b, F.lit(_ANCHOR_TEXT_RE), F.lit(1))
    stripped = F.transform(
        anchors,
        lambda a: F.trim(F.regexp_replace(
            F.regexp_replace(a, _INLINE_TAG_RE, " "), "\\s+", " ")))
    return F.length(F.array_join(stripped, " "))


def main_content(html: Column, min_chars: int = 25,
                 max_link_density: float = 0.5) -> Column:
    """Boilerplate-stripped body text: the jusText/boilerpipe idea
    (block segmentation + per-block link density; Kohlschütter et al.
    WSDM'10, Pomikálek 2011) as pure Catalyst — split on block-level
    tags, keep blocks with >= ``min_chars`` of text whose
    link-text share is <= ``max_link_density``, join with newlines.

    Nav bars, footers, menus and related-link lists are short and
    link-saturated on both axes, so the two thresholds remove them
    without a DOM; scan-stage codegen at any scale (the split array's
    elements are small block strings — per-element regexes never
    re-copy the page).  This is a lossy CONTENT heuristic, distinct
    from ``sources.documents.extract_text`` which strips tags
    verbatim for byte-identity."""
    page = _page(html)
    page = F.regexp_replace(page, _COMMENT_RE, " ")
    page = F.regexp_replace(page, _NONCONTENT_RE, " ")
    blocks = F.split(page, _BLOCK_TAG_RE)
    scored = F.transform(
        blocks,
        lambda b: F.struct(_block_text(b).alias("t"),
                           _block_link_chars(b).alias("l")))
    kept = F.filter(
        scored,
        lambda s: (F.length(s["t"]) >= F.lit(min_chars))
        & (s["l"].cast("double")
           <= F.lit(float(max_link_density)) * F.length(s["t"])))
    return F.array_join(F.transform(kept, lambda s: s["t"]), "\n")


# ---------------------------------------------------------------------------
# charset detection + transcoding (html bytes -> unicode text)
# ---------------------------------------------------------------------------

# Real crawls are NOT all UTF-8 (historically ~10-30% of pages declare
# cp1252/gbk/shift_jis/koi8/...).  Detection is pure Catalyst: BOM
# bytes, else the declared <meta> charset read from an ISO-8859-1 peek
# (every byte sequence is valid ISO-8859-1, so the peek never throws —
# Spark 4 decode RAISES on malformed input and has no try_ variant).
# The transcode itself is a vectorized Arrow UDF: Spark's decode()
# supports 7 charsets and hard-fails on bad bytes, while Python codecs
# cover the real-web set with errors='replace' — per-payload work, the
# same dispatch argument as operators/multimodal.py's codecs.

# detected label -> what a browser actually uses (WHATWG encoding
# spec: latin1 family sniffs as windows-1252 because pages lie)
_CHARSET_ALIASES = {
    "iso-8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "cp1252": "windows-1252",
    "us-ascii": "utf-8", "ascii": "utf-8",
    "utf8": "utf-8", "unicode": "utf-16",
    "gb2312": "gbk", "gb_2312": "gbk",
    "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euckr": "euc-kr", "eucjp": "euc-jp",
}


def sniff_charset(html: Column) -> Column:
    """Best-effort charset of an html BINARY column: BOM first (it
    outranks any declaration), then the page's declared <meta>
    charset normalized through the browser alias table, else
    'utf-8'.  Pure Catalyst — the declaration is regexed out of an
    ISO-8859-1 peek, which cannot throw on any byte sequence."""
    hx = F.lower(F.hex(F.substring(html, 1, 4)))
    peek = F.decode(F.substring(html, 1, 4096), "ISO-8859-1")
    declared = F.lower(F.regexp_extract(
        peek, f"(?is)<meta\\s[^>]*charset\\s*=\\s*{_Q}?([a-zA-Z0-9_-]+)", 1))
    # ONE map lookup, not a when-chain: chained otherwise(aliased)
    # references the prior tree twice per alias and the doubled
    # expression blows codegen's 64 KB method limit
    alias_map = F.create_map(
        *[F.lit(x) for kv in _CHARSET_ALIASES.items() for x in kv])
    aliased = F.coalesce(F.element_at(alias_map, declared), declared)
    return (
        F.when(html.isNull(), F.lit(None).cast("string"))
        .when(hx.startswith("efbbbf"), F.lit("utf-8"))
        .when(hx.startswith("fffe"), F.lit("utf-16-le"))
        .when(hx.startswith("feff"), F.lit("utf-16-be"))
        .when(aliased != "", aliased)
        .otherwise(F.lit("utf-8"))
    )


def decode_html(html: Column, charset: Column | None = None) -> Column:
    """html binary -> unicode string, honoring the page's charset.

    ``charset`` defaults to :func:`sniff_charset`.  Decode runs in a
    vectorized Arrow batch (see module comment for why not Spark's
    decode): BOMs are stripped, bad bytes become U+FFFD
    (errors='replace' — a crawl pipeline never throws on one mojibake
    page), unknown labels fall back to UTF-8-else-windows-1252, the
    WHATWG sniffing order."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if charset is None:
        charset = sniff_charset(html)

    # no type hints: PEP 563 stringizes them module-wide and pyspark's
    # hint inference then rejects the signature
    @pandas_udf("string")
    def _dec(blobs, charsets):
        out = []
        for b, cs in zip(blobs, charsets):
            if b is None:
                out.append(None)
                continue
            b = bytes(b)
            if b[:3] == b"\xef\xbb\xbf":
                b = b[3:]
            elif b[:2] in (b"\xff\xfe", b"\xfe\xff"):
                b = b[2:]
            try:
                out.append(b.decode(cs or "utf-8", "replace"))
            except LookupError:  # label Python has no codec for
                try:
                    out.append(b.decode("utf-8", "strict"))
                except UnicodeDecodeError:
                    out.append(b.decode("windows-1252", "replace"))
        return pd.Series(out)

    return _dec(html, charset)
