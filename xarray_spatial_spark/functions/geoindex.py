"""Geohash and Bing quadkey — the two public spatial-index families
this engine didn't yet speak (beside Morton/mercator cells in grid.py
and real S2 in s2.py).  Both are pure bit arithmetic, so encode AND
decode run as whole-stage-codegen Column expressions — no UDF — and
the identical math replays in any ANSI-SQL oracle via the ``*_sql``
twins (linear-size bit-extraction form, no exponential inlining).

Geohash (public domain, Niemeyer 2008): latitude/longitude bisection
== fixed-point quantization to ``floor(5p/2)`` lat bits and
``ceil(5p/2)`` lon bits, bit-interleaved MSB-first starting with
longitude, rendered in a 32-char alphabet.  The prefix property (a
p-char code is a prefix of every higher-precision code of the same
point) is what makes it a 100-TB clustering key: sorting or
range-partitioning by geohash groups spatial neighbours lexically,
exactly like SURT keys do for hosts (url.py:surt).

Quadkey (Bing maps tile system): the z-digit base-4 rendering of the
Morton interleave of a Web-Mercator tile (x, y) — digit =
2*y_bit + x_bit, MSB first.  Same prefix property; zoom-(z-1) key of
a point is the first z-1 digits of its zoom-z key.

Scale notes: encode is ~30 codegen'd integer ops per row, decode ~40;
the per-character alphabet lookup is a literal-array ``element_at``
(constant-folded) and decode parses the whole value through ONE
``translate``+``conv`` chain (never a per-char lookup loop — see
``_gh_value``).  Nothing here shuffles; grouping by a prefix
(`F.substring(gh, 1, k)`) is the intended aggregation pattern and
needs no re-encode.  Precision is capped at 11 chars (55 bits) so the
28-bit-safe spread helpers in grid.py always apply; geohash-11 is
~15 cm — finer than any web-scale use.

Composition hazard (measured, test-pinned): do NOT put a FILTER
directly over decode→re-encode column chains.  Catalyst's predicate
pushdown substitutes aliased trees unguarded (CollapseProject has a
cost check; PushDownPredicate does not), and the bit spread/compact
chains reference their input twice per step (2^6 = 64× per level), so
a predicate pushed through chained computed-column projects
multiplies to millions of expression nodes and OOMs the optimizer.
Materialize first (write / localCheckpoint) or compare collected
values; encoding from raw lat/lon columns — the production path — is
unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import grid

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 11  # 55 bits total; lon gets 28 = grid spread-helper cap


def _gh_bits(precision: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) for a geohash of ``precision`` chars —
    longitude takes the extra bit at odd precision (it is the first
    bit of the stream)."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be in [1, {MAX_PRECISION}]")
    total = 5 * precision
    return (total + 1) // 2, total // 2


def _quantize(v: Column, lo: float, span: float, bits: int) -> Column:
    """Fixed-point bucket floor((v - lo) / span * 2^bits), clamped —
    the exact op order of grid.tile_x_col so doubles (and therefore
    floors) match any SQL twin bit-for-bit."""
    n = 1 << bits
    q = F.floor((v - F.lit(float(lo))) / F.lit(float(span)) * F.lit(float(n)))
    return F.least(F.greatest(q, F.lit(0)), F.lit(n - 1)).cast("long")


def _gh_interleaved(lat: Column, lon: Column, precision: int) -> Column:
    bl, bt = _gh_bits(precision)
    lo = grid._part1by1_col(_quantize(lon, -180.0, 360.0, bl))
    la = grid._part1by1_col(_quantize(lat, -90.0, 180.0, bt))
    if bl == bt:  # even precision: stream starts AND ends paired
        return F.shiftleft(lo, 1).bitwiseOR(la)
    # odd precision: lon has one extra (final) bit — lon sits at even
    # bit positions so the MSB (bit 2*bt) is still a longitude bit
    return lo.bitwiseOR(F.shiftleft(la, 1))


def _alphabet_lookup(idx: Column) -> Column:
    # literal array + element_at: constant-folded by Catalyst, no UDF
    arr = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    return F.element_at(arr, idx.cast("int") + 1)


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Geohash string of (lat, lon) — codegen'd bit math, no UDF."""
    v = _gh_interleaved(lat, lon, precision)
    chars = [
        _alphabet_lookup(
            F.shiftrightunsigned(v, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31))
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def _compact1by1_col(v: Column) -> Column:
    """Column-expression inverse of grid._part1by1_col (even bits)."""
    v = v.bitwiseAND(F.lit(0x5555555555555555))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 1))).bitwiseAND(F.lit(0x3333333333333333))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 2))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 4))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 8))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 16))).bitwiseAND(F.lit(0x000000000FFFFFFF))
    return v


_STD_BASE32 = "0123456789abcdefghijklmnopqrstuv"


def _gh_value(gh: Column) -> Column:
    """The 5*precision-bit integer behind a geohash string, as ONE
    expression chain referencing ``gh`` exactly once.

    NOT a per-char lookup loop: decode columns get INLINED at every
    downstream reference by projection collapse, so any decode form
    that references the input string once per character multiplies
    through re-encode compositions into a multi-100-MB expression
    tree that OOMs the optimizer (seen live on a default-heap
    session).  ``translate`` maps the geohash alphabet onto standard
    base-32 digits and ``conv`` parses the whole value in one node —
    exact below 2^63, and precision is capped at 11 chars = 55 bits.
    """
    return F.conv(F.translate(gh, GEOHASH_ALPHABET, _STD_BASE32), 32, 10).cast(
        "long"
    )


def geohash_decode_cols(gh: Column, precision: int) -> tuple[Column, Column]:
    """(lat, lon) CELL CENTER of a geohash — exact inverse of the
    quantizer up to the half-cell offset."""
    bl, bt = _gh_bits(precision)
    v = _gh_value(gh)
    if bl == bt:
        lo_q = _compact1by1_col(F.shiftrightunsigned(v, 1))
        la_q = _compact1by1_col(v)
    else:
        lo_q = _compact1by1_col(v)
        la_q = _compact1by1_col(F.shiftrightunsigned(v, 1))
    lat = (la_q.cast("double") + F.lit(0.5)) / F.lit(float(1 << bt)) * F.lit(
        180.0
    ) - F.lit(90.0)
    lon = (lo_q.cast("double") + F.lit(0.5)) / F.lit(float(1 << bl)) * F.lit(
        360.0
    ) - F.lit(180.0)
    return lat, lon


# ---------------------------------------------------------------------------
# Bing quadkey
# ---------------------------------------------------------------------------

def _qk_digit(d: Column) -> Column:
    return F.element_at(F.array(*[F.lit(c) for c in "0123"]), d.cast("int") + 1)


def quadkey_col(lat: Column, lon: Column, zoom: int = 8) -> Column:
    """Bing quadkey string at ``zoom`` — Web-Mercator tile (via
    grid.tile_x_col/tile_y_col, the SAME quantizer the z-tile oracles
    already pin cross-engine) rendered base-4 MSB-first."""
    if not 1 <= zoom <= 28:
        raise ValueError("zoom must be in [1, 28]")
    xt = grid.tile_x_col(lon, zoom)
    yt = grid.tile_y_col(lat, zoom)
    digits = [
        _qk_digit(
            F.shiftleft(
                F.shiftrightunsigned(yt, zoom - 1 - i).bitwiseAND(F.lit(1)), 1
            ).bitwiseOR(F.shiftrightunsigned(xt, zoom - 1 - i).bitwiseAND(F.lit(1)))
        )
        for i in range(zoom)
    ]
    return F.concat(*digits)


def quadkey_decode_cols(qk: Column, zoom: int) -> tuple[Column, Column]:
    """(tile_x, tile_y) of a zoom-length quadkey.

    Same one-reference discipline as ``_gh_value``: the quadkey IS a
    base-4 number whose 2-bit digits are the (y, x) Morton interleave,
    so ``conv`` parses it whole (zoom <= 28 -> 56 bits) and the bit
    compaction runs over that single value."""
    v = F.conv(qk, 4, 10).cast("long")
    return _compact1by1_col(v), _compact1by1_col(F.shiftrightunsigned(v, 1))


# ---------------------------------------------------------------------------
# ANSI-SQL twins (DuckDB oracles) — linear-size bit-extraction form:
# each character is a sum of five single-bit terms over the quantized
# ints, so the expression grows O(5 * precision), never exponentially.
# ---------------------------------------------------------------------------


def _sql_quant(expr: str, lo: float, span: float, bits: int) -> str:
    n = 1 << bits
    q = f"floor((({expr}) - {lo}) / {span} * {float(n)})"
    return f"CAST(least(greatest({q}, 0), {n - 1}) AS BIGINT)"


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 8) -> str:
    """DuckDB expression string computing the identical geohash.
    ``lat_expr``/``lon_expr`` are referenced O(5*precision) times —
    pass COLUMN NAMES (materialize complex exprs in a subquery)."""
    bl, bt = _gh_bits(precision)
    lo = _sql_quant(lon_expr, -180.0, 360.0, bl)
    la = _sql_quant(lat_expr, -90.0, 180.0, bt)
    chars = []
    for i in range(precision):
        terms = []
        for b in range(5):  # global bit position, MSB-first
            pos = 5 * i + b
            # stream alternates lon, lat, lon, ... from the MSB
            if pos % 2 == 0:
                src, nbits = lo, bl
            else:
                src, nbits = la, bt
            shift = nbits - 1 - pos // 2
            terms.append(f"(({src} >> {shift}) & 1) * {1 << (4 - b)}")
        idx = " + ".join(terms)
        chars.append(f"substr('{GEOHASH_ALPHABET}', CAST({idx} AS INT) + 1, 1)")
    return " || ".join(chars)


def quadkey_sql(tile_x_expr: str, tile_y_expr: str, zoom: int) -> str:
    """DuckDB expression for the quadkey of an already-computed tile
    (pair with __spark_entry__._sql_tile_x/_sql_tile_y)."""
    digits = []
    for i in range(zoom):
        sh = zoom - 1 - i
        d = f"((({tile_y_expr}) >> {sh}) & 1) * 2 + ((({tile_x_expr}) >> {sh}) & 1)"
        digits.append(f"substr('0123', CAST({d} AS INT) + 1, 1)")
    return " || ".join(digits)
