"""PDF text extraction — pure stdlib (zlib) + python, no PDF libraries.

Web crawls carry a large PDF tail (Common Crawl serves them alongside
HTML), so a training-corpus engine needs ``application/pdf`` to flow
into the same text pipeline as pages.  This is a from-scratch reader
of the public ISO 32000 / PDF 1.x format covering what crawled PDFs
actually are:

* object model: dicts/arrays/names/strings/numbers/refs/streams,
* classic xref tables AND cross-reference streams (/Type /XRef with
  /W field widths + PNG up/sub/paeth predictors), /Prev chains,
* compressed object streams (/Type /ObjStm),
* filters: FlateDecode (+ predictors), ASCIIHexDecode, ASCII85Decode,
  RunLengthDecode; anything else raises by name,
* page-tree walk with inherited /Resources,
* content-stream text operators (BT/ET, Tf, Td/TD/TD*/Tm, Tj/TJ/'/"),
  with the TJ-kerning space heuristic (TeX engines position spaces
  instead of emitting space glyphs),
* per-font byte->unicode decoding: /ToUnicode CMaps (bfchar/bfrange,
  1- and 2-byte codes), /Differences glyph-name tables (an Adobe-
  glyph-list subset), WinAnsi/Standard/MacRoman base encodings,
  Identity CID fallback.

Distributed shape: ``pdf_text`` is a mapInPandas over binary payloads
(per-blob decode, inherently per-payload like the image codecs);
extraction is scan-stage work, no shuffle.  Errors per row surface in
an ``err`` column instead of failing the batch — a crawl ALWAYS
contains truncated/encrypted PDFs.  Encrypted documents raise by name
(/Encrypt), as does any unsupported filter.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Name(str):
    """A PDF name (distinct from a string object)."""


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"{self.num} {self.gen} R"

    def __eq__(self, o):
        return isinstance(o, Ref) and (self.num, self.gen) == (o.num, o.gen)

    def __hash__(self):
        return hash((self.num, self.gen))


class Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


# ---------------------------------------------------------------------------
# tokenizer / object parser
# ---------------------------------------------------------------------------


def _skip_ws(b: bytes, i: int) -> int:
    n = len(b)
    while i < n:
        c = b[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            while i < n and b[i] not in (10, 13):
                i += 1
        else:
            break
    return i


def _parse_object(b: bytes, i: int, doc=None):
    """Parse one object at offset i; returns (obj, next_offset)."""
    i = _skip_ws(b, i)
    c = b[i]
    if c == 0x3C and b[i + 1: i + 2] == b"<":  # <<
        d = {}
        i += 2
        while True:
            i = _skip_ws(b, i)
            if b[i: i + 2] == b">>":
                i += 2
                break
            key, i = _parse_object(b, i, doc)
            val, i = _parse_object(b, i, doc)
            d[str(key)] = val
        # stream?
        j = _skip_ws(b, i)
        if b[j: j + 6] == b"stream":
            j += 6
            if b[j: j + 2] == b"\r\n":
                j += 2
            elif b[j: j + 1] == b"\n":
                j += 1
            ln = d.get("Length")
            if isinstance(ln, Ref) and doc is not None:
                ln = doc.obj(ln)
            if not isinstance(ln, int):  # fall back: scan for endstream
                end = b.index(b"endstream", j)
                ln = end - j
            raw = b[j: j + ln]
            j += ln
            j = _skip_ws(b, j)
            if b[j: j + 9] == b"endstream":
                j += 9
            return Stream(d, raw), j
        return d, i
    if c == 0x3C:  # <hex string>
        end = b.index(b">", i)
        hx = re.sub(rb"\s", b"", b[i + 1: end])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii")), end + 1
    if c == 0x28:  # (literal string)
        i += 1
        out = bytearray()
        depth = 1
        n = len(b)
        while i < n:
            ch = b[i]
            if ch == 0x5C:  # backslash
                nx = b[i + 1]
                i += 2
                if nx == 0x6E:
                    out.append(10)
                elif nx == 0x72:
                    out.append(13)
                elif nx == 0x74:
                    out.append(9)
                elif nx == 0x62:
                    out.append(8)
                elif nx == 0x66:
                    out.append(12)
                elif nx in (0x28, 0x29, 0x5C):
                    out.append(nx)
                elif 0x30 <= nx <= 0x37:  # octal, up to 3 digits
                    oct_s = chr(nx)
                    for _ in range(2):
                        if i < n and 0x30 <= b[i] <= 0x37:
                            oct_s += chr(b[i])
                            i += 1
                    out.append(int(oct_s, 8) & 0xFF)
                elif nx in (10, 13):  # line continuation
                    if nx == 13 and i < n and b[i] == 10:
                        i += 1
                else:
                    out.append(nx)
                continue
            if ch == 0x28:
                depth += 1
            elif ch == 0x29:
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            out.append(ch)
            i += 1
        return bytes(out), i
    if c == 0x5B:  # [ array ]
        arr = []
        i += 1
        while True:
            i = _skip_ws(b, i)
            if b[i] == 0x5D:
                i += 1
                break
            v, i = _parse_object(b, i, doc)
            arr.append(v)
        return arr, i
    if c == 0x2F:  # /Name
        i += 1
        j = i
        n = len(b)
        while j < n and b[j] not in _WS and b[j] not in _DELIM:
            j += 1
        raw = b[i:j]
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                         lambda m: bytes([int(m.group(1), 16)]), raw)
        return Name(raw.decode("latin-1")), j
    # keyword / number / ref
    j = i
    n = len(b)
    while j < n and b[j] not in _WS and b[j] not in _DELIM:
        j += 1
    tok = b[i:j]
    if tok == b"true":
        return True, j
    if tok == b"false":
        return False, j
    if tok == b"null":
        return None, j
    try:
        if b"." in tok:
            return float(tok), j
        num = int(tok)
    except ValueError:
        return Name(tok.decode("latin-1")), j  # bare operator keyword
    # "num gen R" lookahead
    k = _skip_ws(b, j)
    m = re.match(rb"(\d+)\s+R(?![A-Za-z0-9])", b[k: k + 24], re.S)
    if m is not None and tok.isdigit():
        kk = k
        # confirm the middle token is the gen number followed by R
        gen_end = kk + len(m.group(1))
        r_at = _skip_ws(b, gen_end)
        if b[r_at: r_at + 1] == b"R":
            return Ref(num, int(m.group(1))), r_at + 1
    return num, j


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------


def _png_predict(data: bytes, colors: int, columns: int) -> bytes:
    bpp = colors
    row = columns * colors
    out = bytearray()
    prev = bytearray(row)
    i = 0
    while i < len(data):
        ft = data[i]
        i += 1
        cur = bytearray(data[i: i + row])
        i += row
        if ft == 0:
            pass
        elif ft == 1:
            for x in range(bpp, row):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 2:
            for x in range(row):
                cur[x] = (cur[x] + prev[x]) & 0xFF
        elif ft == 3:
            for x in range(row):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            for x in range(row):
                a = cur[x - bpp] if x >= bpp else 0
                bb = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + bb - cc
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                pr = a if pa <= pb and pa <= pc else (bb if pb <= pc else cc)
                cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out.extend(cur)
        prev = cur
    return bytes(out)


def _apply_filters(s: Stream, doc) -> bytes:
    data = s.raw
    filters = doc.get(s.d, "Filter")
    if filters is None:
        return data
    if not isinstance(filters, list):
        filters = [filters]
    parms = doc.get(s.d, "DecodeParms") or doc.get(s.d, "DP")
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    for f, pm in zip(filters, parms):
        f = str(f)
        if f == "FlateDecode" or f == "Fl":
            data = zlib.decompress(data)
        elif f == "ASCIIHexDecode" or f == "AHx":
            hx = re.sub(rb"[\s>]", b"", data)
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        elif f == "ASCII85Decode" or f == "A85":
            import base64
            body = data.rstrip()
            if body.endswith(b"~>"):
                body = body[:-2]
            data = base64.a85decode(re.sub(rb"\s", b"", body))
        elif f == "RunLengthDecode" or f == "RL":
            out = bytearray()
            i = 0
            while i < len(data):
                l = data[i]
                if l == 128:
                    break
                if l < 128:
                    out += data[i + 1: i + 2 + l]
                    i += 2 + l
                else:
                    out += data[i + 1: i + 2] * (257 - l)
                    i += 2
            data = bytes(out)
        else:
            raise NotImplementedError(f"PDF filter {f} (needs a codec lib)")
        pm = doc.resolve(pm)
        if isinstance(pm, dict):
            pred = doc.get(pm, "Predictor") or 1
            if pred >= 10:
                data = _png_predict(
                    data,
                    int(doc.get(pm, "Colors") or 1),
                    int(doc.get(pm, "Columns") or 1),
                )
            elif pred != 1:
                raise NotImplementedError(f"PDF predictor {pred}")
    return data


# ---------------------------------------------------------------------------
# document: xref (tables + streams), ObjStm, page tree
# ---------------------------------------------------------------------------


class PdfDocument:
    def __init__(self, buf: bytes):
        if not buf.startswith(b"%PDF-"):
            raise ValueError("not a PDF")
        self.buf = buf
        self._cache: dict[int, object] = {}
        self.xref: dict[int, tuple] = {}  # num -> ("f", off) | ("c", objstm, idx)
        self.trailer: dict = {}
        tail = buf[-2048:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise ValueError("PDF without startxref")
        self._load_xref(int(m[-1].group(1)), set())
        if "Encrypt" in self.trailer:
            raise NotImplementedError("encrypted PDF")

    # -- xref loading ------------------------------------------------------
    def _load_xref(self, off: int, seen: set) -> None:
        if off in seen or off >= len(self.buf):
            return
        seen.add(off)
        b = self.buf
        i = _skip_ws(b, off)
        if b[i: i + 4] == b"xref":  # classic table
            i += 4
            while True:
                i = _skip_ws(b, i)
                if b[i: i + 7] == b"trailer":
                    i += 7
                    tr, i = _parse_object(b, i, self)
                    for k, v in tr.items():
                        self.trailer.setdefault(k, v)
                    prev = tr.get("Prev")
                    if isinstance(prev, int):
                        self._load_xref(prev, seen)
                    xs = tr.get("XRefStm")
                    if isinstance(xs, int):
                        self._load_xref(xs, seen)
                    return
                m = re.match(rb"(\d+)\s+(\d+)", b[i: i + 40])
                if m is None:
                    return
                start, cnt = int(m.group(1)), int(m.group(2))
                i += m.end()
                i = _skip_ws(b, i)
                for k in range(cnt):
                    ent = b[i: i + 20]
                    i += 20
                    num = start + k
                    if ent[17:18] == b"n" and num not in self.xref:
                        self.xref[num] = ("f", int(ent[0:10]))
            return
        # xref STREAM: "num gen obj << /Type /XRef ... >> stream"
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", b[i: i + 40])
        if m is None:
            raise ValueError("bad xref offset")
        obj, _ = _parse_object(b, i + m.end(), self)
        if not isinstance(obj, Stream):
            raise ValueError("xref stream expected")
        data = _apply_filters(obj, self)
        w = [int(x) for x in obj.d["W"]]
        size = int(self.resolve(obj.d.get("Size")) or 0)
        index = obj.d.get("Index") or [0, size]
        rw = sum(w)
        pos = 0
        for a in range(0, len(index), 2):
            first, cnt = int(index[a]), int(index[a + 1])
            for k in range(cnt):
                row = data[pos: pos + rw]
                pos += rw
                fs = []
                o = 0
                for width in w:
                    fs.append(int.from_bytes(row[o: o + width], "big")
                              if width else None)
                    o += width
                typ = fs[0] if w[0] else 1
                num = first + k
                if num in self.xref:
                    continue
                if typ == 1:
                    self.xref[num] = ("f", fs[1])
                elif typ == 2:
                    self.xref[num] = ("c", fs[1], fs[2])
        for k, v in obj.d.items():
            self.trailer.setdefault(k, v)
        prev = obj.d.get("Prev")
        if isinstance(prev, int):
            self._load_xref(prev, seen)

    # -- object resolution ---------------------------------------------------
    def resolve(self, v):
        while isinstance(v, Ref):
            v = self.obj(v)
        return v

    def get(self, d, key):
        if d is None:
            return None
        return self.resolve(d.get(key))

    def obj(self, ref: Ref):
        num = ref.num if isinstance(ref, Ref) else int(ref)
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            return None
        if ent[0] == "f":
            b = self.buf
            i = _skip_ws(b, ent[1])
            m = re.match(rb"(\d+)\s+(\d+)\s+obj", b[i: i + 40])
            if m is None:
                return None
            v, _ = _parse_object(b, i + m.end(), self)
            self._cache[num] = v
            return v
        # compressed: in ObjStm ent[1], index ent[2]
        _, stm_num, idx = ent
        stm = self.obj(Ref(stm_num, 0))
        if not isinstance(stm, Stream):
            return None
        data = _apply_filters(stm, self)
        n = int(self.resolve(stm.d["N"]))
        first = int(self.resolve(stm.d["First"]))
        hdr = data[:first].split()
        offs = [(int(hdr[2 * k]), int(hdr[2 * k + 1])) for k in range(n)]
        # cache every object of the stream in one pass
        for onum, ooff in offs:
            if onum not in self._cache:
                v, _ = _parse_object(data, first + ooff, self)
                self._cache[onum] = v
        return self._cache.get(num)

    # -- pages ---------------------------------------------------------------
    def pages(self):
        root = self.resolve(self.trailer.get("Root"))
        out = []

        def walk(node, inherited):
            node = self.resolve(node)
            if node is None:
                return
            res = self.get(node, "Resources") or inherited
            if str(node.get("Type")) == "Page" or (
                    "Contents" in node and "Kids" not in node):
                out.append((node, res))
                return
            for kid in self.get(node, "Kids") or []:
                walk(kid, res)

        walk(self.get(root, "Pages"), None)
        return out

    def stream_bytes(self, v) -> bytes:
        v = self.resolve(v)
        if isinstance(v, Stream):
            return _apply_filters(v, self)
        if isinstance(v, list):
            return b"\n".join(self.stream_bytes(x) for x in v)
        return b""


# ---------------------------------------------------------------------------
# fonts: byte codes -> unicode
# ---------------------------------------------------------------------------

# Adobe-glyph-list subset covering latin text, TeX ligatures and common
# punctuation (public AGL); single-letter names map to themselves and
# uniXXXX names decode directly.
_GLYPHS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "fi": "fi", "fl": "fl", "ffi": "ffi", "ffl": "ffl", "ff": "ff",
    "bullet": "•", "dagger": "†", "daggerdbl": "‡",
    "ellipsis": "…", "germandbls": "ß", "dotlessi": "ı",
    "oe": "œ", "OE": "Œ", "ae": "æ", "AE": "Æ",
    "cent": "¢", "sterling": "£", "section": "§",
    "copyright": "©", "registered": "®", "degree": "°",
    "acute": "´", "dieresis": "¨", "circumflex": "ˆ",
    "tilde": "˜", "macron": "¯", "quotesinglbase": "‚",
    "quotedblbase": "„", "guillemotleft": "«",
    "guillemotright": "»", "exclamdown": "¡",
    "questiondown": "¿", "minus": "−", "multiply": "×",
    "divide": "÷", "nbspace": " ", "Euro": "€",
}


def _glyph_to_char(name: str) -> str:
    if len(name) == 1:
        return name
    if name in _GLYPHS:
        return _GLYPHS[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return ""
    m = re.fullmatch(r"([a-zA-Z])(acute|grave|circumflex|dieresis|tilde|"
                     r"ring|cedilla|caron|breve|macron|slash)", name)
    if m:  # compose common accented latin via NFC best effort
        import unicodedata
        marks = {"acute": "́", "grave": "̀", "circumflex": "̂",
                 "dieresis": "̈", "tilde": "̃", "ring": "̊",
                 "cedilla": "̧", "caron": "̌", "breve": "̆",
                 "macron": "̄", "slash": "̸"}
        return unicodedata.normalize("NFC", m.group(1) + marks[m.group(2)])
    return ""


def _parse_tounicode(cmap: bytes):
    """bfchar/bfrange tables -> {code_int: str}; also returns the code
    byte width (1 or 2) inferred from the codespace/src hex lengths."""
    text = cmap.decode("latin-1", "replace")
    mapping: dict[int, str] = {}
    width = 1

    def dst_to_str(hx: str) -> str:
        raw = bytes.fromhex(hx)
        try:
            return raw.decode("utf-16-be")
        except UnicodeDecodeError:
            return ""

    for m in re.finditer(r"beginbfchar(.*?)endbfchar", text, re.S):
        for src, dst in re.findall(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                                   m.group(1)):
            width = max(width, len(src) // 2)
            mapping[int(src, 16)] = dst_to_str(dst)
    for m in re.finditer(r"beginbfrange(.*?)endbfrange", text, re.S):
        body = m.group(1)
        for lo, hi, dst in re.findall(
                r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                body):
            width = max(width, len(lo) // 2)
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = dst_to_str(dst)
            if not base:
                continue
            for k in range(hi_i - lo_i + 1):
                s = base[:-1] + chr(ord(base[-1]) + k) if base else ""
                mapping[lo_i + k] = s
        for lo, hi, arr in re.findall(
                r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]",
                body, re.S):
            width = max(width, len(lo) // 2)
            dsts = re.findall(r"<([0-9A-Fa-f]+)>", arr)
            for k, d in enumerate(dsts):
                mapping[int(lo, 16) + k] = dst_to_str(d)
    return mapping, width


class _Font:
    """Decoder for one /Font resource."""

    def __init__(self, doc: PdfDocument, fd: dict):
        self.width = 1
        self.cmap: dict[int, str] | None = None
        self.table: list[str] | None = None
        sub = str(doc.get(fd, "Subtype") or "")
        tu = doc.get(fd, "ToUnicode")
        if isinstance(tu, Stream):
            self.cmap, self.width = _parse_tounicode(_apply_filters(tu, doc))
            return
        if sub == "Type0":
            self.width = 2  # Identity-H without ToUnicode: undecodable ids
            return
        # simple font: 256-entry table from base encoding + differences
        table = [chr(c) for c in range(256)]  # StandardEncoding ~ latin-1 core
        enc = doc.get(fd, "Encoding")
        diffs = None
        if isinstance(enc, dict):
            base = str(doc.get(enc, "BaseEncoding") or "")
            diffs = doc.get(enc, "Differences")
        else:
            base = str(enc or "")
        if base == "WinAnsiEncoding":
            table = [bytes([c]).decode("cp1252", "replace") for c in range(256)]
        if diffs:
            code = 0
            for d in diffs:
                d = doc.resolve(d)
                if isinstance(d, (int, float)):
                    code = int(d)
                elif isinstance(d, Name):
                    if code < 256:
                        table[code] = _glyph_to_char(str(d))
                    code += 1
        self.table = table

    def decode(self, raw: bytes) -> str:
        if self.cmap is not None:
            out = []
            if self.width == 2:
                for k in range(0, len(raw) - 1, 2):
                    out.append(self.cmap.get((raw[k] << 8) | raw[k + 1], ""))
            else:
                for c in raw:
                    out.append(self.cmap.get(c, ""))
            return "".join(out)
        if self.table is not None:
            return "".join(self.table[c] for c in raw)
        return ""  # undecodable CID font without ToUnicode


# ---------------------------------------------------------------------------
# content-stream text extraction
# ---------------------------------------------------------------------------


def _page_fonts(doc: PdfDocument, res) -> dict[str, _Font]:
    fonts = {}
    fdict = doc.get(res, "Font") if res else None
    for name, ref in (fdict or {}).items():
        fd = doc.resolve(ref)
        if isinstance(fd, dict):
            fonts[str(name)] = _Font(doc, fd)
    return fonts


def _extract_page_text(doc: PdfDocument, content: bytes,
                       fonts: dict[str, _Font]) -> str:
    out: list[str] = []
    stack: list = []
    font: _Font | None = None
    i = 0
    n = len(content)
    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        obj, i = _parse_object(content, i, None)
        if not isinstance(obj, Name) or str(obj) in ("true", "false", "null"):
            stack.append(obj)
            continue
        # names pushed by _parse_object for /X stay operands; operators
        # come back as bare Names from the keyword branch — tell them
        # apart by the preceding byte (operands were written with /)
        op = str(obj)
        prev_is_slash = content[i - len(op) - 1: i - len(op)] == b"/"
        if prev_is_slash:
            stack.append(obj)
            continue
        if op == "Tf" and len(stack) >= 2:
            font = fonts.get(str(stack[-2]))
        elif op in ("Tj", "'", '"'):
            if op in ("'", '"'):
                out.append("\n")
            raw = stack[-1] if stack else b""
            if isinstance(raw, bytes) and font is not None:
                out.append(font.decode(raw))
        elif op == "TJ":
            arr = stack[-1] if stack else []
            if isinstance(arr, list):
                for el in arr:
                    if isinstance(el, bytes) and font is not None:
                        out.append(font.decode(el))
                    elif isinstance(el, (int, float)) and el < -100:
                        out.append(" ")  # TeX-style positioned space
        elif op in ("T*", "TD"):
            out.append("\n")
        elif op == "Td":
            ty = stack[-1] if stack else 0
            out.append("\n" if isinstance(ty, (int, float)) and ty != 0
                       else " ")
        elif op == "Tm":
            out.append("\n")
        elif op == "ET":
            out.append("\n")
        elif op == "BI":  # inline image: skip to EI
            j = content.find(b"EI", i)
            i = n if j < 0 else j + 2
        if op[0].isalpha() or op in ("'", '"', "T*"):
            stack.clear()
    txt = "".join(out)
    txt = re.sub(r"[ \t]+", " ", txt)
    txt = re.sub(r" ?\n ?", "\n", txt)
    txt = re.sub(r"\n{2,}", "\n", txt)
    return txt.strip()


def extract_pdf_text(buf: bytes, max_pages: int | None = None) -> str:
    """The whole document's text, pages joined by blank lines."""
    doc = PdfDocument(bytes(buf))
    pages = doc.pages()
    if max_pages is not None:
        pages = pages[:max_pages]
    texts = []
    for page, res in pages:
        content = doc.stream_bytes(page.get("Contents"))
        fonts = _page_fonts(doc, res)
        texts.append(_extract_page_text(doc, content, fonts))
    return "\n\n".join(t for t in texts if t)


def pdf_metadata(buf: bytes) -> dict:
    """Driver-callable rollup: page count, PDF version, /Info fields."""
    doc = PdfDocument(bytes(buf))
    info = doc.resolve(doc.trailer.get("Info")) or {}

    def s(v):
        v = doc.resolve(v)
        if isinstance(v, bytes):
            if v[:2] in (b"\xfe\xff",):
                return v[2:].decode("utf-16-be", "replace")
            return v.decode("latin-1", "replace")
        return None

    return {
        "version": doc.buf[5:8].decode("ascii", "replace"),
        "n_pages": len(doc.pages()),
        "title": s(info.get("Title")),
        "author": s(info.get("Author")),
        "producer": s(info.get("Producer")),
    }


# ---------------------------------------------------------------------------
# distributed surface
# ---------------------------------------------------------------------------


def pdf_text(df: DataFrame, payload_col: str = "payload",
             out_col: str = "pdf_text", max_pages: int | None = None
             ) -> DataFrame:
    """binary PDF payloads -> extracted text (+ n_pages, err columns).
    Per-row failures (truncated/encrypted/unsupported-filter PDFs — a
    crawl always has them) surface in ``err`` instead of failing the
    task; scan-stage mapInPandas, no shuffle."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema)
    schema += f", {out_col} string, n_pages int, err string"

    def _op(batches):
        for pdf_batch in batches:
            texts, npages, errs = [], [], []
            for p in pdf_batch[payload_col]:
                try:
                    d = PdfDocument(bytes(p))
                    pages = d.pages()
                    if max_pages is not None:
                        pages = pages[:max_pages]
                    parts = []
                    for page, res in pages:
                        content = d.stream_bytes(page.get("Contents"))
                        parts.append(
                            _extract_page_text(d, content, _page_fonts(d, res)))
                    texts.append("\n\n".join(t for t in parts if t))
                    npages.append(len(pages))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — crawl robustness
                    texts.append(None)
                    npages.append(0)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            res_pdf = pdf_batch.copy()
            res_pdf[out_col] = texts
            res_pdf["n_pages"] = pd.array(npages, dtype="int32")
            res_pdf["err"] = errs
            yield res_pdf

    return df.mapInPandas(_op, schema=schema)


# ---------------------------------------------------------------------------
# fixture builder — deterministic one-page PDFs for tests/benchmarks
# ---------------------------------------------------------------------------


def simple_pdf(text: str, wrap: int = 80) -> bytes:
    """A minimal spec-valid one-page PDF rendering ``text`` (ASCII;
    other bytes replaced) line by line — the deterministic payload
    generator for the pdf_extract benchmark and synthetic crawls."""
    safe = text.encode("ascii", "replace").decode("ascii")
    lines = []
    for ln in safe.split("\n"):
        while len(ln) > wrap:
            lines.append(ln[:wrap])
            ln = ln[wrap:]
        lines.append(ln)

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    body = " ".join(f"({esc(ln)}) Tj 0 -13 Td" for ln in lines)
    content = f"BT /F1 11 Tf 72 760 Td {body} ET".encode("ascii")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for k, b_ in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{k} 0 obj\n".encode() + b_ + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
