"""PDF text extraction (operators/pdf.py): hand-built spec-exact
fixtures (classic xref, flate streams, TJ kerning, WinAnsi +
Differences fonts) plus the REAL pdfTeX documents shipped with this
OS image (xref streams + ObjStm + Type1 subset fonts) as third-party
fixtures."""

import os
import zlib

import numpy as np
import pytest

from xarray_spatial_spark.operators import pdf as P

REAL_PDFS = [
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf",
]


def _build_pdf(objects: list[bytes], header: bytes = b"%PDF-1.4\n") -> bytes:
    """Assemble numbered objects into a classic-xref PDF."""
    out = bytearray(header)
    offsets = [0]
    for k, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{k} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _simple_pdf(content: bytes, compress: bool = False,
                font: bytes = b"<< /Type /Font /Subtype /Type1 "
                              b"/BaseFont /Helvetica "
                              b"/Encoding /WinAnsiEncoding >>") -> bytes:
    if compress:
        raw = zlib.compress(content)
        stream = (f"<< /Length {len(raw)} /Filter /FlateDecode >>\n"
                  .encode() + b"stream\n" + raw + b"\nendstream")
    else:
        stream = (f"<< /Length {len(content)} >>\n".encode()
                  + b"stream\n" + content + b"\nendstream")
    return _build_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        stream,
        font,
    ])


def test_minimal_text():
    buf = _simple_pdf(b"BT /F1 12 Tf 72 720 Td (Hello, crawl world!) Tj ET")
    assert P.extract_pdf_text(buf) == "Hello, crawl world!"
    meta = P.pdf_metadata(buf)
    assert meta["n_pages"] == 1 and meta["version"] == "1.4"


def test_flate_stream_and_lines():
    content = (b"BT /F1 10 Tf 72 720 Td (first line) Tj "
               b"0 -14 Td (second line) Tj T* (third) Tj ET")
    buf = _simple_pdf(content, compress=True)
    assert P.extract_pdf_text(buf) == "first line\nsecond line\nthird"


def test_tj_kerning_spaces_and_escapes():
    # TeX-style: no space glyphs, words separated by kern < -100
    content = (b"BT /F1 10 Tf 72 720 Td "
               b"[ (spa) -50 (ced) -250 (words) ] TJ "
               b"( \\(lit\\) \\\\ \\101 ) Tj "
               b"<48454C4C4F> Tj ET")
    buf = _simple_pdf(content)
    assert P.extract_pdf_text(buf) == "spaced words (lit) \\ A HELLO"


def test_differences_encoding_glyph_names():
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /F "
            b"/Encoding << /Differences [ 65 /fi /quoteright /endash ] >> >>")
    content = b"BT /F1 10 Tf 0 0 Td (xABC) Tj ET"
    buf = _simple_pdf(content, font=font)
    # codes 65..67 remapped through glyph names; 'x' stays identity
    assert P.extract_pdf_text(buf) == "xfi’–"


def test_multi_page_and_inherited_resources():
    c1 = b"BT /F1 10 Tf 0 0 Td (page one) Tj ET"
    c2 = b"BT /F1 10 Tf 0 0 Td (page two) Tj ET"
    buf = _build_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 "
        b"/Resources << /Font << /F1 7 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        f"<< /Length {len(c1)} >>\n".encode() + b"stream\n" + c1 + b"\nendstream",
        f"<< /Length {len(c2)} >>\n".encode() + b"stream\n" + c2 + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ])
    assert P.extract_pdf_text(buf) == "page one\n\npage two"
    assert P.extract_pdf_text(buf, max_pages=1) == "page one"


def test_indirect_length_and_comments():
    c = b"BT /F1 10 Tf 0 0 Td (indirect) Tj ET"
    buf = _build_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F1 6 0 R >> >> >>",
        b"% a comment\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length 5 0 R >>\nstream\n" + c + b"\nendstream",
        str(len(c)).encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ])
    assert P.extract_pdf_text(buf) == "indirect"


def test_encrypted_raises_by_name():
    buf = _simple_pdf(b"BT (x) Tj ET")
    buf = buf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 5 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        P.extract_pdf_text(buf)


def test_not_a_pdf_raises():
    with pytest.raises(ValueError, match="not a PDF"):
        P.extract_pdf_text(b"GIF89a....")


def test_tounicode_cmap_two_byte():
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfchar <0041> <0057> <0042> <006F> endbfchar\n"
            b"1 beginbfrange <0050> <0052> <0061> endbfrange\n"
            b"endcmap end\n")
    font = (b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>")
    content = b"BT /F1 10 Tf 0 0 Td <00410042> Tj <005000510052> Tj ET"
    raw = zlib.compress(cmap)
    buf = _build_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        f"<< /Length {len(content)} >>\n".encode() + b"stream\n"
        + content + b"\nendstream",
        font,
        f"<< /Length {len(raw)} /Filter /FlateDecode >>\n".encode()
        + b"stream\n" + raw + b"\nendstream",
    ])
    # bfchar: 0041->W 0042->o ; bfrange 0050..0052 -> a b c
    assert P.extract_pdf_text(buf) == "Woabc"


@pytest.mark.parametrize("path", REAL_PDFS)
def test_real_pdftex_documents(path):
    """Third-party fixtures: pdfTeX 1.5 files with xref streams +
    compressed object streams + subset Type1 fonts with Differences
    encodings — the modern layout a crawler actually meets."""
    if not os.path.exists(path):
        pytest.skip(f"{path} not on this image")
    buf = open(path, "rb").read()
    meta = P.pdf_metadata(buf)
    assert meta["n_pages"] > 10
    assert meta["producer"].startswith("pdfTeX")
    text = P.extract_pdf_text(buf)
    assert len(text) > 20_000
    words = (["MIME", "database", "application"] if "mime" in path
             else ["ASN.1", "Libtasn1", "structure"])
    for w in words:
        assert w in text, w
    # real words dominate: letters + spaces over total
    letters = sum(ch.isalpha() or ch.isspace() for ch in text)
    assert letters / len(text) > 0.8


def test_png_predictor_roundtrip():
    rng = np.random.default_rng(5)
    cols = 7
    rows = rng.integers(0, 256, (20, cols)).astype(np.uint8)
    # encode with "up" predictor (type 2) the way xref streams are
    enc = bytearray()
    prev = np.zeros(cols, np.uint8)
    for r in rows:
        enc.append(2)
        enc.extend(((r.astype(int) - prev) % 256).astype(np.uint8).tobytes())
        prev = r
    dec = P._png_predict(bytes(enc), 1, cols)
    assert dec == rows.tobytes()


def test_pdf_text_distributed_with_errors(spark):
    good = _simple_pdf(b"BT /F1 12 Tf 0 0 Td (distributed ok) Tj ET")
    rows = [(0, bytearray(good)), (1, bytearray(good[:40])),
            (2, bytearray(b"not a pdf at all"))]
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    out = {r["id"]: r for r in P.pdf_text(df).collect()}
    assert out[0]["pdf_text"] == "distributed ok"
    assert out[0]["err"] is None and out[0]["n_pages"] == 1
    assert out[1]["pdf_text"] is None and out[1]["err"]
    assert "ValueError" in out[2]["err"]
