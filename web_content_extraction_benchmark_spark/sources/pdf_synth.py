"""Deterministic synthetic PDF writer (stdlib only).

Counterpart of `extractors/pdf_text.py` for tests/fixtures: lays a
document's plain text out as a real multi-page, optionally two-column
PDF 1.4 file.  The ground truth of ``encode_pdf(doc_id, text)`` is
``' '.join(text.split())`` — the extractor must recover exactly the
word sequence, which makes reading order (columns, pages) part of the
oracle: a parser that misorders columns or pages scrambles the bytes.

Layout/encoding arms vary BY doc_id so the whole parser surface stays
exercised by the fixture corpus (fixture ids are multiples of 7, so
arms use mod 2/3/4/5 — all full-period over multiples of 7):

- ``doc_id % 2``: 1 or 2 columns per page
- ``doc_id % 3``: FlateDecode (!=0) vs uncompressed content streams
- ``doc_id % 4`` (style): 0 = one ``Tm``+``Tj`` per line; 1 = one
  positioned ``TJ`` array per line with -278/1000 em inter-word
  kerning (word detection via the TJ gap heuristic); 2 = one
  ``Tm``+``Tj`` PER WORD at fixed 40 pt slots (word joining via line
  clustering); 3 = ``Tm``+``TD`` once per column then ``'``
  (next-line-show) — exercises leading/T* state
- ``doc_id % 5 == 0``: strings written as hex ``<...>`` instead of
  literals; ``% 5 == 2``: page content split across an ARRAY of two
  streams; ``% 4 == 2``: stream /Length stored as an INDIRECT object
- ``doc_id % 11`` (r8 encoding arms — the real-crawl surface):
  0 = content streams ASCIIHexDecode-filtered; 1/2 = LZWDecode
  (spec LZW: MSB-first 9-12 bit codes, EarlyChange); 3/4 = font with
  an /Encoding /Differences array — string bytes are written SHIFTED
  by +1 and the Differences glyph names (AGL: /space /zero../nine,
  letters as themselves) map them back; 5 = 1-byte /ToUnicode CMap
  (bytes shifted +3, bfchar + incrementing and array-form bfrange all
  exercised); 6 = 2-byte Identity-H-style CID codes (0x0100 + char)
  with a 2-byte-codespace /ToUnicode CMap, strings forced hex;
  7-10 = plain latin-1.  Truth is unchanged by every arm — the parser
  must invert the encoding exactly.
- ``doc_id % 13 in (1, 5, 9)``: PDF-1.5 layout — every non-stream
  object packed into one /Type /ObjStm container, cross-reference
  written as a /Type /XRef STREAM (W [1 4 2]; no classic trailer),
  half of those PNG-Up-predicted (/DecodeParms /Predictor 12)
- ``doc_id % 9 == 4``: page content wrapped in a ``q dx dy cm ... Q``
  group with every Tm pre-shifted — only a Tm x CTM-composing parser
  recovers the layout
- ``doc_id % 17 in (3, 10, 14)``: /Rotate 90/270/180 on the ROOT
  /Pages node (inheritance exercised) with coordinates pre-rotated —
  only display-orientation clustering recovers reading order (style 3
  exempt: ' cannot advance along a rotated line direction)
- 3+ pages: pages grouped under nested intermediate /Pages nodes

Geometry: US-Letter, columns at x = 36 / 306 (gutter 110 pt >
``COLUMN_GAP_PT``), leading 14 pt, per-word slots 40 pt (< gutter, so
1-D gap clustering separates columns but not words).
"""

from __future__ import annotations

import zlib

X0 = 36.0
COL_PITCH = 270.0
Y0 = 720.0
LEAD = 14.0
WORD_SLOT = 40.0
TJ_SPACE = -278


def pdf_layout_params(doc_id: int) -> dict:
    enc_arm = doc_id % 11
    return {
        "cols": 1 + doc_id % 2,
        "wpl": 3 + doc_id % 3,
        "lines_per_col": 4 + doc_id % 5,
        "font_size": 9 + doc_id % 4,
        "flate": doc_id % 3 != 0,
        "style": doc_id % 4,
        # cmap2 strings are 2-byte CID codes — always written hex (the
        # real-world convention for CID show strings)
        "hex_strings": doc_id % 5 == 0 or enc_arm == 6,
        "split_content": doc_id % 5 == 2,
        "indirect_length": doc_id % 4 == 2,
        # r8 encoding arms (doc_id % 11; full-period over the mod-7
        # fixture ids since gcd(7, 11) = 1)
        "stream_filter": {0: "ahx", 1: "lzw", 2: "lzw"}.get(enc_arm),
        "font_enc": {3: "diff", 4: "diff", 5: "cmap1",
                     6: "cmap2"}.get(enc_arm),
        # r8 PDF-1.5 arm (doc_id % 13, coprime to 7 and to the others):
        # object-stream packing + cross-reference stream, half of them
        # PNG-Predictor-12 filtered
        "pdf15": doc_id % 13 in (1, 5, 9),
        "xref_predictor": doc_id % 5 < 2,  # only read under pdf15
        # r8 CTM arm (doc_id % 9, coprime to 7): page content wrapped
        # in `q <dx> <dy> cm ... Q` with every Tm written PRE-shifted —
        # a parser ignoring the CTM scrambles columns/lines
        "ctm_shift": ((15.0 + doc_id % 7, -2.0 * (doc_id % 5))
                      if doc_id % 9 == 4 else None),
        # r8 /Rotate arm (doc_id % 17, coprime to 7): the page is
        # marked rotated (attribute INHERITED from the /Pages root)
        # and every coordinate written pre-rotated — only a parser
        # that clusters in display orientation recovers reading order.
        # Style 3 (leading-based ' advance) is exempt: T*/' move only
        # along text-space -leading and cannot express the rotated
        # line direction with translation-only matrices.
        "rotate": ({3: 90, 10: 270, 14: 180}.get(doc_id % 17, 0)
                   if doc_id % 4 != 3 else 0),
    }


# reverse glyph-name table (mirror of the parser's AGL subset — the
# Differences arm's lockstep surface; chars outside it fall back to
# /uniXXXX names, which the parser also resolves)
_GLYPH_NAMES = {
    " ": "space", "!": "exclam", '"': "quotedbl", "#": "numbersign",
    "$": "dollar", "%": "percent", "&": "ampersand", "'": "quotesingle",
    "(": "parenleft", ")": "parenright", "*": "asterisk", "+": "plus",
    ",": "comma", "-": "hyphen", ".": "period", "/": "slash",
    "0": "zero", "1": "one", "2": "two", "3": "three", "4": "four",
    "5": "five", "6": "six", "7": "seven", "8": "eight", "9": "nine",
    ":": "colon", ";": "semicolon", "<": "less", "=": "equal",
    ">": "greater", "?": "question", "@": "at", "[": "bracketleft",
    "\\": "backslash", "]": "bracketright", "^": "asciicircum",
    "_": "underscore", "`": "grave", "{": "braceleft", "|": "bar",
    "}": "braceright", "~": "asciitilde",
}
for _c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _GLYPH_NAMES[_c] = _c
del _c


def _glyph_name(ch: str) -> str:
    return _GLYPH_NAMES.get(ch, f"uni{ord(ch):04X}")


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode-compatible encoder (ISO 32000-1 §7.4.4): MSB-first
    variable-width codes, 256 = clear, 257 = EOD, code width grows one
    entry early (``early_change=1``), table reset before 12-bit
    overflow.  Exact inverse of ``pdf_text.lzw_decode``."""
    CLEAR, EOD = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # decoder widens after ITS table reaches (1<<width)-early_change
        # entries; its table trails ours by exactly one insertion
        if next_code + early_change - 1 >= (1 << width):
            if width < 12:
                width += 1
            else:  # table full: reset (decoder handles CLEAR anywhere)
                emit(CLEAR)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        w = bytes([b])
    if w:
        emit(table[w])
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
    emit(EOD)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def ascii_hex_encode(data: bytes) -> bytes:
    hex_str = data.hex()
    lines = [hex_str[i:i + 64] for i in range(0, len(hex_str), 64)]
    return ("\n".join(lines) + ">").encode("ascii")


def _shift_text(s: str, delta: int) -> str:
    return "".join(chr(ord(c) + delta) for c in s)


def _cid2_text(s: str) -> str:
    """2-byte Identity-H-style codes: 0x0100 + char, written as the
    high/low byte pair (latin-1-encodable)."""
    return "".join("\x01" + c for c in s)


def _encode_stream(raw: bytes, p: dict) -> tuple[bytes, str]:
    """(encoded bytes, '/Filter ...' dict fragment) for one content
    stream under the doc's filter arm."""
    sf = p["stream_filter"]
    if sf == "ahx":
        return ascii_hex_encode(raw), " /Filter /ASCIIHexDecode"
    if sf == "lzw":
        return lzw_encode(raw), " /Filter /LZWDecode"
    if p["flate"]:
        return zlib.compress(raw, 6), " /Filter /FlateDecode"
    return raw, ""


def _cmap_stream(chars: list[str], p: dict) -> bytes:
    """A ToUnicode CMap over the doc's used characters.  Contiguous
    code runs of length >= 3 become incrementing ``bfrange`` entries,
    runs of exactly 2 become ARRAY-form bfranges, singletons become
    ``bfchar`` pairs — all three spec forms stay exercised."""
    two_byte = p["font_enc"] == "cmap2"
    shift = 0x0100 if two_byte else 3
    width = 2 if two_byte else 1

    def hx(code: int) -> str:
        return f"<{code:0{width * 2}x}>"

    def uhex(ch: str) -> str:
        return f"<{ord(ch):04x}>"

    codes = sorted((ord(c) + shift, c) for c in set(chars))
    runs: list[list[tuple[int, str]]] = []
    for code, ch in codes:
        if runs and code == runs[-1][-1][0] + 1:
            runs[-1].append((code, ch))
        else:
            runs.append([(code, ch)])
    bfchars: list[str] = []
    bfranges: list[str] = []
    for run in runs:
        if len(run) == 1:
            bfchars.append(f"{hx(run[0][0])} {uhex(run[0][1])}")
        elif len(run) == 2:
            bfranges.append(
                f"{hx(run[0][0])} {hx(run[-1][0])} "
                f"[{uhex(run[0][1])} {uhex(run[1][1])}]")
        else:
            bfranges.append(
                f"{hx(run[0][0])} {hx(run[-1][0])} {uhex(run[0][1])}")
    lo, hi = ("<0000>", "<ffff>") if two_byte else ("<00>", "<ff>")
    parts = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "1 begincodespacerange",
        f"{lo} {hi}",
        "endcodespacerange",
    ]
    if bfranges:
        parts += [f"{len(bfranges)} beginbfrange", *bfranges, "endbfrange"]
    if bfchars:
        parts += [f"{len(bfchars)} beginbfchar", *bfchars, "endbfchar"]
    parts += ["endcmap", "end", "end"]
    return "\n".join(parts).encode("latin-1")


def _esc_literal(s: str) -> str:
    return "(" + s.replace("\\", r"\\").replace("(", r"\(") \
                  .replace(")", r"\)") + ")"


def _hex_str(s: str) -> str:
    return "<" + s.encode("latin-1").hex() + ">"


def _fmt(x: float) -> str:
    return f"{x:.4g}"


def _text_transform(p: dict):
    """How the doc's font arm rewrites characters into show-string
    bytes (the parser's font decoder must invert this exactly)."""
    fe = p["font_enc"]
    if fe == "diff":
        return lambda s: _shift_text(s, 1)
    if fe == "cmap1":
        return lambda s: _shift_text(s, 3)
    if fe == "cmap2":
        return _cid2_text
    return lambda s: s


def _page_ops(page_lines: list[list[list[str]]], p: dict) -> str:
    """Content-stream text for one page.  ``page_lines[col]`` is the
    list of lines (each a word list) of that column."""
    tx = _text_transform(p)
    raw_enc = _hex_str if p["hex_strings"] else _esc_literal

    def enc(s: str) -> str:
        return raw_enc(tx(s))

    # CTM arm: coordinates are written pre-shifted and the whole page
    # is wrapped in a q/cm/Q group translating them back — the final
    # device positions (and thus the truth) are IDENTICAL, but only
    # for a parser that composes Tm x CTM
    dx, dy = p["ctm_shift"] or (0.0, 0.0)
    # /Rotate arm: reading-space coordinates (u, v) written in the
    # rotated page's content space — the inverse of the parser's
    # display-orientation mapping (MediaBox 612 x 792, origin 0)
    rot = p["rotate"]

    def place(u: float, v: float) -> tuple[float, float]:
        if rot == 90:
            xc, yc = 612.0 - v, u
        elif rot == 180:
            xc, yc = 612.0 - u, 792.0 - v
        elif rot == 270:
            xc, yc = v, 792.0 - u
        else:
            xc, yc = u, v
        return xc - dx, yc - dy

    def delta(du: float, dv: float) -> tuple[float, float]:
        if rot == 90:
            return -dv, du
        if rot == 180:
            return -du, -dv
        if rot == 270:
            return dv, -du
        return du, dv

    fs = p["font_size"]
    ops: list[str] = []
    if p["ctm_shift"]:
        ops.append(f"q 1 0 0 1 {_fmt(dx)} {_fmt(dy)} cm")
    ops += ["BT", f"/F1 {_fmt(fs)} Tf"]
    for c, col_lines in enumerate(page_lines):
        if not col_lines:
            continue
        u = X0 + COL_PITCH * c
        if p["style"] == 3:
            sx, sy = place(u, Y0 + LEAD)
            ax, ay = delta(0.0, -LEAD)
            ops.append(f"1 0 0 1 {_fmt(sx)} {_fmt(sy)} Tm")
            ops.append(f"{_fmt(ax)} {_fmt(ay)} TD")
            for i, words in enumerate(col_lines):
                s = enc(" ".join(words))
                ops.append(f"{s} Tj" if i == 0 else f"{s} '")
            continue
        for i, words in enumerate(col_lines):
            v = Y0 - LEAD * i
            if p["style"] == 0:
                x, y = place(u, v)
                ops.append(f"1 0 0 1 {_fmt(x)} {_fmt(y)} Tm")
                ops.append(f"{enc(' '.join(words))} Tj")
            elif p["style"] == 1:
                x, y = place(u, v)
                ops.append(f"1 0 0 1 {_fmt(x)} {_fmt(y)} Tm")
                arr = f" {TJ_SPACE} ".join(enc(w) for w in words)
                ops.append(f"[{arr}] TJ")
            else:  # style 2: one run per word at fixed slots
                for j, w in enumerate(words):
                    x, y = place(u + WORD_SLOT * j, v)
                    ops.append(f"1 0 0 1 {_fmt(x)} {_fmt(y)} Tm")
                    ops.append(f"{enc(w)} Tj")
    ops.append("ET")
    if p["ctm_shift"]:
        ops.append("Q")
    return "\n".join(ops)


def encode_pdf(doc_id: int, text: str, encrypted: bool = False) -> bytes:
    """Render ``text`` as a complete PDF file; see module docstring for
    the arm map.  Ground truth: ``' '.join(text.split())``.
    ``encrypted=True`` adds a trailer ``/Encrypt`` dict (no actual
    encryption — the parser must DETECT and refuse, typed error)."""
    p = pdf_layout_params(doc_id)
    words = text.split()
    lines = [words[i:i + p["wpl"]] for i in range(0, len(words), p["wpl"])]
    per_page = p["cols"] * p["lines_per_col"]
    pages_lines: list[list[list[list[str]]]] = []
    for start in range(0, len(lines), per_page):
        chunk = lines[start:start + per_page]
        cols = [chunk[c * p["lines_per_col"]:(c + 1) * p["lines_per_col"]]
                for c in range(p["cols"])]
        pages_lines.append(cols)
    if not pages_lines:
        pages_lines = [[[] for _ in range(p["cols"])]]

    # --- object assembly ---------------------------------------------------
    objects: dict[int, bytes] = {}
    stream_nums: set[int] = set()  # objects that carry stream data
    next_num = 4  # 1=Catalog 2=Pages-root 3=Font
    page_nums: list[int] = []
    for page_cols in pages_lines:
        ops = _page_ops(page_cols, p).encode("latin-1")
        streams = [ops]
        if p["split_content"]:
            split_lines = ops.split(b"\n")
            half = max(1, len(split_lines) // 2)
            streams = [b"\n".join(split_lines[:half]),
                       b"\n".join(split_lines[half:])]
        content_nums: list[int] = []
        for raw in streams:
            data, filt = _encode_stream(raw, p)
            num = next_num
            next_num += 1
            if p["indirect_length"]:
                len_num = next_num
                next_num += 1
                length = f"{len_num} 0 R"
                objects[len_num] = str(len(data)).encode()
            else:
                length = str(len(data))
            objects[num] = (
                f"<< /Length {length}{filt} >>\nstream\n".encode()
                + data + b"\nendstream"
            )
            stream_nums.add(num)
            content_nums.append(num)
        page_num = next_num
        next_num += 1
        contents = (f"{content_nums[0]} 0 R" if len(content_nums) == 1
                    else "[" + " ".join(f"{n} 0 R" for n in content_nums)
                    + "]")
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {contents} >>".encode()
        )
        page_nums.append(page_num)

    # pages tree: nest under intermediate nodes when 3+ pages
    if len(page_nums) >= 3:
        kid_nodes: list[int] = []
        for i in range(0, len(page_nums), 2):
            group = page_nums[i:i + 2]
            num = next_num
            next_num += 1
            kids = " ".join(f"{g} 0 R" for g in group)
            objects[num] = (
                f"<< /Type /Pages /Parent 2 0 R /Kids [{kids}] "
                f"/Count {len(group)} >>".encode()
            )
            # children must point at their actual parent
            for g in group:
                objects[g] = objects[g].replace(
                    b"/Parent 2 0 R", f"/Parent {num} 0 R".encode(), 1
                )
            kid_nodes.append(num)
        kids_refs = " ".join(f"{n} 0 R" for n in kid_nodes)
    else:
        kids_refs = " ".join(f"{n} 0 R" for n in page_nums)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    # /Rotate lives on the ROOT /Pages node (not the pages): the
    # parser must inherit it down the tree, like /Resources
    rot_entry = f" /Rotate {p['rotate']}" if p["rotate"] else ""
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids_refs}] "
        f"/Count {len(page_nums)}{rot_entry} >>".encode()
    )
    fe = p["font_enc"]
    if fe == "diff":
        used = sorted(set(text) | {" "})
        diffs = " ".join(f"{ord(c) + 1} /{_glyph_name(c)}" for c in used)
        objects[3] = (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            f"/Encoding << /Type /Encoding /Differences [ {diffs} ] >> "
            f">>".encode()
        )
    elif fe in ("cmap1", "cmap2"):
        used = sorted(set(text) | {" "})
        cmap = _cmap_stream(used, p)
        tu_num = next_num
        next_num += 1
        objects[tu_num] = (
            f"<< /Length {len(cmap)} >>\nstream\n".encode()
            + cmap + b"\nendstream"
        )
        stream_nums.add(tu_num)
        subtype = ("/Type0 /Encoding /Identity-H" if fe == "cmap2"
                   else "/TrueType")
        objects[3] = (
            f"<< /Type /Font /Subtype {subtype} /BaseFont /Helvetica "
            f"/ToUnicode {tu_num} 0 R >>".encode()
        )
    else:
        objects[3] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica >>")

    enc_entry = (" /Encrypt << /Filter /Standard /V 1 /R 2 >>"
                 if encrypted else "")

    if p["pdf15"]:
        return _serialize_pdf15(objects, stream_nums, p, enc_entry)

    # --- serialization with a correct classic xref table -------------------
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_pos = len(out)
    size = max(objects) + 1
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R{enc_entry} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return bytes(out)


def png_up_encode(rows: list[bytes]) -> bytes:
    """PNG Up-filter (type 2) encoder over fixed-width rows — the
    /Predictor 12 every real PDF writer applies to xref streams."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)
        out += bytes((b - a) & 0xFF for b, a in zip(row, prev))
        prev = row
    return bytes(out)


def _serialize_pdf15(objects: dict[int, bytes], stream_nums: set[int],
                     p: dict, enc_entry: str) -> bytes:
    """PDF-1.5 serialization: every non-stream object packed into ONE
    /Type /ObjStm container, cross-reference written as a /Type /XRef
    STREAM (W [1 4 2]; type-2 entries for packed members), trailer keys
    living in the xref stream dict — the modern-writer layout.  Half
    the arm (`xref_predictor`) runs the xref rows through the PNG Up
    predictor (/DecodeParms /Predictor 12), the other half plain
    flate."""
    packed = sorted(n for n in objects if n not in stream_nums)
    top = sorted(n for n in objects if n in stream_nums)
    objstm_num = max(objects) + 1
    xref_num = objstm_num + 1

    body = bytearray()
    pair_offs: list[tuple[int, int]] = []
    for n in packed:
        pair_offs.append((n, len(body)))
        body += objects[n] + b"\n"
    header = " ".join(f"{n} {o}" for n, o in pair_offs).encode() + b"\n"
    objstm_data = zlib.compress(header + bytes(body), 6)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for n in top:
        offsets[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objects[n] + b"\nendobj\n"
    offsets[objstm_num] = len(out)
    out += (
        f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(packed)} "
        f"/First {len(header)} /Length {len(objstm_data)} "
        f"/Filter /FlateDecode >>\nstream\n".encode()
        + objstm_data + b"\nendstream\nendobj\n"
    )
    xref_pos = len(out)

    size = xref_num + 1
    rows: list[bytes] = []
    pos_of_packed = {n: i for i, (n, _) in enumerate(pair_offs)}
    for num in range(size):
        if num == 0:
            rows.append(b"\x00" + (0).to_bytes(4, "big")
                        + (0xFFFF).to_bytes(2, "big"))
        elif num in pos_of_packed:
            rows.append(b"\x02" + objstm_num.to_bytes(4, "big")
                        + pos_of_packed[num].to_bytes(2, "big"))
        else:
            off = xref_pos if num == xref_num else offsets[num]
            rows.append(b"\x01" + off.to_bytes(4, "big")
                        + (0).to_bytes(2, "big"))
    if p["xref_predictor"]:
        xdata = zlib.compress(png_up_encode(rows), 6)
        parms = " /DecodeParms << /Predictor 12 /Columns 7 >>"
    else:
        xdata = zlib.compress(b"".join(rows), 6)
        parms = ""
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root 1 0 R{enc_entry} /Length {len(xdata)} "
        f"/Filter /FlateDecode{parms} >>\nstream\n".encode()
        + xdata + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def expected_pdf_stats(doc_id: int, text: str) -> dict:
    """Closed-form layout stats for pytest assertions (shares
    `pdf_layout_params` with the writer, NOT with the parser)."""
    p = pdf_layout_params(doc_id)
    n_words = len(text.split())
    n_lines = -(-n_words // p["wpl"]) if n_words else 0
    per_page = p["cols"] * p["lines_per_col"]
    n_pages = -(-n_lines // per_page) if n_lines else 1
    full, rem = divmod(n_lines, per_page)
    n_blocks = full * p["cols"]
    if rem:
        n_blocks += min(p["cols"], -(-rem // p["lines_per_col"]))
    first_page_lines = min(n_lines, per_page)
    return {
        "n_pages": n_pages,
        "n_lines": n_lines,
        "n_blocks": max(n_blocks, 0),
        # columns actually USED (a short doc never opens column 2)
        "n_columns": min(p["cols"],
                         -(-first_page_lines // p["lines_per_col"]))
        if n_lines else 0,
    }
