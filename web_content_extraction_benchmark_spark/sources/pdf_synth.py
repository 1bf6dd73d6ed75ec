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
    return {
        "cols": 1 + doc_id % 2,
        "wpl": 3 + doc_id % 3,
        "lines_per_col": 4 + doc_id % 5,
        "font_size": 9 + doc_id % 4,
        "flate": doc_id % 3 != 0,
        "style": doc_id % 4,
        "hex_strings": doc_id % 5 == 0,
        "split_content": doc_id % 5 == 2,
        "indirect_length": doc_id % 4 == 2,
    }


def _esc_literal(s: str) -> str:
    return "(" + s.replace("\\", r"\\").replace("(", r"\(") \
                  .replace(")", r"\)") + ")"


def _hex_str(s: str) -> str:
    return "<" + s.encode("latin-1").hex() + ">"


def _fmt(x: float) -> str:
    return f"{x:.4g}"


def _page_ops(page_lines: list[list[list[str]]], p: dict) -> str:
    """Content-stream text for one page.  ``page_lines[col]`` is the
    list of lines (each a word list) of that column."""
    enc = _hex_str if p["hex_strings"] else _esc_literal
    fs = p["font_size"]
    ops: list[str] = ["BT", f"/F1 {_fmt(fs)} Tf"]
    for c, col_lines in enumerate(page_lines):
        if not col_lines:
            continue
        x = X0 + COL_PITCH * c
        if p["style"] == 3:
            ops.append(f"1 0 0 1 {_fmt(x)} {_fmt(Y0 + LEAD)} Tm")
            ops.append(f"0 {_fmt(-LEAD)} TD")
            for i, words in enumerate(col_lines):
                s = enc(" ".join(words))
                ops.append(f"{s} Tj" if i == 0 else f"{s} '")
            continue
        for i, words in enumerate(col_lines):
            y = Y0 - LEAD * i
            if p["style"] == 0:
                ops.append(f"1 0 0 1 {_fmt(x)} {_fmt(y)} Tm")
                ops.append(f"{enc(' '.join(words))} Tj")
            elif p["style"] == 1:
                ops.append(f"1 0 0 1 {_fmt(x)} {_fmt(y)} Tm")
                arr = f" {TJ_SPACE} ".join(enc(w) for w in words)
                ops.append(f"[{arr}] TJ")
            else:  # style 2: one run per word at fixed slots
                for j, w in enumerate(words):
                    wx = x + WORD_SLOT * j
                    ops.append(f"1 0 0 1 {_fmt(wx)} {_fmt(y)} Tm")
                    ops.append(f"{enc(w)} Tj")
    ops.append("ET")
    return "\n".join(ops)


def encode_pdf(doc_id: int, text: str) -> bytes:
    """Render ``text`` as a complete PDF file; see module docstring for
    the arm map.  Ground truth: ``' '.join(text.split())``."""
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
            data = zlib.compress(raw, 6) if p["flate"] else raw
            num = next_num
            next_num += 1
            if p["indirect_length"]:
                len_num = next_num
                next_num += 1
                length = f"{len_num} 0 R"
                objects[len_num] = str(len(data)).encode()
            else:
                length = str(len(data))
            filt = " /Filter /FlateDecode" if p["flate"] else ""
            objects[num] = (
                f"<< /Length {length}{filt} >>\nstream\n".encode()
                + data + b"\nendstream"
            )
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
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids_refs}] "
        f"/Count {len(page_nums)} >>".encode()
    )
    objects[3] = (b"<< /Type /Font /Subtype /Type1 "
                  b"/BaseFont /Helvetica >>")

    # --- serialization with a correct xref ---------------------------------
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
        f"trailer\n<< /Size {size} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
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
