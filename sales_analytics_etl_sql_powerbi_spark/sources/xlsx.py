"""Minimal pure-stdlib xlsx reader (S2 support — no openpyxl needed).

The reference ingests ``.xls/.xlsx`` sheets with
``pd.read_excel(dtype=str)`` (reference etl/order_info_etl.py:178,
sheet config :13). This container has no Excel engine, and an xlsx
file is just a zip of XML parts — so the ingest shim reads the parts
directly with ``zipfile`` + ``xml.etree``: workbook sheet registry,
shared-string table, and the sheet's cell grid, every value surfaced
as a raw string (dtype=str semantics; schema-on-write happens in the
cleaning stack like every other source).

Scope honestly bounded to what the reference's exports contain:
shared/inline/plain strings, numbers, booleans. Style-driven dates
come out as their raw serial-number strings (documented divergence —
pandas would localize them; the reference sheets carry text columns).
Legacy binary ``.xls`` is parsed by the sibling :mod:`.xls` module
(CFB + BIFF8, round 12) under the same (headers, rows) contract.

A matching minimal writer is included for tests and fixtures — it
emits the same part layout (shared strings included) so the reader's
full path is exercisable in-container.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"

__all__ = ["read_xlsx_table", "write_minimal_xlsx"]


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (0-based column from an A1-style ref)."""
    letters = re.match(r"[A-Z]+", cell_ref)
    idx = 0
    for ch in letters.group(0) if letters else "A":
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, member_path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall(f"{_NS_PKG}Relationship")
    }
    sheets_el = wb.find(f"{_NS}sheets")
    if sheets_el is None:
        raise ValueError("workbook.xml has no <sheets> element")
    out = []
    for sheet in sheets_el.findall(f"{_NS}sheet"):
        rid = sheet.get(f"{_NS_REL}id")
        target = target_by_rid.get(rid)
        if target is None:
            raise ValueError(
                f"sheet relationship {rid!r} missing from workbook rels"
            )
        if not target.startswith("/"):
            target = "xl/" + target
        out.append((sheet.get("name"), target.lstrip("/")))
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    strings = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t> — concatenate all t nodes
        strings.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return strings


def _cell_value(c: ET.Element, shared: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        try:
            i = int(v.text)
        except ValueError:
            raise ValueError(
                f"shared-string ref is not an integer: {v.text!r}"
            ) from None
        if not 0 <= i < len(shared):
            raise ValueError(
                f"shared-string index {i} out of range ({len(shared)} strings)"
            )
        return shared[i]
    if t == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    return v.text  # 'n' (number-as-written) / 'str' (formula result)


def read_xlsx_table(
    path: str, sheet: int | str = 0
) -> tuple[list[str], list[list[str | None]]]:
    """(headers, data_rows) of the sheet, every value a raw string.

    ``sheet`` is a 0-based index or a sheet name — the reference's
    ``SHEET_NAME`` config accepts both. Rows are padded/positioned by
    each cell's A1 reference, so sparse rows keep column alignment.

    Reject-don't-misparse (round 14, found by extending the fuzz
    campaign to the readers): corrupt containers used to escape with
    zipfile's exception zoo — ``BadZipFile``, ``EOFError``,
    ``NotImplementedError`` (crafted version/encryption flags),
    ``zlib.error``, XML ``ParseError`` — instead of the documented
    ValueError every other reader raises. All container/XML-level
    failures now normalize to ValueError so a malformed payload fails
    its ROW under one catchable type, the same contract as
    :func:`.xls.read_xls_table` and the multimodal decoders.

    The normalize-except wraps ONLY the zipfile/ElementTree container
    operations (ADVICE r14: it used to wrap the pure-Python grid loop
    too and catch IndexError/KeyError/RuntimeError broadly, so a
    genuine bug in the grid logic would masquerade as 'corrupt xlsx
    container'). Data-level faults inside well-formed XML —
    out-of-range shared-string refs, non-integer refs, missing sheet
    relationships, beyond-XFD column refs — raise their own specific
    ValueError from the helpers instead.
    """
    import zlib

    try:
        with zipfile.ZipFile(path) as zf:
            sheets = _sheet_targets(zf)
            if isinstance(sheet, int):
                if not 0 <= sheet < len(sheets):
                    raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
                target = sheets[sheet][1]
            else:
                by_name = {n: t for n, t in sheets}
                if sheet not in by_name:
                    raise ValueError(f"sheet {sheet!r} not found; have {sorted(by_name)}")
                target = by_name[sheet]
            shared = _shared_strings(zf)
            root = ET.fromstring(zf.read(target))
    except ValueError:
        raise  # already the contract type, with a specific message
    except (
        zipfile.BadZipFile,
        EOFError,
        NotImplementedError,
        zlib.error,
        KeyError,  # zf.read of a missing member
        ET.ParseError,
        RuntimeError,  # zipfile's "encrypted, password required"
    ) as e:
        raise ValueError(f"corrupt xlsx container: {type(e).__name__}: {e}") from e

    # grid building is pure Python over parsed XML — outside the
    # normalize-except, so its only deliberate rejections (ValueError
    # from _cell_value / the XFD cap) propagate and anything else is a
    # real bug that should surface as itself
    grid: list[list[str | None]] = []
    for row in root.iter(f"{_NS}row"):
        cells: list[str | None] = []
        for c in row.findall(f"{_NS}c"):
            ref = c.get("r")
            idx = _col_index(ref) if ref else len(cells)
            if idx >= 16384:  # Excel's XFD column cap; also bounds the
                raise ValueError(  # None-padding loop on crafted refs
                    f"cell ref {ref!r} beyond Excel's 16384-column limit"
                )
            while len(cells) < idx:
                cells.append(None)
            cells.append(_cell_value(c, shared))
        grid.append(cells)
    if not grid:
        return [], []
    width = max(len(r) for r in grid)
    grid = [r + [None] * (width - len(r)) for r in grid]
    headers = [h if h is not None else f"col_{i}" for i, h in enumerate(grid[0])]
    return headers, grid[1:]


# ---------------------------------------------------------------------------
# minimal writer (tests/fixtures only — emits sharedStrings so the
# reader's full path runs in-container)
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(65 + rem) + s
    return s


def write_minimal_xlsx(
    path: str,
    headers: list[str],
    rows: list[list],
    sheet_name: str = "Sheet1",
) -> str:
    """Write a one-sheet xlsx: strings via sharedStrings, numbers plain."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        s = str(v)
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return f'<c r="{ref}" t="s"><v>{shared_idx[s]}</v></c>'

    body = []
    for rno, row in enumerate([headers] + rows, start=1):
        cells = "".join(
            cell_xml(f"{_col_letter(i)}{rno}", v) for i, v in enumerate(row)
        )
        body.append(f'<row r="{rno}">{cells}</row>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>{"".join(body)}</sheetData></worksheet>'
    )

    def esc(s: str) -> str:
        # XML 1.0 cannot represent C0 controls (other than \t\n\r) or
        # lone surrogates AT ALL — not even as entities. Round 14
        # (reader fuzz): the writer used to embed them raw, producing
        # a file its own reader rejects as not-well-formed; fail the
        # WRITE loudly instead. (The BIFF8 .xls writer has no such
        # limit — binary format — which is itself a fidelity
        # difference worth knowing when choosing a fixture container.)
        for ch in s:
            o = ord(ch)
            if (o < 0x20 and ch not in "\t\n\r") or 0xD800 <= o <= 0xDFFF:
                raise ValueError(
                    f"string contains XML-unrepresentable char U+{o:04X}"
                )
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS[1:-1]}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t xml:space=\"preserve\">{esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS[1:-1]}" '
        f'xmlns:r="{_NS_REL[1:-1]}">'
        f'<sheets><sheet name="{esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return path
