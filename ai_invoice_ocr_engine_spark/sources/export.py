"""Result sinks — distributed analogs of the reference export formats
(SURVEY.md §2.1 S4-S8; /root/reference/utils/export.py).

The reference flattens per-document results to (file, index, text, score)
rows for xlsx/csv (utils/export.py:16-25,43-50) and wraps JSON in a
versioned envelope (utils/export.py:4-15). Here the flattening is a
`posexplode` projection and the sinks are distributed writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ENGINE_VERSION = "0.1.0"


def flat_spans(result: DataFrame) -> DataFrame:
    """result(doc_id, spans_out, …) → one row per span:
    (doc_id, idx, kind, text, media_ref) — the F7 projection."""
    return result.select(
        "doc_id", F.posexplode("spans_out").alias("idx", "s")
    ).select(
        "doc_id",
        "idx",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def write_csv(result: DataFrame, path: str) -> None:
    """S7 analog: flat rows, header, delimiter-escaped by the csv writer."""
    flat_spans(result).write.mode("overwrite").option("header", True).csv(path)


def write_json(result: DataFrame, path: str, run_id: str = "") -> None:
    """S4 analog: one JSON object per document with an embedded version tag
    (the envelope of utils/export.py:10 carried per-row so the sink stays
    distributed — a driver-side global envelope would not scale)."""
    (
        result.select(
            F.lit(ENGINE_VERSION).alias("version"),
            F.lit(run_id).alias("run_id"),
            "doc_id",
            "spans_out",
            "invoice_fields",
        )
        .write.mode("overwrite")
        .json(path)
    )


def write_text(result: DataFrame, path: str) -> None:
    """S8 analog: newline-joined span texts per document."""
    (
        result.select(
            F.concat_ws(
                "\n", F.transform("spans_out", lambda s: s["text"])
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


# Excel's hard worksheet limit — also the honest scale bound for a
# single-file sink: xlsx export is a driver-side materialization by nature
# (the reference's to_excel, utils/export.py:16-25, is too).
XLSX_MAX_ROWS = 1_048_576


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


def _row_xml(r_idx: int, values) -> str:
    cells = []
    for c_idx, v in enumerate(values):
        ref = f"{_col_letter(c_idx)}{r_idx}"
        if isinstance(v, bool):
            cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
        elif isinstance(v, (int, float)) and v == v and v not in (
            float("inf"), float("-inf")
        ):  # finite number (inf/NaN are not valid OOXML numerics)
            cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        elif v is None:
            cells.append(f'<c r="{ref}"/>')
        else:
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{_xml_escape(str(v))}</t></is></c>"
            )
    return f'<row r="{r_idx}">{"".join(cells)}</row>'


def write_xlsx(result: DataFrame, path: str, max_rows: int = XLSX_MAX_ROWS) -> str:
    """S5 analog of the reference's ``to_excel`` (utils/export.py:16-25,
    CLI ``-f xlsx`` cli.py:33-38): the flat_spans projection serialized as
    a minimal OOXML workbook — a zip of five XML parts with inline strings,
    no third-party dependency.

    A worksheet is a single driver-side file capped at Excel's own
    1,048,576-row limit, so the flat rows stream through toLocalIterator
    AND into the zip entry itself (zipfile's streaming writer — O(1)
    driver memory, never one giant XML string; review finding r3); the
    cap fails loudly; bulk exports belong in the distributed csv/json
    sinks.
    """
    import os
    import zipfile

    flat = flat_spans(result)
    header = flat.columns
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="spans" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        _write_xlsx_zip(path, ct, rels, wb, wb_rels, header, flat, max_rows)
    except BaseException:
        if os.path.exists(path):  # never leave a truncated workbook behind
            os.remove(path)
        raise
    return path


def _write_xlsx_zip(path, ct, rels, wb, wb_rels, header, flat, max_rows):
    import zipfile

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        with z.open("xl/worksheets/sheet1.xml", "w") as f:
            f.write(
                b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                b'<worksheet xmlns="http://schemas.openxmlformats.org/'
                b'spreadsheetml/2006/main"><sheetData>'
            )
            f.write(_row_xml(1, header).encode())
            n = 0
            for r in flat.toLocalIterator():
                n += 1
                if n + 1 > max_rows:  # +1: header occupies row 1
                    raise ValueError(
                        f"xlsx sink exceeds {max_rows} rows (Excel's "
                        "worksheet limit); use write_csv/write_json for "
                        "bulk exports"
                    )
                f.write(_row_xml(n + 1, tuple(r)).encode())
            f.write(b"</sheetData></worksheet>")
    return path


#: driver-side report cap — an HTML report is for human eyes, not bulk IO
HTML_MAX_DOCS = 10_000


def write_html(result: DataFrame, path: str, run_id: str = "",
               max_docs: int = HTML_MAX_DOCS) -> str:
    """S6 analog of the reference's ``to_html`` (utils/export.py:26-43):
    one styled table per document with span kind/text rows. A report is a
    single driver-side file for human review, so it streams through
    toLocalIterator with a loud cap (same posture as write_xlsx); bulk
    exports belong in the distributed sinks. No timestamp — output is a
    pure function of the input (the engine's determinism contract), with
    the run_id as provenance instead."""
    import html as _html
    import os

    parts = [
        '<!DOCTYPE html><html><head><meta charset="utf-8">'
        "<title>Extraction Results</title>",
        "<style>body{font-family:Arial;margin:20px}"
        "table{border-collapse:collapse;width:100%}"
        "th,td{border:1px solid #ddd;padding:8px;text-align:left}"
        "th{background:#4CAF50;color:white}"
        "tr:nth-child(even){background:#f2f2f2}"
        ".kind{color:#666;font-size:0.9em}</style></head><body>",
        f"<h1>Extraction Results</h1><p>run_id: {_html.escape(run_id)}</p>",
    ]
    n = 0
    for row in result.select("doc_id", "spans_out").toLocalIterator():
        n += 1
        if n > max_docs:
            raise ValueError(
                f"html report exceeds {max_docs} documents; use "
                "write_json/write_csv for bulk exports"
            )
        parts.append(f"<h2>Document {n}: {_html.escape(row['doc_id'])}</h2>")
        parts.append("<table><tr><th>#</th><th>Kind</th><th>Text</th>"
                     "<th>Media</th></tr>")
        for j, s in enumerate(row["spans_out"] or []):
            parts.append(
                f"<tr><td>{j + 1}</td><td class=\"kind\">{_html.escape(s['kind'])}</td>"
                f"<td>{_html.escape(s['text'] or '')}</td>"
                f"<td>{_html.escape(s['media_ref'] or '')}</td></tr>"
            )
        parts.append("</table>")
    parts.append("</body></html>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return path
