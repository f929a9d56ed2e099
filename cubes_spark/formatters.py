"""Result formatters: CSV, JSON-lines, XLSX and cross-table.

Parity: /root/reference/cubes/formatters.py:58-440 (CSVGenerator,
JSONLinesGenerator, SlicerJSONEncoder, make_cross_table,
CrossTableFormatter, CSVFormatter, XLSXFormatter).  These are
driver-side presentation layers over collected result rows — small by
construction (paginated/aggregated results), so plain Python is the
right tool; bulk data exports go through ``df.write.csv/parquet``
instead (see operators/olap.py materialization sinks).
"""

from __future__ import annotations

import csv
import datetime
import io
import json
from collections import namedtuple
from decimal import Decimal
from typing import Any, Iterable, List, Optional, Sequence

from cubes_spark.errors import ArgumentError

__all__ = [
    "CrossTable",
    "SlicerJSONEncoder",
    "csv_generator",
    "make_cross_table",
    "CrossTableFormatter",
    "CSVFormatter",
    "HTMLCrossTableFormatter",
    "JSONLinesFormatter",
    "XLSXFormatter",
]


class SlicerJSONEncoder(json.JSONEncoder):
    """JSON encoder handling result value types (parity:
    formatters.py:151-170): decimals as floats, dates in ISO form,
    objects exposing ``to_dict``."""

    def default(self, o: Any) -> Any:
        if isinstance(o, Decimal):
            return float(o)
        if isinstance(o, (datetime.date, datetime.datetime)):
            return o.isoformat()
        if hasattr(o, "to_dict") and callable(o.to_dict):
            return o.to_dict()
        try:
            return json.JSONEncoder.default(self, o)
        except TypeError:
            return str(o)


def csv_generator(records: Iterable[dict], fields: Sequence[str],
                  include_header: bool = True,
                  header: Optional[Sequence[str]] = None) -> Iterable[str]:
    """Stream CSV lines from record dicts (parity: formatters.py:58-111).

    A generator, not a materialized string — results stream row by row
    regardless of size.
    """
    buffer = io.StringIO()
    writer = csv.writer(buffer)
    if include_header:
        writer.writerow(header or fields)
        yield _drain(buffer)
    for record in records:
        writer.writerow([record.get(f) for f in fields])
        yield _drain(buffer)


def _drain(buffer: io.StringIO) -> str:
    value = buffer.getvalue()
    buffer.seek(0)
    buffer.truncate()
    return value


CrossTable = namedtuple("CrossTable", ["columns", "rows", "data"])


def make_cross_table(result: Any, onrows: Optional[Sequence[str]] = None,
                     oncolumns: Optional[Sequence[str]] = None,
                     aggregates_on: Optional[str] = None) -> CrossTable:
    """Pivot a drilldown result into (columns, rows, data)
    (parity: formatters.py:208-291; same matrix semantics).

    ``aggregates_on``: ``"cells"`` (tuples in the matrix), ``"rows"``
    or ``"columns"`` (one header per aggregate).
    """
    if not result.drilldown:
        raise ArgumentError("Can't create cross-table without drilldown.")

    aggregates = result.aggregates
    agg_refs = [str(a) for a in aggregates]
    onrows = list(onrows or [])
    oncolumns = list(oncolumns or [])

    matrix: dict = {}
    row_hdrs: List[tuple] = []
    column_hdrs: List[tuple] = []

    if aggregates_on is None or aggregates_on == "cells":
        for record in result.cells:
            hrow = tuple(record[f] for f in onrows)
            hcol = tuple(record[f] for f in oncolumns)
            if hrow not in row_hdrs:
                row_hdrs.append(hrow)
            if hcol not in column_hdrs:
                column_hdrs.append(hcol)
            matrix[(hrow, hcol)] = tuple(record[a] for a in agg_refs)
    else:
        for record in result.cells:
            base_hrow = [record[f] for f in onrows]
            base_hcol = [record[f] for f in oncolumns]
            for agg in aggregates:
                label = getattr(agg, "label", None) or str(agg)
                if aggregates_on == "rows":
                    hrow = tuple(base_hrow + [label])
                    hcol = tuple(base_hcol)
                elif aggregates_on == "columns":
                    hrow = tuple(base_hrow)
                    hcol = tuple(base_hcol + [label])
                else:
                    raise ArgumentError(
                        f"Unknown aggregates_on: {aggregates_on}"
                    )
                if hrow not in row_hdrs:
                    row_hdrs.append(hrow)
                if hcol not in column_hdrs:
                    column_hdrs.append(hcol)
                matrix[(hrow, hcol)] = record[str(agg)]

    data = [
        [matrix.get((hrow, hcol)) for hcol in column_hdrs]
        for hrow in row_hdrs
    ]
    return CrossTable(column_hdrs, row_hdrs, data)


def coalesce_table_labels(attributes: Sequence[str],
                          onrows: Optional[Sequence[str]],
                          oncolumns: Optional[Sequence[str]]):
    """Distribute attributes between rows/columns when one side is
    unspecified (parity: formatters.py:294-308)."""
    if not onrows or not oncolumns:
        onrows = list(onrows or [])
        oncolumns = list(oncolumns or [])
        if not onrows:
            onrows = [a for a in attributes if a not in oncolumns]
        if not oncolumns:
            oncolumns = [a for a in attributes if a not in onrows]
    return list(onrows), list(oncolumns)


class Formatter:
    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        return self.format(*args, **kwargs)

    def format(self, *args: Any, **kwargs: Any) -> Any:
        raise NotImplementedError


class CrossTableFormatter(Formatter):
    """JSON-shaped cross table (parity: formatters.py:311-375)."""

    mime_type = "application/json"

    def __init__(self, indent: Optional[int] = None) -> None:
        self.indent = indent
        self.encoder = SlicerJSONEncoder(indent=indent)

    def format(self, cube: Any, result: Any,
               onrows: Optional[Sequence[str]] = None,
               oncolumns: Optional[Sequence[str]] = None,
               aggregates_on: Optional[str] = None) -> str:
        attrs = _drilldown_attribute_refs(result)
        onrows, oncolumns = coalesce_table_labels(attrs, onrows, oncolumns)
        table = make_cross_table(result, onrows, oncolumns, aggregates_on)
        return self.encoder.encode({
            "columns": table.columns,
            "rows": table.rows,
            "data": table.data,
        })


class HTMLCrossTableFormatter(CrossTableFormatter):
    """HTML table of the pivoted cross-table (parity:
    formatters.py:361-391 + templates/cross_table.html — same table
    shape, rendered directly without a template engine: one <th>
    header row per column-path level, row-path headers as <th> cells,
    aggregates in <td> cells, everything HTML-escaped)."""

    mime_type = "text/html"

    def __init__(self, table_style: Optional[str] = None) -> None:
        super().__init__()
        self.table_style = table_style

    def format(self, cube: Any, result: Any,
               onrows: Optional[Sequence[str]] = None,
               oncolumns: Optional[Sequence[str]] = None,
               aggregates_on: Optional[str] = None) -> str:
        import html as _html

        def esc(value: Any) -> str:
            return _html.escape("" if value is None else str(value))

        attrs = _drilldown_attribute_refs(result)
        onrows, oncolumns = coalesce_table_labels(attrs, onrows, oncolumns)
        table = make_cross_table(result, onrows, oncolumns, aggregates_on)

        style = f' class="{esc(self.table_style)}"' \
            if self.table_style else ""
        out = [f"<table{style}>", "<thead>"]
        levels = len(table.columns[0]) if table.columns else 0
        row_width = len(table.rows[0]) if table.rows else 0
        for level in range(levels):
            cells = ["<th></th>"] * row_width
            cells += [f"<th>{esc(col[level])}</th>"
                      for col in table.columns]
            out.append("<tr>" + "".join(cells) + "</tr>")
        out.append("</thead>")
        out.append("<tbody>")
        for i, row in enumerate(table.rows):
            cells = [f"<th>{esc(h)}</th>" for h in row]
            cells += [f"<td>{esc(v)}</td>" for v in table.data[i]]
            out.append("<tr>" + "".join(cells) + "</tr>")
        out.append("</tbody>")
        out.append("</table>")
        return "\n".join(out)


class CSVFormatter(Formatter):
    """CSV of drilldown cells: drilldown attributes + aggregates
    (parity: formatters.py:393-419).  Labels in the header, refs in the
    rows."""

    mime_type = "text/csv"

    def format(self, cube: Any, result: Any,
               fields: Optional[Sequence[str]] = None) -> str:
        fields = list(fields or result.labels)
        return "".join(csv_generator(result.cells, fields))


class JSONLinesFormatter(Formatter):
    """One JSON document per drilldown cell
    (parity: JSONLinesGenerator, formatters.py:136-148)."""

    mime_type = "application/x-json-lines"

    def format(self, cube: Any, result: Any) -> str:
        encoder = SlicerJSONEncoder()
        return "\n".join(encoder.encode(cell) for cell in result.cells)


class XLSXFormatter(Formatter):
    """XLSX workbook from result cells (parity: formatters.py:114-130).

    Dependency-free: XLSX is a zip of OOXML parts, so the workbook is
    written directly with ``zipfile`` + hand-built XML (numbers as
    native number cells, strings as inline strings).  When
    ``openpyxl`` happens to be installed it is used instead for richer
    compatibility; the built-in writer is the fallback and produces
    files Excel/LibreOffice/openpyxl read."""

    mime_type = ("application/vnd.openxmlformats-officedocument"
                 ".spreadsheetml.sheet")

    def rows(self, result: Any,
             fields: Optional[Sequence[str]] = None) -> List[list]:
        fields = list(fields or result.labels)
        out = [list(fields)]
        for record in result.cells:
            out.append([record.get(f) for f in fields])
        return out

    def format(self, cube: Any, result: Any,
               fields: Optional[Sequence[str]] = None) -> bytes:
        rows = self.rows(result, fields)
        try:
            from openpyxl import Workbook
        except ImportError:
            return _write_xlsx(rows)
        wb = Workbook(write_only=True)
        ws = wb.create_sheet()
        for row in rows:
            ws.append(row)
        stream = io.BytesIO()
        wb.save(stream)
        return stream.getvalue()


_XLSX_STATIC_PARTS = {
    "[Content_Types].xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        "</Types>"
    ),
    "_rels/.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/>'
        "</Relationships>"
    ),
    "xl/workbook.xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="result" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    ),
    "xl/_rels/workbook.xml.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    ),
}


def _xlsx_cell_xml(ref: str, value: Any) -> str:
    from decimal import Decimal
    from xml.sax.saxutils import escape

    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float, Decimal)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    text = escape(str(value))
    return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{text}</t></is></c>")


def _xlsx_col_name(index: int) -> str:
    name = ""
    index += 1
    while index:
        index, rem = divmod(index - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def _write_xlsx(rows: List[list]) -> bytes:
    import zipfile

    body = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>']
    for r, row in enumerate(rows, start=1):
        cells = "".join(
            _xlsx_cell_xml(f"{_xlsx_col_name(c)}{r}", value)
            for c, value in enumerate(row)
        )
        body.append(f'<row r="{r}">{cells}</row>')
    body.append("</sheetData></worksheet>")

    stream = io.BytesIO()
    with zipfile.ZipFile(stream, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in _XLSX_STATIC_PARTS.items():
            zf.writestr(name, content)
        zf.writestr("xl/worksheets/sheet1.xml", "".join(body))
    return stream.getvalue()


def _drilldown_attribute_refs(result: Any) -> List[str]:
    refs = []
    agg_names = {str(a) for a in result.aggregates}
    for label in result.labels:
        if label not in agg_names:
            refs.append(label)
    return refs
