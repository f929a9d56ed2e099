"""Formatter outputs against golden strings (parity:
/root/reference/cubes/formatters.py semantics)."""

import json

import pytest

from cubes_spark.formatters import (
    CSVFormatter,
    CrossTableFormatter,
    JSONLinesFormatter,
    XLSXFormatter,
    csv_generator,
    make_cross_table,
)


@pytest.fixture(scope="module")
def result(golden_browser):
    return golden_browser.aggregate(drilldown=["year"],
                                    aggregates=["amount_sum", "count"])


def test_csv_formatter_golden(result):
    out = CSVFormatter().format(None, result)
    lines = out.strip().splitlines()
    assert lines[0] == "year.year,amount_sum,count"
    assert lines[1] == "2010,15,4"
    assert len(lines) == 5


def test_csv_generator_header_override():
    records = [{"a": 1, "b": "x,y"}]
    out = "".join(csv_generator(records, ["a", "b"], header=["A", "B"]))
    assert out.splitlines() == ["A,B", '1,"x,y"']


def test_jsonlines_formatter(result):
    out = JSONLinesFormatter().format(None, result)
    docs = [json.loads(line) for line in out.splitlines()]
    assert len(docs) == 4
    assert docs[0]["year.year"] == 2010
    assert docs[0]["amount_sum"] == 15


def test_cross_table_cells(result):
    table = make_cross_table(result, onrows=["year.year"], oncolumns=[])
    assert table.rows == [(2010,), (2011,), (2012,), (2013,)]
    assert table.columns == [()]
    assert table.data[0] == [(15, 4)]


def test_cross_table_aggregates_on_columns(result):
    table = make_cross_table(result, onrows=["year.year"], oncolumns=[],
                             aggregates_on="columns")
    assert len(table.columns) == 2
    assert table.data[0] == [15, 4]


def test_cross_table_formatter_json(result):
    out = json.loads(CrossTableFormatter().format(None, result))
    assert out["rows"] == [[2010], [2011], [2012], [2013]]
    assert out["data"][0] == [[15, 4]]


def test_cross_table_two_dims(tpch_browser):
    r = tpch_browser.aggregate(drilldown=["returnflag", "linestatus"],
                               aggregates=["fact_count"])
    table = make_cross_table(
        r, onrows=["returnflag.returnflag"],
        oncolumns=["linestatus.linestatus"],
    )
    assert ("F",) in table.columns and ("O",) in table.columns
    assert ("A",) in table.rows
    total = sum(
        cell[0] for row in table.data for cell in row if cell is not None
    )
    assert total == r.summary["fact_count"]


def test_xlsx_rows_layout(result):
    rows = XLSXFormatter().rows(result)
    assert rows[0] == ["year.year", "amount_sum", "count"]
    assert rows[1] == [2010, 15, 4]


def test_xlsx_real_workbook_roundtrip(result):
    """The dependency-free writer emits a real OOXML zip whose sheet
    XML parses back to the same grid."""
    import io
    import re
    import zipfile
    from xml.etree import ElementTree

    payload = XLSXFormatter().format(None, result)
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml"} <= names
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    root = ElementTree.fromstring(sheet)
    grid = []
    for row in root.findall(".//m:row", ns):
        values = []
        for cell in row.findall("m:c", ns):
            t = cell.find("m:is/m:t", ns)
            v = cell.find("m:v", ns)
            values.append(t.text if t is not None else float(v.text))
        grid.append(values)
    assert grid[0] == ["year.year", "amount_sum", "count"]
    assert grid[1] == [2010.0, 15.0, 4.0]


def test_html_cross_table_formatter(tpch_browser):
    from cubes_spark.formatters import HTMLCrossTableFormatter

    result = tpch_browser.aggregate(
        drilldown=["returnflag", "linestatus"],
        aggregates=["fact_count"])
    html = HTMLCrossTableFormatter(table_style="cubes").format(
        None, result, onrows=["returnflag.returnflag"],
        oncolumns=["linestatus.linestatus"])
    assert html.startswith('<table class="cubes">')
    assert "<thead>" in html and "<tbody>" in html
    # row headers are <th>, data cells are <td>
    assert "<th>A</th>" in html
    assert "<td>" in html
    # values escape: nothing in TPC-H needs it, so inject one
    class FakeAgg:
        def __str__(self):
            return "x"
        label = "a<b"
    class FakeResult:
        drilldown = ["d"]
        aggregates = [FakeAgg()]
        cells = [{"d": "<v>", "x": 1}]
        labels = ["d", "x"]
    fake = HTMLCrossTableFormatter().format(
        None, FakeResult(), onrows=["d"], oncolumns=[],
        aggregates_on="columns")
    assert "&lt;v&gt;" in fake and "<v>" not in fake
    assert "a&lt;b" in fake
