"""Malformed-HTML tolerance of the table parser (no Spark needed): the
reference uses bs4/lxml, which forgive void elements, unclosed cells, and
nested tables in historical scans — our stdlib parser must match.
"""

from __future__ import annotations

from factory_inspectors_db_etl_spark.sources.html_table import parse_first_table


def _texts(row):
    return [c.text_stripped() for c in row.tds()]


def test_void_elements_do_not_swallow_cells():
    # <img>/<hr>/<input> have no end tags; the cells after them must
    # still be seen as separate cells, not merged into the first
    html = """<table><tr>
      <td>a <img src="x.png"> b</td><td>c<hr>d</td><td><input name="q">e</td><td>f</td>
    </tr></table>"""
    rows, _ = parse_first_table(html)
    assert len(rows) == 1
    # get_text(strip=True) semantics: fragments stripped, joined with ""
    assert _texts(rows[0]) == ["ab", "cd", "e", "f"]


def test_all_void_elements_tolerated():
    voids = ["area", "base", "br", "col", "embed", "hr", "img",
             "input", "link", "meta", "source", "track", "wbr"]
    cells = "".join(f"<td>x<{v}>y</td>" for v in voids)
    rows, _ = parse_first_table(f"<table><tr>{cells}</tr></table>")
    assert len(rows) == 1
    assert len(rows[0].tds()) == len(voids)
    assert all(t == "xy" for t in _texts(rows[0]))


def test_nested_table_markup_kept_in_inner_html():
    html = """<table><tr>
      <td>before <table><tr><td>inner</td></tr></table> after</td><td>next</td>
    </tr></table>"""
    rows, _ = parse_first_table(html)
    assert len(rows) == 1
    tds = rows[0].tds()
    assert len(tds) == 2
    inner = tds[0].inner_html()
    assert "<table>" in inner and "</table>" in inner and "inner" in inner
    assert tds[1].text_stripped() == "next"
    # and the nested table's rows are NOT promoted to top-level rows
    assert _texts(rows[0])[0].startswith("before")


def test_unclosed_td_implicitly_closed_by_sibling():
    # lxml closes an open <td> when a sibling <td> starts
    html = "<table><tr><td>a<td>b<td>c</td></tr></table>"
    rows, _ = parse_first_table(html)
    assert len(rows) == 1
    assert _texts(rows[0]) == ["a", "b", "c"]


def test_unclosed_tr_implicitly_closed_by_next_tr():
    html = "<table><tr><td>r1<tr><td>r2</td></tr></table>"
    rows, _ = parse_first_table(html)
    assert [_texts(r) for r in rows] == [["r1"], ["r2"]]


def test_br_still_preserved_in_inner_html():
    html = "<table><tr><td>one<br>two</td></tr></table>"
    rows, _ = parse_first_table(html)
    assert "<br>" in rows[0].tds()[0].inner_html()
