"""K3 render parity (SURVEY §2.7): node/link/color construction must match
the reference's PyechartsRenderer semantics (pyecharts_renderer.py:31-90)."""

from __future__ import annotations

import json

from scrapontologies_spark.plans.render import (
    COLOR_PALETTE,
    assign_colors,
    graph_option,
    render_html,
)

ENTS = [
    {"id": "payslip", "type": "object", "attributes": {"base_pay": "number"}},
    {"id": "employee", "type": "object", "attributes": {"name": "string"}},
    {"id": "mod.py", "type": "module", "attributes": '{"lang":"python"}'},
]
RELS = [
    {"source": "payslip", "target": "employee"},
    {"source": "mod.py", "target": "payslip"},
]


def test_assign_colors_first_seen_wins():
    colors = assign_colors(["object", "module", "object", "thing"])
    assert colors["object"] == COLOR_PALETTE[0]
    assert colors["module"] == COLOR_PALETTE[1]
    assert colors["thing"] == COLOR_PALETTE[2]
    # palette cycles after 10 types (reference uses itertools.cycle)
    many = assign_colors([f"t{i}" for i in range(12)])
    assert many["t10"] == COLOR_PALETTE[0]


def test_graph_option_node_and_link_shape():
    opt = graph_option(ENTS, RELS, title="T")
    series = opt["series"][0]
    assert series["layout"] == "force"
    assert series["edgeSymbol"] == ["none", "arrow"]
    nodes = series["data"]
    assert [n["name"] for n in nodes] == ["payslip", "employee", "mod.py"]
    assert all(n["symbolSize"] == 50 for n in nodes)
    # tooltip = "Type: <type>\n" + pretty attribute JSON (reference :39-41, :57-59)
    assert nodes[0]["tooltip"]["formatter"] == (
        "Type: object\n" + json.dumps({"base_pay": "number"}, indent=2)
    )
    # JSON-string attributes are parsed before pretty-printing
    assert '"lang": "python"' in nodes[2]["tooltip"]["formatter"]
    # same type → same color; module differs
    assert nodes[0]["itemStyle"]["color"] == nodes[1]["itemStyle"]["color"]
    assert nodes[2]["itemStyle"]["color"] != nodes[0]["itemStyle"]["color"]
    links = series["links"]
    assert links[0] == {
        "source": "payslip",
        "target": "employee",
        "tooltip": {"show": False},
    }


def test_render_html_is_self_contained(tmp_path):
    out = tmp_path / "g.html"
    html = render_html(ENTS, RELS, output_path=str(out))
    assert out.read_text() == html
    embedded = html.split('id="graph-option">')[1].split("</script>")[0]
    opt = json.loads(embedded)
    assert len(opt["series"][0]["data"]) == 3
    assert len(opt["series"][0]["links"]) == 2


def test_render_pyecharts_builds_reference_graph_args():
    """The pyecharts backend must call Graph().add with the reference's
    exact arguments (pyecharts_renderer.py:72-90) over the shared
    node/link dicts.  pyecharts isn't installed here — inject a recording
    stand-in module."""
    from types import SimpleNamespace

    from scrapontologies_spark.plans.render import render_pyecharts

    calls = {}

    class FakeGraph:
        def add(self, series_name, nodes, links, **kw):
            calls["add"] = (series_name, nodes, links, kw)
            return self

        def set_global_opts(self, **kw):
            calls["global"] = kw
            return self

        def render(self, path):
            calls["render"] = path

    fake = SimpleNamespace(
        options=SimpleNamespace(
            LineStyleOpts=lambda **kw: ("line", kw),
            LabelOpts=lambda **kw: ("label", kw),
            TitleOpts=lambda **kw: ("title", kw),
        ),
        charts=SimpleNamespace(Graph=FakeGraph),
    )
    g = render_pyecharts(ENTS, RELS, title="T", pyecharts_module=fake)
    name, nodes, links, kw = calls["add"]
    assert name == "" and len(nodes) == 3 and len(links) == 2
    # same node/link dicts as the html backend
    assert nodes[0]["name"] == "payslip" and nodes[0]["symbolSize"] == 50
    assert links[0]["tooltip"] == {"show": False}
    assert kw["layout"] == "force" and kw["repulsion"] == 2000
    assert kw["is_roam"] is True and kw["is_draggable"] is True
    assert kw["edge_symbol"] == ["none", "arrow"]
    assert kw["edge_symbol_size"] == [10, 10]
    assert kw["linestyle_opts"] == ("line", {"width": 1, "curve": 0.2, "opacity": 0.7})
    assert kw["label_opts"] == ("label", {"is_show": True, "position": "right"})
    assert calls["global"]["title_opts"] == ("title", {"title": "T"})
    assert g.width == "100%" and g.height == "100%"
    assert "render" not in calls  # no output_path → no file write


def test_render_pyecharts_missing_dependency_raises_importerror():
    import pytest

    from scrapontologies_spark.plans.render import render_pyecharts

    with pytest.raises(ImportError, match="render_html"):
        render_pyecharts(ENTS, RELS)


def test_render_html_escapes_hostile_ids_and_title():
    """An entity id containing '</script>' must not terminate the embedded
    JSON block, and the title must not inject markup into <title>."""
    hostile = [{"id": "x</script><script>alert(1)</script>", "type": "object",
                "attributes": {}}]
    html = render_html(hostile, [], title="<b>T</b>")
    embedded = html.split('id="graph-option">')[1].split("</script>")[0]
    opt = json.loads(embedded)  # still one intact JSON document
    assert opt["series"][0]["data"][0]["name"].startswith("x</script>")
    assert "</script><script>alert" not in embedded  # '<' is <-escaped
    assert "<title>&lt;b&gt;T&lt;/b&gt;</title>" in html


def test_render_backend_validated_before_collect(spark):
    """A typo'd backend raises immediately — before any Spark job runs —
    and the api facade is equally strict (no silent html fallback)."""
    import pytest

    from scrapontologies_spark.plans.render import render_from_tables

    ents = spark.createDataFrame(
        [("a", "object", "{}")], "id string, type string, attributes string"
    )
    rels = spark.createDataFrame(
        [], "id string, source string, target string, name string, rel_type string"
    )
    with pytest.raises(ValueError, match="unknown render backend"):
        render_from_tables(ents, rels, backend="pyechart")


def test_render_from_tables_drops_null_ids(spark):
    """NULL entity ids are filtered out instead of crashing the keep-set
    sort or emitting a null graph node."""
    from scrapontologies_spark.plans.render import render_from_tables

    ents = spark.createDataFrame(
        [("a", "object", "{}"), (None, "object", "{}")],
        "id string, type string, attributes string",
    )
    rels = spark.createDataFrame(
        [], "id string, source string, target string, name string, rel_type string"
    )
    html = render_from_tables(ents, rels)
    assert '"name": "a"' in html
    assert '"name": null' not in html and html.count('"name":') == 1
