"""K3 — interactive entity-relationship graph render (driver-side).

Parity with the reference's PyechartsRenderer
(renderers/pyecharts_renderer.py:43-154): nodes = entities with
symbolSize 50, label = entity id, value = entity type, tooltip = "Type: " +
pretty-printed attribute JSON, color assigned first-seen per type from the
same 10-color palette (assign_colors, :31-37); links = one arrowed edge per
relation from source to target (:65-67); force layout, roam + drag.

Non-distributed by design (SURVEY §2.7 K3): the caller collect()s the
(small, canonical) entity/edge dimension tables.  pyecharts is not in this
container, so the default backend emits a self-contained HTML document
embedding the ECharts graph *option* JSON — byte-stable, testable, and
drop-in renderable by any ECharts runtime; :func:`render_pyecharts`
(``backend='pyecharts'`` on render_from_tables) builds the same Graph the
reference does when pyecharts is importable (guarded import, injectable
for tests).
"""

from __future__ import annotations

import html as _html
import json
from itertools import cycle
from typing import Any, Dict, List, Optional, Sequence

# Same palette as the reference (pyecharts_renderer.py:25-28)
COLOR_PALETTE = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
]


def assign_colors(types_in_order: Sequence[str]) -> Dict[str, str]:
    """First-seen-wins color per entity type (A7; pyecharts_renderer.py:31-37)."""
    colors = cycle(COLOR_PALETTE)
    out: Dict[str, str] = {}
    for t in types_in_order:
        if t not in out:
            out[t] = next(colors)
    return out


def _nodes_and_links(
    entities: List[Dict[str, Any]], relations: List[Dict[str, Any]]
) -> "tuple[list, list]":
    """The reference's node/link dicts (pyecharts_renderer.py:48-68), shared
    by both backends: label = entity id, value = type, tooltip = 'Type: ' +
    pretty attribute JSON, first-seen color per type; links arrowed
    source→target with tooltips off."""
    type_to_color = assign_colors([e["type"] for e in entities])

    def attrs_of(e: Dict[str, Any]) -> Any:
        a = e.get("attributes")
        if isinstance(a, str):
            try:
                a = json.loads(a)
            except (ValueError, TypeError):
                pass
        return a if a is not None else {}

    nodes = [
        {
            "name": e["id"],
            "symbolSize": 50,
            "label": {"formatter": f"{e['id']}"},
            "value": e["type"],
            "tooltip": {
                "formatter": f"Type: {e['type']}\n"
                + json.dumps(attrs_of(e), indent=2)
            },
            "itemStyle": {"color": type_to_color[e["type"]]},
        }
        for e in entities
    ]
    links = [
        {"source": r["source"], "target": r["target"], "tooltip": {"show": False}}
        for r in relations
    ]
    return nodes, links


def graph_option(
    entities: List[Dict[str, Any]],
    relations: List[Dict[str, Any]],
    title: str = "Entity-Relationship Graph",
    repulsion: int = 2000,
) -> Dict[str, Any]:
    """Build the ECharts option dict (the reference's Graph.add arguments,
    pyecharts_renderer.py:72-90).  ``entities`` rows need id/type/attributes
    (attributes as dict or canonical-JSON string); ``relations`` rows need
    source/target."""
    nodes, links = _nodes_and_links(entities, relations)
    return {
        "title": {"text": title},
        "series": [
            {
                "type": "graph",
                "layout": "force",
                "roam": True,
                "draggable": True,
                "force": {"repulsion": repulsion},
                "edgeSymbol": ["none", "arrow"],
                "edgeSymbolSize": [10, 10],
                "lineStyle": {"width": 1, "curveness": 0.2, "opacity": 0.7},
                "label": {"show": True, "position": "right"},
                "data": nodes,
                "links": links,
            }
        ],
    }


def render_pyecharts(
    entities: List[Dict[str, Any]],
    relations: List[Dict[str, Any]],
    output_path: Optional[str] = None,
    title: str = "Entity-Relationship Graph",
    repulsion: int = 2000,
    pyecharts_module: Any = None,
):
    """K3 pyecharts backend — builds the SAME Graph the reference does
    (pyecharts_renderer.py:72-90: Graph().add('', nodes, links,
    layout='force', repulsion, is_roam, is_draggable, edge_symbol arrows,
    linestyle width/curve/opacity, right-positioned labels) with the shared
    node/link dicts.  pyecharts is not bundled in this container: the import
    is guarded (ImportError names the dependency-free ``render_html``
    fallback), and ``pyecharts_module`` injects a stand-in for tests."""
    if pyecharts_module is None:
        try:
            import importlib

            pyecharts_module = importlib.import_module("pyecharts")
            importlib.import_module("pyecharts.options")
            importlib.import_module("pyecharts.charts")
        except ImportError as e:
            raise ImportError(
                "the pyecharts backend requires the 'pyecharts' package; "
                "use render_html() for the self-contained HTML backend"
            ) from e
    opts = pyecharts_module.options
    Graph = pyecharts_module.charts.Graph
    nodes, links = _nodes_and_links(entities, relations)
    graph = (
        Graph()
        .add(
            "",
            nodes,
            links,
            layout="force",
            repulsion=repulsion,
            is_roam=True,
            is_draggable=True,
            edge_symbol=["none", "arrow"],
            edge_symbol_size=[10, 10],
            linestyle_opts=opts.LineStyleOpts(width=1, curve=0.2, opacity=0.7),
            label_opts=opts.LabelOpts(is_show=True, position="right"),
        )
        .set_global_opts(title_opts=opts.TitleOpts(title=title))
    )
    graph.width = "100%"
    graph.height = "100%"
    if output_path:
        graph.render(output_path)
    return graph


def render_html(
    entities: List[Dict[str, Any]],
    relations: List[Dict[str, Any]],
    output_path: Optional[str] = None,
    title: str = "Entity-Relationship Graph",
    repulsion: int = 2000,
) -> str:
    """Self-contained HTML embedding the graph option JSON.  The document
    loads ECharts from its standard CDN path when online and otherwise
    leaves the option inspectable in-page — no hard dependency."""
    option = graph_option(entities, relations, title, repulsion)
    # '<' must not appear literally inside the embedded JSON: an entity id
    # containing '</script>' would terminate the application/json block
    opt_json = json.dumps(option).replace("<", "\\u003c")
    safe_title = _html.escape(title)
    html = f"""<!DOCTYPE html>
<html>
<head><meta charset="utf-8"><title>{safe_title}</title></head>
<body>
<div id="graph" style="width:100%;height:900px;"></div>
<script type="application/json" id="graph-option">{opt_json}</script>
<script src="https://cdn.jsdelivr.net/npm/echarts@5/dist/echarts.min.js"></script>
<script>
if (typeof echarts !== 'undefined') {{
  var chart = echarts.init(document.getElementById('graph'));
  chart.setOption(JSON.parse(document.getElementById('graph-option').textContent));
}}
</script>
</body>
</html>
"""
    if output_path:
        # explicit utf-8: the document declares <meta charset="utf-8">, and
        # the locale's preferred encoding (POSIX hosts: ASCII) would raise
        # on non-ASCII titles/attributes
        with open(output_path, "w", encoding="utf-8") as f:
            f.write(html)
    return html


def render_from_tables(
    entities_df,
    relations_df,
    output_path: Optional[str] = None,
    max_nodes: int = 2000,
    max_edges: int = 20000,
    backend: str = "html",
    **kwargs: Any,
):
    """Collect the (small) canonical dimension tables and render.  The
    limits guard against accidentally collecting a billion-row table —
    rendering is a driver-side sink for the canonical top of the graph,
    exactly like the reference (which holds all entities in a Python list
    anyway).  The edge filter runs DataFrame-side: relations are semi-
    joined against the (broadcast, ≤max_nodes) kept-node set on BOTH
    endpoints before anything is collected, so a corpus-scale edge table
    never reaches the driver.  ``backend``: 'html' (self-contained,
    default) or 'pyecharts'."""
    from pyspark.sql import functions as F

    if backend not in ("html", "pyecharts"):
        # validate BEFORE collecting anything — a typo'd backend should not
        # cost two Spark jobs first
        raise ValueError(f"unknown render backend: {backend!r}")
    # NULL ids cannot be graph nodes (and would crash the sorted() below)
    # orderBy before limit: .limit on an unordered frame picks whichever
    # partitions answer first, so the rendered subset would vary across
    # runs/partitionings whenever the table exceeds the cap
    ents = [
        r.asDict()
        for r in entities_df.filter(F.col("id").isNotNull())
        .orderBy("id")
        .limit(max_nodes)
        .collect()
    ]
    keep = {e["id"] for e in ents}
    spark = relations_df.sparkSession
    keep_df = spark.createDataFrame([(k,) for k in sorted(keep)], "id string")
    rels_df = (
        relations_df.join(
            F.broadcast(keep_df.withColumnRenamed("id", "source")),
            "source",
            "left_semi",
        )
        .join(
            F.broadcast(keep_df.withColumnRenamed("id", "target")),
            "target",
            "left_semi",
        )
        # order by EVERY column: (source, target) alone is not a total
        # order when duplicate pairs differ in pred/rel_type, so the kept
        # members at the limit boundary would vary with partitioning —
        # breaking the byte-stable render the nodes side guarantees
        .orderBy(*sorted(relations_df.columns))
        .limit(max_edges)
    )
    rels = [r.asDict() for r in rels_df.collect()]
    if backend == "pyecharts":
        return render_pyecharts(ents, rels, output_path, **kwargs)
    return render_html(ents, rels, output_path, **kwargs)
