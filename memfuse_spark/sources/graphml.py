"""GraphML import/export for the graph tables (SURVEY.md §2.1 S7).

The reference persists its graph as a .graphml file via networkx
(store/graph_store/graphml_store.py:741,1019 write; igraph_store.py:
690-706 read). Spark-first, the graph LIVES as two DataFrames (nodes,
edges) in parquet; GraphML is supported as an INTERCHANGE format only —
a small-graph XML file by construction (it is a single document), so
the conversion runs driver-side over collected rows, exactly like any
export-to-file-format boundary. At 100 TB the graph stays in
partitioned parquet and GraphML export applies to extracted subgraphs
(a neighborhood, a component), which are result-set sized.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = "http://graphml.graphdrawing.org/xmlns"

EDGE_KEYS = (("d_weight", "weight", "double"), ("d_relation", "relation", "string"))


def export_graphml(nodes: DataFrame, edges: DataFrame, path: str) -> int:
    """Write a networkx-compatible GraphML file; returns edge count.

    `nodes`: (node_id); `edges`: (src, dst, weight, relation). The
    caller bounds the subgraph size (GraphML is a single-document
    format — collect here is the format's own constraint, not a plan
    shortcut).
    """
    ET.register_namespace("", _NS)
    root = ET.Element(f"{{{_NS}}}graphml")
    for key_id, name, typ in EDGE_KEYS:
        ET.SubElement(
            root,
            f"{{{_NS}}}key",
            {"id": key_id, "for": "edge", "attr.name": name, "attr.type": typ},
        )
    graph = ET.SubElement(root, f"{{{_NS}}}graph", {"edgedefault": "directed"})
    for r in nodes.select("node_id").orderBy("node_id").collect():
        ET.SubElement(graph, f"{{{_NS}}}node", {"id": str(r.node_id)})
    n_edges = 0
    for r in edges.select("src", "dst", "weight", "relation").orderBy(
        "src", "dst", "relation"
    ).collect():
        e = ET.SubElement(
            graph, f"{{{_NS}}}edge", {"source": str(r.src), "target": str(r.dst)}
        )
        w = ET.SubElement(e, f"{{{_NS}}}data", {"key": "d_weight"})
        w.text = repr(float(r.weight))
        rel = ET.SubElement(e, f"{{{_NS}}}data", {"key": "d_relation"})
        rel.text = r.relation
        n_edges += 1
    ET.ElementTree(root).write(path, xml_declaration=True, encoding="utf-8")
    return n_edges


def import_graphml(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a GraphML file back into (nodes, edges) DataFrames with the
    same schema the graph operators consume."""
    tree = ET.parse(path)
    graph = tree.getroot().find(f"{{{_NS}}}graph")
    nodes = [(int(n.get("id")),) for n in graph.findall(f"{{{_NS}}}node")]
    edges = []
    for e in graph.findall(f"{{{_NS}}}edge"):
        attrs = {d.get("key"): d.text for d in e.findall(f"{{{_NS}}}data")}
        edges.append(
            (
                int(e.get("source")),
                int(e.get("target")),
                float(attrs.get("d_weight", 1.0)),
                attrs.get("d_relation", ""),
            )
        )
    nodes_df = spark.createDataFrame(nodes, "node_id long")
    edges_df = spark.createDataFrame(
        edges, "src long, dst long, weight double, relation string"
    )
    return nodes_df, edges_df
