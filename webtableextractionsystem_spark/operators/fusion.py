"""Entity fusion (A6): merge per-(name,url) property bags across documents.

Reproduces the effective upsert semantics of the reference's Neo4j sink
(__createNodeWithEntityList + fusionNode,
/root/reference/src/knowledgeStorage/peronGraph.py:32-88) as a
deterministic, distributed merge — the reference's behavior depends on DB
arrival order; here the order is pinned to (doc_id, seq).

Effective reference semantics reproduced:

* names ending 氏: the reference matches an existing node and calls
  ``create`` on the match (no-op) or on None (exception, swallowed) —
  so 氏-entities NEVER create or modify nodes; they are dropped.
* url-less entity: merge into the first existing node of that name
  (first-wins property union), else create a url-less node.
* url-bearing entity: exact (name,url) node -> merge; else if the first
  node of that name has a url and the urls contain one another -> merge;
  if that node is url-less the reference raises TypeError on ``in`` and
  swallows it -> entity dropped; else create a new node.
* property union keeps existing values (fusionNode: only absent keys
  are added).

Scale: groupBy(name) + applyInPandas. Name groups are small (bounded by
how many pages mention one name); Spark AQE handles residual skew. The
shuffle key is the join key of the semantic — unavoidable and minimal.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

FUSED_SCHEMA = (
    "name string, url string, props map<string,string>, n_sources int"
)


def _fuse_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["doc_id", "seq"], kind="mergesort")
    nodes: list[dict] = []  # {"url": str|None, "props": dict, "n": int}
    for row in pdf.itertuples(index=False):
        name = row.name
        url = row.url or ""
        props = dict(row.props) if row.props is not None else {}
        if name.endswith("氏"):
            continue  # reference-effective: 氏 entities are no-ops
        if url == "" or url.isspace():
            if nodes:
                _merge(nodes[0], props)
            else:
                nodes.append({"url": None, "props": props, "n": 1})
            continue
        exact = next((n for n in nodes if n["url"] == url), None)
        if exact is not None:
            _merge(exact, props)
            continue
        if nodes:
            first = nodes[0]
            if first["url"] is None:
                continue  # reference TypeError-swallow: entity dropped
            if first["url"] in url or url in first["url"]:
                _merge(first, props)
                continue
        nodes.append({"url": url, "props": props, "n": 1})

    if not nodes:
        return pd.DataFrame(
            {"name": [], "url": [], "props": [], "n_sources": []}
        ).astype({"name": object, "url": object, "props": object,
                  "n_sources": "int32"})
    name = pdf["name"].iloc[0]
    return pd.DataFrame(
        {
            "name": [name] * len(nodes),
            "url": [n["url"] or "" for n in nodes],
            "props": [n["props"] for n in nodes],
            "n_sources": pd.array([n["n"] for n in nodes], dtype="int32"),
        }
    )


def _merge(node: dict, props: dict) -> None:
    for k, v in props.items():
        if k not in node["props"]:
            node["props"][k] = v
    node["n"] += 1


def fuse_entities(entities: DataFrame) -> DataFrame:
    """entities(doc_id, seq, name, url, props) -> fused nodes."""
    return (
        entities.select("doc_id", "seq", "name", "url", "props")
        .groupBy("name")
        .applyInPandas(_fuse_group, schema=FUSED_SCHEMA)
    )
