"""K2 — graph-database sink (Neo4j parity).

The reference's Neo4jDBClient opens a driver session and runs raw Cypher
(db_client.py:70-97); nothing in the repo generates the Cypher itself.  At
corpus scale the canonical graph lives in the warehouse tables (triples /
entities) and a graph DB is an EXPORT target: we format idempotent
``UNWIND $rows ... MERGE`` batches per partition and hand them to a driver
callback (``foreachPartition``), so the engine needs no graph-DB client
installed — the emitter is injected, exactly like the multimodal codec
stubs.

Formatting is pure and unit-tested; the network write is the injected part.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

# Uniqueness constraint on the MERGE key — REQUIRED before any parallel
# export: without it, two partitions concurrently MERGEing the same id
# (e.g. a lib:: obj node appearing in many partitions' triples) race and
# create duplicate nodes — the classic Neo4j MERGE race, which would break
# the idempotent-upsert contract.  With the constraint, one MERGE wins and
# the others retry/lock on the key.  export_to_graph runs it driver-side
# before the parallel writes.
CONSTRAINT_CYPHER = (
    "CREATE CONSTRAINT entity_id_unique IF NOT EXISTS "
    "FOR (e:Entity) REQUIRE e.id IS UNIQUE"
)

# Idempotent upserts: MERGE on the id key, SET properties.
ENTITY_CYPHER = (
    "UNWIND $rows AS r "
    "MERGE (e:Entity {id: r.id}) "
    "SET e.type = r.type, e.attributes = r.attributes"
)
TRIPLE_CYPHER = (
    "UNWIND $rows AS r "
    "MERGE (s:Entity {id: r.subj}) "
    "MERGE (o:Entity {id: r.obj}) "
    "MERGE (s)-[rel:REL {name: r.pred}]->(o) "
    "SET rel.type = r.rel_type"
)


def entity_batches(
    rows: Iterable, batch_size: int = 1000
) -> Iterable[Tuple[str, List[Dict[str, Any]]]]:
    """entities rows (id, type, attributes) → (cypher, params) batches."""
    buf: List[Dict[str, Any]] = []
    for r in rows:
        buf.append({"id": r["id"], "type": r["type"], "attributes": r["attributes"]})
        if len(buf) >= batch_size:
            yield ENTITY_CYPHER, buf
            buf = []
    if buf:
        yield ENTITY_CYPHER, buf


def triple_batches(
    rows: Iterable, batch_size: int = 1000
) -> Iterable[Tuple[str, List[Dict[str, Any]]]]:
    """triples rows (subj, pred, obj, rel_type) → (cypher, params) batches."""
    buf: List[Dict[str, Any]] = []
    for r in rows:
        buf.append(
            {
                "subj": r["subj"],
                "pred": r["pred"],
                "obj": r["obj"],
                "rel_type": r["rel_type"],
            }
        )
        if len(buf) >= batch_size:
            yield TRIPLE_CYPHER, buf
            buf = []
    if buf:
        yield TRIPLE_CYPHER, buf


def export_to_graph(
    entities_df,
    triples_df,
    run_cypher: Callable[[str, Dict[str, Any]], Any],
    batch_size: int = 1000,
) -> None:
    """Distributed export: each partition formats its own batches and calls
    the injected ``run_cypher(statement, {"rows": [...]})`` — the
    foreachPartition shape that a real Neo4j driver session plugs into
    (db_client.py:85-97 semantics: execute, consume results).

    The id-uniqueness constraint runs first, DRIVER-side: parallel MERGEs
    on the same id race without it (duplicate nodes) — see
    CONSTRAINT_CYPHER."""
    run_cypher(CONSTRAINT_CYPHER, {})

    def _ents(it):
        for stmt, rows in entity_batches((r.asDict() for r in it), batch_size):
            run_cypher(stmt, {"rows": rows})

    def _trps(it):
        for stmt, rows in triple_batches((r.asDict() for r in it), batch_size):
            run_cypher(stmt, {"rows": rows})

    entities_df.foreachPartition(_ents)
    triples_df.foreachPartition(_trps)


def cypher_script(
    entities: List[Dict[str, Any]],
    triples: List[Dict[str, Any]],
    batch_size: int = 1000,
) -> str:
    """Driver-side convenience: a runnable cypher-shell script with inlined
    parameters (for small canonical graphs / debugging).

    The right side of ``:param rows =>`` is a CYPHER expression, not JSON:
    map keys must be bare identifiers (``{id: ...}``) — ``{"id": ...}`` is
    a Cypher syntax error.  Keys here are fixed identifiers, so only the
    VALUES are JSON-encoded (JSON string literals are valid Cypher string
    literals)."""

    def _cypher_value(v: Any) -> str:
        # Cypher property values must be scalars (or arrays of scalars):
        # a dict-valued field JSON-encoded inline would render quoted map
        # keys ({"k": 1}) — the exact syntax error the docstring warns
        # about — so non-scalars become their canonical-JSON STRING (the
        # same representation the entities table stores).  Non-finite
        # floats (NaN/Infinity) have no Cypher literal: null.
        if isinstance(v, (dict, list)):
            return json.dumps(json.dumps(v, sort_keys=True))
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            return "null"
        return json.dumps(v)

    def _cypher_map(row: Dict[str, Any]) -> str:
        return (
            "{" + ", ".join(f"{k}: {_cypher_value(v)}" for k, v in row.items()) + "}"
        )

    parts = [f"{CONSTRAINT_CYPHER};"]
    for stmt, rows in list(entity_batches(entities, batch_size)) + list(
        triple_batches(triples, batch_size)
    ):
        rows_lit = "[" + ", ".join(_cypher_map(r) for r in rows) + "]"
        parts.append(f":param rows => {rows_lit};\n{stmt};")
    return "\n".join(parts)
