"""C3 delete-intent router (extractor.py:126-147 / DELETE_PROMPT
prompts.py:170-185) and S5 external-schema source merge
(extractor.py:193-248) — deterministic stand-in parity."""

from __future__ import annotations

import json

from scrapontologies_spark.functions.semantics import (
    Entity,
    Relation,
    canonical_json,
    delete_entity_cascade,
    delete_relation,
    route_delete,
    schema_union_all,
)
from scrapontologies_spark.operators.schema_merge import merge_external_schemas

ENTS = ["portfolio", "fees", "fundExpenses"]
RELS = [
    ("portfolio", "fees", "has_fees"),
    ("fees", "fundExpenses", "has_fundExpenses"),
]


def test_route_entity_exact():
    r = route_delete("please delete the fees entity", ENTS, RELS)
    assert r == {"Type": "Entity", "ID": "fees", "Clarification": "None"}


def test_route_longest_entity_wins():
    # 'fundExpenses' contains no other id; 'portfolio fees' mentions two →
    # longest id wins deterministically
    r = route_delete("drop portfolio", ENTS, RELS)
    assert r["ID"] == "portfolio"


def test_route_relation_beats_entity():
    r = route_delete("remove has_fees between portfolio and fees", ENTS, RELS)
    assert r["Type"] == "Relation"
    # ID is the stringified tuple the reference evals (extractor.py:166)
    assert r["ID"] == str(("portfolio", "fees", "has_fees"))


def test_route_unclear_asks_clarification():
    r = route_delete("remove the thing", ENTS, RELS)
    assert r["Type"] == "None" and r["ID"] == "None"
    assert r["Clarification"] != "None"


def test_router_drives_delete_cascade():
    """Full C3→C1 flow: route then cascade, matching extractor.py:139-147."""
    ents = [Entity(id=e, type="object", attributes={}) for e in ENTS]
    rels = [
        Relation(id=f"r{i}", source=s, target=t, name=n)
        for i, (s, t, n) in enumerate(RELS)
    ]
    routed = route_delete("delete fees", ENTS, RELS)
    assert routed["Type"] == "Entity"
    e2, r2 = delete_entity_cascade(ents, rels, routed["ID"])
    assert [e.id for e in e2] == ["portfolio", "fundExpenses"]
    assert r2 == []  # both relations incident on 'fees'

    routed = route_delete("delete the has_fees relation of portfolio/fees", ENTS, RELS)
    key = eval(routed["ID"])  # reference consumes it via eval; ours is a tuple
    r3 = delete_relation(rels, key)
    assert [r.name for r in r3] == ["has_fundExpenses"]


def test_merge_external_schema_json_rows(spark):
    g = {"type": "object", "properties": {"a": {"type": "string"}}}
    ext = spark.createDataFrame(
        [(canonical_json({"type": "object", "properties": {"b": {"type": "integer"}}}),),
         (canonical_json({"type": "object", "properties": {"a": {"type": "string"}, "c": {"type": "number"}}}),)],
        "schema_json string",
    )
    merged = json.loads(merge_external_schemas(canonical_json(g), ext))
    assert sorted(merged["properties"]) == ["a", "b", "c"]
    # same-key existing structure preserved (UPDATE_SCHEMA_PROMPT rule)
    assert merged["properties"]["a"] == {"type": "string"}


def test_merge_external_schema_struct_rows(spark):
    """spark.read.json-shaped input (no schema_json column)."""
    ext = spark.read.json(
        spark.sparkContext.parallelize(
            ['{"type": "object", "properties": {"z": {"type": "string"}}}']
        )
    )
    merged = json.loads(merge_external_schemas("", ext))
    assert "z" in merged["properties"]
    # commutativity sanity: same result as pure union
    assert merged["properties"]["z"]["type"] == "string"


def test_merge_external_empty_left_copies_right(spark):
    ext = spark.createDataFrame([(canonical_json({"x": 1}),)], "schema_json string")
    assert json.loads(merge_external_schemas("", ext)) == schema_union_all([{}, {"x": 1}])
