"""K2 graph-sink parity: batch formatting is pure and idempotent-by-MERGE;
the distributed export calls the injected cypher runner once per batch with
UNWIND-able row params (db_client.py:70-97 is the reference surface)."""

from __future__ import annotations

from scrapontologies_spark.sources.graph_sink import (
    ENTITY_CYPHER,
    TRIPLE_CYPHER,
    cypher_script,
    entity_batches,
    triple_batches,
)

ENTS = [{"id": f"e{i}", "type": "object", "attributes": "{}"} for i in range(5)]
TRPS = [
    {"subj": "e0", "pred": "calls", "obj": "e1", "rel_type": "call"},
    {"subj": "e1", "pred": "imports", "obj": "lib::x", "rel_type": "import"},
]


def test_entity_batching_respects_batch_size():
    batches = list(entity_batches(ENTS, batch_size=2))
    assert [len(rows) for _, rows in batches] == [2, 2, 1]
    assert all(stmt == ENTITY_CYPHER for stmt, _ in batches)
    assert batches[0][1][0] == {"id": "e0", "type": "object", "attributes": "{}"}


def test_triple_batch_shape():
    ((stmt, rows),) = list(triple_batches(TRPS, batch_size=10))
    assert stmt == TRIPLE_CYPHER
    assert rows[1]["obj"] == "lib::x"
    assert "MERGE (s)-[rel:REL {name: r.pred}]->(o)" in stmt


def test_cypher_script_is_runnable_text():
    script = cypher_script(ENTS, TRPS, batch_size=10)
    assert script.count(":param rows =>") == 2
    assert ENTITY_CYPHER in script and TRIPLE_CYPHER in script


def test_distributed_export_calls_runner_per_batch(spark):
    from scrapontologies_spark.sources.graph_sink import export_to_graph

    ents = spark.createDataFrame(ENTS)
    trps = spark.createDataFrame(TRPS)

    # record calls through a file-backed accumulator (foreachPartition runs
    # in executors of the same local JVM; a plain list would not come back)
    from pyspark import AccumulatorParam

    class ListParam(AccumulatorParam):
        def zero(self, v):
            return []

        def addInPlace(self, a, b):
            return a + b

    acc = spark.sparkContext.accumulator([], ListParam())

    def runner(stmt, params):
        acc.add([(stmt, len(params.get("rows", [])))])

    export_to_graph(ents, trps, runner, batch_size=2)
    calls = acc.value
    ent_rows = sum(n for s, n in calls if s == ENTITY_CYPHER)
    trp_rows = sum(n for s, n in calls if s == TRIPLE_CYPHER)
    assert ent_rows == len(ENTS)
    assert trp_rows == len(TRPS)
    # the id-uniqueness constraint ran exactly once, driver-side, BEFORE
    # the parallel MERGEs (whose concurrent same-id upserts race without it)
    from scrapontologies_spark.sources.graph_sink import CONSTRAINT_CYPHER

    assert calls[0] == (CONSTRAINT_CYPHER, 0)
    assert sum(1 for s, _ in calls if s == CONSTRAINT_CYPHER) == 1


def test_cypher_script_map_keys_are_bare_identifiers():
    """':param rows =>' takes a CYPHER expression: map keys must be bare
    identifiers ({id: ...}); JSON-style quoted keys are a syntax error in
    cypher-shell.  Values stay JSON-encoded (valid Cypher strings)."""
    from scrapontologies_spark.sources.graph_sink import cypher_script

    script = cypher_script(
        [{"id": "a", "type": "module", "attributes": '{"k": "v"}'}],
        [{"subj": "a", "pred": "calls", "obj": "b", "rel_type": "call"}],
    )
    assert '{"' not in script  # no quoted map keys anywhere
    assert "{id: " in script and "{subj: " in script
    # JSON inside a VALUE is escaped into the Cypher string literal
    assert '"{\\"k\\": \\"v\\"}"' in script
