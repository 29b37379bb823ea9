"""K1 (optional) — relational-database parity sink (Postgres analog).

The reference executes LLM-generated DDL + rows against Postgres through
``PostgresDBClient.execute_query`` (db_client.py:25-67).  At corpus scale
the sanctioned primary sink is the warehouse/Iceberg DDL path
(operators/ddl.py); this module is the ``df.write.jdbc`` parity sink for
users exporting the canonical dimension tables to an external RDBMS:

- :func:`postgres_ddl` renders the deterministic 3NF table specs to ANSI
  DDL with PRIMARY KEY / FOREIGN KEY constraints (what the reference's
  CREATE_TABLES_PROMPT demanded of the LLM, extractor.py:304-387);
- :func:`create_tables_via` executes them through an injected
  ``execute_query`` callback — the exact surface of
  ``PostgresDBClient.execute_query(query, params)`` (db_client.py:59-67),
  so a real psycopg2 client plugs in unchanged and tests inject a recorder
  (same pattern as graph_sink's ``run_cypher``);
- :func:`write_jdbc` is the distributed data-row path: a thin
  ``df.write.jdbc`` wrapper (each executor partition opens its own JDBC
  connection — Spark's parallel write, no driver-side collect).  No JDBC
  driver jar ships in this container; the call shape is tested with an
  injected writer.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

from ..operators.ddl import TableSpec, schema_to_tables, tables_to_ddl

# Spark-SQL column types → Postgres/ANSI spellings.  Without this a real
# psycopg2 client fails on essentially every schema: Postgres has no
# STRING type, and DOUBLE needs PRECISION.
_PG_TYPES = {"STRING": "TEXT", "DOUBLE": "DOUBLE PRECISION"}


def postgres_ddl(schema: Dict[str, Any], if_not_exists: bool = True) -> List[str]:
    """Deterministic Postgres DDL (with PK/FK constraints) for every 3NF
    table derived from ``schema`` — the executable stand-in for the
    reference's LLM-generated CREATE TABLE statements.  Column types are
    rendered in the Postgres dialect (TEXT / DOUBLE PRECISION); the
    Spark/Iceberg spellings stay in operators/ddl.tables_to_ddl."""
    pg_specs = [
        TableSpec(
            t.name,
            [(c, _PG_TYPES.get(ty, ty)) for c, ty in t.columns],
            t.primary_key,
            t.foreign_key,
        )
        for t in schema_to_tables(schema)
    ]
    return tables_to_ddl(pg_specs, if_not_exists=if_not_exists, with_constraints=True)


def create_tables_via(
    execute_query: Callable[[str], Any],
    schema: Dict[str, Any],
    if_not_exists: bool = True,
) -> List[str]:
    """Execute the generated DDL through the injected client callback
    (PostgresDBClient.execute_query shape, db_client.py:59-67).  Idempotent
    via IF NOT EXISTS — no retry loop needed, generation is deterministic
    (the reference retried because the LLM output could be invalid SQL).
    Returns the executed statements."""
    stmts = postgres_ddl(schema, if_not_exists=if_not_exists)
    for s in stmts:
        execute_query(s)
    return stmts


def write_jdbc(
    df,
    url: str,
    table: str,
    properties: Optional[Dict[str, str]] = None,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: Optional[int] = None,
):
    """Distributed JDBC write of a dimension table (entities / triples /
    generated 3NF rows).  ``num_partitions`` caps concurrent connections
    (JDBC servers melt under one-connection-per-core at cluster scale);
    ``batchsize`` batches inserts per round trip.

    repartition, NOT coalesce: coalesce propagates its narrow dependency
    upstream and would collapse the whole producing pipeline to
    ``num_partitions`` tasks; repartition pays one shuffle of only the
    final rows and leaves upstream parallelism intact."""
    props = dict(properties or {})
    props.setdefault("batchsize", str(batch_size))
    out = df.repartition(num_partitions) if num_partitions else df
    out.write.mode(mode).jdbc(url, table, properties=props)
    return out
