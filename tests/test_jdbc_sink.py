"""K1 optional JDBC parity sink: DDL-through-injected-client (the
PostgresDBClient.execute_query surface, db_client.py:25-67) and the
df.write.jdbc call shape."""

from __future__ import annotations

from scrapontologies_spark.sources.jdbc_sink import (
    create_tables_via,
    postgres_ddl,
    write_jdbc,
)
from tests.test_ddl import PAYSLIP_SCHEMA


def test_postgres_ddl_has_constraints_and_idempotence():
    stmts = postgres_ddl(PAYSLIP_SCHEMA)
    assert len(stmts) == 4
    assert all(s.startswith("CREATE TABLE IF NOT EXISTS ") for s in stmts)
    assert any("PRIMARY KEY (payslip_id)" in s for s in stmts)
    assert any(
        "FOREIGN KEY (payslip_id) REFERENCES payslip (payslip_id)" in s
        for s in stmts
    )
    # deterministic — same schema, same statements
    assert stmts == postgres_ddl(PAYSLIP_SCHEMA)


def test_create_tables_via_injected_client():
    executed = []
    out = create_tables_via(executed.append, PAYSLIP_SCHEMA)
    assert executed == out == postgres_ddl(PAYSLIP_SCHEMA)


def test_write_jdbc_call_shape():
    """No JDBC driver in the container — inject a recording df stand-in and
    assert the write goes through mode→jdbc with batchsize + partition cap."""
    calls = {}

    class FakeWriter:
        def mode(self, m):
            calls["mode"] = m
            return self

        def jdbc(self, url, table, properties=None):
            calls["jdbc"] = (url, table, properties)

    class FakeDF:
        write = FakeWriter()

        def repartition(self, n):
            # repartition, not coalesce: coalesce would collapse the whole
            # upstream pipeline to n tasks, not just the write stage
            calls["repartition"] = n
            return self

    write_jdbc(
        FakeDF(), "jdbc:postgresql://h/db", "entities",
        properties={"user": "u"}, mode="overwrite", num_partitions=8,
    )
    assert calls["repartition"] == 8
    assert calls["mode"] == "overwrite"
    url, table, props = calls["jdbc"]
    assert (url, table) == ("jdbc:postgresql://h/db", "entities")
    assert props == {"user": "u", "batchsize": "10000"}
