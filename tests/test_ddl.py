"""K1 — deterministic JSON-schema → 3NF DDL generator (SURVEY §2.7 K1,
§3 EP3).  The fixture is the reference's own JSON_SCHEMA_PROMPT exemplar
(prompts.py:43-155, the Payslip schema): the LLM-mediated CREATE_TABLES
step (extractor.py:304-387) demanded "the 3 forms of normalization"; the
stand-in must decompose nested objects and arrays into child tables with
FKs and map scalar types deterministically."""

from __future__ import annotations

from scrapontologies_spark.operators.ddl import (
    schema_to_tables,
    tables_to_ddl,
)

PAYSLIP_SCHEMA = {
    "$schema": "http://json-schema.org/schema#",
    "title": "Payslip",
    "type": "object",
    "properties": {
        "payslip": {
            "type": "object",
            "properties": {
                "employee": {
                    "type": "object",
                    "properties": {
                        "name": {"type": "string"},
                        "qualification": {"type": "string"},
                        "position": {"type": "string"},
                    },
                },
                "work_details": {
                    "type": "object",
                    "properties": {
                        "worked_hours": {"type": "integer"},
                        "holiday_hours": {"type": "integer"},
                        "worked_days": {"type": "integer"},
                    },
                },
                "base_pay": {"type": "number"},
                "deductions": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "properties": {
                            "description": {"type": "string"},
                            "percentage": {"type": "number"},
                        },
                    },
                },
                "net_income": {"type": "number"},
            },
        }
    },
}


def test_payslip_decomposes_to_3nf_tables():
    tables = schema_to_tables(PAYSLIP_SCHEMA)
    by_name = {t.name: t for t in tables}
    # parent + two nested objects + one array-of-object child
    assert set(by_name) == {
        "payslip",
        "payslip_employee",
        "payslip_work_details",
        "payslip_deductions",
    }
    parent = by_name["payslip"]
    assert parent.primary_key == "payslip_id"
    assert parent.foreign_key is None
    # scalars stay on the parent; nested structures do NOT
    cols = dict(parent.columns)
    assert cols["base_pay"] == "DOUBLE"
    assert cols["net_income"] == "DOUBLE"
    assert "employee" not in cols and "deductions" not in cols

    emp = by_name["payslip_employee"]
    assert emp.foreign_key == ("payslip_id", "payslip")
    assert dict(emp.columns)["name"] == "STRING"

    wd = by_name["payslip_work_details"]
    assert dict(wd.columns)["worked_hours"] == "BIGINT"

    ded = by_name["payslip_deductions"]
    assert ded.foreign_key == ("payslip_id", "payslip")
    assert dict(ded.columns)["percentage"] == "DOUBLE"


def test_array_of_scalars_gets_value_child_table():
    schema = {
        "properties": {
            "doc": {
                "type": "object",
                "properties": {
                    "tags": {"type": "array", "items": {"type": "string"}},
                    "title": {"type": "string"},
                },
            }
        }
    }
    tables = {t.name: t for t in schema_to_tables(schema)}
    assert set(tables) == {"doc", "doc_tags"}
    assert dict(tables["doc_tags"].columns)["value"] == "STRING"
    assert tables["doc_tags"].foreign_key == ("doc_id", "doc")


def test_ddl_rendering_idempotent_and_dialects():
    tables = schema_to_tables(PAYSLIP_SCHEMA)
    ddl = tables_to_ddl(tables, if_not_exists=True, using="iceberg")
    assert all(s.startswith("CREATE TABLE IF NOT EXISTS ") for s in ddl)
    assert all(s.endswith(" USING iceberg") for s in ddl)
    ansi = tables_to_ddl(tables, if_not_exists=False, with_constraints=True)
    assert any("FOREIGN KEY (payslip_id) REFERENCES payslip" in s for s in ansi)
    # deterministic: same input → same output
    assert ddl == tables_to_ddl(schema_to_tables(PAYSLIP_SCHEMA), using="iceberg")


def test_date_format_maps_to_date_type():
    schema = {
        "properties": {
            "invoice": {
                "type": "object",
                "properties": {"issued": {"type": "string", "format": "date"}},
            }
        }
    }
    (t,) = schema_to_tables(schema)
    assert dict(t.columns)["issued"] == "DATE"


def test_colliding_sanitized_names_stay_distinct():
    """'Foo-Bar' and 'foo_bar' both sanitize to 'foo_bar'; the second must
    get a deterministic hash suffix instead of silently shadowing the first
    (CREATE TABLE IF NOT EXISTS would drop its columns)."""
    schema = {
        "properties": {
            "Foo-Bar": {"type": "object", "properties": {"a": {"type": "string"}}},
            "foo_bar": {"type": "object", "properties": {"b": {"type": "integer"}}},
        }
    }
    tables = schema_to_tables(schema)
    names = [t.name for t in tables]
    assert len(names) == len(set(names)) == 2
    assert "foo_bar" in names
    other = next(n for n in names if n != "foo_bar")
    assert other.startswith("foo_bar_") and len(other) == len("foo_bar_") + 6
    # deterministic across runs
    assert [t.name for t in schema_to_tables(schema)] == names

    # colliding COLUMN names within one table disambiguate the same way
    schema2 = {
        "properties": {
            "doc": {
                "type": "object",
                "properties": {
                    "My-Field": {"type": "string"},
                    "my_field": {"type": "integer"},
                },
            }
        }
    }
    (t,) = schema_to_tables(schema2)
    colnames = [c for c, _ in t.columns]
    assert len(colnames) == len(set(colnames)) == 3  # pk + 2 distinct


def test_spark_create_tables_executes(spark, tmp_path):
    """EP3 sink parity: the generated DDL is valid Spark SQL and re-running
    it is idempotent (IF NOT EXISTS — no retry loop needed)."""
    import uuid

    from scrapontologies_spark.operators.ddl import create_tables

    db = f"ddl_test_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    spark.catalog.setCurrentDatabase(db)
    try:
        stmts = create_tables(spark, PAYSLIP_SCHEMA)
        assert len(stmts) == 4
        tables = {t.name for t in spark.catalog.listTables(db)}
        assert "payslip" in tables and "payslip_deductions" in tables
        # idempotent rerun
        create_tables(spark, PAYSLIP_SCHEMA)
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_sql_type_handles_union_types():
    """JSON-schema nullable unions ({'type': ['string','null']}) map to the
    first non-null member instead of crashing the dict lookup."""
    from scrapontologies_spark.operators.ddl import schema_to_tables

    schema = {
        "properties": {
            "e": {
                "type": "object",
                "properties": {
                    "x": {"type": ["string", "null"]},
                    "y": {"type": ["null", "integer"]},
                    "z": {"type": ["null"]},
                },
            }
        }
    }
    tables = schema_to_tables(schema)
    cols = {c: ty for t in tables for c, ty in t.columns}
    assert cols["x"] == "STRING" and cols["y"] == "BIGINT" and cols["z"] == "STRING"


def test_top_level_array_property_keeps_items():
    """A top-level {'type':'array'} property must get the same items-table
    treatment as a nested one — not a PK-only table with its items
    silently dropped."""
    tables = {t.name: t for t in schema_to_tables(
        {"properties": {
            "tags": {"type": "array", "items": {"type": "string"}},
            "people": {"type": "array", "items": {
                "type": "object",
                "properties": {"name": {"type": "string"}},
            }},
        }}
    )}
    assert [c for c, _ in tables["tags"].columns if c == "value"] == ["value"]
    assert ("name", "STRING") in tables["people"].columns


def test_reserved_word_identifiers_are_suffixed():
    """Property names that are SQL reserved words ('order', 'user', 'from')
    must not render unexecutable DDL — they get a trailing underscore."""
    tables = schema_to_tables(
        {"properties": {"order": {"type": "object", "properties": {
            "from": {"type": "string"}, "user": {"type": "integer"},
        }}}}
    )
    (t,) = tables
    assert t.name == "order_"
    cols = dict(t.columns)
    assert "from_" in cols and "user_" in cols
    ddl = tables_to_ddl(tables)[0]
    assert " order " not in ddl and "order_ " in ddl


def test_postgres_ddl_uses_postgres_types():
    """The psycopg2 path must emit TEXT / DOUBLE PRECISION — Postgres has
    no STRING type and bare DOUBLE is a syntax error."""
    from scrapontologies_spark.sources.jdbc_sink import postgres_ddl

    stmts = postgres_ddl({"properties": {"payslip": {
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "amount": {"type": "number"},
                       "n": {"type": "integer"}},
    }}})
    joined = "\n".join(stmts)
    assert "TEXT" in joined and "DOUBLE PRECISION" in joined
    assert " STRING" not in joined
    assert "BIGINT" in joined


def test_uniq_suffix_collision_extends_hash():
    """A raw name equal to another name's suffixed form must not yield two
    identical identifiers — the suffix extends until free."""
    from scrapontologies_spark.operators.ddl import _ident, _uniq

    import hashlib

    used: set = set()
    first = _uniq(_ident("Foo"), "Foo", used)
    second = _uniq(_ident("foo"), "foo", used)          # foo_<h6>
    # pre-occupy the clash raw's OWN 6-char suffixed slot: md5('FOO') !=
    # md5('foo'), so without this the while-loop extension branch never
    # runs and deleting it entirely would still pass the 3-distinct check
    clash_raw = "FOO"
    h = hashlib.md5(clash_raw.encode("utf-8")).hexdigest()
    used.add(f"foo_{h[:6]}")
    clash = _uniq(_ident(clash_raw), clash_raw, used)
    assert clash == f"foo_{h[:8]}"  # extended by 2 hex chars until free
    assert len({first, second, clash}) == 3
