"""K1 — deterministic JSON-schema → 3NF relational DDL.

The reference asks an LLM to emit Postgres DDL honoring "the 3 forms of
normalization" and executes it with a retry loop
(extractor.py:304-387, CREATE_TABLES_PROMPT prompts.py:260-267,
db_client.py:25-67).  Deterministic stand-in:

- every top-level schema property (= entity, M4) becomes a table;
- scalar properties become typed columns;
- nested ``object`` properties become CHILD tables with a FK to the parent
  (1:1 decomposition — transitive dependencies split out, 3NF);
- ``array`` properties become child tables with a FK and, for scalar items,
  a single ``value`` column (repeating groups eliminated, 1NF);
- every table gets a synthetic ``<name>_id BIGINT`` primary key.

No retry loop is needed (generation is deterministic, SURVEY §3 EP3); the
sink wraps in ``CREATE TABLE IF NOT EXISTS`` so re-runs are idempotent.
Output dialect is Spark SQL (Iceberg ``USING`` clause optional); the same
table specs render to ANSI for the pytest oracle.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

_TYPE_MAP = {
    "string": "STRING",
    "integer": "BIGINT",
    "number": "DOUBLE",
    "boolean": "BOOLEAN",
    "null": "STRING",
}


def _sql_type(prop: Dict[str, Any]) -> str:
    if prop.get("format") == "date":
        return "DATE"
    t = prop.get("type")
    if isinstance(t, list):
        # JSON-schema union form ({"type": ["string", "null"]}) — common in
        # external schemas fed through merge_external_schemas; the first
        # non-null member decides the column type (SQL columns are nullable
        # anyway), instead of crashing the unhashable-list dict lookup
        t = next((x for x in t if x != "null"), "null")
    return _TYPE_MAP.get(t, "STRING")


# SQL reserved words an extracted property name can plausibly collide with
# (ANSI + Postgres + Spark).  A reserved identifier gets a trailing '_' —
# engine-agnostic, unlike quoting, whose syntax differs per dialect
# (backticks vs double quotes) and per Spark conf.
_RESERVED = frozenset({
    "all", "and", "any", "as", "asc", "between", "by", "case", "cast",
    "check", "column", "constraint", "create", "cross", "current", "default",
    "delete", "desc", "distinct", "drop", "else", "end", "except", "exists",
    "false", "fetch", "for", "foreign", "from", "full", "grant", "group",
    "having", "in", "inner", "insert", "intersect", "into", "is", "join",
    "left", "like", "limit", "not", "null", "of", "offset", "on", "or",
    "order", "outer", "primary", "references", "right", "select", "set",
    "some", "table", "then", "to", "true", "union", "unique", "update",
    "user", "using", "values", "when", "where", "window", "with",
})


def _ident(name: str) -> str:
    """Lower-snake identifier, deterministic.  Distinct raw names CAN map to
    the same identifier ('Foo-Bar' and 'foo_bar' → 'foo_bar'); collisions
    are resolved at emission time by :func:`_uniq`, which appends a short
    hash of the raw name — never silently, never order-dependent beyond the
    canonical schema order.  SQL reserved words ('order', 'user', 'from')
    get a trailing underscore so the rendered DDL parses in every target
    engine."""
    clean = re.sub(r"[^A-Za-z0-9_]", "_", name).lower()
    if not clean or clean[0].isdigit():
        clean = f"t_{clean}"
    if clean in _RESERVED:
        clean += "_"
    return clean


def _uniq(ident: str, raw: str, used: set) -> str:
    """Disambiguate ``ident`` against ``used`` (mutated): first occupant
    keeps the clean name; later raw names that sanitize to the same
    identifier get a deterministic suffix derived from the RAW name's hash,
    extended until free — so the result is stable across runs and input
    orderings of other keys, and a raw name that happens to equal another
    name's suffixed form still cannot yield two identical identifiers."""
    if ident not in used:
        used.add(ident)
        return ident
    h = hashlib.md5(raw.encode("utf-8")).hexdigest()
    take = 6
    suffixed = f"{ident}_{h[:take]}"
    while suffixed in used and take < len(h):
        take += 2
        suffixed = f"{ident}_{h[:take]}"
    used.add(suffixed)
    return suffixed


def _array_node(sub: Dict[str, Any]) -> Dict[str, Any]:
    """Normalize an array property to the object node its items table is
    built from: object items pass through; scalar (or missing) items become
    a single 'value' column."""
    items = sub.get("items") or {}
    if items.get("type") == "object" or "properties" in items:
        return items
    return {
        "type": "object",
        "properties": {"value": items or {"type": "string"}},
    }


@dataclass
class TableSpec:
    name: str
    columns: List[Tuple[str, str]]  # (column, sql type)
    primary_key: str
    foreign_key: Optional[Tuple[str, str]] = None  # (column, parent table)


def schema_to_tables(schema: Dict[str, Any]) -> List[TableSpec]:
    """Walk a draft-style JSON schema into 3NF table specs (stable order:
    parents before children, properties in schema order)."""
    props = schema.get("properties", schema) if isinstance(schema, dict) else {}
    tables: List[TableSpec] = []
    used_tables: set = set()

    def walk(tname: str, node: Dict[str, Any], parent: Optional[str]) -> None:
        pk = f"{tname}_id"
        cols: List[Tuple[str, str]] = [(pk, "BIGINT")]
        used_cols: set = {pk}
        fk = None
        if parent:
            fk_col = f"{parent}_id"
            cols.append((fk_col, "BIGINT"))
            used_cols.add(fk_col)
            fk = (fk_col, parent)
        children: List[Tuple[str, str, Dict[str, Any]]] = []  # (ident, raw, sub)
        for cname, sub in (node.get("properties") or {}).items():
            if not isinstance(sub, dict):
                cols.append((_uniq(_ident(cname), cname, used_cols), "STRING"))
                continue
            t = sub.get("type")
            if t == "object" or "properties" in sub:
                children.append((_ident(cname), cname, sub))
            elif t == "array":
                children.append((_ident(cname), cname, _array_node(sub)))
            else:
                cols.append((_uniq(_ident(cname), cname, used_cols), _sql_type(sub)))
        tables.append(TableSpec(tname, cols, pk, fk))
        for cident, craw, sub in children:
            walk(_uniq(f"{tname}_{cident}", craw, used_tables), sub, tname)

    for name, sub in props.items():
        if isinstance(sub, dict):
            # a TOP-LEVEL array property gets the same items-table treatment
            # as a nested one — walk() reads only node['properties'], so
            # passing the raw array node would silently drop its items and
            # emit a PK-only table
            node = _array_node(sub) if sub.get("type") == "array" else sub
            walk(_uniq(_ident(name), name, used_tables), node, None)
    return tables


def tables_to_ddl(
    tables: List[TableSpec],
    if_not_exists: bool = True,
    using: Optional[str] = None,
    with_constraints: bool = False,
) -> List[str]:
    """Render table specs to DDL strings.

    ``using='iceberg'`` appends the Spark ``USING iceberg`` clause for the
    cluster sink; ``with_constraints`` adds ANSI PRIMARY KEY / FOREIGN KEY
    clauses for engines that enforce them (Spark/Iceberg do not)."""
    out = []
    ine = "IF NOT EXISTS " if if_not_exists else ""
    for t in tables:
        lines = [f"  {c} {ty}" for c, ty in t.columns]
        if with_constraints:
            lines.append(f"  PRIMARY KEY ({t.primary_key})")
            if t.foreign_key:
                col, parent = t.foreign_key
                lines.append(
                    f"  FOREIGN KEY ({col}) REFERENCES {parent} ({parent}_id)"
                )
        ddl = f"CREATE TABLE {ine}{t.name} (\n" + ",\n".join(lines) + "\n)"
        if using:
            ddl += f" USING {using}"
        out.append(ddl)
    return out


def create_tables(spark, schema: Dict[str, Any], using: Optional[str] = None) -> List[str]:
    """EP3 sink: execute the generated DDL against the session catalog
    (idempotent — IF NOT EXISTS; no retry loop needed since generation is
    deterministic).  Returns the executed statements."""
    stmts = tables_to_ddl(schema_to_tables(schema), if_not_exists=True, using=using)
    for s in stmts:
        spark.sql(s)
    return stmts
