"""CorpusExtractor facade parity: the reference's FileExtractor flow
(extractor.py:78-389; examples/extract_entities_relations_schema_from_pdf.py,
examples/prompt_based_extraction.py) must run unchanged against the
distributed engine — extract → relations → merge → delete → DDL → render."""

from __future__ import annotations

from scrapontologies_spark.api import CorpusExtractor, _parse_prompt
from scrapontologies_spark.functions.code_gazetteer import document_schema
from scrapontologies_spark.functions.semantics import schema_union_all
from scrapontologies_spark.sources.corpus import corpus_df, corpus_rows

CHUNK = 512
N = 30


def test_extract_entities_and_relations_schema(spark):
    ex = CorpusExtractor(corpus_df(spark, N), chunk_bytes=CHUNK)
    ents = ex.extract_entities_schema()
    assert ents and all(e.type == "object" for e in ents)
    # distributed global schema == sequential per-document union oracle
    expected = schema_union_all(
        document_schema(lang, content, CHUNK)
        for _, _, _, lang, content in corpus_rows(N)
    )
    assert ex.get_json_schema() == expected
    assert {e.id for e in ents} == set(expected["properties"])

    rels = ex.extract_relations_schema()
    assert rels is ex.get_relations_schema()
    assert {r.target for r in rels if r.source == "ROOT"} == {e.id for e in ents}
    assert all(r.type == "containment" for r in rels)


def test_prompt_allowlist_restricts_schema(spark):
    ex = CorpusExtractor(corpus_df(spark, N), chunk_bytes=CHUNK)
    ents = ex.extract_entities_schema(prompt="only import declarations")
    assert {e.id for e in ents} == {"import"}
    assert _parse_prompt("only import declarations")[0] == frozenset({"import"})


def test_merge_schemas_then_delete(spark):
    ex = CorpusExtractor(corpus_df(spark, N), chunk_bytes=CHUNK)
    ex.extract_entities_schema()
    ex.extract_relations_schema()
    n0 = len(ex.get_entities_schema())

    external = {
        "type": "object",
        "properties": {
            "custom_thing": {
                "type": "object",
                "properties": {"x": {"type": "string"}},
            }
        },
    }
    merged = ex.merge_schemas(external)
    assert "custom_thing" in merged["properties"]
    assert len(ex.get_entities_schema()) == n0 + 1
    assert any(
        r.source == "ROOT" and r.target == "custom_thing"
        for r in ex.get_relations_schema()
    )

    # C3 route + C1 cascade, the reference's delete flow
    ex.delete_entity_or_relation("please remove custom_thing from the graph")
    assert all(e.id != "custom_thing" for e in ex.get_entities_schema())
    assert all(
        "custom_thing" not in (r.source, r.target)
        for r in ex.get_relations_schema()
    )
    # deleting a relation by describing its (source, target, name)
    rel = ex.get_relations_schema()[0]
    ex.delete_entity_or_relation(
        f"drop the relation {rel.name} from {rel.source} to {rel.target}"
    )
    assert all(
        not (r.source == rel.source and r.target == rel.target and r.name == rel.name)
        for r in ex.get_relations_schema()
    )


def test_extract_entities_instances(spark):
    """extract_entities returns the distributed per-document instance
    table (A2/A3), consistent with the sequential fold oracle on a spot
    check."""
    from scrapontologies_spark.functions.code_gazetteer import document_payload
    from scrapontologies_spark.functions.semantics import is_na

    ex = CorpusExtractor(corpus_df(spark, 10), chunk_bytes=CHUNK)
    rows = ex.extract_entities().collect()
    assert rows
    repo, path, _, lang, content = corpus_rows(10)[0]
    expected = {
        k for k in document_payload(lang, content, CHUNK) if not is_na(k)
    }
    got = {r.entity_name for r in rows if (r.repo, r.path) == (repo, path)}
    assert got == expected


def test_merge_schemas_requires_prior_extraction(spark):
    ex = CorpusExtractor(corpus_df(spark, N), chunk_bytes=CHUNK)
    assert ex.merge_schemas({"properties": {}}) is None  # extractor.py:236-238


def test_create_tables_via_injected_client_and_render(spark):
    import pytest

    ex = CorpusExtractor(corpus_df(spark, N), chunk_bytes=CHUNK)
    with pytest.raises(ValueError):
        ex.create_tables()  # no sink configured — extractor.py:309-311
    ex.extract_entities_schema()
    ex.extract_relations_schema()
    executed = []
    ex.db_execute = executed.append
    stmts = ex.create_tables()
    assert executed == stmts and stmts
    assert all(s.startswith("CREATE TABLE IF NOT EXISTS") for s in stmts)

    html = ex.render(title="G")
    first = ex.get_entities_schema()[0].id
    assert first in html and "<title>G</title>" in html


def test_prompt_combining_kind_and_term_keeps_named_terms(spark):
    """'function join' must keep the named term reachable: the kinds
    filter runs before the terms filter, so 'term' joins allowed_kinds
    whenever vocabulary terms are present.  Filler words constrain
    nothing."""
    from scrapontologies_spark.api import _parse_prompt

    kinds, terms = _parse_prompt("function join")
    assert "term" in kinds and "function" in kinds
    assert terms == frozenset({"join"})
    assert _parse_prompt("function") == (frozenset({"function"}), None)
    assert _parse_prompt("scan join") == (None, frozenset({"scan", "join"}))
    assert _parse_prompt("only import declarations") == (
        frozenset({"import"}), None
    )


def test_relations_prompt_reextracts_on_warm_state(spark):
    """A filtered relation request after an unfiltered extraction must not
    reuse the stale entity set."""
    ex = CorpusExtractor(corpus_df(spark, N), chunk_bytes=CHUNK)
    ex.extract_entities_schema()
    all_rels = set((r.source, r.name, r.target) for r in ex.extract_relations_schema())
    filtered = set(
        (r.source, r.name, r.target)
        for r in ex.extract_relations_schema(prompt="import")
    )
    # non-empty FIRST: an empty filtered set would satisfy every assertion
    # below vacuously (strict subset, all() over empty, <= {...})
    assert filtered
    assert filtered < all_rels
    assert all(t == "import" or s == "ROOT" for s, _, t in filtered)
    # entity state now reflects the filter too
    ids = {e.id for e in ex.get_entities_schema()}
    assert ids and ids <= {"import"}


def test_delete_relation_with_apostrophe_id(spark):
    """Relation keys containing apostrophes survive the str(tuple) round
    trip (literal_eval, not a quote-matching regex)."""
    from scrapontologies_spark.functions.semantics import Relation

    ex = CorpusExtractor(corpus_df(spark, N), chunk_bytes=CHUNK)
    ex._relations = [
        Relation(id="r1", source="a'b", target="c", name="knows"),
        Relation(id="r2", source="x", target="y", name="likes"),
    ]
    ex._entities = []
    ex.delete_entity_or_relation(str(("a'b", "c", "knows")))
    assert [(r.source, r.target, r.name) for r in ex._relations] == [("x", "y", "likes")]


def test_delete_keeps_json_schema_stale_like_reference(spark, caplog):
    """Reference-faithful quirk (extractor.py:150-160): deletes update the
    entity/relation lists ONLY — the stored JSON schema is untouched, so
    get_json_schema still contains the deleted entity.  Pinned so a future
    'fix' is a deliberate, documented divergence."""
    import copy
    import logging

    ex = CorpusExtractor(corpus_df(spark, N), chunk_bytes=CHUNK)
    ex.extract_entities_schema()
    # deep copy: get_json_schema returns the live dict, and an aliased
    # snapshot could not detect an in-place mutation
    schema_before = copy.deepcopy(ex.get_json_schema())
    target = next(iter(schema_before["properties"]))  # loud on malformed

    ex.delete_entity_or_relation(f"remove the {target} entity")
    assert all(e.id != target for e in ex.get_entities_schema())
    assert ex.get_json_schema() == schema_before  # stale by design

    # unroutable description: LOGGED no-op (reference logger.error), state
    # unchanged, no exception
    ents = list(ex.get_entities_schema())
    with caplog.at_level(logging.ERROR, logger="scrapontologies_spark.api"):
        ex.delete_entity_or_relation("remove the zz_nonexistent_zz node")
    assert ex.get_entities_schema() == ents
    assert any("nothing deleted" in r.message for r in caplog.records)
