"""Resumable KG-construction job: the spark-submit entry point.

Stage DAG (each boundary = warehouse checkpoint + manifest + metrics row,
so a killed run resumes mid-pipeline with identical output — north_rule):

  corpus → chunks → {triples_raw, doc_entities, doc_schemas, global_schema}
         → entities (modules ∪ symbols, reconciled against any existing
           entities table — the MERGE INTO analog of J1/M6)
         → alias_labels (large-star/small-star CC over import-stem aliases)
         → triples (canonicalized + referential integrity)

Shuffle layout per BASELINE north_star: explicit repartition(repo, lang)
before the link stage; AQE + skew-join on (session.py); the deleted-ids /
alias dimension sides broadcast; the entity reconcile join runs salted when
``salt > 0`` is passed to :func:`run_job` (default 8 whenever an
``entities_prev`` table exists — the incremental-merge case where a
mega-repo's new entities can hash-skew the link join; ``salt=0`` forces
the plain full-outer path, and both paths are equivalence-tested).

Usage (cluster — spark-submit takes a primary .py FILE, not a module):
    spark-submit --py-files scrapontologies_spark.zip \
        scripts/run_job.py <warehouse_root> <n_rows>
Local:  python -m scrapontologies_spark.plans.job <warehouse_root> <n_rows>
"""

from __future__ import annotations

import sys
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.semantics import canonical_json
from ..operators.cc import (
    canonicalize_entities,
    canonicalize_triples,
    connected_components,
    module_alias_edges,
    prefer_real_canonical,
)
from ..operators.extract import (
    doc_entities_view,
    doc_schemas_view,
    extract_document_rows,
    module_entities_view,
    triples_view,
)
from ..operators.link import reconcile, referential_integrity
from ..operators.schema_merge import global_schema
from ..sources.io import StageInfo, Warehouse


def run_job(
    spark: SparkSession,
    corpus: DataFrame,
    warehouse_root: str,
    chunk_bytes: int = 1024,
    with_cc: bool = True,
    with_schemas: bool = True,
    fmt: str = "parquet",
    salt: Optional[int] = None,
    allowed_kinds=None,
    allowed_terms=None,
    scale=None,
) -> Dict[str, StageInfo]:
    """``salt``: skew factor for the entity reconcile join (None → default:
    8 when an entities_prev table is present, else unsalted; 0 → force
    plain full-outer).  See operators/link.reconcile.

    ``allowed_kinds``/``allowed_terms``: P8 extraction allowlist
    (user_prompt_for_filter stand-in) — restricts mention extraction, so
    every downstream stage reflects the filter.

    ``scale``: a profiles.ScaleProfile (or preset name, e.g. "corpus")
    filling ``salt`` when left at None — at corpus scale the reconcile
    join is always salted so a mega-repo key cannot pin one reducer.
    Physical knob only (salted == plain, equivalence-tested), so resume
    tokens are unaffected — flipping the profile never invalidates
    checkpoints."""
    from ..profiles import pick, resolve_profile

    salt = pick(salt, resolve_profile(scale).reconcile_salt)
    wh = Warehouse(warehouse_root, fmt)
    infos: Dict[str, StageInfo] = {}

    # Resume guard: each stage's token covers the parameters ITS output
    # depends on — no more (a whole-DAG token would re-run the mapInPandas
    # extraction, the 100 TB hot path, when only a downstream flag flips)
    # and no less (every upstream-affecting knob present).  salt is
    # deliberately excluded everywhere: it is a physical knob (salted ==
    # plain, equivalence-tested), and invalidating checkpoints over it
    # would force needless rebuilds.
    #
    # - cfg (extraction params): with_schemas changes the 'extracted' rows
    #   themselves (schema rows emitted or not), so it must sit here — a
    #   re-run with the flag flipped would otherwise serve a stale
    #   'extracted' and yield an empty global schema.
    # - ent_cfg adds the entities_prev state (rows + fingerprint from its
    #   marker): writing or replacing an entities_prev table between runs
    #   changes the reconcile's output, so it must invalidate 'entities'
    #   and everything downstream of it — with it excluded, an identical
    #   re-run after seeding entities_prev would silently skip the merge.
    # - cc_cfg adds with_cc, which changes only canonicalization and the
    #   final triples.
    cfg = {
        "chunk_bytes": chunk_bytes,
        "allowed_kinds": allowed_kinds,
        "allowed_terms": allowed_terms,
        "with_schemas": with_schemas,
    }
    prev_meta = wh._read_marker("entities_prev")
    ent_cfg = {
        **cfg,
        "entities_prev": None
        if prev_meta is None
        else {"rows": prev_meta["rows"], "fingerprint": prev_meta["fingerprint"]},
    }
    cc_cfg = {**ent_cfg, "with_cc": with_cc}

    # Fused one-pass extraction: chunk/fold/schema/triple rows from ONE
    # narrow mapInPandas over the scan (operators/extract.py) — the 100 TB
    # hot path has zero shuffles; the warehouse write is the only wide cost
    # and doubles as the resume checkpoint.
    extracted, infos["extracted"] = wh.run_stage(
        spark,
        "extracted",
        lambda: extract_document_rows(
            corpus, chunk_bytes, with_schemas,
            allowed_kinds=allowed_kinds, allowed_terms=allowed_terms,
        ),
        config=cfg,
    )

    triples_raw, infos["triples_raw"] = wh.run_stage(
        spark, "triples_raw", lambda: triples_view(extracted), config=cfg
    )

    doc_entities, infos["doc_entities"] = wh.run_stage(
        spark, "doc_entities", lambda: doc_entities_view(extracted), config=cfg
    )

    def build_entities() -> DataFrame:
        symbols = doc_entities.select(
            F.concat(
                F.concat_ws("/", "repo", "path"), F.lit("::"), F.col("entity_name")
            ).alias("id"),
            F.col("entity_type").alias("type"),
            F.col("attributes"),
        )
        # explicit repartition(repo, lang) ahead of the link stage
        # (north_star) — co-locates a repo's symbols for reconcile/CC
        new = (
            module_entities_view(extracted.repartition("repo", "lang"))
            .select("id", "type", "attributes")
            .unionByName(symbols)
        )
        # MERGE-INTO analog: reconcile against a previous run's entities
        # table when present (J1 full-outer + A1 attribute merge), salted
        # per the north_star skew mandate unless explicitly disabled
        if wh.is_complete("entities_prev"):
            existing = wh.read_stage(spark, "entities_prev")
            return reconcile(existing, new, salt=8 if salt is None else salt)
        return new

    entities, infos["entities"] = wh.run_stage(
        spark, "entities", build_entities, config=ent_cfg
    )

    if with_cc:
        labels, infos["alias_labels"] = wh.run_stage(
            spark,
            "alias_labels",
            lambda: prefer_real_canonical(
                connected_components(module_alias_edges(entities))
            ),
            config=cc_cfg,
        )
        triples_canon = canonicalize_triples(triples_raw, labels)
        entities_final, infos["entities_canonical"] = wh.run_stage(
            spark,
            "entities_canonical",
            lambda: canonicalize_entities(entities, labels),
            config=cc_cfg,
        )
    else:
        triples_canon = triples_raw
        entities_final = entities

    triples, infos["triples"] = wh.run_stage(
        spark,
        "triples",
        lambda: referential_integrity(triples_canon, entities_final),
        config=cc_cfg,
    )

    if with_schemas:
        doc_schemas, infos["doc_schemas"] = wh.run_stage(
            spark, "doc_schemas", lambda: doc_schemas_view(extracted), config=cfg
        )

        def build_global() -> DataFrame:
            g = global_schema(doc_schemas)
            return spark.createDataFrame(
                [("global", canonical_json(g))], "scope string, schema_json string"
            )

        gdf, infos["global_schema"] = wh.run_stage(spark, "global_schema", build_global, config=cfg)

        # M5(a) — containment triples from the global ontology (the Digraph
        # exemplar, prompts.py:1-38; rendered arrows pyecharts_renderer.py:
        # 65-67): ROOT → top-level entity → nested-object attribute.  The
        # global schema is ONE tiny row, so derivation is driver-side.
        def build_containment() -> DataFrame:
            import json as _json

            from ..functions.semantics import (
                derive_containment_relations,
                schema_to_entities,
            )

            gjson = gdf.collect()[0]["schema_json"]
            rels = derive_containment_relations(
                schema_to_entities(_json.loads(gjson) if gjson else {})
            )
            return spark.createDataFrame(
                [(r.source, r.name, r.target, r.type) for r in rels],
                "subj string, pred string, obj string, rel_type string",
            )

        _, infos["containment_triples"] = wh.run_stage(
            spark, "containment_triples", build_containment, config=cfg
        )

    return infos


def _arg_parser() -> "argparse.ArgumentParser":
    import argparse

    ap = argparse.ArgumentParser(
        prog="job",
        description="Run the staged KG-construction job over a synthetic corpus.",
        allow_abbrev=False,
    )
    ap.add_argument("warehouse_root", nargs="?", default="/tmp/sparkonto_warehouse")
    ap.add_argument("n_rows", nargs="?", type=int, default=5_000)
    ap.add_argument(
        "--corpus", default=None, metavar="PARQUET_PATH",
        help="read the corpus from this parquet path (input_hint shape: "
        "repo, path, commit, lang, content) instead of generating the "
        "synthetic corpus; n_rows is ignored",
    )
    ap.add_argument(
        "--salt", type=int, default=None,
        help="skew factor for the entity reconcile join (0 = force unsalted)",
    )
    ap.add_argument(
        "--allowed-kinds", default=None,
        help="comma-separated entity kinds to keep (P8 extraction filter)",
    )
    ap.add_argument(
        "--allowed-terms", default=None,
        help="comma-separated entity ids to keep (P8 extraction filter)",
    )
    return ap


def main(argv: Optional[list] = None) -> None:
    # argparse rejects unknown --flags and flags missing their value with a
    # usage error, instead of silently routing a typo into warehouse_root
    args = _arg_parser().parse_args(argv if argv is not None else sys.argv[1:])
    salt = args.salt
    allowed_kinds = (
        frozenset(args.allowed_kinds.split(",")) if args.allowed_kinds else None
    )
    allowed_terms = (
        frozenset(args.allowed_terms.split(",")) if args.allowed_terms else None
    )
    warehouse_root = args.warehouse_root
    n_rows = args.n_rows
    from ..session import build_session
    from ..sources.corpus import corpus_df

    spark = build_session(app_name="kg-job")
    corpus = (
        spark.read.parquet(args.corpus)
        if args.corpus
        else corpus_df(spark, n_rows)
    )
    infos = run_job(
        spark, corpus, warehouse_root,
        salt=salt, allowed_kinds=allowed_kinds, allowed_terms=allowed_terms,
    )
    for name, info in infos.items():
        print(
            f"{name}: rows={info.rows} wall_ms={info.wall_ms} "
            f"skipped={info.skipped} fp={info.fingerprint}"
        )


if __name__ == "__main__":
    main()
