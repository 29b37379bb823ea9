"""A2/A3 — order-sensitive per-document fold, distributed.

The reference folds per-page dicts left-to-right with the NA-preferring
merge, seed {} (pdf_parser.py:708-721) — order-sensitive, therefore NOT a
commutative Spark aggregate (SURVEY §4).  Reproduction: group by document
key, sort rows by the stable byte-offset ``chunk_id`` *inside* the grouped
pandas UDF, then run the exact same pure fold the pytest oracle uses.

Scale notes: groups are per-file (small — bounded by file size / chunk
size), key cardinality is huge → applyInPandas shuffles once on (repo,path)
and parallelizes perfectly; the mega-repo skew in ``repo`` is harmless here
because ``path`` is in the key.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.semantics import canonical_json, combine_entities_data, is_na

DOC_ENTITIES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("entity_name", T.StringType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("attributes", T.StringType()),  # canonical JSON
    ]
)


def fold_documents(chunks: DataFrame) -> DataFrame:
    """chunk rows → one row per (document, top-level merged key).

    Implements A2 (fold in chunk order) + A3 (one Entity per top-level key,
    type='object' — pdf_parser.py:699-704) with the shared pure functions.
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_id")  # reproduces page order exactly
        merged = combine_entities_data([json.loads(p) for p in pdf["payload_json"]])
        repo = pdf["repo"].iloc[0]
        path = pdf["path"].iloc[0]
        rows = [
            (repo, path, name, "object", canonical_json(attrs))
            for name, attrs in merged.items()
            if not is_na(name)
        ]
        return pd.DataFrame(rows, columns=[f.name for f in DOC_ENTITIES_SCHEMA.fields])

    return chunks.select("repo", "path", "chunk_id", "payload_json").groupBy(
        "repo", "path"
    ).applyInPandas(fold, schema=DOC_ENTITIES_SCHEMA)
