"""Corpus analog of the reference's examples/merge_schemas.py: extract the
corpus ontology, merge an externally supplied JSON schema into it (M3
union replacing the UPDATE_SCHEMA_PROMPT round-trip), and show the
re-derived entities.

Run:  python examples/merge_schemas.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapontologies_spark import CorpusExtractor
from scrapontologies_spark.session import build_session
from scrapontologies_spark.sources.corpus import corpus_df

HARDCODED_SCHEMA = {
    "title": "Fund",
    "type": "object",
    "properties": {
        "costCategory": {
            "type": "object",
            "properties": {
                "costFlag": {"type": "string"},
                "costAmount": {"type": "number"},
            },
        }
    },
}


def main() -> None:
    spark = build_session(app_name="example-merge")
    spark.sparkContext.setLogLevel("ERROR")
    extractor = CorpusExtractor(corpus_df(spark, 200), chunk_bytes=1024)

    entities = extractor.extract_entities_schema()
    print("Extracted entities:", [e.id for e in entities])

    merged = extractor.merge_schemas(HARDCODED_SCHEMA)
    print("Merged schema top-level properties:", sorted(merged["properties"]))
    print("Entities after merge:", [e.id for e in extractor.get_entities_schema()])
    spark.stop()


if __name__ == "__main__":
    main()
