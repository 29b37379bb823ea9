"""Corpus analog of the reference's
examples/extract_entities_relations_schema_from_pdf.py: build the entity
and relation schemas from a source-code corpus and render the
entity-relationship graph.

The reference wires FileExtractor(pdf, PDFParser(LLMClient(...))) and a
PyechartsRenderer; here the corpus replaces the PDF, the deterministic
gazetteer + distributed schema reduce replace the per-page LLM calls, and
the renderer emits a self-contained HTML document (pass
``backend='pyecharts'`` with pyecharts installed for the reference's exact
Graph object).

Run:  python examples/extract_entities_relations_schema_from_corpus.py [n_docs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapontologies_spark import CorpusExtractor
from scrapontologies_spark.session import build_session
from scrapontologies_spark.sources.corpus import corpus_df


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = build_session(app_name="example-extract")
    spark.sparkContext.setLogLevel("ERROR")

    extractor = CorpusExtractor(corpus_df(spark, n_docs), chunk_bytes=1024)

    entities_schema = extractor.extract_entities_schema()
    relations_schema = extractor.extract_relations_schema()
    print("Extracted entity classes:", [e.id for e in entities_schema])
    print("Containment relations:", [(r.source, r.name, r.target) for r in relations_schema][:10])

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "graph.html")
    extractor.render(output_path=out, title="Entity-Relationship Graph")
    print(f"Wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
