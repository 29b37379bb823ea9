"""The reference's literal entry surface — FileExtractor(path) over files
on disk (extractor.py:78-90) — against a REAL directory tree: ingest it
with the distributed binaryFile scan (sources/files.py), then run the same
schema extraction / relation derivation / render flow as the other
examples.

Run:  python examples/extract_from_directory.py [directory]
(defaults to this repo's own scrapontologies_spark/ package — the engine
extracting the knowledge graph of its own source code.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapontologies_spark import CorpusExtractor
from scrapontologies_spark.session import build_session
from scrapontologies_spark.sources.files import corpus_from_files


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(here, "scrapontologies_spark")
    spark = build_session(app_name="example-ingest-directory")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = corpus_from_files(spark, root)
    print(f"ingested {corpus.count()} files from {root}")

    ex = CorpusExtractor(corpus)
    entities = ex.extract_entities_schema()
    relations = ex.extract_relations_schema()
    print(f"{len(entities)} entity kinds, {len(relations)} relation kinds")
    for r in relations[:10]:
        print(f"  {r.source} -[{r.name}]-> {r.target}")

    out = os.path.join(here, "examples", "directory_graph.html")
    ex.render(out)
    print(f"graph rendered to {out}")
    spark.stop()


if __name__ == "__main__":
    main()


