"""Corpus analog of the reference's examples/prompt_based_extraction.py:
restrict extraction with a free-text prompt.

The reference threads the prompt into every extraction LLM call
(user_prompt_for_filter); the deterministic stand-in parses the prompt
into the P8 allowlist — kind-named tokens restrict mention kinds, other
tokens restrict the prose gazetteer terms.

Run:  python examples/prompt_based_extraction.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapontologies_spark import CorpusExtractor
from scrapontologies_spark.session import build_session
from scrapontologies_spark.sources.corpus import corpus_df


def main() -> None:
    spark = build_session(app_name="example-prompt")
    spark.sparkContext.setLogLevel("ERROR")
    extractor = CorpusExtractor(corpus_df(spark, 200), chunk_bytes=1024)

    custom_prompt = "Insert in the schema only import and class declarations."
    entities = extractor.extract_entities_schema(prompt=custom_prompt)
    print("Extracted entities:", [e.id for e in entities])
    spark.stop()


if __name__ == "__main__":
    main()
