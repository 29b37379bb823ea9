"""Corpus analog of the reference's
examples/generate_postgres_tables_from_pdf.py: derive 3NF tables from the
extracted ontology and execute the DDL.

The reference asks an LLM for Postgres DDL and runs it through
PostgresDBClient with a retry loop; here the DDL is generated
deterministically (no retry needed) and executed either against the Spark
session catalog (shown) or a real Postgres by passing the client's
``execute_query`` as ``db_execute`` to CorpusExtractor (jdbc_sink parity
path).  Table/column structure is identical either way; TYPE names are
engine-routed (this Spark-catalog run prints STRING/BIGINT, the Postgres
path prints TEXT/BIGINT — see operators/ddl.py and tests/test_ddl.py).

Run:  python examples/generate_postgres_tables_from_corpus.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapontologies_spark import CorpusExtractor
from scrapontologies_spark.session import build_session
from scrapontologies_spark.sources.corpus import corpus_df


def main() -> None:
    spark = build_session(app_name="example-ddl")
    spark.sparkContext.setLogLevel("ERROR")
    extractor = CorpusExtractor(corpus_df(spark, 200), chunk_bytes=1024)
    extractor.extract_entities_schema()

    # Spark-catalog sink (swap for db_execute=<psycopg2 cursor call> or the
    # ANSI statements from sources.jdbc_sink.postgres_ddl for Postgres)
    stmts = extractor.create_tables(spark=spark)
    for s in stmts:
        print(s + ";")
    spark.stop()


if __name__ == "__main__":
    main()
