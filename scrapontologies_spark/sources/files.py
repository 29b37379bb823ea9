"""Real-file corpus ingestion — the reference's actual entry point.

``FileExtractor(file_path, parser)`` (extractor.py:78-90) is constructed on
a PATH and the parser reads the file from disk; this module is that
ingestion surface for a directory tree of source files, producing the
engine's corpus shape ``(repo, path, commit, lang, content)``
(BASELINE input_hint) as a DataFrame every downstream operator accepts.

Scale shape: Spark's ``binaryFile`` source lists and reads files inside
executors (a distributed scan with its own partitioning over file splits),
so a 10^8-file tree never materializes driver-side; the UTF-8 decode and
all column derivations are JVM expressions.  ``max_bytes`` fences the
corpus against stray blobs: a single multi-GB artifact would otherwise
dominate one task's memory (binaryFile reads whole files — correct for
documents, wrong for archives).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → gazetteer language id (code_gazetteer grammars + "text" prose
# fallback); unknown extensions ingest as plain text so the prose gazetteer
# still runs rather than dropping the file
EXT_LANG = {
    "py": "python",
    "js": "javascript",
    "go": "go",
    "java": "java",
    "md": "markdown",
    "markdown": "markdown",
    "txt": "text",
}

DEFAULT_GLOB = "*.{" + ",".join(sorted(EXT_LANG)) + "}"


def corpus_from_files(
    spark: SparkSession,
    root_dir: str,
    repo: Optional[str] = None,
    commit: str = "HEAD",
    path_glob: Optional[str] = None,
    max_bytes: int = 10 * 1024 * 1024,
) -> DataFrame:
    """Directory tree → corpus DataFrame (repo, path, commit, lang, content).

    - ``repo``: fixed repo id for every row; defaults to the tree's last
      path segment (the reference treats one FileExtractor = one source).
    - ``commit``: caller-provided revision label (no VCS probing — the
      engine is hermetic; pass the real SHA when the tree is a checkout).
    - ``path_glob``: binaryFile ``pathGlobFilter``; defaults to the
      extensions the gazetteer understands.
    - ``max_bytes``: files larger than this are EXCLUDED by the scan's
      length column (pushed before content reaches memory).

    Paths are made relative to ``root_dir``; content is decoded as UTF-8
    (invalid bytes become replacement characters — the deterministic analog
    of the reference's text extraction never failing a page).
    """
    root = root_dir.rstrip("/")
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob or DEFAULT_GLOB)
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    repo_col = F.lit(repo if repo is not None else root.rsplit("/", 1)[-1])
    # relative path: binaryFile yields absolute URIs (file:/...), so take
    # everything after the LAST occurrence of "<root's last segment>/"
    anchor = root.rsplit("/", 1)[-1] + "/"
    rel = F.substring_index(F.col("path"), anchor, -1)
    ext = F.lower(F.substring_index(F.col("path"), ".", -1))
    lang_map = F.create_map(
        *[F.lit(x) for kv in EXT_LANG.items() for x in kv]
    )
    return (
        raw.filter(F.col("length") <= max_bytes)
        .select(
            repo_col.alias("repo"),
            rel.alias("path"),
            F.lit(commit).alias("commit"),
            F.coalesce(lang_map[ext], F.lit("text")).alias("lang"),
            F.decode(F.col("content"), "UTF-8").alias("content"),
        )
    )
