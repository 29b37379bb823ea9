"""Real-file corpus ingestion (sources/files.py): a directory tree must
ingest into the exact corpus shape and feed the extraction pipeline
end-to-end — the reference's FileExtractor(path) entry surface."""

from __future__ import annotations

from scrapontologies_spark.sources.files import corpus_from_files


def _write_tree(tmp_path):
    root = tmp_path / "myrepo"
    (root / "pkg").mkdir(parents=True)
    (root / "pkg" / "mod.py").write_text(
        "import os\n\nclass Greeter:\n    def hello(self):\n        return os.name\n"
    )
    (root / "README.md").write_text("# myrepo\n\nquery the database index.\n")
    (root / "notes.txt").write_text("sort and merge the table rows")
    (root / "blob.bin").write_bytes(b"\x00" * 64)  # excluded by glob
    (root / "big.py").write_text("x = 1\n" * 200_000)  # excluded by max_bytes
    return str(root)


def test_corpus_from_files_shape_and_filters(spark, tmp_path):
    root = _write_tree(tmp_path)
    df = corpus_from_files(spark, root, commit="abc123", max_bytes=100_000)
    rows = {r.path: r for r in df.collect()}

    assert set(rows) == {"pkg/mod.py", "README.md", "notes.txt"}
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    assert all(r.repo == "myrepo" and r.commit == "abc123" for r in rows.values())
    assert rows["pkg/mod.py"].lang == "python"
    assert rows["README.md"].lang == "markdown"
    assert rows["notes.txt"].lang == "text"
    assert "class Greeter" in rows["pkg/mod.py"].content


def test_corpus_from_files_feeds_extraction(spark, tmp_path):
    from scrapontologies_spark.plans.pipeline import run_pipeline

    root = _write_tree(tmp_path)
    corpus = corpus_from_files(spark, root, max_bytes=100_000)
    res = run_pipeline(corpus, chunk_bytes=512, with_schemas=False)
    triples = {
        (r.subj, r.pred, r.obj) for r in res.triples.collect()
    }
    res.doc_rows.unpersist()
    # the python module yields class/method/import structure
    assert ("myrepo/pkg/mod.py", "defines", "myrepo/pkg/mod.py::Greeter") in triples
    assert (
        "myrepo/pkg/mod.py::Greeter",
        "has_method",
        "myrepo/pkg/mod.py::hello",
    ) in triples
    assert ("myrepo/pkg/mod.py", "imports", "lib::os") in triples
