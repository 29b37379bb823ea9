"""sparkonto — PySpark-native knowledge-graph construction.

Top-level convenience mirroring the reference's ``from scrapontologies
import FileExtractor`` (scrapontologies/__init__.py): the facade imports
lazily so that importing the package costs nothing until used.
"""


def __getattr__(name):
    if name == "CorpusExtractor":
        from .api import CorpusExtractor

        return CorpusExtractor
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["CorpusExtractor"]
