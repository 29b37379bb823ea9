"""Task tracker core: stores, filters, and renders task records.

Note the word `def` and `class Fake:` appearing in this docstring — a
line-anchored grammar must not fire inside it unless the line starts at
column zero like real code would.
"""

import dataclasses
import json
from collections import defaultdict


@dataclasses.dataclass
class Task:
    title: str
    done: bool = False
    tags: tuple = ()

    def matches(self, query):
        q = query.lower()
        return q in self.title.lower() or any(q == t for t in self.tags)

    def to_json(self):
        return json.dumps(dataclasses.asdict(self))


class Tracker:
    """In-memory store with tag indexing."""

    def __init__(self):
        self._tasks = []
        self._by_tag = defaultdict(list)

    def add(self, task):
        self._tasks.append(task)
        for tag in task.tags:
            self._by_tag[tag].append(task)
        return len(self._tasks)

    def pending(self):
        return [t for t in self._tasks if not t.done]

    class Cursor:
        """Nested iteration state — an indented class (wave 7)."""

        def advance(self, step):
            self.pos = self.pos + step
            return self.pos


def load_tracker(path):
    tracker = Tracker()
    with open(path) as fh:
        for line in fh:
            record = json.loads(line)
            tracker.add(Task(**record))
    return tracker


def render_summary(tracker, out=print):
    pending = tracker.pending()
    out(f"{len(pending)} open tasks")
    for task in pending:
        out(" - " + task.title)
