"""Filter rules — small callables kept as lambda declarators, the
round-5 wave-4 python shape."""

import re

MAX_TITLE = 120

is_urgent = lambda task: task.priority >= 8
normalize = lambda s: re.sub(r"\s+", " ", s).strip()[:MAX_TITLE]


class RuleSet:
    default_key = lambda self, task: (task.due, task.priority)

    def apply(self, tasks):
        return sorted((t for t in tasks if is_urgent(t)), key=self.default_key)


def combined(tasks):
    # nested def — a closure, not a method of RuleSet (wave-7 scoping)
    def dedupe(titles):
        seen = set()
        return [t for t in titles if not (t in seen or seen.add(t))]

    return dedupe(normalize(t.title) for t in RuleSet().apply(tasks))
