"""`evaluate <plugin>(...)` dispatch (SURVEY.md §2.8, §2.12).

Registry contract: EVALUATE_REGISTRY[name](pipe_translator, df, args_ast)
-> DataFrame.
"""

from __future__ import annotations

EVALUATE_REGISTRY: dict[str, object] = {}


def plugin(*names):
    def deco(f):
        for n in names:
            EVALUATE_REGISTRY[n] = f
        return f

    return deco


from . import std  # noqa: E402,F401
from . import llm  # noqa: E402,F401
