"""Error types for the KQL-on-Spark engine.

The reference repo (yy-database/kql-engine) ships only an error scaffold
(ref:projects/kql-core/src/errors/mod.rs:1-24 — a single `UnknownError`
variant); its intended public surface is errors, so this module is the one
place our engine mirrors the reference's structure 1:1 while everything
else is Spark-first design (SURVEY.md §0).
"""

from __future__ import annotations


class KqlError(Exception):
    """Base error for all engine failures."""


class KqlSyntaxError(KqlError):
    """Lexer/parser failure. Carries source position for diagnostics."""

    def __init__(self, message: str, text: str = "", pos: int = 0):
        self.pos = pos
        if text:
            line = text.count("\n", 0, pos) + 1
            col = pos - (text.rfind("\n", 0, pos) + 1) + 1
            snippet = text[max(0, pos - 30) : pos + 30].replace("\n", " ")
            message = f"{message} (line {line}, col {col}) near: ...{snippet}..."
        super().__init__(message)


class KqlSemanticError(KqlError):
    """Analyzer failure: unknown column/table, illegal operator use
    (e.g. window function on a non-serialized table), bad types."""


class KqlUnsupportedError(KqlError):
    """Recognized KQL construct that this engine does not implement."""


class KqlLimitError(KqlError):
    """A documented engine resource limit was exceeded (e.g. streaming
    scan state size) — mirrors Kusto's query-limits failures, which abort
    the query rather than silently degrade."""


class KqlScaleWarning(UserWarning):
    """A documented scale assumption of an operator is being violated
    (e.g. a decontaminate benchmark side that is corpus-sized). Results
    are unchanged, but the plan will be far more expensive than the
    operator's contract implies — warned so the cost is visible instead
    of assumed read from a docstring (round 18)."""
