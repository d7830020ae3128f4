"""KQL lexer.

Tokenizes the public Kusto Query Language surface (SURVEY.md §2; semantics
cited [KQL] = learn.microsoft.com/azure/data-explorer/kusto/query). The
reference repo contains no lexer (SURVEY.md §0) — this is a from-scratch
hand-rolled scanner (no third-party parser generator in the environment).

Design notes:
- KQL keywords are *contextual*: ``project`` is an operator head but a legal
  column name elsewhere. The lexer therefore emits generic IDENT tokens and
  the parser decides by position.
- Timespan literals (``1d``, ``90m``, ``1.5h``, ``100ms``) are a single
  token: a number immediately followed by a unit suffix.
- ``!contains`` / ``!has`` etc. are single negated-word operator tokens.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .errors import KqlSyntaxError

# token kinds
IDENT = "IDENT"
QIDENT = "QIDENT"  # ['quoted identifier']
INT = "INT"
REAL = "REAL"
STRING = "STRING"
TIMESPAN = "TIMESPAN"
OP = "OP"  # punctuation / operators
EOF = "EOF"

# timespan unit -> seconds multiplier (KQL: d h m s ms microsecond tick)
_TS_UNITS = {
    "d": 86400.0,
    "day": 86400.0,
    "days": 86400.0,
    "h": 3600.0,
    "hr": 3600.0,
    "hrs": 3600.0,
    "hour": 3600.0,
    "hours": 3600.0,
    "m": 60.0,
    "min": 60.0,
    "minute": 60.0,
    "minutes": 60.0,
    "s": 1.0,
    "sec": 1.0,
    "second": 1.0,
    "seconds": 1.0,
    "ms": 1e-3,
    "milli": 1e-3,
    "millis": 1e-3,
    "millisec": 1e-3,
    "millisecond": 1e-3,
    "milliseconds": 1e-3,
    "microsecond": 1e-6,
    "microseconds": 1e-6,
    "tick": 1e-7,
    "ticks": 1e-7,
}

_TS_RE = re.compile(
    r"(\d+(?:\.\d+)?)(" + "|".join(sorted(_TS_UNITS, key=len, reverse=True)) + r")\b"
)
_NUM_RE = re.compile(
    r"0[xX][0-9a-fA-F]+|\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+[eE][+-]?\d+|\d+"
)
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# content may not contain an unescaped quote of its own kind: otherwise
# `['x', 'y']` (datatable row of two strings) mis-lexes as one identifier
_QIDENT_RE = re.compile(
    r"\[\s*'((?:[^'\\]|\\.)*?)'\s*\]|\[\s*\"((?:[^\"\\]|\\.)*?)\"\s*\]"
)
_QIDENT_ESC_RE = re.compile(r"\\u([0-9a-fA-F]{4})|\\(.)")
_WS_RE = re.compile(r"[ \t\r\n]+")
_COMMENT_RE = re.compile(r"//[^\n]*")
_BANGWORD_RE = re.compile(r"![a-z_]+~?")

# multi-char punctuation, longest first
_PUNCT = [
    "==", "!=", "<=", ">=", "=~", "!~", "<>", "..", "::", ":=", "=>",
    "|", "(", ")", "[", "]", "{", "}", ",", ";", ":", "=", "<", ">",
    "+", "-", "*", "/", "%", ".", "!", "@", "$", "?", "~",
]

_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"',
    "0": "\0", "a": "\a", "b": "\b", "f": "\f", "v": "\v",
}


@dataclass
class Token:
    kind: str
    value: object  # str for IDENT/OP/STRING, int/float for numbers, float seconds for TIMESPAN
    pos: int  # char offset of token start
    end: int  # char offset one past token end

    def __repr__(self) -> str:  # compact for debugging
        return f"{self.kind}({self.value!r})"


def _scan_string(text: str, i: int) -> tuple[str, int]:
    """Scan a KQL string literal starting at i. Supports "...", '...',
    verbatim @"..." / @'...' (quote doubling, no escapes), and
    h-prefixed obfuscated strings (h"...")."""
    start = i
    verbatim = False
    if text[i] in "@h" and i + 1 < len(text) and text[i + 1] in "\"'":
        verbatim = text[i] == "@"
        i += 1
    quote = text[i]
    i += 1
    out: list[str] = []
    while i < len(text):
        c = text[i]
        if verbatim:
            if c == quote:
                if i + 1 < len(text) and text[i + 1] == quote:  # doubled quote
                    out.append(quote)
                    i += 2
                    continue
                return "".join(out), i + 1
            out.append(c)
            i += 1
        else:
            if c == quote:
                return "".join(out), i + 1
            if c == "\\" and i + 1 < len(text):
                esc = text[i + 1]
                if esc == "u" and i + 5 < len(text):
                    out.append(chr(int(text[i + 2 : i + 6], 16)))
                    i += 6
                    continue
                out.append(_ESCAPES.get(esc, esc))
                i += 2
                continue
            if c == "\n":
                break
            out.append(c)
            i += 1
    raise KqlSyntaxError("unterminated string literal", text, start)


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        m = _WS_RE.match(text, i)
        if m:
            i = m.end()
            continue
        m = _COMMENT_RE.match(text, i)
        if m:
            i = m.end()
            continue
        c = text[i]
        # strings (incl. @"verbatim" and h"hidden")
        if c in "\"'" or (c in "@h" and i + 1 < n and text[i + 1] in "\"'"):
            # 'h' might start an identifier like 'hours' — only treat as
            # string prefix when followed directly by a quote
            s, j = _scan_string(text, i)
            tokens.append(Token(STRING, s, i, j))
            i = j
            continue
        # quoted identifier ['col name']
        if c == "[":
            m = _QIDENT_RE.match(text, i)
            if m:
                val = m.group(1) if m.group(1) is not None else m.group(2)
                # same escape semantics as string literals — a QIDENT is
                # also a one-cell datatable row block, so `["{\"a\": 1}"]`
                # must decode \" exactly like the STRING path would
                val = _QIDENT_ESC_RE.sub(
                    lambda em: chr(int(em.group(1), 16))
                    if em.group(1) is not None
                    else _ESCAPES.get(em.group(2), em.group(2)),
                    val,
                )
                tokens.append(Token(QIDENT, val, i, m.end()))
                i = m.end()
                continue
        # timespan literal (before generic number)
        m = _TS_RE.match(text, i)
        if m:
            secs = float(m.group(1)) * _TS_UNITS[m.group(2)]
            tokens.append(Token(TIMESPAN, secs, i, m.end()))
            i = m.end()
            continue
        # number
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            m = _NUM_RE.match(text, i)
            if m:
                lit = m.group(0)
                if lit.lower().startswith("0x"):
                    tokens.append(Token(INT, int(lit, 16), i, m.end()))
                elif "." in lit or "e" in lit.lower():
                    tokens.append(Token(REAL, float(lit), i, m.end()))
                else:
                    tokens.append(Token(INT, int(lit), i, m.end()))
                i = m.end()
                continue
        # identifier
        m = _IDENT_RE.match(text, i)
        if m:
            tokens.append(Token(IDENT, m.group(0), i, m.end()))
            i = m.end()
            continue
        # negated word operators: !contains, !has, !in, !startswith ...
        m = _BANGWORD_RE.match(text, i)
        if m and m.group(0) != "!":
            tokens.append(Token(OP, m.group(0), i, m.end()))
            i = m.end()
            continue
        # punctuation
        for p in _PUNCT:
            if text.startswith(p, i):
                tokens.append(Token(OP, p, i, i + len(p)))
                i += len(p)
                break
        else:
            raise KqlSyntaxError(f"unexpected character {c!r}", text, i)
    tokens.append(Token(EOF, None, n, n))
    return tokens
