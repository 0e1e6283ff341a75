"""Tokenizer for the csvtool dialect.

Behavior (not implementation) follows the reference scanner
(/root/reference/scanner.go): whitespace-separated words; quoted strings
('...' or "...") collapse to single WORD tokens carrying a ``quoted`` flag
(scanner.go:452-461); the special characters ``* = ! < > ( ) , + - % / ^ ;``
self-delimit; two-char operators ``!= <> <= >=``. Words keep ``\\ : _ . [ ]
~ { }`` so file paths and alias.column references scan as one token.

The reference is a table-driven DFA; a hand-rolled loop is clearer in
Python and produces the same token stream.
"""

from __future__ import annotations

from dataclasses import dataclass

from csvtool_spark.dialect.errors import ScanError

# Single-char specials that terminate a word and stand alone.
_SPECIALS = set("*=!<>(),+-%/^;")
# Non-alphanumeric characters allowed inside words (paths, alias.col, ~).
_WORD_EXTRAS = set("\\:_.[]~{}$@#&?")


@dataclass(frozen=True)
class Token:
    kind: str  # WORD | OP | EOF
    val: str
    quoted: bool
    pos: int

    def lower(self) -> str:
        return self.val.lower()


def scan(text: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch in ("'", '"'):
            j = text.find(ch, i + 1)
            if j < 0:
                raise ScanError(f"Unterminated quote at position {i}")
            toks.append(Token("WORD", text[i + 1 : j], True, i))
            i = j + 1
            continue
        if ch in _SPECIALS:
            two = text[i : i + 2]
            if two in ("!=", "<>", "<=", ">="):
                toks.append(Token("OP", two, False, i))
                i += 2
            else:
                toks.append(Token("OP", ch, False, i))
                i += 1
            continue
        if ch == "|":
            # engine extension (no reference analog): the curation pipe
            # '|>' chains post-query stages (dialect/stages.py). Bare '|'
            # stays an error.
            if text[i : i + 2] == "|>":
                toks.append(Token("OP", "|>", False, i))
                i += 2
                continue
            raise ScanError(f"Unexpected character '|' at position {i}")
        # word: letters/digits plus extras
        j = i
        while j < n and not text[j].isspace() and text[j] not in _SPECIALS and (
            text[j].isalnum() or text[j] in _WORD_EXTRAS
        ):
            j += 1
        if j == i:
            raise ScanError(f"Unexpected character {ch!r} at position {i}")
        toks.append(Token("WORD", text[i:j], False, i))
        i = j
    toks.append(Token("EOF", "", False, n))
    return toks
