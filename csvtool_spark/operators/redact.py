"""PII scrubbing for training corpora: regex redaction of emails, IPv4
addresses and phone-like digit runs, plus per-document match counts.

The standard pre-training privacy pass (C4 and The Pile both strip or mask
contact-info patterns). Everything is a chained ``regexp_replace`` /
``regexp_extract_all`` column tree — whole-stage codegen, zero shuffle,
scales linearly with the scan; at 100 TB this runs as a map-only stage
fused into whatever scan feeds it.

Patterns deliberately use the Java-regex ∩ RE2 common subset (character
classes, bounded quantifiers, ``\\b`` — no lookaround or backrefs) so the
DuckDB oracle can run the *same* pattern strings and the redacted text
compares bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) — applied in order; email first so a phone
#: pattern can never eat the digits of user123@host.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9() .-]{6,}[0-9]", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Text with every PII match replaced by its ``<TYPE>`` token."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts (long) — the audit metric that decides
    whether a source is droppable vs scrubbable.

    Counts follow the same sequential semantics as ``redact_pii``: each
    category is counted on text with the earlier categories already
    replaced, so an IPv4 octet run is never double-counted as a phone
    number."""
    out: dict[str, Column] = {}
    cur = col
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).cast(
            "long"
        )
        cur = F.regexp_replace(cur, pat, repl)
    return out


def pii_report(df, text_col: str, id_col: str):
    """(id, redacted text, one count column per category)."""
    counts = pii_counts(F.col(text_col))
    return df.select(
        F.col(id_col),
        redact_pii(F.col(text_col)).alias("redacted"),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
    )
