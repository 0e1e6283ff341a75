"""PII detection and redaction over text columns — the scrubbing pass
every pretraining pipeline runs before anything else (emails, IPv4s,
phone-shaped and card-shaped digit runs). Beyond-reference extension.

Patterns are deliberately CONSERVATIVE and written in the common subset
of Java regex (Spark executes ``regexp_replace``/``regexp_count``
JVM-side) and RE2 (DuckDB): no lookaround, no backreferences, ASCII
``\\d``/``\\b`` only — so the oracle twin matches byte-for-byte and the
operator never needs a Python UDF. Everything is a pure Column tree:
whole-stage-codegen, no shuffle, streaming-legal.

Redaction applies the categories in a FIXED order (email → ipv4 → phone
→ long digit run); order matters because a replacement token must not be
re-matched by a later pattern, and both engines apply the identical
sequence. Precision/recall tuning (locale phone formats, IBANs, names)
is a deployment concern — the operator takes a pattern table, these are
the defaults.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (category, pattern, replacement) — applied in order. The common
#: Java/RE2 subset: character classes, bounded repetition, \b, \d.
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b|\b\d{3}-\d{3,4}-\d{4}\b", "<PHONE>"),
    ("digit_run", r"\b\d{13,19}\b", "<NUM>"),
]


def redact(col: Column, patterns: list[tuple[str, str, str]] | None = None) -> Column:
    """Replace every PII match with its category token, in order."""
    out = col
    for _, pat, repl in patterns or DEFAULT_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Per-document PII counts + total — the audit pass run BEFORE
    deciding to redact vs drop (documents dominated by PII are usually
    dropped, not scrubbed). Counts are measured on the progressively
    redacted text exactly like ``redact`` applies it, so a span never
    counts twice under two categories (an email's digits can't also be a
    phone). Adds one ``n_<category>`` long per pattern and ``n_pii``."""
    pats = patterns or DEFAULT_PATTERNS
    out = df
    cur = F.col(text_col)
    total = F.lit(0).cast("long")
    for name, pat, repl in pats:
        n = F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0)).cast("long")
        out = out.withColumn(f"n_{name}", n)
        total = total + n
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn("n_pii", total)


def redact_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_pii_fraction: float = 0.2,
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """The full scrubbing policy: documents whose PII density (matches
    per whitespace token) exceeds ``max_pii_fraction`` are DROPPED (they
    are address books / logs, not prose); the rest pass through with
    ``text`` redacted. Returns (id, text, n_pii, pii_fraction)."""
    from csvtool_spark.operators.dedup import normalized
    from csvtool_spark.operators.textstats import tokens

    pats = patterns or DEFAULT_PATTERNS
    stats = pii_stats(df, text_col, id_col, pats)
    # null text → size null → greatest picks 1; empty text → [''] → 1
    n_toks = F.greatest(F.size(tokens(normalized(F.col(text_col)))), F.lit(1))
    frac = F.round(F.col("n_pii").cast("double") / n_toks.cast("double"), 6)
    return (
        stats.withColumn("pii_fraction", frac)
        .filter(F.col("pii_fraction") <= float(max_pii_fraction))
        .select(
            F.col(id_col),
            redact(F.col(text_col), pats).alias(text_col),
            "n_pii",
            "pii_fraction",
        )
    )


def pii_oracle_sql(
    max_pii_fraction: float = 0.2,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``redact_documents`` with the default patterns:
    identical sequential regexp_replace ('g' flag ≡ Spark's replace-all),
    progressive counting via regexp_extract_all lengths, same density
    rule and rounding."""
    p = {name: pat for name, pat, _ in DEFAULT_PATTERNS}
    r = {name: repl for name, _, repl in DEFAULT_PATTERNS}

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    c0 = text_col
    cnt_exprs, cur = [], c0
    for name, _, _ in DEFAULT_PATTERNS:
        # coalesce: null text must yield count 0 (and survive the gate)
        # exactly like Spark's coalesced regexp_count
        cnt_exprs.append(
            f"coalesce(len(regexp_extract_all({cur}, {lit(p[name])})), 0) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, {lit(p[name])}, {lit(r[name])}, 'g')"
    red = cur
    n_sum = " + ".join(f"n_{name}" for name, _, _ in DEFAULT_PATTERNS)
    return f"""
    WITH s AS (
      SELECT {id_col}, {text_col},
             {", ".join(cnt_exprs)},
             {red} AS redacted
      FROM {table}
    ),
    t AS (
      SELECT {id_col}, redacted, CAST({n_sum} AS BIGINT) AS n_pii,
             round(CAST({n_sum} AS DOUBLE) /
                   greatest(coalesce(len(string_split(lower(trim({text_col})), ' ')), 1), 1), 6)
                   AS pii_fraction
      FROM s
    )
    SELECT {id_col}, redacted AS {text_col}, n_pii, pii_fraction
    FROM t WHERE pii_fraction <= CAST({float(max_pii_fraction)!r} AS DOUBLE)
    """
