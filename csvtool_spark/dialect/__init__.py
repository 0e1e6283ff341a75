"""The csvtool SQL dialect front-end.

Pipeline: ``scan`` (scanner.py) → ``parse`` (parser.py, recursive descent
per the grammar in /root/reference/parser.go:1-29) → semantic analysis &
coercion planning (typecheck.py, reproducing the reference's typeChart and
operator-semantics error battery) → DataFrame compilation (compiler.py).

Everything below the front-end is stock Catalyst — the reference's four
physical strategies (normal/ordered/join/ordered-join scans) all map to
built-in Spark physical operators (SURVEY.md §4).
"""

from csvtool_spark.dialect.scanner import scan  # noqa: F401
from csvtool_spark.dialect.parser import parse  # noqa: F401
