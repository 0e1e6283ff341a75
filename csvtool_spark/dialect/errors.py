"""Dialect error types: scan/parse errors vs semantic (type) errors.

The reference reports both as plain error strings; we distinguish them so
tests can assert on the failure stage.
"""

from __future__ import annotations


class DialectError(Exception):
    """Base for all csvtool-dialect front-end errors."""


class ScanError(DialectError):
    pass


class ParseError(DialectError):
    pass


class SemanticError(DialectError):
    """Type/placement errors (the reference's expected-error battery)."""
