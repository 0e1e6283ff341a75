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


class PasswordRequired(SemanticError):
    """encrypt()/decrypt() ran without a password and no interactive
    provider is installed.  A SemanticError subclass so programmatic
    callers keep their strict failure, but distinguishable so interactive
    surfaces (CLI getpass, web UI prompt — the reference's websocket
    SK_PASS flow, server.go:40-60) can prompt and retry."""
