"""encrypt()/decrypt() — reference: AES-256-GCM with key = SHA-256(password),
random nonce prepended, base64 output (selector.go:163-203, parser.go:979-1007).

Spark-first mapping: ``F.aes_encrypt/aes_decrypt`` (JVM-side). GCM with a
random IV matches the reference but is nondeterministic; ``deterministic=True``
uses GCM with a fixed IV derived from the plaintext — test/oracle mode only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def _key(password: str) -> Column:
    # Reference derives the 32-byte AES key as SHA-256(password).
    return F.lit(hashlib.sha256(password.encode()).digest())


def encrypt(col: Column, password: str, deterministic: bool = False) -> Column:
    if deterministic:
        # Fixed 12-byte IV per row (sha256 of the plaintext) so the output is
        # stable for round-trip tests; NOT for production use.
        iv = F.substring(F.sha2(col.cast("string"), 256).cast("binary"), 1, 12)
        enc = F.aes_encrypt(col.cast("string").cast("binary"), _key(password), F.lit("GCM"), F.lit("NONE"), iv)
    else:
        enc = F.aes_encrypt(col.cast("string").cast("binary"), _key(password), F.lit("GCM"))
    return F.base64(enc)


def decrypt(col: Column, password: str) -> Column:
    dec = F.aes_decrypt(F.unbase64(col), _key(password), F.lit("GCM"))
    return dec.cast("string")
