"""Credential/payload crypto as engine expressions (reference parity: C2).

The reference decrypts AES-256-GCM passwords driver-side with the Python
``cryptography`` package (utils/helper_functions.py:54-74: 12-byte nonce
prepended to ciphertext+tag, key from hex). Spark ships the same
primitive as a codegen'd expression — ``aes_decrypt``/``aes_encrypt``
with GCM default — so encrypted COLUMNS (tokens, PII payloads) decrypt
distributed, not row-by-row on the driver.

Keys stay driver-side literals (control plane); only ciphertext moves
through executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def aes_gcm_encrypt(col: Column | str, key: bytes) -> Column:
    """Encrypt a string/binary column; output = nonce||ciphertext||tag
    (Spark generates the random IV and prepends it, matching the
    reference's wire format)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_encrypt(c.cast("binary"), F.lit(key), F.lit("GCM"))


def aes_gcm_decrypt(col: Column | str, key: bytes) -> Column:
    """Decrypt nonce-prepended AES-GCM payloads to string (the reference's
    decrypt_pass semantics, executed engine-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(c, F.lit(key), F.lit("GCM")).cast("string")
