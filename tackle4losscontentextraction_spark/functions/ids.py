"""Deterministic id generation (SURVEY §2.7 C10).

The reference mints cluster ids with ``uuid.uuid4()``
(``db_access.py:249``) — random, so a retried batch creates duplicate
clusters and fixtures can't pin outputs. The engine rendition is a
name-based UUID (RFC 4122 version-3 semantics: md5 of the name, with
the version nibble and variant bits patched into the standard
8-4-4-4-12 layout): identical inputs always yield the identical id, so
task retries, replays and both oracles agree — while remaining
format-compatible with any consumer expecting a UUID column.

Pure string/hash expressions — JVM codegen, engine-exact in DuckDB
(md5 + substr + printf) and Python (hashlib twin in tests/pyoracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_uuid(name: Column) -> Column:
    """RFC-4122-shaped v3-style UUID string from an arbitrary name
    column: md5 hex re-laid as 8-4-4-4-12 with hex char 13 := '3'
    (version) and char 17 := (c & 0x3) | 0x8 (variant 10xx)."""
    h = F.md5(name.cast("string"))
    variant = F.lower(
        F.hex(F.conv(F.substring(h, 17, 1), 16, 10).cast("bigint") % 4 + 8)
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def deterministic_uuid_py(name: str) -> str:
    """Pure-Python twin of :func:`deterministic_uuid` (same md5 relay,
    version nibble, variant bits) — for driver-side kernels like the
    sequential clustering replay, where ids are minted outside a plan."""
    import hashlib

    h = hashlib.md5(name.encode("utf-8")).hexdigest()
    variant = format(int(h[16], 16) % 4 + 8, "x")
    return (
        f"{h[0:8]}-{h[8:12]}-3{h[13:16]}-{variant}{h[17:20]}-{h[20:32]}"
    )
