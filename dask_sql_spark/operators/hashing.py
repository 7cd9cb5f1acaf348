"""Portable deterministic hashing helpers.

Cross-engine reproducibility is the design constraint: the correctness gate
compares Spark results against a DuckDB oracle, so every hash used in dedup
/ fingerprinting must produce identical values in both engines. Spark's
``hash()``/``xxhash64()`` are Spark-specific murmur variants, so we derive
integer hashes from ``md5`` hex strings, which both engines implement
identically.

Scale note: md5-on-string is ~2-3× slower than xxhash64 but stays entirely
inside whole-stage codegen (no Python). For a production 100 TB run where
no cross-engine oracle is needed, swap ``portable_hash64`` for
``F.xxhash64`` — the operators take the hash column builder as a knob.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^60 max → always fits BIGINT in both engines
_HEX_DIGITS = 15

# modulus for minhash permutations: prime < 2^30 so a*h+b stays < 2^63
MINHASH_PRIME = 1_000_000_007


def portable_hash64(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string column, identical in
    Spark and DuckDB:

    - Spark:  ``CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)``
    - DuckDB: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``
    """
    return F.conv(F.substring(F.md5(col), 1, _HEX_DIGITS), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """The DuckDB-side equivalent of :func:`portable_hash64` as SQL text."""
    return f"CAST('0x' || substr(md5({expr}), 1, {_HEX_DIGITS}) AS BIGINT)"


def portable_hash64_spark_sql(expr: str) -> str:
    """The Spark-SQL-side equivalent of :func:`portable_hash64` as text."""
    return f"CAST(conv(substr(md5({expr}), 1, {_HEX_DIGITS}), 16, 10) AS BIGINT)"


# Fixed (a, b) parameters for minhash permutations h_i(x) = (a*x + b) mod p.
# Literal constants (not RNG) so the Spark operator and the SQL oracle bake
# in the same values. 32 permutations; operators slice what they need.
MINHASH_PERMS: list[tuple[int, int]] = [
    (472882049, 880301087), (193877777, 715225741), (661323293, 93196121),
    (104395303, 486187739), (982451653, 298154327), (741235837, 562448657),
    (198491317, 636875889), (305175781, 32452843), (217645199, 715225739),
    (370248451, 169941229), (95189161, 553105243), (657305147, 236887691),
    (442245931, 104729869), (815730721, 735632791), (282174487, 28048729),
    (617584681, 472930517), (99370249, 613651349), (536870909, 179424673),
    (715827883, 275604541), (121654211, 967692239), (694847539, 373587883),
    (256203161, 479001599), (533000389, 87178291), (609862651, 755234047),
    (722222227, 198765431), (154858631, 941083981), (433024223, 256203221),
    (314606891, 674506081), (899809343, 522882643), (617237197, 133496537),
    (776531401, 413158511), (359334083, 963726515),
]
