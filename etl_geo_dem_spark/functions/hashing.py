"""Driver-side xxHash64 — Spark's ``F.xxhash64`` without a Spark job.

The storage-bucket routing (``pmod(xxhash64(key), n_buckets)``) is needed on
the DRIVER for metadata-only planning: a single-key ``delete_where`` or
``point_lookup`` must know which bucket to open before any read happens.
Round 4 computed that with a one-row Spark job (createDataFrame + collect,
~0.2 s fixed cost per DML call); this module replaces it with the public
xxHash64 algorithm (Collet's XXH64 spec — the same algorithm Spark's
``XxHash64`` expression implements with seed 42) in pure Python.

Type discipline mirrors Spark's hash routing exactly (and
``tests/test_round5.py::test_python_xxhash64_matches_spark`` pins equality
against ``F.xxhash64`` across types and value ranges):

- byte/short/int  → 4-byte specialization (``hashInt``)
- long/timestamp  → 8-byte specialization (``hashLong``, two's complement)
- string          → XXH64 over the UTF-8 bytes
- null            → hash unchanged (the seed itself)
"""

from __future__ import annotations

from pyspark.sql import types as T

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_HASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_long(v: int, seed: int = SPARK_HASH_SEED) -> int:
    """XXH64 of one 64-bit value (Spark hashes LongType/TimestampType this way)."""
    v &= _M  # two's complement encoding of negative longs
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def xxh64_int(v: int, seed: int = SPARK_HASH_SEED) -> int:
    """XXH64 of one 32-bit value (Spark hashes Byte/Short/IntegerType this way)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    h = ((_rotl(h, 23) * _P2) + _P3) & _M
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """XXH64 over a byte buffer (Spark hashes StringType's UTF-8 bytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            k = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _M, 31) * _P1) & _M
            k = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _M, 31) * _P1) & _M
            k = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _M, 31) * _P1) & _M
            k = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType)


def spark_xxhash64(value, dtype: T.DataType) -> int:
    """``F.xxhash64(lit(value).cast(dtype))`` as a driver-side SIGNED 64-bit
    int (Spark's hash expressions return LongType). Raises TypeError for a
    dtype outside the supported routing — callers fall back to the Spark-job
    path for exotic key types."""
    if value is None:
        h = SPARK_HASH_SEED  # null children leave the running hash unchanged
    elif isinstance(dtype, T.StringType):
        # Python str() and Spark's cast-to-string agree ONLY for str and int
        # (decimal repr): str(1e7)='10000000.0' vs Spark '1.0E7',
        # str(True)='True' vs Spark 'true' — those must NOT be hashed here.
        # TypeError routes the caller to the Spark-job twin, whose cast
        # applies Spark's own semantics.
        if isinstance(value, bool) or not isinstance(value, (str, int)):
            raise TypeError(
                f"str() of {type(value).__name__} diverges from Spark's "
                "cast-to-string; use the Spark-side hash"
            )
        h = xxh64_bytes(str(value).encode("utf-8"))
    elif isinstance(dtype, _INT_TYPES):
        h = xxh64_int(int(value))
    elif isinstance(dtype, T.LongType):
        h = xxh64_long(int(value))
    else:
        raise TypeError(f"no driver-side xxhash64 routing for {dtype}")
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of_py(value, dtype: T.DataType, n_buckets: int) -> int:
    """Driver-side twin of :func:`plans.lake_table.bucket_expr`:
    ``pmod(xxhash64(cast(value as dtype)), n_buckets)``."""
    return spark_xxhash64(value, dtype) % n_buckets  # Python % IS pmod
