"""Portable deterministic hashing as Column expressions.

Spark's native ``hash``/``xxhash64`` are fast but engine-specific — their
values cannot be reproduced by an external oracle (DuckDB) or by a different
engine version, which would make every hash-derived operator (minhash LSH,
simhash, fingerprints) untestable. We instead derive 60-bit integers from
``md5`` hex digests, which every engine computes identically:

    hash60(s, seed) = int(md5(f"{seed}:{s}")[:15], 16)      # 60 bits, >= 0

15 hex chars = 60 bits < 2**63, so the value fits a BIGINT in both Spark
(``conv(..., 16, 10)``) and DuckDB (``CAST('0x' || ... AS BIGINT)``).

This is the slow-but-reproducible path used for *correctness-checked*
operators. At 100 TB scale, swap ``hash60`` for ``F.xxhash64`` via the
``fast=True`` flag — same query shape, ~5× cheaper hashing, identical
statistical behavior, but no cross-engine oracle.

Reference parity note: the reference engine has no hashing operators at all
(its only hash use is in-memory ``unordered_map`` buckets,
``src/functions.cpp:75``); everything here is north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def hash60(col: Column | str, seed: int | Column = 0, fast: bool = False) -> Column:
    """Deterministic 60-bit non-negative BIGINT hash of a string column.

    ``seed`` may be a Python int or an integer Column (for per-row seeds,
    e.g. one minhash permutation per seed value).
    """
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    payload = F.concat(seed_col, F.lit(":"), _c(col))
    if fast:
        # Engine-native path for production scale; NOT oracle-reproducible.
        return F.abs(F.xxhash64(payload))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def bit_at(h: Column | str, bit: int) -> Column:
    """Bit ``bit`` (0-based from LSB) of integer column ``h`` as 0/1 int."""
    return F.shiftrightunsigned(_c(h), bit).bitwiseAND(F.lit(1))


MINHASH_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)
_MASK30 = (1 << 30) - 1


def minhash_perm_constants(n_hashes: int) -> list[tuple[int, int, int]]:
    """Deterministic affine-permutation constants ``(a, b, c)``, one triple
    per minhash function.

    Derived from a fixed-seed 64-bit LCG so every engine (and the DuckDB
    oracle) regenerates the identical family. All values are 30-bit, which
    bounds ``a*h_lo + b*h_hi + c`` below 2^61 — no BIGINT overflow in any
    engine, with or without ANSI arithmetic.
    """
    out: list[tuple[int, int, int]] = []
    x = 0x5DEECE66D

    def nxt() -> int:
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (x >> 16) & _MASK30

    for _ in range(n_hashes):
        out.append((nxt() | 1, nxt() | 1, nxt()))
    return out


def minhash_perm(h: Column | str, a: int, b: int, c: int) -> Column:
    """Affine permutation of a 60-bit base hash: the classic universal-hash
    MinHash family ``(a·h_lo + b·h_hi + c) mod 2^31−1``, computed on the
    hash's two 30-bit halves so products stay overflow-free."""
    hc = _c(h)
    h1 = hc.bitwiseAND(F.lit(_MASK30))
    h2 = F.shiftrightunsigned(hc, 30).bitwiseAND(F.lit(_MASK30))
    return (F.lit(a) * h1 + F.lit(b) * h2 + F.lit(c)) % F.lit(MINHASH_MOD)


def srp_plane_constants(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic random-hyperplane components for sign-random-projection
    (SRP) cosine LSH: ``plane[k][j] = (hash60(f"rp:{k}:{j}") % 2001 - 1000)
    / 1000`` — uniform in [-1, 1] with 3 decimal digits, so the literal
    round-trips bit-exactly through any engine's decimal-to-double parser.
    Generated driver-side (hyperplanes are config, not data) and inlined
    as array literals into both the Spark plan and the DuckDB oracle."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        [(h60(f"rp:{k}:{j}") % 2001 - 1000) / 1000.0 for j in range(dim)]
        for k in range(n_bits)
    ]


def hll_bucket_rho(h_col: str, m: int) -> tuple["Column", "Column"]:
    """The ONE definition of the open-box HLL register coordinates used
    by every family (batch q_hll, partial-merge q_hll_merge, streaming
    sketch maintenance): given a ``hash60`` column name, bucket = low
    bits (``h % m``), rho = 1-based first-set-bit rank of the remaining
    ``60 - log2(m)`` bits (one past that width if none set). Hand-copies
    of this expression pair drifted into three modules before round 6's
    review hoisted it here — register compatibility across families
    depends on it being single-sourced.

    ``m`` must be a power of two ≤ 2^60: the pad width is derived from
    it (60 − log2 m), so a non-256 register count keeps rho aligned to
    the true remaining-bit width instead of silently shifting against a
    hardcoded 52 (round-6 advisor finding)."""
    from pyspark.sql import functions as F

    if m <= 0 or (m & (m - 1)) != 0 or m > 1 << 60:
        raise ValueError(f"HLL register count must be a power of two ≤ 2^60, got {m}")
    width = 60 - (m.bit_length() - 1)
    w = F.expr(f"{h_col} div {m}")
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.instr(F.lpad(F.bin(w), width, "0"), "1")
    )
    return (F.col(h_col) % m), rho
