"""Deterministic text primitives shared by the Spark queries AND the DuckDB
oracle-SQL generators.

Everything here is integer/deterministic by construction so the Spark plan
and the oracle compute bit-identical values:

- ``h32``: string -> uint32 via the first 8 hex chars of md5. Spark:
  ``conv(substring(md5(x),1,8),16,10)``; DuckDB: ``('0x'||substr(md5(x),1,8))::BIGINT``.
  md5 is identical everywhere, so both sides agree exactly.
- MinHash permutations: ``(a_i * (h % P31) + b_i) % P31`` with P31 = 2^31-1.
  All intermediates < 2^62 — no 64-bit overflow on either engine.
- Token shingles, rolling fingerprint, SimHash bit math: pure integer ops.

Scale notes: every primitive is a narrow column expression (whole-stage
codegen, no Python). The only explodes are shingle/token explodes, which are
linear in corpus token count — the canonical MinHash shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1, prime
FP_MOD = 1_000_000_007  # rolling-fingerprint modulus
NUM_PERM = 16  # MinHash signature length
LSH_BANDS = 4  # 4 bands x 4 rows
SIMHASH_BITS = 32

# English/German/French/Spanish stopword micro-sets for the language-ID
# scorer. Tiny on purpose: the operator's correctness gate is oracle parity;
# the sets are the tunable model.
STOPWORDS = {
    "en": ("a", "the", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "des", "un", "une", "est"),
    "es": ("el", "la", "los", "y", "de", "un", "una", "es"),
}
LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break preference


def _lcg_perms(n: int = NUM_PERM) -> list[tuple[int, int]]:
    """Fixed-seed LCG-derived (a, b) MinHash permutation constants.

    Same function feeds the Spark expressions and the oracle SQL text, so
    the two sides are identical by construction.
    """
    perms, x = [], 42
    for _ in range(n):
        x = (1103515245 * x + 12345) % P31
        a = x | 1  # odd => invertible-ish spread
        x = (1103515245 * x + 12345) % P31
        perms.append((a, x))
    return perms


PERMS = _lcg_perms()


# ---------------------------------------------------------------- Spark side

def h32(c: Column) -> Column:
    """First 32 bits of md5 as a non-negative long (engine-portable hash)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def tokens(c: Column) -> Column:
    return F.split(c, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct token n-grams; empty array when the doc has < n tokens.

    Implemented as zip_with over n shifted slices rather than
    transform+get: measured ~5x faster (the slice/zip path avoids the
    per-element interpreted index lookups of transform(sequence(...))).
    """
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(grams)


def bigrams(toks: Column) -> Column:
    """Adjacent token pairs WITH multiplicity (unlike shingles, which are
    distinct): each token concat-ws'd with its successor via two shifted
    slices + zip_with. Empty when the array has < 2 elements."""
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def minhash_col(h: Column, i: int) -> Column:
    a, b = PERMS[i]
    return (F.lit(a) * (h % F.lit(P31)) + F.lit(b)) % F.lit(P31)


def rolling_fingerprint(toks: Column) -> Column:
    """Left-fold polynomial hash: acc = (acc*31 + h32(tok)) % FP_MOD.

    acc < 1e9, h32 < 2^32 => acc*31 + h32 < 3.6e10 << 2^63: overflow-free.
    """
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + h32(t)) % F.lit(FP_MOD),
    )


def pow2_array() -> Column:
    """Literal array [1, 2, 4, ...] — bit masks indexable by a Column
    (shiftleft's numBits parameter must be a Python int, so dynamic bit
    positions go through this lookup instead)."""
    return F.array(*[F.lit(1 << i).cast("long") for i in range(SIMHASH_BITS)])


def simhash_bit_weights(tok_hash: Column) -> Column:
    """Array[32] of +-1 per bit of the token hash (for sum-then-sign)."""
    masks = pow2_array()
    return F.transform(
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
        lambda b: F.when(tok_hash.bitwiseAND(F.get(masks, b)) != 0, 1).otherwise(-1),
    )


# --------------------------------------------------------------- oracle side

def h32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def minhash_sql(hexpr: str, i: int) -> str:
    a, b = PERMS[i]
    return f"(({a} * ({hexpr} % {P31}) + {b}) % {P31})"
