"""Deterministic hashing / sharding / fingerprint expressions.

Replaces three reference mechanisms (SURVEY.md §1.5):
- Q2 (broken float-modulo content sharding, vector_search_cluster.py:1200-1212):
  we hash stable integer ids, never float content.
- Q3 (lossy cache fingerprint, 378-387): kept as an expression-level operator
  (E1) for capability parity, but query dedup uses exact full-vector hashing.
- P1 (unseeded np.random.shuffle, 1002): seeded hash-ordering instead.

Cross-engine note: oracle-checked queries avoid Spark-only hash builtins
(xxhash64 has no DuckDB twin). ``det_hash`` is a Knuth multiplicative hash in
pure BIGINT arithmetic — identical results in any ANSI SQL engine. At 100 TB
the hot paths can swap in ``xxhash64`` (better avalanche) without semantic
change; the oracle queries pin the portable form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth's 2^32 golden-ratio multiplier, modulus 2^32. det_hash's split
# form (below) stays BIGINT-safe for ids up to ~2^47; the NAIVE product
# form (det_hash_sql, oracle-only) overflows past ids ~3.4e9 and is kept
# strictly for the small-id regime the test data lives in.
_MULT = 2654435761
_ADD = 1013904223
_MOD = 4294967296


def _seed_mult(seed: int) -> int:
    """Per-seed odd multiplier (mod-2^32 bijection; seed=0 -> _MULT, so
    default-seed values — shard layouts, stored artifacts — are unchanged).
    The seed must enter MULTIPLICATIVELY: with the textbook additive form
    ((id+seed)*MULT) every seed's draw is the seed-0 draw plus a constant,
    so two samples at different seeds are deterministically coupled
    (measured: 0% overlap between 10% samples at seeds 0 and 1 where ~1%
    is expected) — 'distinct seeds give independent draws' was false."""
    return ((2 * seed + 1) * _MULT) % _MOD


def det_hash(id_col: Column, seed: int = 0) -> Column:
    """Deterministic 32-bit hash of a non-negative BIGINT id column.

    Computed in an overflow-safe split form: the naive (id+seed)*mult
    exceeds BIGINT for ids past ~2e9 (an ANSI arithmetic error under
    Spark 4's defaults — fatal at web-scale row counts). Splitting
    a = hi*2^16 + lo keeps every intermediate under 2^63 — the largest is
    hi*ms ~= 2^(47-16) * 2^32 = 2^63-ish at the id ceiling (per-seed
    multipliers approach 2^32), comfortably inside signed BIGINT, while
    producing the EXACT same value mod 2^32 (multiplication is a
    homomorphism mod 2^32), so oracle parity with det_hash_sql's naive
    form on small-id test data is unchanged. Valid for ids up to ~2^47."""
    ms = _seed_mult(seed)
    a = id_col + F.lit(seed)
    hi = F.shiftright(a, 16)
    lo = a.bitwiseAND(F.lit(65535))
    return (
        ((hi * F.lit(ms)) % F.lit(_MOD)) * F.lit(65536)
        + lo * F.lit(ms)
        + F.lit(_ADD)
    ) % F.lit(_MOD)


def det_hash_sql(id_expr: str, seed: int = 0) -> str:
    """Same hash as ANSI SQL text — runnable verbatim in Spark SQL and
    DuckDB (naive form: valid for the small-id regime oracle data lives
    in; the Column form above is the overflow-safe one)."""
    return f"((({id_expr}) + {seed}) * {_seed_mult(seed)} + {_ADD}) % {_MOD}"


def pmod_shard(id_col: Column, num_shards: int, seed: int = 0) -> Column:
    """Shard assignment: pmod(det_hash(id), n) — the fixed form of quirk Q2."""
    return (det_hash(id_col, seed) % F.lit(num_shards)).cast("int")


def pmod_shard_sql(id_expr: str, num_shards: int, seed: int = 0) -> str:
    return f"CAST(({det_hash_sql(id_expr, seed)}) % {num_shards} AS INT)"


def fingerprint(vec: Column, n_edge: int = 8, decimals: int = 5) -> Column:
    """E1 — the reference's lossy cache-key fingerprint (378-387).

    First 8 + last 8 components formatted at 5 decimals, comma-joined. Kept as
    a capability (it is the reference's observable cache-key semantics); NOT
    used for dedup (quirk Q3 — distinct queries can collide).

    Values are rounded half-away-from-zero in DOUBLE before formatting so the
    printed digits match any engine's printf.
    """
    # python v[-8:] on a short vector returns the whole vector; Spark's
    # slice(vec, -8, 8) returns [] instead — guard to match the reference
    # (and the DuckDB twin, whose greatest() clamp already matches python)
    tail = F.when(F.size(vec) >= n_edge, F.slice(vec, -n_edge, n_edge)).otherwise(vec)
    edge = F.concat(F.slice(vec, 1, n_edge), tail)
    # "+ 0.0" collapses IEEE -0.0 to +0.0 so both engines print "0.00000"
    fmt = F.transform(
        edge,
        lambda x: F.format_string(
            f"%.{decimals}f", F.round(x.cast("double"), decimals) + F.lit(0.0)
        ),
    )
    return F.concat_ws(",", fmt)


def fingerprint_sql(vec_expr: str, n_edge: int = 8, decimals: int = 5) -> str:
    """DuckDB twin of :func:`fingerprint` (list_concat + printf)."""
    edge = (
        f"list_concat({vec_expr}[1:{n_edge}], "
        f"{vec_expr}[greatest(1, len({vec_expr}) - {n_edge - 1}):len({vec_expr})])"
    )
    return (
        f"list_aggregate(list_transform({edge}, "
        f"x -> printf('%.{decimals}f', round(CAST(x AS DOUBLE), {decimals}) + 0.0)), "
        f"'string_agg', ',')"
    )


def qvec_hash(vec: Column) -> Column:
    """Exact full-vector hash for query dedup (replaces the Q3 lossy key).

    md5 over a LOSSLESS rendering of every component: %.17g round-trips any
    double (and a fortiori any float32), so two vectors hash equal iff they
    are bitwise-equal as doubles — unlike the reference's 16-component
    5-decimal fingerprint, and unlike any fixed-decimal rendering (a %.6f
    key would collide vectors differing below 1e-6 and serve one vector's
    results for the other).
    """
    rendered = F.transform(vec, lambda x: F.format_string("%.17g", x.cast("double")))
    return F.md5(F.concat_ws(",", rendered))
