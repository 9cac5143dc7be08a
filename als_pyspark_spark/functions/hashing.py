"""MinHash / SimHash signature builders — per-row, shuffle-free.

Scale design: a signature is computed inside one row projection
(transform + array_min / aggregate over the token array), so signature
computation is embarrassingly parallel and adds no exchange. The ONLY
shuffle in the LSH dedup pipeline is the band-bucket groupBy — whose
cardinality is ~n_docs × n_bands with near-uniform hash keys (no skew).

Catalyst-tree discipline: Column expressions are TREES, not DAGs — writing
``sum(f(x) for b in range(64))`` embeds 64 copies of ``x``'s whole subtree
and the optimizer walks each copy (a 5-row simhash join took minutes that
way). Every function here therefore iterates with higher-order functions
over ``sequence(0, n)`` so each input subtree occurs exactly once, keeping
expression size O(1) in bit width / hash count.

The reference has no analogue (its only hashing is the bit-packing
LocalIndexEncoder, util/encoder.py:10-24 — a different job that Tungsten
does internally). xxhash64 is Spark's built-in 64-bit hash (JVM,
codegen'd); seeds are folded in by prefixing a per-function salt literal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _bit(x: Column, b: Column) -> Column:
    """Bit ``b`` of long ``x`` (shift amount as a Column, so bit loops can
    run inside transform/aggregate instead of unrolled Python)."""
    return F.call_function("shiftright", x, b).bitwiseAND(F.lit(1))


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature: array of `num_hashes` minima over the shingle set.

    One pass per hash function via nested transform — the `shingles`
    subtree occurs once, so callers may pass a full shingling expression
    without blowing up the plan. The family is xxhash64(shingle, i): the
    seed rides as a second hash input, so no per-(shingle, seed) string
    concat is allocated (measured ~25% off the signature stage vs a
    prefix-concat family). Empty shingle sets get a sentinel signature of
    Long.MaxValue so they never collide with real content.
    """
    sentinel = F.lit(2**63 - 1).cast("long")
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.coalesce(
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, i))),
            sentinel,
        ),
    )


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Split a signature into band keys: array of 'bandIdx:hash(bandSlice)'.

    Docs sharing ANY band key are near-dup candidates (standard banding:
    P[candidate] = 1-(1-j^r)^b for Jaccard j). ``slice`` keeps the
    signature subtree single-occurrence per band; callers pass an
    attribute reference anyway.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.concat_ws(
            ":",
            b.cast("string"),
            F.xxhash64(
                F.array_join(
                    F.slice(signature, b * rows_per_band + 1, rows_per_band).cast(
                        "array<string>"
                    ),
                    ",",
                )
            ).cast("string"),
        ),
    )


_NBITS = 64


def simhash64(toks: Column) -> Column:
    """64-bit SimHash over tokens: per bit, sum ±1 votes of each token's
    xxhash64 bit, take the sign. One aggregate over the token array with a
    64-long accumulator — single projection, no shuffle, and every subtree
    (token hash, vote array) occurs exactly once in the expression tree.
    """
    bits = F.sequence(F.lit(0), F.lit(_NBITS - 1))
    zero = F.array_repeat(F.lit(0).cast("long"), _NBITS)

    def step(acc: Column, t: Column) -> Column:
        h = F.xxhash64(t)
        votes_of_t = F.transform(
            bits,
            lambda b: F.when(_bit(h, b) == 1, F.lit(1)).otherwise(F.lit(-1)).cast("long"),
        )
        return F.zip_with(acc, votes_of_t, lambda x, y: x + y)

    votes = F.aggregate(toks, zero, step)
    # Assemble Σ (vote_b > 0) << b. Bit 63 is the sign bit of a long: its
    # weight is Long.MIN_VALUE, added as the matching negative literal.
    weights = F.array(
        *[F.lit(-(2**63) if b == _NBITS - 1 else (1 << b)).cast("long") for b in range(_NBITS)]
    )
    return F.aggregate(
        F.zip_with(
            votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes via popcount of XOR,
    as one aggregate over bit positions (inputs occur once each)."""
    x = a.bitwiseXOR(b)
    return F.aggregate(
        F.transform(F.sequence(F.lit(0), F.lit(_NBITS - 1)), lambda i: _bit(x, i).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
