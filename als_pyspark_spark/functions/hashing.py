"""MinHash / SimHash signature builders — per-row, shuffle-free.

Scale design: a signature is computed inside one row projection
(transform + array_min / aggregate over the token array), so signature
computation is embarrassingly parallel and adds no exchange. The ONLY
shuffle in the LSH dedup pipeline is the band-bucket groupBy — whose
cardinality is ~n_docs × n_bands with near-uniform hash keys (no skew).

The reference has no analogue (its only hashing is the bit-packing
LocalIndexEncoder, util/encoder.py:10-24 — a different job that Tungsten
does internally). xxhash64 is Spark's built-in 64-bit hash (JVM,
codegen'd); seeds are folded in by prefixing a per-function salt literal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seeded_hash(col: Column, seed: int) -> Column:
    """64-bit hash of a string column under a numbered hash function."""
    return F.xxhash64(F.concat(F.lit(f"s{seed}:"), col))


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature: array of `num_hashes` minima over the shingle set.

    Empty shingle sets get a sentinel signature of Long.MaxValue so they
    never collide with real content.
    """
    sentinel = F.lit(2**63 - 1)
    mins = F.array(
        *[
            F.coalesce(
                F.array_min(F.transform(shingles, lambda s, i=i: seeded_hash(s, i))),
                sentinel,
            )
            for i in range(num_hashes)
        ]
    )
    return mins


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Split a signature into band keys: array of 'bandIdx:hash(bandSlice)'.

    Docs sharing ANY band key are near-dup candidates (standard banding:
    P[candidate] = 1-(1-j^r)^b for Jaccard j).
    """
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).cast("string"),
            )
            for b in range(num_bands)
        ]
    )


_NBITS = 64


def simhash64(toks: Column) -> Column:
    """64-bit SimHash over tokens: per bit, sum ±1 votes of each token's
    xxhash64 bit, take the sign. Computed as one aggregate over the token
    array with a 64-int accumulator — single projection, no shuffle.

    Bit positions are unrolled with Python-int literals because Spark's
    shiftleft/shiftright take a literal bit count, not a Column.
    """
    zero = F.array(*[F.lit(0) for _ in range(_NBITS)])

    def step(acc: Column, t: Column) -> Column:
        h = F.xxhash64(t)
        bits = F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for b in range(_NBITS)
            ]
        )
        return F.zip_with(acc, bits, lambda x, y: x + y)

    votes = F.aggregate(toks, zero, step)
    # Assemble Σ (vote_b > 0) << b. Bit 63 is the sign bit of a long:
    # its weight is Long.MIN_VALUE, added as the matching negative literal.
    terms = [
        F.when(
            F.element_at(votes, b + 1) > 0,
            F.lit(-(2**63) if b == 63 else (1 << b)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(_NBITS)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes via popcount of XOR."""
    x = a.bitwiseXOR(b)
    out = F.lit(0)
    for i in range(_NBITS):
        out = out + F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("int")
    return out.cast("long")
