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
does internally). The hash family is md5 (JVM-side, codegen'd) rather
than Spark's cheaper xxhash64: DuckDB computes byte-identical md5, which
is what lets every minhash/simhash dedup query carry an EXACT DuckDB
oracle instead of a rows-only check. Seeds are folded in by prefixing a
per-function salt literal.
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

    Hash family: Kirsch–Mitzenmacher double hashing over ONE md5 per
    shingle — h1/h2 are the first/second 8 hex chars as 32-bit ints and
    g_i = h1 + i·h2 (max ~2^36, no long overflow under ANSI mode). md5 is
    byte-identical in DuckDB, so the LSH dedup pipeline carries an EXACT
    cross-engine oracle; double hashing keeps it to one md5 per shingle
    instead of `num_hashes`.

    Evaluation shape (the tree-discipline): the (h1, h2) pairs array is
    the aggregate's INPUT — computed once per row — and the running
    16-minimum accumulator folds over it with lambda variables only.
    Putting the pair computation inside a per-seed lambda would re-md5
    every shingle once per seed. Empty shingle sets keep the Long.MaxValue
    seed accumulator as a sentinel (real g_i are < 2^37, so empty docs
    never pair with content).
    """
    seeds = F.sequence(F.lit(0).cast("long"), F.lit(num_hashes - 1).cast("long"))
    acc0 = F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes)
    digests = F.transform(shingles, lambda s: F.md5(s))
    pairs = F.transform(
        digests,  # HOF input: one md5 per shingle; m below is a bound value
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    return F.aggregate(
        pairs,
        acc0,
        lambda acc, p: F.zip_with(
            acc, seeds, lambda a, i: F.least(a, p["h1"] + i * p["h2"])
        ),
    )


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Split a signature into band keys: array of 'bandIdx:md5(bandSlice)'.

    Docs sharing ANY band key are near-dup candidates (standard banding:
    P[candidate] = 1-(1-j^r)^b for Jaccard j). ``slice`` keeps the
    signature subtree single-occurrence per band; callers pass an
    attribute reference anyway. md5 over the joined slice mirrors the
    DuckDB oracle byte-for-byte (see minhash_signature).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.concat_ws(
            ":",
            b.cast("string"),
            F.md5(
                F.array_join(
                    F.slice(signature, b * rows_per_band + 1, rows_per_band).cast(
                        "array<string>"
                    ),
                    ",",
                )
            ),
        ),
    )


_NBITS = 60  # 15 md5 hex chars → 60-bit token hash, fits a signed long


def md5_hash60(t: Column) -> Column:
    """60-bit integer hash from the first 15 hex chars of md5.

    The one hash both engines compute byte-identically: DuckDB's twin is
    ``('0x' || substr(md5(t), 1, 15))::BIGINT``, so simhash carries an
    exact cross-engine oracle (xxhash64 is Spark-only)."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash64(toks: Column) -> Column:
    """60-bit SimHash over tokens: per bit, sum ±1 votes of each token's
    md5-derived hash bit, take the sign. One aggregate over the token array
    with a 60-long accumulator — single projection, no shuffle, and every
    subtree (token hash, vote array) occurs exactly once in the expression
    tree.
    """
    bits = F.sequence(F.lit(0), F.lit(_NBITS - 1))
    zero = F.array_repeat(F.lit(0).cast("long"), _NBITS)

    def step(acc: Column, h: Column) -> Column:
        # h is the aggregate's LAMBDA VARIABLE (a bound value), so the
        # per-bit transform reads it 60 times for free. Hashing inside
        # this lambda instead would re-evaluate md5+conv once per BIT per
        # token — the runtime twin of the Catalyst tree-duplication trap.
        votes_of_t = F.transform(
            bits,
            lambda b: F.when(_bit(h, b) == 1, F.lit(1)).otherwise(F.lit(-1)).cast("long"),
        )
        return F.zip_with(acc, votes_of_t, lambda x, y: x + y)

    # hash once per token: the hashed array is the HOF *input*
    votes = F.aggregate(F.transform(toks, md5_hash60), zero, step)
    # Assemble Σ (vote_b > 0) << b — all 60 weights positive (no sign bit).
    weights = F.array(*[F.lit(1 << b).cast("long") for b in range(_NBITS)])
    return F.aggregate(
        F.zip_with(
            votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two longs: popcount of XOR via the native
    ``bit_count`` (one codegen'd instruction). The previous formulation —
    an aggregate over all 64 bit positions — computed the identical value
    but as an interpreted 60+-element HOF; evaluated per candidate pair
    inside the simhash blocking join's condition (and again in the
    project), it dominated the query — q_dedup_simhash measured 25.6s →
    5.8s cold / 1.3s warm-cache at sf1 on this change alone. DuckDB
    twin: bit_count(xor(a, b)) — same integer."""
    return F.bit_count(a.bitwiseXOR(b)).cast("long")
