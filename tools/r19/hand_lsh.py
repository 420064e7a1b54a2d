#!/usr/bin/env python3
"""Hand-evidence generator for VectorFunctionsSpec's LshBucket literal
assertions — the q34/q36 hyperplane family, derived OUTSIDE Spark.

The committed contract (functions/VectorFunctions.scala LshBucket):
  weight(plane, dim, seed) = +1 if bit 1 of
      XXH64_le8(dim, seed = XXH64_le8(plane, seed)) is set, else -1
  bucket bit p = 1 iff sum_i vec[i] * weight(p, i, seed) > 0
with seed 42 (Spark's xxhash64 seed). XXH64 here is the same from-spec
implementation hand_minhash.py validated against Spark token hashes —
XXH64 over the 8 little-endian bytes of the long.

Run: python3 tools/r19/hand_lsh.py  -> prints the Scala literals.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from hand_minhash import xxh64, signed


def xxh64_long(value: int, seed: int) -> int:
    return xxh64((value & ((1 << 64) - 1)).to_bytes(8, "little"), seed)


def weight(plane: int, dim: int, seed: int = 42) -> float:
    h = xxh64_long(dim, xxh64_long(plane, seed))
    return 1.0 if (h & 2) else -1.0


def bucket(vec, nbits: int, seed: int = 42) -> int:
    b = 0
    for p in range(nbits):
        proj = sum(v * weight(p, i, seed) for i, v in enumerate(vec))
        if proj > 0:
            b |= 1 << p
    return b


if __name__ == "__main__":
    nbits, dims = 4, 4
    print(f"== weight matrix (seed 42, {nbits} planes x {dims} dims) ==")
    for p in range(nbits):
        print(f"  plane {p}:", [int(weight(p, i)) for i in range(dims)])
    vecs = {
        "e0 = (1,0,0,0)": [1.0, 0.0, 0.0, 0.0],
        "v  = (1,2,-1,0.5)": [1.0, 2.0, -1.0, 0.5],
        "-v": [-1.0, -2.0, 1.0, -0.5],
    }
    for name, v in vecs.items():
        print(f"  bucket({name}) = {bucket(v, nbits)}L")
    # band seed sanity: q34 uses seeds 42+b for b in 0..3
    print("== q34 band seeds: bucket(v) per seed 42..45 ==")
    v = [1.0, 2.0, -1.0, 0.5]
    for s in range(42, 46):
        print(f"  seed {s}: {bucket(v, nbits, s)}L")
