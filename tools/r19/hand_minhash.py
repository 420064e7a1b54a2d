#!/usr/bin/env python3
"""Hand-evidence generator for DedupSpec's q31/q32 literal assertions.

Derives, OUTSIDE Spark, every number the spec asserts:
  1. XXH64 (seed 42) of each token — implemented here directly from the
     public xxHash specification (github.com/Cyan4973/xxHash, XXH64),
     NOT from Spark's XXH64.scala; agreement with Spark's xxhash64()
     is itself asserted in the spec (cross-implementation differential,
     the q51-CPython evidence class).
  2. q31's gram values: the HashedGrams rolling polynomial
     g = ((th0*P + th1)*P + th2) mod 2^64, P = 0x9E3779B97F4A7C15.
  3. q31's 16 minhash values: min over grams of
     ((g mod M) * a_i) mod M, M = 2^31-1, a_i = (1000003*(2i+1)) mod M
     (Dedup.permMul) — pmod semantics (result non-negative).
  4. q32's 64-bit simhash: per distinct token, bit i of XXH64(token)
     votes +1/-1; bit i of the simhash is set iff the vote sum > 0.

Run: python3 tools/r19/hand_minhash.py  -> prints the Scala literals.
"""
MASK = (1 << 64) - 1
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed
        v4 = (seed - P1) & MASK
        i = 0
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (v + lane * P2) & MASK
                v = (rotl(v, 31) * P1) & MASK
                if j == 0: v1 = v
                elif j == 1: v2 = v
                elif j == 2: v3 = v
                else: v4 = v
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            v = (rotl((v * P2) & MASK, 31) * P1) & MASK
            h = (((h ^ v) * P1) + P4) & MASK
    else:
        h = (seed + P5) & MASK
        i = 0
    h = (h + n) & MASK
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (rotl((lane * P2) & MASK, 31) * P1) & MASK
        h = ((rotl(h, 27) * P1) + P4) & MASK
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * P1) & MASK
        h = ((rotl(h, 23) * P2) + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


ROLL_P = 0x9E3779B97F4A7C15
M31 = 2147483647


def grams3(tokens):
    th = [xxh64(t.encode(), 42) for t in tokens]
    out = []
    for i in range(len(th) - 2):
        g = ((th[i] * ROLL_P + th[i + 1]) * ROLL_P + th[i + 2]) & MASK
        out.append(g)
    return out


def pmod(x, m):
    # Spark pmod over signed longs: ((x % m) + m) % m with Java % semantics
    sx = signed(x)
    r = sx - (abs(sx) // m) * m * (1 if sx >= 0 else -1)  # Java truncation
    return r if r >= 0 else r + m


def minhash16(tokens):
    hs = sorted({pmod(g, M31) for g in grams3(tokens)})
    sig = []
    for i in range(16):
        a = (1000003 * (2 * i + 1)) % M31
        sig.append(min((h * a) % M31 for h in hs))
    return sig


def simhash(tokens):
    votes = [0] * 64
    for t in sorted(set(tokens)):
        h = xxh64(t.encode(), 42)
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    sh = 0
    for i in range(64):
        if votes[i] > 0:
            sh |= 1 << i
    return sh


if __name__ == "__main__":
    docs = {0: "a b c d e", 1: "a b c d f"}
    print("== token XXH64(seed 42), signed (Spark xxhash64 literals) ==")
    for t in "abcdef":
        print(f'  "{t}" -> {signed(xxh64(t.encode(), 42))}L')
    for d, text in docs.items():
        toks = text.split()
        print(f"== doc {d}: {text!r} ==")
        gs = grams3(toks)
        print("  gram hashes (unsigned):", gs)
        print("  pmod(g, 2^31-1):", sorted(pmod(g, M31) for g in gs))
        sig = minhash16(toks)
        print("  minhash16:", sig)
        sh = simhash(toks)
        print(f"  simhash: {signed(sh)}L  (0x{sh:016x})")
    s0, s1 = minhash16(docs[0].split()), minhash16(docs[1].split())
    matches = sum(a == b for a, b in zip(s0, s1))
    print(f"== pair: matches {matches}/16, est_jaccard {matches/16}")
    bands = [all(s0[b * 4 + r] == s1[b * 4 + r] for r in range(4))
             for b in range(4)]
    print("   band-of-4 matches:", bands)
    h0, h1 = simhash(docs[0].split()), simhash(docs[1].split())
    print(f"   simhash hamming: {bin(h0 ^ h1).count('1')}")
    q = [(h0 >> (i * 16)) & 0xFFFF == (h1 >> (i * 16)) & 0xFFFF
         for i in range(4)]
    print("   16-bit quarter matches:", q)
