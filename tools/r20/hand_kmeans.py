#!/usr/bin/env python3
"""Hand-evidence generator for the k-means / PQ fit arithmetic
(r19 verdict item 4 — the q31/q32 hand-pinning playbook applied to the
q43/q66/q77/q84/q131 fit legs).

Derives, OUTSIDE the Scala codebase, every number the specs assert as a
literal, by walking the DOCUMENTED algorithms on tiny exact-in-float32
grids (every input and every centroid mean is a dyadic rational, so
float32 rounding never moves a value and Python float64 arithmetic
reproduces the JVM bit-for-bit):

  1. KMeansL2 (Pq.scala) — farthest-point seeding (next seed = point
     with the LARGEST min squared distance to existing seeds, strict >)
     + one Lloyd round (argmin sqDist, strict <, empty cluster keeps its
     old centroid) on the 4-point grid
         (0,0) (1,1) (8,8) (9,9), k=2, iters=1
     seed walk: seeds=[(0,0)]; minDists 0,2,128,162 -> seed2=(9,9).
     Lloyd: (0,0),(1,1)->c0; (8,8) [128 vs 2] ,(9,9)->c1.
     centroids: c0=(0.5,0.5), c1=(8.5,8.5).

  2. KMeansLite (Similarity.scala) — cosine farthest-point (next seed =
     point with SMALLEST max cosine to existing seeds, strict <) + one
     Lloyd round (argmax cosine, strict >, empty clusters DROPPED) +
     near-duplicate centroid merge (cos > 0.95) on
         (1,0) (0.5,0.25) (0.75,0.5) (-1,0), k=2, iters=1
     seed walk: maxCos to (1,0): 1.0, 0.894.., 0.832.., -1.0
       -> seed2=(-1,0).
     Lloyd: first three -> c0 (their cosines to (-1,0) are the
     negations), (-1,0) -> c1.
     centroids: c0=((1+0.5+0.75)/3,(0+0.25+0.5)/3)=(0.75,0.25),
                c1=(-1,0); cos(c0,c1)<0 -> both kept.
     degenerate collinear case: (1,0),(0.5,0) k=2 -> cos=1.0 exactly,
     NOT < 1.0, so the seed walk re-picks (1,0); Lloyd sends both to
     the first seed (strict >), the empty twin is dropped ->
     [(0.75, 0.0)].
     merge case: (1,0),(0.96,0.28) k=2 -> both survive Lloyd as their
     own centroid, cos(c0,c1)=0.96../1.0 > 0.95 -> merged -> [(1,0)].

  3. Pq encode / ADC (Pq.scala) on the 2-subspace grid, m=2 k=2
     subDim=2 (bits=1), vectors
         v0=(0,0,10,10) v1=(1,1,11,11) v2=(8,8,2,2) v3=(9,9,3,3)
     subspace-0 codebook (hand walk 1 shape): [(0.5,0.5),(8.5,8.5)]
     subspace-1 codebook: seeds [(10,10)] then farthest=(2,2)
       [sq 128 > 98 > 2]; Lloyd: (10,10),(11,11)->c0, (2,2),(3,3)->c1
       -> [(10.5,10.5),(2.5,2.5)]
     encode (argmin sqDist per subspace, little-end-first packing):
       v0 -> sub0 idx0 (0.5 vs 144.5), sub1 idx0 (0.5 vs 112.5)
          -> code 0, errSum 1.0, recon_mse 1.0/4 = 0.25
       v2 -> idx1, idx1 -> code 3, recon_mse 0.25
     ADC for query (0,0,10,10):
       LUT sub0 = [0.5, 144.5]; LUT sub1 = [0.5, 112.5]
       v0/v1 (code 0) -> 1.0;  v2/v3 (code 3) -> 257.0

Run: python3 tools/r20/hand_kmeans.py  -> walks everything from scratch,
asserts the literals above, prints them for the specs
(SimilaritySpec / PqSpec "hand-pinned fit arithmetic" tests).
"""
import struct


def f32(x):
    """Round a Python float to float32 — the JVM's .toFloat."""
    return struct.unpack("f", struct.pack("f", x))[0]


def sq_dist(a, b):
    return sum((f32(x) - f32(y)) ** 2 for x, y in zip(a, b))


def cos(a, b):
    dot = sum(f32(x) * f32(y) for x, y in zip(a, b))
    na = sum(f32(x) ** 2 for x in a)
    nb = sum(f32(y) ** 2 for y in b)
    d = (na ** 0.5) * (nb ** 0.5)
    return 0.0 if d == 0.0 else dot / d


def kmeans_l2(points, k, iters):
    """KMeansL2.fit as documented: farthest-point seeds (strict >),
    Lloyd argmin (strict <), empty cluster keeps its old centroid."""
    k2 = max(1, min(k, len(points)))
    seeds = [points[0]]
    while len(seeds) < k2:
        best, best_score = points[0], -1.0
        for p in points:
            min_dist = min(sq_dist(p, s) for s in seeds)
            if min_dist > best_score:
                best_score, best = min_dist, p
        seeds.append(best)
    cents = [list(s) for s in seeds]
    for _ in range(iters):
        sums = [[0.0] * len(points[0]) for _ in cents]
        counts = [0] * len(cents)
        for p in points:
            best, best_dist = 0, float("inf")
            for j, c in enumerate(cents):
                d = sq_dist(p, c)
                if d < best_dist:
                    best_dist, best = d, j
            for x, v in enumerate(p):
                sums[best][x] += f32(v)
            counts[best] += 1
        cents = [old if counts[j] == 0
                 else [f32(sums[j][x] / counts[j]) for x in range(len(old))]
                 for j, old in enumerate(cents)]
    return [tuple(c) for c in cents]


def kmeans_lite(points, k, iters):
    """KMeansLite.fit as documented: cosine farthest-point (strict <),
    Lloyd argmax cosine (strict >), empty clusters dropped, then the
    near-duplicate merge (cos > 0.95, first-kept wins)."""
    k2 = max(1, min(k, len(points)))
    seeds = [points[0]]
    while len(seeds) < k2:
        best, best_score = points[0], 2.0
        for p in points:
            max_cos = max(cos(s, p) for s in seeds)
            if max_cos < best_score:
                best_score, best = max_cos, p
        seeds.append(best)
    cents = [list(s) for s in seeds]
    for _ in range(iters):
        sums = [[0.0] * len(points[0]) for _ in cents]
        counts = [0] * len(cents)
        for p in points:
            best, best_cos = 0, -2.0
            for j, c in enumerate(cents):
                cc = cos(c, p)
                if cc > best_cos:
                    best_cos, best = cc, j
            for x, v in enumerate(p):
                sums[best][x] += f32(v)
            counts[best] += 1
        cents = [[f32(sums[j][x] / counts[j]) for x in range(len(c))]
                 for j, c in enumerate(cents) if counts[j] > 0]
        if not cents:
            cents = [list(points[0])]
    kept = []
    for c in cents:
        if not any(cos(kc, c) > 0.95 for kc in kept):
            kept.append(c)
    return [tuple(c) for c in kept]


def pq_encode(v, codebooks, bits):
    code, err = 0, 0.0
    for sub, cb in enumerate(codebooks):
        d = len(cb[0])
        sl = v[sub * d:(sub + 1) * d]
        dists = [sq_dist(sl, c) for c in cb]
        best = min(range(len(cb)), key=lambda i: (dists[i], i))
        code |= best << (sub * bits)
        err += dists[best]
    return code, err / len(v)


def adc(q, code, codebooks, bits):
    total, mask = 0.0, (1 << bits) - 1
    for sub, cb in enumerate(codebooks):
        d = len(cb[0])
        total += sq_dist(q[sub * d:(sub + 1) * d], cb[(code >> (sub * bits)) & mask])
    return total


# ---- 1. KMeansL2 ----------------------------------------------------------
L2_GRID = [(0.0, 0.0), (1.0, 1.0), (8.0, 8.0), (9.0, 9.0)]
l2 = kmeans_l2(L2_GRID, 2, 1)
assert l2 == [(0.5, 0.5), (8.5, 8.5)], l2
# iters=8 (the Pq.fit setting) is stable on this grid
assert kmeans_l2(L2_GRID, 2, 8) == l2

# ---- 2. KMeansLite --------------------------------------------------------
LITE_GRID = [(1.0, 0.0), (0.5, 0.25), (0.75, 0.5), (-1.0, 0.0)]
lite = kmeans_lite(LITE_GRID, 2, 1)
assert lite == [(0.75, 0.25), (-1.0, 0.0)], lite
collinear = kmeans_lite([(1.0, 0.0), (0.5, 0.0)], 2, 1)
assert collinear == [(0.75, 0.0)], collinear
merged = kmeans_lite([(1.0, 0.0), (0.96, 0.28)], 2, 1)
assert merged == [(f32(1.0), f32(0.0))] and len(merged) == 1, merged

# ---- 3. PQ ---------------------------------------------------------------
VECS = [(0.0, 0.0, 10.0, 10.0), (1.0, 1.0, 11.0, 11.0),
        (8.0, 8.0, 2.0, 2.0), (9.0, 9.0, 3.0, 3.0)]
cb0 = kmeans_l2([v[0:2] for v in VECS], 2, 8)
cb1 = kmeans_l2([v[2:4] for v in VECS], 2, 8)
assert cb0 == [(0.5, 0.5), (8.5, 8.5)], cb0
assert cb1 == [(10.5, 10.5), (2.5, 2.5)], cb1
CODEBOOKS, BITS = [cb0, cb1], 1
codes = [pq_encode(v, CODEBOOKS, BITS) for v in VECS]
assert codes == [(0, 0.25), (0, 0.25), (3, 0.25), (3, 0.25)], codes
Q = (0.0, 0.0, 10.0, 10.0)
adcs = [adc(Q, c, CODEBOOKS, BITS) for c, _ in codes]
assert adcs == [1.0, 1.0, 257.0, 257.0], adcs

print("KMeansL2.fit(grid, 2, 1)    =", l2)
print("KMeansLite.fit(grid, 2, 1)  =", lite)
print("KMeansLite collinear (k=2)  =", collinear)
print("KMeansLite merge case (k=2) =", merged)
print("PQ codebooks (m=2,k=2)      =", CODEBOOKS)
print("PQ codes/recon_mse          =", codes)
print("ADC dists for q=v0          =", adcs)
print("all hand assertions hold")
