#!/usr/bin/env python3
"""Generate the q60 cross-engine PCA/whitening fixture (dev tool only —
NOT part of the library; the Scala code never depends on this).

The r16 verdict's same-author-oracle item, q60 edition: the expected
values here are computed by numpy/LAPACK (`np.linalg.eigh` — a true
second implementation of the symmetric eigenproblem, vs the repo's
cyclic-Jacobi solver) over pinned float32 embeddings, then written to
src/test/resources/graft/q60_pca_expected/expected.json for
PcaSpec's "q60 cross-engine" test.

Pipeline replicated (definitions from ops/Pca.scala, math from LAPACK):
  - covariance with ddof=1 over the float32 vectors (accumulated f64)
  - top-k eigenpairs by descending eigenvalue
  - canonical sign: largest-|component| positive
  - whiten: (x - mean)·v / sqrt(max(lambda, 0) + 1e-12)

The spectrum is made well-separated on purpose: close eigenvalues make
eigenvectors ill-conditioned and the comparison would test luck, not
arithmetic. Tolerances in the spec are 1e-8 (both solvers converge to
~1e-12 here; fold-order FP noise is smaller still).

Usage: python3 tools/r18/gen_q60_pca.py
"""
import json
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
OUT = ROOT / "src/test/resources/graft/q60_pca_expected/expected.json"

N, D, K = 40, 6, 4
rng = np.random.default_rng(60_2026)

# well-separated covariance: scale independent coordinates by strongly
# decaying factors, then rotate by a fixed orthogonal matrix
scales = np.array([8.0, 4.0, 2.0, 1.0, 0.5, 0.25])
q, _ = np.linalg.qr(rng.standard_normal((D, D)))
z = rng.standard_normal((N, D)) * scales
x32 = ((z @ q.T) + np.arange(D) * 0.3).astype(np.float32)

x = x32.astype(np.float64)  # everything downstream in f64, like the JVM
mean = x.mean(axis=0)
cov = np.cov(x.T, ddof=1)
evals, evecs = np.linalg.eigh(cov)          # ascending
order = np.argsort(-evals)[:K]
comps = []
for ix in order:
    v = evecs[:, ix].copy()
    m = np.argmax(np.abs(v))
    if v[m] < 0:
        v = -v
    comps.append(v)
comps = np.array(comps)
lam = evals[order]
proj = (x - mean) @ comps.T / np.sqrt(np.maximum(lam, 0.0) + 1e-12)

OUT.parent.mkdir(parents=True, exist_ok=True)
OUT.write_text(json.dumps({
    "k": K,
    "vec_ids": list(range(1, N + 1)),
    "embeddings": [[float(v) for v in row] for row in x32],
    "mean": [float(v) for v in mean],
    "eigenvalues": [float(v) for v in lam],
    "projections": [[float(v) for v in row] for row in proj],
}, indent=1))
print(f"wrote {OUT} (n={N}, d={D}, k={K}, "
      f"eigengaps={np.round(lam[:-1] / lam[1:], 2).tolist()})")
