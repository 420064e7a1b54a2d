#!/usr/bin/env python3
"""Generate the q82 cross-engine deflate fixture (dev tool, r17).

The q82 pipeline deflates with java.util.zip.Deflater(DEFAULT_COMPRESSION,
nowrap=true) — the JDK's bundled zlib. This script derives the expected
deflated byte counts for a pinned deterministic corpus with CPython's
zlib (compressobj(level=-1, wbits=-15): same codec, entirely different
runtime and author), committed as a test resource so the spec pins the
pipeline against an engine nobody in this repo wrote.

Deterministic: text generation uses a fixed LCG, no time/randomness.
Rerun to regenerate; the output is stable across zlib 1.2/1.3.
"""
import json
import zlib
import pathlib

def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield s

def texts():
    out = []
    out.append(("empty", ""))
    out.append(("single", "a"))
    out.append(("repeat", "spark " * 500))
    out.append(("lines", "\n".join(f"row {i} value {i*i}" for i in range(200))))
    out.append(("unicode", "наука 科学 επιστήμη science " * 64))
    g = lcg(42)
    words = ["alpha","beta","gamma","delta","eps","zeta","eta","theta",
             "iota","kappa","lam","mu","nu","xi","omicron","pi"]
    for k in range(5):
        n = 120 + 97 * k
        body = " ".join(words[next(g) % len(words)] for _ in range(n))
        out.append((f"zipf{k}", body))
    # high-entropy: hex of LCG stream (compresses poorly)
    out.append(("noise", "".join(format(next(g), "016x") for _ in range(256))))
    return out

rows = []
for name, t in texts():
    raw = t.encode("utf-8")
    c = zlib.compressobj(-1, zlib.DEFLATED, -15)
    comp = c.compress(raw) + c.flush()
    rows.append({"name": name, "text": t, "n_bytes": len(raw),
                 "n_deflated": len(comp)})

dest = pathlib.Path(__file__).resolve().parents[2] / \
    "src/test/resources/graft/q82_zlib_expected.json"
dest.parent.mkdir(parents=True, exist_ok=True)
dest.write_text(json.dumps(rows, ensure_ascii=False, indent=1))
print(f"wrote {dest} ({len(rows)} rows)")
for r in rows:
    print(f"  {r['name']}: {r['n_bytes']} -> {r['n_deflated']}")
