#!/usr/bin/env python3
"""Regenerate Bench.expected (the >3x regression-guard floor map) from
committed BENCH_rNN.json gate artifacts (dev tool only — NOT part of the
library; the Scala code never depends on this).

Usage:
  python3 tools/floors.py BENCH_r07.json ... [--seed LOCAL.json ...]

For each query, the floor is the MINIMUM time across the named GATE
artifacts — the guard's baselines are evidence from accepted gate runs,
never hand-typed numbers (round-9 verdict). Artifacts after `--seed`
are builder-local runs and are consulted ONLY for queries absent from
every gate artifact (round-10 advice: self-reported local numbers must
not loosen a floor the gate already evidences — they may only seed
floors for queries the gates predate). Rewrites the block between the
BEGIN/END GENERATED FLOORS markers in src/main/scala/graft/Bench.scala;
review the diff like any other change. A query missing from every named
artifact gets no floor (unguarded until a gate records it); a floor for
a query that no longer exists is caught by BenchSpec's staleness check.
"""
import json
import re
import sys
import pathlib

BENCH = pathlib.Path(__file__).resolve().parent.parent / \
    "src/main/scala/graft/Bench.scala"
BEGIN = "// BEGIN GENERATED FLOORS"
END = "// END GENERATED FLOORS"


def load_queries(path: str, gate: bool) -> dict:
    with open(path) as f:
        doc = json.load(f)
    # gate artifacts wrap the bench line under parsed.queries — and ONLY
    # there: a builder-local BENCH_LOCAL-style file (top-level queries)
    # passed in gate position would silently lower gate-evidenced floors
    # (round-11 advice), so the top-level fallback is seed-only
    qs = (doc.get("parsed") or {}).get("queries")
    if gate:
        if not isinstance(qs, dict) or not qs:
            raise SystemExit(
                f"{path}: no parsed.queries — not a GATE artifact. Local "
                f"BENCH_LOCAL-style files must come after --seed.")
    else:
        qs = qs or doc.get("queries")
        if not isinstance(qs, dict) or not qs:
            raise SystemExit(f"{path}: no queries map — not a bench artifact?")
    return {k: float(v) for k, v in qs.items()}


def main():
    argv = sys.argv[1:]
    if not argv:
        raise SystemExit(__doc__)
    if "--seed" in argv:
        i = argv.index("--seed")
        gates, seeds = argv[:i], argv[i + 1:]
    else:
        gates, seeds = argv, []
    if not gates:
        raise SystemExit("need at least one gate artifact")
    floors = {}
    for a in gates:
        for q, t in load_queries(a, gate=True).items():
            floors[q] = min(t, floors.get(q, float("inf")))
    seeded = {}
    for a in seeds:
        for q, t in load_queries(a, gate=False).items():
            if q not in floors:  # gate evidence always wins
                seeded[q] = min(t, seeded.get(q, float("inf")))
    floors.update(seeded)
    arts = gates + (["--seed"] + seeds if seeds else [])
    body = []
    items = sorted(floors.items())
    for i in range(0, len(items), 4):
        chunk = ", ".join(f'"{q}" -> {t:.2f}' for q, t in items[i:i + 4])
        sep = "," if i + 4 < len(items) else ""
        body.append(f"    {chunk}{sep}")
    src = BENCH.read_text()
    pat = re.compile(
        re.escape(BEGIN) + r".*?" + re.escape(END), flags=re.S)
    if not pat.search(src):
        raise SystemExit(f"markers not found in {BENCH}")
    gen = BEGIN + f" (from: {' '.join(pathlib.Path(a).name for a in arts)})\n" \
        + "\n".join(body) + "\n    " + END
    BENCH.write_text(pat.sub(lambda _: gen, src))
    print(f"wrote {len(floors)} floors to {BENCH} from {len(arts)} artifacts")


if __name__ == "__main__":
    main()
