#!/usr/bin/env python3
"""Regenerate Bench.expected (the >3x regression-guard floor map) from
committed BENCH_rNN.json gate artifacts (dev tool only — NOT part of the
library; the Scala code never depends on this).

Usage:
  python3 tools/floors.py --from-artifacts
  python3 tools/floors.py BENCH_r07.json ... [--seed LOCAL.json ...]

`--from-artifacts` (the argument-free round-over-round mode — round-12
verdict item #2: a hand-maintained artifact list silently unguards
queries when a regeneration forgets one) globs the repo root's
BENCH_r*.json itself, keeps every gate artifact from round
MIN_GATE_ROUND on (earlier rounds predate the finalized per-query plans
and the one-JSON-line parse fix, so their times are evidence about code
that no longer exists), skips non-gate files (no parsed.queries) with a
notice, and uses no seeds — the r10+ gates cover every current query,
so seed files can no longer contribute (gate evidence always wins).

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

REPO = pathlib.Path(__file__).resolve().parent.parent
BENCH = REPO / "src/main/scala/graft/Bench.scala"
BEGIN = "// BEGIN GENERATED FLOORS"
END = "// END GENERATED FLOORS"
# First round whose gate artifact is floor evidence: r07 is when the
# current query-plan generation and bench methodology stabilized (the
# provenance every committed floor block has used since r09). Earlier
# gates measured plans that were since replaced; their minima would
# arm the guard with times the current code never evidenced.
MIN_GATE_ROUND = 7


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


def from_artifacts_args() -> list:
    """Expand --from-artifacts into the gate-artifact list: every
    BENCH_r{NN}.json in the repo root with NN >= MIN_GATE_ROUND that
    actually parses as a gate artifact (parsed.queries present)."""
    picked = []
    for p in sorted(REPO.glob("BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if not m:
            continue
        if int(m.group(1)) < MIN_GATE_ROUND:
            print(f"skip {p.name}: round < r{MIN_GATE_ROUND:02d} "
                  f"(pre-dates the current plan generation)")
            continue
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            print(f"skip {p.name}: unreadable/malformed JSON ({e}) - "
                  f"not floor evidence")
            continue
        if not ((doc.get("parsed") or {}).get("queries")):
            print(f"skip {p.name}: no parsed.queries (gate parse failed "
                  f"that round) - not floor evidence")
            continue
        picked.append(str(p))
    if not picked:
        raise SystemExit("--from-artifacts found no usable gate artifacts")
    return picked


def main():
    argv = sys.argv[1:]
    if not argv:
        raise SystemExit(__doc__)
    if argv == ["--from-artifacts"]:
        argv = from_artifacts_args()
    elif "--from-artifacts" in argv:
        raise SystemExit("--from-artifacts takes no other arguments")
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
