#!/usr/bin/env python3
"""Regenerate Bench's floor maps (the >3x regression-guard / 2x-retry
baselines) from committed BENCH_rNN.json gate artifacts (dev tool only —
NOT part of the library; the Scala code never depends on this).

Usage:
  python3 tools/floors.py --from-artifacts [--scaled-seed LOCAL.json ...] [--write]
  python3 tools/floors.py BENCH_r07.json ... [--seed LOCAL.json ...]
                                             [--scaled-seed LOCAL.json ...]
                                             [--write]

DRY-RUN BY DEFAULT (r16 verdict hygiene): without --write the tool
prints the floors it would generate and a diff against the committed
blocks, touching nothing — so a diagnostic run can never dirty
src/main. Pass --write to rewrite Bench.scala in place.

Two floor blocks live in Bench.scala since round 14, one per evidence
corpus (comparing a run against the other scale's numbers armed the
guard with evidence about a different corpus — the first 10x
scale-gate bench burned 58 pointless reruns on exactly this):

  - GENERATED FLOORS        — sf0.1 runs ("sf" basename == sf0.1)
  - GENERATED SCALED FLOORS — derived-10x runs ("sf" basename ==
    graft_sf1d, the ScaleCorpus.defaultDir basename)

Every gate artifact is routed to its block by the "sf" recorded in its
own JSON line (an artifact with no "sf" is treated as sf0.1 — all
pre-r14 gates ran there). For each query, the floor is the MINIMUM time
across that block's gate artifacts — evidence from accepted gate runs,
never hand-typed numbers (round-9 verdict).

`--from-artifacts` (the argument-free round-over-round mode — round-12
verdict item #2: a hand-maintained artifact list silently unguards
queries when a regeneration forgets one) globs the repo root's
BENCH_r*.json itself, keeps every gate artifact from round
MIN_GATE_ROUND on (earlier rounds predate the finalized per-query plans
and the one-JSON-line parse fix), and skips non-gate files (no
parsed.queries) with a notice.

Seeds are builder-local runs consulted ONLY for queries absent from
every gate artifact of the same block (round-10 advice: self-reported
local numbers must not loosen a floor the gate already evidences —
they may only seed floors for queries the gates predate). `--seed`
seeds the sf0.1 block; `--scaled-seed` seeds the scaled block — the
round-14 bootstrap, since the first round at a new scale has no gate
artifact yet.

A block with NO inputs at all is left untouched (with a notice), so a
regeneration run before the first scaled gate artifact exists cannot
wipe the seeded scaled floors. Rewrites the blocks between the
BEGIN/END markers in src/main/scala/graft/Bench.scala; review the diff
like any other change. A query missing from every input gets no floor
(unguarded until a run records it); a floor for a query that no longer
exists is caught by BenchSpec's staleness check.
"""
import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
BENCH = REPO / "src/main/scala/graft/Bench.scala"
BLOCKS = {
    "base": ("// BEGIN GENERATED FLOORS", "// END GENERATED FLOORS"),
    "scaled": ("// BEGIN GENERATED SCALED FLOORS",
               "// END GENERATED SCALED FLOORS"),
}
# ScaleCorpus.defaultDir's basename — the artifact-side discriminator.
SCALED_BASENAME = "graft_sf1d"
# Generated floors are clamped to this minimum (seconds). Tiny-floor
# queries (q82 0.20 s, q42 0.24 s, q30 0.31 s) tripped >=1.8x ratios in
# each of r17-r19 purely on JIT/window noise — at sub-0.3 s durations a
# single JIT burst is a 2x "breach". Bench already carries the 0.25 s
# absolute materiality guard for retries; this clamps the GRADING floor
# too, so the ratio stops manufacturing adjudication work every round
# (r19 verdict item 5). The clamp is recorded in the provenance line.
FLOOR_MIN = 0.30
# First round whose gate artifact is floor evidence: r07 is when the
# current query-plan generation and bench methodology stabilized (the
# provenance every committed floor block has used since r09). Earlier
# gates measured plans that were since replaced; their minima would
# arm the guard with times the current code never evidenced.
MIN_GATE_ROUND = 7


def block_of(sf: str) -> str:
    """Route an artifact to a floor block by its recorded corpus."""
    return "scaled" if pathlib.Path(sf or "sf0.1").name == SCALED_BASENAME \
        else "base"


def load(path: str, gate: bool):
    """-> (queries dict, block name)."""
    with open(path) as f:
        doc = json.load(f)
    # gate artifacts wrap the bench line under parsed.queries — and ONLY
    # there: a builder-local BENCH_LOCAL-style file (top-level queries)
    # passed in gate position would silently lower gate-evidenced floors
    # (round-11 advice), so the top-level fallback is seed-only
    parsed = doc.get("parsed") or {}
    qs = parsed.get("queries")
    sf = parsed.get("sf")
    if gate:
        if not isinstance(qs, dict) or not qs:
            raise SystemExit(
                f"{path}: no parsed.queries — not a GATE artifact. Local "
                f"BENCH_LOCAL-style files must come after --seed/--scaled-seed.")
    else:
        if not isinstance(qs, dict) or not qs:
            qs, sf = doc.get("queries"), doc.get("sf")
        if not isinstance(qs, dict) or not qs:
            raise SystemExit(f"{path}: no queries map — not a bench artifact?")
    return {k: float(v) for k, v in qs.items()}, block_of(sf)


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


def render(floors: dict, provenance: list, begin: str, end: str) -> str:
    body = []
    items = sorted(floors.items())
    for i in range(0, len(items), 4):
        chunk = ", ".join(f'"{q}" -> {t:.2f}' for q, t in items[i:i + 4])
        sep = "," if i + 4 < len(items) else ""
        body.append(f"    {chunk}{sep}")
    names = " ".join(pathlib.Path(a).name for a in provenance)
    return (begin + f" (from: {names} | clamped to >= {FLOOR_MIN:.2f}s)\n"
            + "\n".join(body) + "\n    " + end)


def split_flag(argv: list, flag: str):
    """Pop `flag` and every following arg up to the next --flag."""
    if flag not in argv:
        return argv, []
    i = argv.index(flag)
    rest, taken = argv[i + 1:], []
    while rest and not rest[0].startswith("--"):
        taken.append(rest.pop(0))
    return argv[:i] + rest, taken


def main():
    argv = sys.argv[1:]
    if not argv:
        raise SystemExit(__doc__)
    write = "--write" in argv
    argv = [a for a in argv if a != "--write"]
    argv, seeds = split_flag(argv, "--seed")
    argv, scaled_seeds = split_flag(argv, "--scaled-seed")
    # split_flag pops only the FIRST occurrence; a repeated flag (or a
    # typo'd one) must fail loudly, not be opened as a gate artifact
    stray = [a for a in argv if a.startswith("--") and a != "--from-artifacts"]
    if stray:
        raise SystemExit(f"unexpected/repeated flag(s): {stray} — pass each "
                         f"of --seed/--scaled-seed at most once, with all "
                         f"its files after it")
    if argv == ["--from-artifacts"]:
        gates = from_artifacts_args()
        if seeds:
            raise SystemExit("--from-artifacts takes no --seed (the r10+ "
                             "gates cover every query at sf0.1)")
    elif "--from-artifacts" in argv:
        raise SystemExit("--from-artifacts combines only with --scaled-seed")
    else:
        gates = argv
    if not gates:
        raise SystemExit("need at least one gate artifact")

    floors = {"base": {}, "scaled": {}}
    prov = {"base": [], "scaled": []}
    for a in gates:
        qs, blk = load(a, gate=True)
        prov[blk].append(a)
        for q, t in qs.items():
            floors[blk][q] = min(t, floors[blk].get(q, float("inf")))
    for blk, seed_files in (("base", seeds), ("scaled", scaled_seeds)):
        seeded = {}
        for a in seed_files:
            qs, sblk = load(a, gate=False)
            if sblk != blk:
                raise SystemExit(f"{a}: recorded corpus routes to the "
                                 f"'{sblk}' block, but it was passed as a "
                                 f"'{blk}' seed")
            for q, t in qs.items():
                if q not in floors[blk]:  # gate evidence always wins
                    seeded[q] = min(t, seeded.get(q, float("inf")))
        floors[blk].update(seeded)
        if seed_files:
            prov[blk] += [f"--{'scaled-' if blk == 'scaled' else ''}seed"] \
                + seed_files
    # tiny-floor clamp (see FLOOR_MIN) — applied LAST so it binds gate
    # evidence and seeds alike
    for blk in floors:
        floors[blk] = {q: max(t, FLOOR_MIN) for q, t in floors[blk].items()}

    orig = BENCH.read_text()
    src = orig
    for blk, (begin, end) in BLOCKS.items():
        if not floors[blk]:
            print(f"{blk} block: no inputs — left untouched")
            continue
        pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), flags=re.S)
        if not pat.search(src):
            raise SystemExit(f"markers for {blk} block not found in {BENCH}")
        gen = render(floors[blk], prov[blk], begin, end)
        src = pat.sub(lambda _: gen, src)
        print(f"{blk} block: {len(floors[blk])} floors "
              f"from {len(prov[blk])} inputs")
    if src == orig:
        print(f"{BENCH} already up to date")
    elif write:
        BENCH.write_text(src)
        print(f"wrote {BENCH}")
    else:
        import difflib
        sys.stdout.writelines(difflib.unified_diff(
            orig.splitlines(keepends=True), src.splitlines(keepends=True),
            fromfile=str(BENCH), tofile=f"{BENCH} (regenerated)"))
        print(f"\ndry run — {BENCH} NOT touched; pass --write to apply")


if __name__ == "__main__":
    main()
