"""Regenerate QUERIES.md from the registry + CORRECTNESS_r*.json history.

Run from the repo root: ``python scripts/gen_queries_md.py``. Kept as a
committed script (instead of a snippet in git history) so the catalog can
be regenerated in the same commit that registers a query — the
new-query wiring rule in .claude/skills/verify/SKILL.md.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")

from kinesis_stream_video_project_spark.plans import registry  # noqa: E402

def _load_correctness() -> list[tuple[int, dict]]:
    out = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        with open(path) as f:
            out.append((rnd, json.load(f)))
    return out


_CORRECTNESS = _load_correctness()

# Current round = one past the newest driver artifact (the driver writes
# CORRECTNESS_r{N}.json AFTER round N's commits, so when it appears the
# repo is already in round N+1). Deriving it — instead of hand-bumping a
# constant — means the first-commit regeneration of each round absorbs
# the new (untracked) artifact automatically and the committed catalog
# never drifts by a stale-round's worth of status cells (VERDICT r9
# item 5).
ROUND = max((rnd for rnd, _ in _CORRECTNESS), default=0) + 1


def latest_green(name: str) -> int | None:
    best = None
    for rnd, data in _CORRECTNESS:
        row = data.get(name)
        if row and row.get("hash_match") and not row.get("err"):
            best = rnd
    return best


def summary(doc: str, limit: int = 68) -> str:
    first = (doc or "").strip().splitlines()[0] if doc else ""
    first = first.replace("|", "\\|")
    out: list[str] = []
    for w in first.split():
        if sum(len(x) + 1 for x in out) + len(w) > limit:
            break
        out.append(w)
    return " ".join(out)


def main() -> None:
    # Canonical order (VERDICT r7 item 5): the 50-entry driver window in
    # its export order (that order IS the verification budget), then every
    # remaining query sorted by name — regeneration on a clean tree is a
    # no-op regardless of module import order, so doc drift is
    # diff-detectable.
    raw = registry.all_queries()
    window = list(raw.items())[:50]
    rest = sorted(list(raw.items())[50:], key=lambda kv: kv[0])
    specs = dict(window + rest)
    lines = [
        "# QUERIES — generated catalog of the registered surface",
        "",
        "Generated from `plans/registry.py` by `scripts/gen_queries_md.py`.",
        "One row per `queries()` entry: the first 50 (the",
        f"round-{ROUND} driver verification window) in export order, the",
        "rest sorted by name (canonical — regeneration is drift-detectable",
        "by diff). Driver column:",
        "r1..r4 = latest round with a green CORRECTNESS row; "
        f"w{ROUND} = in the round-{ROUND} window (checked this round); "
        f"`new` = registered in round {ROUND}.",
        "Every entry has a DuckDB oracle — zero rows-only queries.",
        "",
        "| # | Query | Oracle | Driver | Tags | Summary |",
        "|---|---|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(specs.items(), start=1):
        green = latest_green(name)
        driver = f"r{green}" if green else "new"
        if i <= 50:
            driver += f"+w{ROUND}"
        tags = ", ".join(spec.tags)
        lines.append(
            f"| {i} | `{name}` | {'yes' if spec.oracle else 'ROWS-ONLY'} |"
            f" {driver} | {tags} | {summary(spec.doc)} |"
        )
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md: {len(specs)} queries")


if __name__ == "__main__":
    main()
