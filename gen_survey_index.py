"""Regenerate SURVEY.md §2.17 (the declared-entry index) from the
registry + the cross-round driver ledger.

The table is the judge-facing contract index: one row per registered
entry, in DRIVER ORDER (the first 50 are the round's driver window),
with the entry's oracle kind, the last round in which the external
correctness driver recorded a green row for it (from
CORRECTNESS_r*.json), and its description. Run after any registry or
window change; tests/test_plans.py pins that every registry entry
appears in SURVEY.md.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
HEADER = (
    "| # | entry | oracle | last driver-green | description |\n"
    "|---|---|---|---|---|\n"
)


def ledger() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and v.get("err") is None
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def render() -> str:
    """The §2.17 table text (header + one row per registry entry, in
    driver order) — exposed so tests can pin SURVEY.md against drift."""
    from sparkstreaming_gmall_demo_spark.plans import _DRIVER_CAP, REGISTRY

    green = ledger()
    next_round = max(green.values(), default=0) + 1
    lines = [HEADER]
    for i, (name, spec) in enumerate(REGISTRY.items(), start=1):
        oracle = "sql" if spec.oracle is not None else ""
        last = f"r{green[name]}" if name in green else "never"
        if i <= _DRIVER_CAP:
            last += f" (seated r{next_round})"
        lines.append(f"| {i} | {name} | {oracle} | {last} | {spec.description} |\n")
    return "".join(lines)


def extract_table(text: str) -> str:
    """The committed §2.17 table (header + contiguous |-rows) out of a
    SURVEY.md text — the parse main() replaces, exposed for the
    staleness guard."""
    marker = "## 2.17 Declared-entry index"
    _, _, rest = text.partition(marker)
    if not rest:
        raise ValueError("SURVEY.md has no §2.17 marker")
    after = rest[rest.index("| # |"):]
    lines = after.splitlines(keepends=True)
    n = 0
    while n < len(lines) and lines[n].startswith("|"):
        n += 1
    return "".join(lines[:n])


def strip_ledger_column(table: str) -> str:
    """Drop the 'last driver-green' column: the driver writes
    CORRECTNESS_r{N}.json AFTER the builder's final commit, so the
    committed ledger column is one artifact behind by construction
    (r5/r6 verdicts) — the staleness guard compares everything else
    byte-for-byte."""
    out = []
    for line in table.splitlines():
        cells = line.split("|")
        if len(cells) >= 7:
            del cells[4]
        out.append("|".join(cells))
    return "\n".join(out) + "\n"


def main() -> None:
    table = render()
    survey_path = os.path.join(REPO, "SURVEY.md")
    with open(survey_path) as f:
        text = f.read()
    # replace the contiguous table (header + rows) after the §2.17 title
    marker = "## 2.17 Declared-entry index"
    head, _, rest = text.partition(marker)
    if not rest:
        raise SystemExit("SURVEY.md has no §2.17 marker")
    table_start = rest.index("| # |")
    preamble = rest[:table_start]
    after = rest[table_start:]
    # the table is the trailing run of |-prefixed lines; keep whatever
    # follows it (currently nothing)
    tail_lines = after.splitlines(keepends=True)
    n = 0
    while n < len(tail_lines) and tail_lines[n].startswith("|"):
        n += 1
    remainder = "".join(tail_lines[n:])
    with open(survey_path, "w") as f:
        f.write(head + marker + preamble + table + remainder)
    print(f"wrote {table.count(chr(10)) - 2} rows")


if __name__ == "__main__":
    main()
