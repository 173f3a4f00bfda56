"""Driver-window rotation policy (VERDICT r8 item 5, formalized).

The external correctness driver oracle-checks only the FIRST 50
registry entries each round, while the registry holds ~147 — so a
full revisit takes three rounds and the question "who gets a driver
CORRECTNESS row this round" needs a written, *executable* policy
instead of a hand-rotated list. The policy, unchanged since r7 but
now encoded here:

1. **Core sentinels every round.** The eight cross-cutting regression
   trip wires (dedup-count, decimal money, the 3-way join, the
   windowed alert, scored search, both sessionization variants,
   banded ratios) are seated in every window.
2. **Never-seated entries first.** A registry entry that has never
   had a fully-green driver row outranks everything (ledger round
   -1) — no entry ships a second round without driver contact.
3. **Stalest-first for the rest.** Remaining seats go to entries by
   ascending newest-green round (the cross-round ledger over all
   committed CORRECTNESS_r*.json files), name order as the
   deterministic tiebreak. This is a 3-round wheel at the current
   registry size: 50 seats - 8 sentinels = 42/round over ~139
   rotating entries.
4. **Steady-state registry.** The reference-parity + extension
   surface is complete (VERDICT r8: 52/52 operators); new entries
   are only added when a capability gap is found, and each new entry
   enters the next window via rule 2.

Every entry outside the window stays DuckDB-oracle-paired and is
verified by tests/test_oracle_queries.py at sf0.001 AND sf0.01 on
every pytest run — the cap only decides who gets a *driver* row.

The frozen window literal lives in plans/__init__.py (no file I/O at
import time); tests/test_round9_ops.py recomputes it from the
committed CORRECTNESS_r01..r08 ledger through this module and asserts
the literal matches, making the policy self-enforcing.
"""

from __future__ import annotations

import json

CORE_SENTINELS = [
    "q1_dau_total",
    "q3_gmv_total",
    "q5_sale_detail_join",
    "q6_alert_window",
    "q9b_scored_search",
    "q10_banded_ratios",
    "q20_sessionization",
    "q36_native_session_window",
]

DRIVER_CAP = 50


def row_is_green(rec: dict) -> bool:
    """A driver row counts as green when nothing mismatched, nothing
    errored, AND at least one check actually ran (a record with all
    three fields absent — a mid-check crash or schema drift — must not
    stamp the entry fresh and rotate it out of the next window;
    round-9 review). Rows-only checks (no oracle SQL) report None for
    the hash/schema fields — still green; the judge sees which."""
    if not isinstance(rec, dict) or rec.get("err"):
        return False
    checks = ("rows_match", "schema_match", "hash_match")
    return all(rec.get(k) in (True, None) for k in checks) and any(
        rec.get(k) is True for k in checks
    )


def ledger_from_files(paths: dict[int, str]) -> dict[str, int]:
    """{entry name -> newest round with a fully-green driver row},
    from {round -> CORRECTNESS_r{N}.json path}. Entries absent from
    every file are simply absent (never seated)."""
    newest: dict[str, int] = {}
    for rnd in sorted(paths):
        with open(paths[rnd]) as f:
            data = json.load(f)
        for name, rec in data.items():
            if row_is_green(rec):
                newest[name] = max(newest.get(name, -1), rnd)
    return newest


def driver_window(
    registry_names: list[str],
    ledger: dict[str, int],
    cap: int = DRIVER_CAP,
    sentinels: list[str] | None = None,
) -> list[str]:
    """The next round's driver window under the policy above:
    sentinels, then the (cap - len(sentinels)) stalest non-sentinel
    entries — never-seated (-1) first, then ascending newest-green
    round, name ascending within a round."""
    if sentinels is None:
        sentinels = CORE_SENTINELS
    if cap < len(sentinels):
        # a negative pool slice would silently return MORE than cap
        raise ValueError(
            f"cap={cap} is below the {len(sentinels)} always-seated sentinels"
        )
    missing = [s for s in sentinels if s not in registry_names]
    if missing:
        raise ValueError(f"sentinels not in registry: {missing}")
    pool = [n for n in registry_names if n not in sentinels]
    pool.sort(key=lambda n: (ledger.get(n, -1), n))
    return list(sentinels) + pool[: cap - len(sentinels)]
