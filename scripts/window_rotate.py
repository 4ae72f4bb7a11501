"""Mechanical driver-window rotation (the r15+ steady state).

COVERAGE.md's ledger rule, executable: the next round's 50-slot
driver window is

  1. RED rows from the newest CORRECTNESS_r*.json (hash/schema/row
     mismatch or error), in registration order — rule 2 re-entry;
  2. never-driver-checked queries, in registration order — rule 1;
  3. everything else by staleness: the round of each query's LATEST
     driver row ascending, ties broken by registration order.

Usage:
  python scripts/window_rotate.py            # print the computed list
  python scripts/window_rotate.py --check    # diff vs registry._WINDOW_PRIORITY
                                             # (exit 1 on mismatch)
  python scripts/window_rotate.py --emit     # paste-ready Python list

--check is what a round-start rotation commit should leave green —
run it right AFTER rotating, before registering new queries (a round
may then legitimately diverge: the r13 ledger held its three
additions for r14 because the window was pinned to the judge's
pre-commitment; additions inserted per rule 1 keep --check green).
--next previews the FOLLOWING round's window by assuming every
current _WINDOW_PRIORITY row comes back green — the list a round-end
pre-commitment should write into the ledger. Registration order =
registry.load_all() import order, read from RAW_QUERIES (insertion
order, never reordered by the window priority itself).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sparrow_spark import registry  # noqa: E402

WINDOW = 50


def _row_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match", True)  # rows-only checks lack hashes
        and not row.get("err")
    )


REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def correctness_files() -> list[tuple[int, str]]:
    out = []
    # Anchored to the repo root, not the CWD — run from anywhere a
    # missing-file result means the files are genuinely absent, not
    # that we were invoked from the wrong directory.
    for p in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)", os.path.basename(p))
        if m:
            out.append((int(m.group(1)), p))
    if not out:
        raise SystemExit(
            f"no CORRECTNESS_r*.json found under {REPO_ROOT} — "
            "cannot compute a staleness window"
        )
    return sorted(out)


def compute_window(
    assume_current_green: bool = False,
    exclude: set[str] | None = None,
) -> list[str]:
    registry.load_all()
    reg_order = [
        n for n in registry.RAW_QUERIES if not (exclude and n in exclude)
    ]  # decorator insertion order
    pos = {n: i for i, n in enumerate(reg_order)}

    latest_round: dict[str, int] = {}
    latest_green: dict[str, bool] = {}
    newest = 0
    for rnd, path in correctness_files():
        newest = max(newest, rnd)
        data = json.load(open(path))
        for name, row in data.items():
            if name not in pos:
                continue  # renamed/retired queries
            latest_round[name] = rnd
            latest_green[name] = _row_green(row)
    if assume_current_green:
        newest += 1
        for name in registry._WINDOW_PRIORITY:
            if name in pos:
                latest_round[name] = newest
                latest_green[name] = True

    reds = sorted(
        (n for n in reg_order if latest_round.get(n) == newest
         and not latest_green.get(n, True)),
        key=pos.__getitem__,
    )
    never = [n for n in reg_order if n not in latest_round]
    stale = sorted(
        (n for n in reg_order if n in latest_round and n not in reds),
        key=lambda n: (latest_round[n], pos[n]),
    )
    window = (reds + never + stale)[:WINDOW]
    return window


def rotation_round() -> int:
    """The round whose window the CURRENT registry should encode:
    newest CORRECTNESS round + 1."""
    return correctness_files()[-1][0] + 1


def main() -> int:
    if "--check-if-fresh" in sys.argv:
        # Gate mode: enforce the window rule only while the rotation
        # is fresh — i.e. no CORRECTNESS file for the rotation round
        # exists yet AND no queries were registered after the window
        # was cut. Mid-round additions enter at the never-checked
        # head (rule 2 of compute_window), which legitimately
        # diverges from a pinned list until the next rotation; in
        # that state this mode reports and passes.
        registry.load_all()
        current = list(registry._WINDOW_PRIORITY)
        window = compute_window()
        if current == window:
            print(f"window check: OK ({len(window)} slots match the "
                  "mechanical rule)")
            return 0
        newest_data = json.load(open(correctness_files()[-1][1]))
        newest_keys = set(newest_data)
        if set(current) <= newest_keys:
            # The pinned window has already been GRADED (every row
            # appears in the newest CORRECTNESS file): the registry is
            # between rounds and divergence from the freshly-computed
            # next window is expected — the round-start rotation commit
            # resolves it. Failing here would wedge gate.sh stage 1 for
            # the whole window between a verdict landing and the next
            # rotation. But "graded" is not a free pass (the r15
            # verdict's demonstrated gap): the driver writes its rows
            # in the order it graded them — the pinned order at grading
            # time — so the pinned slots must still match that
            # artifact's row order exactly, or an unexcused reordering
            # could hide between the verdict landing and the next
            # rotation commit.
            graded_order = [n for n in newest_data if n in set(current)]
            if current == graded_order:
                print("window check: SKIP — the pinned window is fully "
                      "graded by the newest CORRECTNESS round (slot "
                      "order verified against the graded artifact's "
                      "row order); rotation is due at round start "
                      "(run --emit and update the ledger)")
                return 0
            print("window check: MISMATCH — the pinned window is fully "
                  "graded but its slot order diverges from the newest "
                  "CORRECTNESS artifact's row order (unexcused "
                  "reordering after grading)")
            for i, (a, b) in enumerate(zip(current, graded_order)):
                if a != b:
                    print(f"  slot {i + 1}: registry={a}  graded={b}")
            return 1
        known = set()
        for _, path in correctness_files():
            known.update(json.load(open(path)))
        additions = [n for n in registry.RAW_QUERIES
                     if n not in known and n not in current]
        if additions:
            # Mid-round additions not yet inserted into the pinned
            # window legitimately diverge until the next rotation —
            # but the NON-addition slots must still obey the rule:
            # recompute the window as if the additions did not exist
            # and require the pinned list to match it exactly, so an
            # unexcused reordering of existing slots cannot hide
            # behind an unrelated addition.
            expected = compute_window(exclude=set(additions))
            if current == expected:
                print("window check: OK — non-addition slots match the "
                      f"mechanical rule; {len(additions)} mid-round "
                      "addition(s) pending insertion (legitimate until "
                      "next rotation): " + ", ".join(additions[:10]))
                return 0
            print("window check: MISMATCH — non-addition slots diverge "
                  "from the mechanical rule (additions ignored: "
                  + ", ".join(additions[:10]) + ")")
            for i, (a, b) in enumerate(zip(current, expected)):
                if a != b:
                    print(f"  slot {i + 1}: registry={a}  computed={b}")
            return 1
        print("window check: MISMATCH (no mid-round additions excuse it)")
        for i, (a, b) in enumerate(zip(current, window)):
            if a != b:
                print(f"  slot {i + 1}: registry={a}  computed={b}")
        return 1
    window = compute_window(assume_current_green="--next" in sys.argv)
    if "--emit" in sys.argv:
        print("_WINDOW_PRIORITY: list[str] = [")
        for n in window:
            print(f'    "{n}",')
        print("]")
        return 0
    if "--check" in sys.argv:
        current = list(registry._WINDOW_PRIORITY)
        if current == window:
            print(f"window check: OK ({len(window)} slots match the "
                  "mechanical rule)")
            return 0
        print("window check: MISMATCH")
        for i, (a, b) in enumerate(zip(current, window)):
            if a != b:
                print(f"  slot {i + 1}: registry={a}  computed={b}")
        extra = len(current) - len(window)
        if extra:
            print(f"  length differs by {extra}")
        return 1
    for i, n in enumerate(window, 1):
        print(f"{i:3d}  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
