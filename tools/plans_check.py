#!/usr/bin/env python
"""Diff the per-round plan-fingerprint artifact (PLANS_latest.json,
written by bench.py) against the committed SCALE.md plan table.

Wall-time regressions are drowned by box noise (BASELINE.md §r10);
plan stats are deterministic, so THIS is the per-round regression
signal: a query whose shuffle count grew, whose broadcast join became
a sort-merge join, or that sprouted a cartesian shows up here even
when timings cannot distinguish it from jitter.

    python tools/plans_check.py [--plans PLANS_latest.json]

Exit 0 when every query matches; exit 1 with one line per drift.
Queries present on only one side are reported too (new/removed
queries are expected to come with a regenerated SCALE.md in the same
commit — `python tools/plan_report.py`).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# SCALE.md columns the artifact also carries (wsc is runtime-only in
# AQE plans and intentionally excluded from the comparable set)
FIELDS = ("exch", "bhj", "smj", "cart", "push")


def parse_scale_md(path: str) -> dict[str, dict]:
    rows: dict[str, dict] = {}
    # the push cell may carry a footnote marker (strip_dup_spans¹:
    # the count-prunes-projection timing caveat, SCALE.md r11)
    pat = re.compile(
        r"^\| (\S+) \| (\d+|—) \| (\d+|—) \| (\d+|—) \| (\d+|—) \| (?:\d+|—) \| (yes|—|error.*?)¹? \|$"
    )
    with open(path) as f:
        for line in f:
            m = pat.match(line.rstrip())
            if not m:
                continue
            name, exch, bhj, smj, cart, push = m.groups()
            if exch == "—":  # error row in SCALE.md
                rows[name] = {"err": push}
                continue
            rows[name] = {
                "exch": int(exch),
                "bhj": int(bhj),
                "smj": int(smj),
                "cart": int(cart),
                "push": push == "yes",
            }
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=os.path.join(REPO, "PLANS_latest.json"))
    ap.add_argument("--scale", default=os.path.join(REPO, "SCALE.md"))
    args = ap.parse_args()

    with open(args.plans) as f:
        plans = json.load(f)
    scale = parse_scale_md(args.scale)

    drifts: list[str] = []
    for name in sorted(set(plans) | set(scale)):
        p, s = plans.get(name), scale.get(name)
        if p is None:
            drifts.append(f"{name}: in SCALE.md but missing from artifact")
            continue
        if s is None:
            drifts.append(f"{name}: in artifact but missing from SCALE.md")
            continue
        if "err" in p or "err" in s:
            # error on either side only drifts if the other side is clean
            if ("err" in p) != ("err" in s):
                drifts.append(f"{name}: plan errors on one side only ({p} vs {s})")
            continue
        diffs = [
            f"{k} {s[k]}->{p[k]}" for k in FIELDS if p.get(k) != s.get(k)
        ]
        if diffs:
            drifts.append(f"{name}: {', '.join(diffs)}")

    if drifts:
        print(f"{len(drifts)} plan drift(s) vs SCALE.md:")
        for d in drifts:
            print(f"  {d}")
        return 1
    print(f"all {len(plans)} query plans match SCALE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
