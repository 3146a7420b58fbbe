"""Plan doctor: static scale-hazard diagnostics for any DataFrame.

``diagnose(df)`` inspects the physical plan text and returns findings
for the anti-patterns that actually kill jobs at 100 TB — the same
checks the test-suite plan audits assert, packaged for users to run
against their own queries before launching them:

- D1 cartesian: a CartesianProduct / BroadcastNestedLoopJoin without
  a LIMIT in the plan — O(n*m) row explosion.
- D2 single-partition exchange: a SinglePartition shuffle (e.g. an
  unpartitioned window) funneling the whole dataset through one task.
  A global orderBy does NOT trigger this — range partitioning stays
  parallel.
- D3 unpushed filter: a Filter node carries real comparisons while
  the parquet scan pushed nothing beyond IsNotNull — the predicate
  runs after reading every row (usually a cast/UDF around the column).
- D4 wide scan: a scan whose ReadSchema lists many more columns than
  the plan's project — column pruning defeated.
- D5 shuffle count: informational tally of Exchange operators.

Findings are strings prefixed with their code; empty list = clean.
Deliberately bounded designs still flag (a limited cross join, a
scalar-subquery nested loop, an advisory small-side SMJ) — that is
intentional: those plans deserve the second look the finding asks for.
Across this repo's own 106-query registry the doctor raises exactly
the deliberate cases and nothing else (see the audit in the r3 log).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def _plan_text(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(df: DataFrame) -> dict:
    """Compact, comparable physical-plan fingerprint: shuffle count,
    join kinds, cartesians, and whether any parquet scan got pushed
    filters. The per-round PLANS artifact (bench.py) and SCALE.md
    (tools/plan_report.py) both count from this one implementation so
    a plan regression diffs identically everywhere. Counts come from
    the numbered detail headers only — formatted mode also draws the
    tree, which would double-count."""
    plan = _plan_text(df)
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)
    return {
        "exch": sum(1 for o in ops if o == "Exchange"),
        "bhj": sum(1 for o in ops if o == "BroadcastHashJoin"),
        "smj": sum(1 for o in ops if o == "SortMergeJoin"),
        "cart": sum(
            1 for o in ops if o in ("CartesianProduct", "BroadcastNestedLoopJoin")
        ),
        "push": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
    }


def diagnose(df: DataFrame, *, shuffle_warn_threshold: int = 6) -> list[str]:
    plan = _plan_text(df)
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)
    findings: list[str] = []

    n_cart = sum(1 for o in ops if o in ("CartesianProduct", "BroadcastNestedLoopJoin"))
    if n_cart and not any(o in ("GlobalLimit", "LocalLimit", "CollectLimit") for o in ops):
        findings.append(
            f"D1 cartesian: {n_cart} unbounded cartesian/nested-loop join(s) — "
            "row count multiplies; add an equi-condition, broadcast a bounded "
            "side, or limit the result"
        )

    # single-partition funnels are only a hazard when real per-row work
    # (a Window) runs there — a final global aggregate reduces to one
    # row per upstream partition map-side first, which is fine. The
    # check is ADJACENCY-aware (r9): the SinglePartition exchange must
    # feed the Window itself (Window → [Sort/AQE reads] → Exchange in
    # the plan tree); a 1-row global-agg SinglePartition elsewhere in
    # the same plan as a properly-partitioned window is benign (the
    # corpus-adaptive sampling modulus pattern hit exactly this).
    win_single = False
    for m in re.finditer(
        r"Window \(\d+\)"
        r"((?:\n[^\n]*?(?:Sort|AQEShuffleRead|ShuffleQueryStage) \(\d+\))*)"
        r"\n[^\n]*?Exchange \((\d+)\)",
        plan,
    ):
        ex_id = m.group(2)
        # bound the Arguments probe to THAT exchange's own detail block:
        # stop at the next "(<id>) " header so a benign SinglePartition
        # exchange later in the plan (the common window-then-global-agg
        # shape) can't lazily satisfy the match (r10, ADVICE).
        if re.search(
            rf"^\({ex_id}\) Exchange[^\n]*\n"
            rf"(?:(?!^\(\d+\) )[^\n]*\n)*?"
            rf"[^\n]*Arguments: SinglePartition",
            plan,
            flags=re.M,
        ):
            win_single = True
            break
    if win_single:
        findings.append(
            "D2 single-partition window: an unpartitioned window is "
            "funneling all rows through ONE task — partition the window or "
            "use a per-group form"
        )

    # unpushed filter: a Filter DIRECTLY ABOVE a scan carries real
    # comparisons while that scan pushed nothing beyond IsNotNull — the
    # predicate wraps the column (cast/function) so the reader cannot
    # skip row groups. Filters later in the plan (over joined/computed
    # values) legitimately cannot push and are not flagged.
    scans = re.findall(r"^\(\d+\) Scan parquet[\s\S]*?(?=^\(\d+\) |\Z)", plan, flags=re.M)
    # tree adjacency: Filter whose direct child is the (ColumnarToRow->)scan
    filter_over_scan = re.search(
        r"Filter \(\d+\)\s*\n\s*\+- \*?\s?ColumnarToRow \(\d+\)\s*\n\s*\+- Scan parquet",
        plan,
    )
    conditions = re.findall(r"^Condition : (.+)$", plan, flags=re.M)
    has_real_predicate = any(
        re.search(r"[=<>]", re.sub(r"isnotnull\([^)]*\)", "", cond, flags=re.I))
        for cond in conditions
    )
    for scan in scans:
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", scan)
        if pushed is None:
            continue
        entries = [e.strip() for e in pushed.group(1).split(",") if e.strip()]
        only_nullchecks = all(e.startswith("IsNotNull") for e in entries)
        if filter_over_scan and has_real_predicate and only_nullchecks:
            findings.append(
                "D3 unpushed filter: a Filter directly above a parquet scan "
                "carries real comparisons but the scan pushed nothing beyond "
                "IsNotNull — the predicate likely wraps the column in a "
                "cast/function; compare against the raw column so the scan "
                "can skip row groups"
            )
            break

    for scan in scans:
        m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
        if m:
            n_read = len(m.group(1).split(",")) if m.group(1).strip() else 0
            if n_read >= 10:
                findings.append(
                    f"D4 wide scan: a parquet scan reads {n_read} columns — "
                    "if the query uses fewer, select them explicitly so "
                    "pruning reaches the reader"
                )
                break

    # D6: a sort-merge join while one joined scan reads a small file —
    # broadcasting it would drop both shuffle+sort. Static check: stat
    # each scanned location and compare against the session's
    # autoBroadcastJoinThreshold.
    # FullOuter sort-merge joins are exempt: broadcast-hash does not
    # support full outer, so there is nothing actionable to suggest
    smj_types = re.findall(r"SortMergeJoin[\s\S]{0,200}?Join type: (\w+)", plan)
    if any(o == "SortMergeJoin" for o in ops) and any(t != "FullOuter" for t in smj_types or ["Inner"]):
        import os as _os

        try:
            thresh_raw = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
            mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
            tl = thresh_raw.strip().lower().rstrip("b")
            thresh = int(float(tl[:-1]) * mult[tl[-1]]) if tl and tl[-1] in mult else int(tl)
        except Exception:
            thresh = 10 << 20
        if thresh <= 0:
            # broadcast disabled in conf (that's WHY the SMJ exists) —
            # still advise against Spark's default 10 MB budget
            thresh = 10 << 20
        if thresh > 0:
            for loc in re.findall(r"Location: \w+ \[([^\]]+)\]", plan):
                p = loc.split(",")[0].replace("file:", "")
                try:
                    size = (
                        sum(
                            _os.path.getsize(_os.path.join(r, f))
                            for r, _, fs in _os.walk(p)
                            for f in fs
                        )
                        if _os.path.isdir(p)
                        else _os.path.getsize(p)
                    )
                except OSError:
                    continue
                if 0 < size < thresh:
                    findings.append(
                        f"D6 broadcastable side: a sort-merge join reads "
                        f"{p} ({size >> 10} KB, under the "
                        f"{thresh >> 20} MB broadcast threshold) — "
                        "broadcast() it to drop the shuffle and sort"
                    )
                    break

    n_exch = sum(1 for o in ops if o == "Exchange")
    if n_exch >= shuffle_warn_threshold:
        findings.append(
            f"D5 shuffle count: {n_exch} exchanges in one plan — check for "
            "repeated re-partitioning; reuse one partitioning across stages "
            "where keys align"
        )

    return findings
