"""Declarative data expectations (dbt-test / Great-Expectations
style), evaluated in ONE conditional-aggregation pass over the
already-cached source frame — the same execution shape as the
validator battery (SURVEY.md §2.4), so adding 50 expectations adds
zero extra scans.

Supported forms per expectation item:

- ``{"column": c, "checks": ["not_null", "unique"]}``
- ``{"column": c, "accepted_values": [..]}``
- ``{"column": c, "between": [lo, hi]}``  (inclusive; nulls pass —
  pair with not_null to forbid)
- ``{"column": c, "matches": "^regex$"}``  (nulls pass)
- ``{"expression": "price >= cost"}``  row-level SQL predicate that
  must hold on every row (nulls fail — an unknown truth value is a
  violation, matching SQL CHECK semantics would silently pass them)

``unique`` is the one non-row-local check; it still folds into the
same aggregation via count(col) - count(DISTINCT col).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ExpectationResult:
    name: str
    n_violations: int
    sample: str | None = None

    @property
    def passed(self) -> bool:
        return self.n_violations == 0


@dataclass
class ExpectationReport:
    results: list[ExpectationResult] = field(default_factory=list)

    @property
    def failed(self) -> list[ExpectationResult]:
        return [r for r in self.results if not r.passed]

    @property
    def is_valid(self) -> bool:
        return not self.failed

    def errors(self) -> list[str]:
        return [
            f"expectation '{r.name}': {r.n_violations} violation(s)"
            + (f" (e.g. {r.sample!r})" if r.sample is not None else "")
            for r in self.failed
        ]


def _row_checks(item: dict) -> list[tuple[str, "F.Column", "F.Column | None"]]:
    """(name, violation_condition, sample_value) triples for the
    row-local checks of one expectation item."""
    out: list[tuple[str, F.Column, F.Column | None]] = []
    col = item.get("column")
    c = F.col(col) if col else None
    for check in item.get("checks", []):
        if check == "not_null":
            out.append((f"{col}.not_null", c.isNull(), None))
        elif check == "unique":
            pass  # aggregated separately below
        else:
            raise ValueError(f"unknown check {check!r} for column {col!r}")
    if "accepted_values" in item:
        vals = item["accepted_values"]
        cond = c.isNotNull() & ~c.cast("string").isin([str(v) for v in vals])
        out.append((f"{col}.accepted_values", cond, c.cast("string")))
    if "between" in item:
        lo, hi = item["between"]
        d = c.cast("double")
        cond = c.isNotNull() & ((d < float(lo)) | (d > float(hi)) | d.isNull())
        out.append((f"{col}.between[{lo},{hi}]", cond, c.cast("string")))
    if "matches" in item:
        pat = item["matches"]
        cond = c.isNotNull() & ~c.cast("string").rlike(pat)
        out.append((f"{col}.matches", cond, c.cast("string")))
    if "expression" in item:
        expr = item["expression"]
        # NULL predicate = violation (fail-closed)
        cond = ~F.coalesce(F.expr(expr), F.lit(False))
        out.append((f"expr:{expr}", cond, None))
    return out


def evaluate_expectations(df: DataFrame, expectations: list[dict]) -> ExpectationReport:
    """Evaluate every expectation in one df.agg() job."""
    aggs: list[F.Column] = []
    names: list[str] = []
    sampled: dict[str, bool] = {}

    for item in expectations:
        for name, cond, sample in _row_checks(item):
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{len(names)}"))
            sampled[name] = sample is not None
            if sample is not None:
                aggs.append(F.first(F.when(cond, sample), ignorenulls=True).alias(f"s_{len(names)}"))
            names.append(name)
        col = item.get("column")
        if col and "unique" in item.get("checks", []):
            name = f"{col}.unique"
            aggs.append(
                (F.count(col) - F.countDistinct(col)).alias(f"n_{len(names)}")
            )
            sampled[name] = False
            names.append(name)

    if not aggs:
        return ExpectationReport([])
    row = df.agg(*aggs).collect()[0]
    results = []
    for i, name in enumerate(names):
        n = int(row[f"n_{i}"] or 0)
        sample = row[f"s_{i}"] if sampled[name] and n else None
        results.append(ExpectationResult(name, n, sample))
    return ExpectationReport(results)
