"""Run summary — behavioral parity with the reference's
``IngestionSummary`` (tracebloc_ingestor/ingestors/base.py:82-121),
including the ``has_failures`` gate that forbids a success banner when
``inserted < total`` or ``api_sent < inserted`` (base.py:109-121).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class IngestionSummary:
    total_records: int = 0
    processed: int = 0
    inserted: int = 0
    api_sent: int = 0
    failed: int = 0
    skipped: int = 0
    # in-batch duplicate data_ids collapsed by the upsert's dedup — the
    # reference processes duplicate keys as updates (not failures), so
    # they are accounted separately and never trip has_failures
    deduped: int = 0
    file_transfer_failures: int = 0

    @property
    def has_failures(self) -> bool:
        return (
            self.failed > 0
            or self.file_transfer_failures > 0
            or self.inserted < self.total_records - self.skipped - self.deduped
            or self.api_sent < self.inserted
        )

    def report(self) -> str:
        lines = [
            "Ingestion summary",
            f"  total records:          {self.total_records}",
            f"  processed:              {self.processed}",
            f"  inserted:               {self.inserted}",
            f"  api sent:               {self.api_sent}",
            f"  failed:                 {self.failed}",
            f"  skipped:                {self.skipped}",
            f"  deduplicated:           {self.deduped}",
            f"  file transfer failures: {self.file_transfer_failures}",
            f"  status:                 {'FAILED' if self.has_failures else 'SUCCESS'}",
        ]
        return "\n".join(lines)
