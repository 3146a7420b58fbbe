"""K3/K4: REST metadata sink + dataset registration sequence.

Behavioral contract from the reference API client
(tracebloc_ingestor/api/client.py:217-505) and the registration block
in ``BaseIngestor.ingest`` (ingestors/base.py:861-918):

- **send_batch** posts per-record metadata (data_id / data_intent /
  label / is_sample / ingestor id) for one batch; returns False on any
  HTTP/transport error after retries — the caller counts, never
  raises, so one bad batch doesn't abort the run but DOES trip the
  ``has_failures`` gate (api_sent < inserted).
- **401 handling**: one token refresh + single retry per request
  (client.py:195-215).
- **registration** is a 4-step sequence after rows are committed:
  edge-label meta (skipped for self-supervised categories) → global
  schema metadata → prepare → create. Any failure raises — the rows
  are already committed, so silent skips would leave a half-created
  dataset (the reference's fail-loud fix).

Transport is stdlib ``urllib`` (no hard dependency); tests run against
``MockApiSink``, the in-process double mirroring the reference's
permissive mock backend (e2e/conftest.py:40-68) plus failure
injection.

Scale note: metadata batches stream through the driver via
``toLocalIterator`` — one batch in memory at a time, same as the
reference's batched send but without its full-table materialization.
The payload is 3 small fields/row; at 100 TB the bottleneck is the
receiving API, not this iterator. If the backend ever supports bulk
ingestion from object storage, swap the sink for a manifest upload.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Any, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETRY_MAX_ATTEMPTS = 3
RETRY_WAIT_MIN = 1.0
RETRY_WAIT_MAX = 10.0
API_TIMEOUT = 30.0

# Categories with no label column — the edge-label registration call
# would 400 (reference base.py:77-80).
SELF_SUPERVISED_CATEGORIES = frozenset({"masked_language_modeling"})


class ApiSink(Protocol):
    """The surface the pipeline needs; HttpApiSink and MockApiSink
    both satisfy it."""

    def send_batch(self, records: list[dict], table_name: str, ingestor_id: str) -> bool: ...

    def send_generate_edge_label_meta(
        self, table_name: str, ingestor_id: str, intent: str
    ) -> bool: ...

    def send_global_meta_meta(
        self, table_name: str, schema: dict[str, str], add_info: dict
    ) -> bool: ...

    def prepare_dataset(
        self, category: str, ingestor_id: str, data_format: str, intent: str
    ) -> bool: ...

    def create_dataset(self, category: str, ingestor_id: str) -> dict[str, Any]: ...


# --- HTTP implementation ------------------------------------------------


class HttpApiSink:
    """stdlib-urllib client: token auth, bounded retry with exponential
    backoff on transport errors/5xx, one 401-refresh-retry."""

    def __init__(
        self,
        endpoint: str,
        *,
        token: str | None = None,
        client_id: str | None = None,
        client_password: str | None = None,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.client_id = client_id
        self.client_password = client_password
        self.token = token or self._authenticate()

    # -- transport -------------------------------------------------------

    def _authenticate(self) -> str:
        if not (self.client_id and self.client_password):
            raise ValueError("HttpApiSink needs a token or client_id+client_password")
        body = json.dumps(
            {"username": self.client_id, "password": self.client_password}
        ).encode()
        req = urllib.request.Request(
            f"{self.endpoint}/api-token-auth/",
            data=body,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=API_TIMEOUT) as resp:
            return json.loads(resp.read())["token"]

    def _request(self, method: str, path: str, payload: dict | list | None = None) -> dict:
        """One authed request with retry; raises urllib.error.HTTPError
        after retries are exhausted. A 401 triggers a single token
        refresh + retry (client.py:195-215)."""
        data = json.dumps(payload).encode() if payload is not None else None
        last: Exception | None = None
        delay = RETRY_WAIT_MIN
        refreshed = False
        for attempt in range(RETRY_MAX_ATTEMPTS):
            req = urllib.request.Request(
                f"{self.endpoint}{path}",
                data=data,
                headers={
                    "Content-Type": "application/json",
                    "Authorization": f"TOKEN {self.token}",
                },
                method=method,
            )
            try:
                with urllib.request.urlopen(req, timeout=API_TIMEOUT) as resp:
                    body = resp.read()
                    return json.loads(body) if body else {}
            except urllib.error.HTTPError as e:
                if e.code == 401 and not refreshed and self.client_id:
                    refreshed = True
                    self.token = self._authenticate()
                    continue  # immediate retry with the fresh token
                if e.code < 500:
                    raise  # client errors won't heal with retries
                last = e
            except (urllib.error.URLError, OSError) as e:
                last = e
            if attempt < RETRY_MAX_ATTEMPTS - 1:
                time.sleep(min(delay, RETRY_WAIT_MAX))
                delay *= 2
        raise last  # type: ignore[misc]

    def _try(self, method: str, path: str, payload=None) -> bool:
        try:
            self._request(method, path, payload)
            return True
        except Exception:
            return False

    # -- ApiSink surface --------------------------------------------------

    def send_batch(self, records: list[dict], table_name: str, ingestor_id: str) -> bool:
        payload = [
            {
                "data_id": r.get("data_id"),
                "data_intent": r.get("data_intent", "train"),
                "label": r.get("label", ""),
                "is_sample": False,
                "injestor_id": ingestor_id,  # sic — wire-format field name
            }
            for r in records
        ]
        return self._try("POST", f"/global_meta/{table_name}/", payload)

    def send_generate_edge_label_meta(self, table_name, ingestor_id, intent) -> bool:
        return self._try(
            "GET",
            f"/global_meta/generate-edge-labels-meta/?table_name={table_name}"
            f"&injestor_id={ingestor_id}&data_intent={intent}",
        )

    def send_global_meta_meta(self, table_name, schema, add_info) -> bool:
        return self._try(
            "POST",
            "/global_meta/global_metadata/",
            {"table_name": table_name, "schema": schema, "meta_data": add_info},
        )

    def prepare_dataset(self, category, ingestor_id, data_format, intent) -> bool:
        return self._try(
            "GET",
            f"/global_meta/prepare/?category={category}&injestor_id={ingestor_id}"
            f"&data_format={data_format}&data_intent={intent}",
        )

    def create_dataset(self, category, ingestor_id) -> dict[str, Any]:
        return self._request(
            "POST",
            "/dataset/",
            {"title": f"{category}_{ingestor_id}",
             "allow_feature_modification": category == "tabular_classification"},
        )


# --- test double --------------------------------------------------------


class MockApiSink:
    """In-process double: records every call; inject failures via
    ``fail_batches`` (0-based indices of send_batch calls to reject) or
    ``fail_steps`` (registration method names returning False)."""

    def __init__(self, fail_batches: set[int] | None = None, fail_steps: set[str] | None = None):
        self.fail_batches = fail_batches or set()
        self.fail_steps = fail_steps or set()
        self.batches: list[list[dict]] = []
        self.calls: list[tuple[str, tuple]] = []

    def send_batch(self, records, table_name, ingestor_id) -> bool:
        idx = len(self.batches)
        self.batches.append(list(records))
        self.calls.append(("send_batch", (table_name, ingestor_id, len(records))))
        return idx not in self.fail_batches

    def _step(self, name: str, *args) -> bool:
        self.calls.append((name, args))
        return name not in self.fail_steps

    def send_generate_edge_label_meta(self, *a) -> bool:
        return self._step("send_generate_edge_label_meta", *a)

    def send_global_meta_meta(self, *a) -> bool:
        return self._step("send_global_meta_meta", *a)

    def prepare_dataset(self, *a) -> bool:
        return self._step("prepare_dataset", *a)

    def create_dataset(self, *a) -> dict[str, Any]:
        self.calls.append(("create_dataset", a))
        if "create_dataset" in self.fail_steps:
            raise RuntimeError("create_dataset failed")
        return {"id": "mock_dataset_id"}


# --- pipeline glue ------------------------------------------------------


def send_metadata_batches(
    df: DataFrame,
    sink: ApiSink,
    *,
    table_name: str,
    ingestor_id: str,
    batch_size: int = 4000,
) -> int:
    """Stream (data_id, data_intent, label) to the sink in batches;
    returns the number of records ACKed. ``toLocalIterator`` holds one
    partition at a time on the driver — no full-table collect."""
    it = (
        df.select(
            F.col("data_id").cast("string"),
            F.col("data_intent").cast("string"),
            F.col("label").cast("string"),
        )
        .toLocalIterator()
    )
    sent = 0
    batch: list[dict] = []

    def flush() -> int:
        if not batch:
            return 0
        n = len(batch) if sink.send_batch(batch, table_name, ingestor_id) else 0
        batch.clear()
        return n

    for row in it:
        batch.append(row.asDict())
        if len(batch) >= batch_size:
            sent += flush()
    sent += flush()
    return sent


def register_dataset(
    sink: ApiSink,
    *,
    table_name: str,
    schema: dict[str, str],
    category: str,
    ingestor_id: str,
    data_format: str,
    intent: str,
    add_info: dict | None = None,
) -> dict[str, Any]:
    """The 4-call registration sequence (base.py:861-918). Rows are
    already committed when this runs, so every failure RAISES — a
    silent skip would leave committed rows with no registered dataset."""
    if category not in SELF_SUPERVISED_CATEGORIES:
        if not sink.send_generate_edge_label_meta(table_name, ingestor_id, intent):
            raise RuntimeError(
                "backend rejected edge-label metadata; dataset NOT registered "
                "(its rows are already committed)"
            )
    if not sink.send_global_meta_meta(table_name, schema, add_info or {}):
        raise RuntimeError(
            "backend rejected the dataset schema/metadata; dataset NOT "
            "registered (its rows are already committed)"
        )
    if not sink.prepare_dataset(category, ingestor_id, data_format, intent):
        raise RuntimeError(
            "backend failed to prepare the dataset; it was NOT registered "
            "(its rows are already committed)"
        )
    return sink.create_dataset(category, ingestor_id)
