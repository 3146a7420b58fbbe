"""K3/K4: API metadata sink + registration sequence.

Contract from the reference client (api/client.py:217-505) and the
fail-loud registration block (ingestors/base.py:861-918); mock pattern
from e2e/conftest.py:40-68.
"""

from __future__ import annotations

import json
import textwrap
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from data_ingestors_spark.api import (
    HttpApiSink,
    MockApiSink,
    register_dataset,
    send_metadata_batches,
)
from data_ingestors_spark.ingest import Ingestor, ResolvedConfig

SCHEMA = {"age": "INT", "name": "VARCHAR(50)"}


@pytest.fixture
def csv_source(tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("age,name\n" + "".join(f"{i},user{i}\n" for i in range(10)))
    return str(p)


def make_ingestor(spark, tmp_path, sink, **overrides):
    cfg = ResolvedConfig(table_name="t_api", schema=SCHEMA, batch_size=4, **overrides)
    return Ingestor(spark, cfg, str(tmp_path / "table"), api_sink=sink)


# --- pipeline accounting ------------------------------------------------


def test_api_sent_is_real_accounting(spark, tmp_path, csv_source):
    sink = MockApiSink()
    s = make_ingestor(spark, tmp_path, sink).ingest(csv_source)
    assert s.inserted == 10
    assert s.api_sent == 10
    assert not s.has_failures
    # batch_size=4 → batches of 4/4/2
    assert [len(b) for b in sink.batches] == [4, 4, 2]
    # payload fields match the reference wire format
    rec = sink.batches[0][0]
    assert set(rec) == {"data_id", "data_intent", "label"}
    # registration sequence ran, in order, after the sends
    names = [c[0] for c in sink.calls]
    assert names[-4:] == [
        "send_generate_edge_label_meta",
        "send_global_meta_meta",
        "prepare_dataset",
        "create_dataset",
    ]


def test_failed_batch_trips_has_failures(spark, tmp_path, csv_source):
    sink = MockApiSink(fail_batches={1})  # reject the middle batch
    s = make_ingestor(spark, tmp_path, sink).ingest(csv_source)
    assert s.inserted == 10
    assert s.api_sent == 6  # 4 + 0 + 2
    assert s.has_failures  # api_sent < inserted must not report success


def test_registration_failure_raises(spark, tmp_path, csv_source):
    sink = MockApiSink(fail_steps={"prepare_dataset"})
    with pytest.raises(RuntimeError, match="NOT registered"):
        make_ingestor(spark, tmp_path, sink).ingest(csv_source)


def test_self_supervised_skips_edge_labels():
    sink = MockApiSink()
    register_dataset(
        sink, table_name="t", schema={}, category="masked_language_modeling",
        ingestor_id="i", data_format="csv", intent="train",
    )
    names = [c[0] for c in sink.calls]
    assert "send_generate_edge_label_meta" not in names
    assert names == ["send_global_meta_meta", "prepare_dataset", "create_dataset"]


def test_send_metadata_batches_counts_only_acked(spark):
    df = spark.createDataFrame(
        [(str(i), "train", "l") for i in range(7)], ["data_id", "data_intent", "label"]
    )
    sink = MockApiSink(fail_batches={0})
    sent = send_metadata_batches(df, sink, table_name="t", ingestor_id="i", batch_size=5)
    assert sent == 2  # first batch of 5 rejected, final 2 ACKed


# --- HTTP transport (401 refresh + retry) -------------------------------


class _Backend(BaseHTTPRequestHandler):
    """Permissive mock backend; first N requests per path can be forced
    to 401 to exercise the refresh path."""

    state = {"auth_calls": 0, "fail_401_once": False, "batches": []}

    def _reply(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n)) if n else None
        if self.path == "/api-token-auth/":
            _Backend.state["auth_calls"] += 1
            self._reply(200, {"token": f"tok{_Backend.state['auth_calls']}"})
            return
        if _Backend.state["fail_401_once"]:
            _Backend.state["fail_401_once"] = False
            self._reply(401, {"detail": "expired"})
            return
        if self.path.startswith("/global_meta/t_http/"):
            _Backend.state["batches"].append(payload)
        self._reply(200, {"id": 1, "status": "ok"})

    do_GET = do_POST

    def log_message(self, *_):
        pass


@pytest.fixture
def backend():
    _Backend.state.update({"auth_calls": 0, "fail_401_once": False, "batches": []})
    srv = HTTPServer(("127.0.0.1", 0), _Backend)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_sink_roundtrip(backend):
    sink = HttpApiSink(backend, client_id="u", client_password="p")
    assert sink.token == "tok1"
    ok = sink.send_batch(
        [{"data_id": "d1", "data_intent": "train", "label": "x"}], "t_http", "ing"
    )
    assert ok
    assert _Backend.state["batches"][0][0]["injestor_id"] == "ing"
    assert register_dataset(
        sink, table_name="t_http", schema={"a": "INT"}, category="tabular_classification",
        ingestor_id="ing", data_format="csv", intent="train",
    ) == {"id": 1, "status": "ok"}


def test_http_sink_refreshes_on_401(backend):
    sink = HttpApiSink(backend, client_id="u", client_password="p")
    _Backend.state["fail_401_once"] = True
    assert sink.send_batch([{"data_id": "d"}], "t_http", "i")
    assert sink.token == "tok2"  # refreshed once, then succeeded
