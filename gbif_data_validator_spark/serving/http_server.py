"""HTTP job-server surface — the reference's REST API, re-expressed for a
table-native engine.

Reference analogs (validator-ws/src/main/java/org/gbif/validation/ws/
resources/ValidationResource.java):
- ``POST /jobserver/submit`` (:87-97) — the reference consumes a multipart
  file upload; our "upload" is a table reference (Iceberg ``db.table`` or a
  parquet/csv/jsonl path), because at 10^12 rows data arrives as a table,
  not a request body. Returns 202 + the ACCEPTED status document.
- ``POST /jobserver/submiturl?fileUrl=`` (:99-118) — parity alias: accepts
  a ``file://`` URL or plain path in the ``fileUrl`` query param.
- ``GET /jobserver/status/{jobid}`` (:120-125).
- ``GET /jobserver/status/{jobid}/kill`` (:140-145).
- ``GET /jobserver/output/{jobid}/{type}`` (:127-138) — the reference's
  ``ValidationDataOutput.Type`` enum (DATASET_OBJECT, VERBATIM_RECORD_SAMPLE
  — api/result/ValidationDataOutput.java:20-21) maps to report sections:
  ``report`` (whole document, DATASET_OBJECT analog), ``samples``
  (VERBATIM_RECORD_SAMPLE analog), plus ``issue_counts`` / ``metrics`` /
  ``partition_verdicts`` for the engine's richer report.

Spark design: the handler thread only *submits* — the JobRunner runs each
validation on its own driver thread under a Spark job group, so a slow
job never blocks the HTTP accept loop, and ``kill`` cancels in-flight
stages cluster-wide via ``cancelJobGroup``. ``ThreadingHTTPServer`` gives
one handler thread per request; all shared state lives in JobRunner's
lock-guarded maps and atomic status files. The server binds an ephemeral
port by default so tests never collide.
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import fields as dc_fields
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import SparkSession

from ..plans.engine import EngineConfig
from ..plans.jobs import FINISHED, NOT_FOUND, JobRunner

#: report sections servable via /output/{id}/{type} (case-insensitive),
#: mirroring ValidationDataOutput.Type.fromString's lenient matching
OUTPUT_TYPES = ("report", "samples", "issue_counts", "metrics", "partition_verdicts")

_CONFIG_FIELDS = {f.name for f in dc_fields(EngineConfig)}

_STATUS_RE = re.compile(r"^/jobserver/status/(\d+)(/kill)?$")
_OUTPUT_RE = re.compile(r"^/jobserver/output/(\d+)/([A-Za-z_]+)$")

#: JobStatusResponse.FAILED_RESPONSE analog — the body of every 4xx
FAILED_RESPONSE = {"status": "FAILED", "job_id": -1}


def _read_input(spark: SparkSession, path: str, fmt: str):
    from ..sources import tables

    fmt = (fmt or "parquet").lower()
    if fmt == "parquet":
        return tables.read_table(spark, path)
    if fmt == "csv":
        return tables.read_pages_csv(spark, path)
    if fmt in ("jsonl", "json"):
        return tables.read_pages_jsonl(spark, path)
    raise ValueError(f"unsupported format: {fmt!r}")


class _JobHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer carrying the shared JobRunner for handlers."""

    daemon_threads = True

    def __init__(self, addr, handler, runner: JobRunner) -> None:
        self.runner = runner
        super().__init__(addr, handler)


class _Handler(BaseHTTPRequestHandler):
    server: _JobHTTPServer  # type: ignore[assignment]

    # -- plumbing --------------------------------------------------------
    def _send(self, code: int, doc: dict) -> None:
        body = json.dumps(doc, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a) -> None:  # quiet: tests assert on responses
        pass

    # -- routes ----------------------------------------------------------
    def do_POST(self) -> None:
        url = urlparse(self.path)
        if url.path == "/jobserver/submit":
            try:
                n = int(self.headers.get("Content-Length", 0))
                spec = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._send(400, {**FAILED_RESPONSE, "error": "bad JSON body"})
            return self._submit(spec)
        if url.path == "/jobserver/submiturl":
            file_url = parse_qs(url.query).get("fileUrl", [None])[0]
            if not file_url:
                return self._send(400, {**FAILED_RESPONSE, "error": "fileUrl required"})
            p = urlparse(file_url)
            if p.scheme not in ("", "file"):
                return self._send(
                    400, {**FAILED_RESPONSE, "error": "only file:// URLs supported"}
                )
            return self._submit({"path": unquote(p.path) or file_url})
        return self._send(404, {**FAILED_RESPONSE, "error": "no such route"})

    def _submit(self, spec: dict) -> None:
        path = spec.get("path")
        if not path:
            return self._send(400, {**FAILED_RESPONSE, "error": "path required"})
        cfg_kwargs = spec.get("config") or {}
        unknown = set(cfg_kwargs) - _CONFIG_FIELDS
        if unknown:
            return self._send(
                400, {**FAILED_RESPONSE, "error": f"unknown config keys: {sorted(unknown)}"}
            )
        srv = self.server
        try:
            # schema errors raise here (handler thread), before submit —
            # the preflight pass inside the engine catches the rest async
            pages = _read_input(srv.runner.spark, path, spec.get("format", "parquet"))
            # tuple-typed dataclass fields arrive as JSON lists
            if "data_unique_cols" in cfg_kwargs:
                cfg_kwargs["data_unique_cols"] = tuple(cfg_kwargs["data_unique_cols"])
            config = EngineConfig(**cfg_kwargs)
        except Exception as e:
            return self._send(400, {**FAILED_RESPONSE, "error": f"{type(e).__name__}: {e}"})
        job_id = srv.runner.submit(pages, config)
        self._send(202, srv.runner.status(job_id))

    def do_GET(self) -> None:
        m = _STATUS_RE.match(self.path)
        if m:
            job_id, kill = int(m.group(1)), bool(m.group(2))
            st = self.server.runner.status(job_id)
            if st.get("status") == NOT_FOUND:  # kill of an unknown id must
                return self._send(404, st)  # not fabricate a KILLED doc
            if kill:
                st = self.server.runner.kill(job_id)
            return self._send(200, st)
        m = _OUTPUT_RE.match(self.path)
        if m:
            return self._output(int(m.group(1)), m.group(2).lower())
        return self._send(404, {**FAILED_RESPONSE, "error": "no such route"})

    def _output(self, job_id: int, out_type: str) -> None:
        if out_type not in OUTPUT_TYPES:  # bad type → 400 (reference :137)
            return self._send(400, {**FAILED_RESPONSE, "error": f"unknown output type {out_type!r}"})
        st = self.server.runner.status(job_id)
        if st.get("status") == NOT_FOUND:
            return self._send(404, st)
        if st.get("status") != FINISHED:
            return self._send(404, {"job_id": job_id, "status": st.get("status"), "error": "no output yet"})
        report = st.get("report") or {}
        doc = report if out_type == "report" else report.get(out_type)
        self._send(200, {"job_id": job_id, "type": out_type, "data": doc})


class ValidationServer:
    """Embeddable HTTP facade over :class:`JobRunner` (ValidationWsListener
    analog, minus the servlet container). ``port=0`` binds an ephemeral
    port — read it back from ``.port`` after :meth:`start`."""

    def __init__(
        self,
        spark: SparkSession,
        storage_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self.runner = JobRunner(spark, storage_dir)
        self._httpd = _JobHTTPServer((host, port), _Handler, self.runner)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "ValidationServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="gdv-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)
