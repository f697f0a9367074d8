"""REST surface — §2.E10 (SURVEY.md).

The reference drives Kafka Connect's worker REST API both ways:

* status — GET /connectors lists running connectors, GET
  /connectors/<name> shows one (main.sh:85-89, 117-128);
* mutation — PUT /connectors/<name>/config upserts a declarative
  spec (main.sh:156-159) and DELETE /connectors/<name> removes one,
  with retry on conflict (main.sh:130-141, 190-195).

The Spark analog serves the same surface over the ``QueryRuntime``
(i.e. ``spark.streams.active``): a stdlib threaded HTTP server, no
dependencies, driver-side only — it never touches the data path.
Mutations route through the SAME ``Reconciler`` the declarative env
boot uses, so a PUT gets identical fingerprint/upsert semantics and
a DELETE gets the E8 retry ladder; an external declarative client
(the reference's own ``main.sh`` loop, say) can drive this API
exactly as it drives Connect's.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .controlplane import ConflictError, PipelineSpec, QueryRuntime, Reconciler, SpecError


class StatusServer:
    """Threaded REST server. ``port=0`` binds an ephemeral port (read
    it back from ``.port`` after ``start()``). Pass the boot
    ``Reconciler`` so HTTP mutations share its retry configuration;
    when omitted, a default Reconciler over ``runtime`` is built."""

    def __init__(
        self,
        runtime: QueryRuntime,
        host: str = "127.0.0.1",
        port: int = 0,
        reconciler: Reconciler | None = None,
        http_stop_retries: int = 3,
        http_retry_sleep_s: float = 0.5,
    ) -> None:
        self.runtime = runtime
        self.reconciler = reconciler or Reconciler(runtime)
        self._host = host
        self._port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        # mutations serialize on the RECONCILER's lock (not a local
        # one): the boot thread's background reconcile and every HTTP
        # PUT/DELETE drive the same Reconciler, so the lock must be
        # shared or an HTTP upsert could interleave stop/start with
        # the boot pass (Connect's herder-queue serialization).
        self._mutate = self.reconciler.lock
        # HTTP mutations run through a SECOND reconciler that shares
        # the boot reconciler's lock (same herder-queue serialization)
        # but carries a BOUNDED retry ladder: the boot path's default
        # 8×2s stop-retry would hold the shared lock ~16s per stuck
        # pipeline, head-of-line-blocking every other HTTP mutation
        # and the background reconcile pass while ThreadingHTTPServer
        # threads pile up behind it. 3×0.5s caps the hold at ~1.5s;
        # retries-exhausted surfaces as 409 (Connect's
        # conflict-under-rebalance), which a declarative client —
        # including the reference's own main.sh retry loop
        # (main.sh:130-141) — already re-drives.
        self._http_rec = Reconciler(
            runtime,
            # never LOOSER than the boot reconciler's own budget, and
            # the boot reconciler's (injectable) sleep carries over so
            # tests with a fake clock stay fake
            stop_retries=min(self.reconciler.stop_retries, http_stop_retries),
            retry_sleep_s=min(self.reconciler.retry_sleep_s, http_retry_sleep_s),
            sleep=self.reconciler._sleep,
        )
        self._http_rec.lock = self.reconciler.lock

    @property
    def port(self) -> int:
        if self._httpd is None:
            raise RuntimeError("server not started")
        return self._httpd.server_address[1]

    def start(self) -> int:
        runtime = self.runtime
        reconciler = self._http_rec
        mutate = self._mutate

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, payload=None) -> None:
                body = b"" if payload is None else json.dumps(payload).encode()
                self.send_response(code)
                if body:
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                path = self.path.rstrip("/")
                try:
                    if path == "":
                        # worker readiness (the reference curls this in
                        # its boot loop, main.sh:99-111)
                        ready = runtime.is_ready()
                        self._send(200 if ready else 503, {"ready": ready})
                    elif path == "/connectors":
                        self._send(200, sorted(runtime.list_running()))
                    elif path.startswith("/connectors/"):
                        name = path.removeprefix("/connectors/")
                        running = runtime.list_running()
                        if name in running:
                            self._send(
                                200,
                                {
                                    "name": name,
                                    "fingerprint": running[name],
                                    "state": "RUNNING",
                                },
                            )
                        else:
                            self._send(404, {"error": f"connector {name} not found"})
                    else:
                        self._send(404, {"error": "not found"})
                except Exception as e:  # noqa: BLE001 — surface as 500, keep serving
                    self._send(500, {"error": str(e)})

            def do_PUT(self) -> None:  # noqa: N802
                """PUT /connectors/<name>/config — the reference's
                upsert call (main.sh:156-159): body is the flat config
                map; same fingerprint = no-op, changed = restart, new
                = create (201)."""
                path = self.path.rstrip("/")
                try:
                    if not (
                        path.startswith("/connectors/") and path.endswith("/config")
                    ):
                        self._send(404, {"error": "not found"})
                        return
                    name = path.removeprefix("/connectors/").removesuffix("/config")
                    n = int(self.headers.get("Content-Length") or 0)
                    try:
                        cfg = json.loads(self.rfile.read(n) or b"")
                    except json.JSONDecodeError as e:
                        self._send(400, {"error": f"body is not valid JSON: {e}"})
                        return
                    if not isinstance(cfg, dict):
                        self._send(400, {"error": "config must be a JSON object"})
                        return
                    spec = PipelineSpec(name=name, config=cfg)
                    try:
                        with mutate:
                            outcome = reconciler.upsert(spec)
                    except SpecError as e:
                        self._send(400, {"error": str(e)})
                        return
                    except ConflictError as e:
                        # stop-for-restart retries exhausted — the same
                        # condition DELETE maps to Connect's 409 under
                        # rebalance; a declarative client retries it
                        self._send(409, {"error": str(e)})
                        return
                    self._send(
                        201 if outcome == "started" else 200,
                        {
                            "name": name,
                            "fingerprint": spec.fingerprint(),
                            "state": "RUNNING",
                            "outcome": outcome,
                        },
                    )
                except Exception as e:  # noqa: BLE001
                    self._send(500, {"error": str(e)})

            def do_DELETE(self) -> None:  # noqa: N802
                """DELETE /connectors/<name> — stop with the E8 retry
                ladder (main.sh:130-141); retries exhausted maps to
                Connect's 409-under-rebalance."""
                path = self.path.rstrip("/")
                try:
                    if not path.startswith("/connectors/") or path.endswith("/config"):
                        self._send(404, {"error": "not found"})
                        return
                    name = path.removeprefix("/connectors/")
                    with mutate:
                        if name not in runtime.list_running():
                            self._send(404, {"error": f"connector {name} not found"})
                            return
                        ok = reconciler.delete(name)
                    if ok:
                        self._send(204)
                    else:
                        self._send(409, {"error": f"{name}: stop retries exhausted"})
                except Exception as e:  # noqa: BLE001
                    self._send(500, {"error": str(e)})

            def log_message(self, *_a) -> None:  # silence per-request stderr
                pass

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def shutdown(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
