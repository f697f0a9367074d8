"""REST status endpoint — §2.E10 (SURVEY.md).

The reference keeps Kafka Connect's worker REST API reachable for
status (GET /connectors lists running connectors, GET
/connectors/<name> shows one — main.sh:85-89, 117-128). The Spark
analog serves the same read-only surface over the ``QueryRuntime``
(i.e. ``spark.streams.active``): a stdlib threaded HTTP server, no
dependencies, driver-side only — it never touches the data path.

Write operations (PUT/DELETE) are deliberately absent: desired state
is declared via env (controlplane.specs_from_env) and enforced by the
Reconciler; the HTTP surface is observability, matching how the
reference's own bash only ever GETs this API after boot.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .controlplane import QueryRuntime


class StatusServer:
    """Threaded status HTTP server. ``port=0`` binds an ephemeral
    port (read it back from ``.port`` after ``start()``)."""

    def __init__(self, runtime: QueryRuntime, host: str = "127.0.0.1", port: int = 0) -> None:
        self.runtime = runtime
        self._host = host
        self._port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        if self._httpd is None:
            raise RuntimeError("server not started")
        return self._httpd.server_address[1]

    def start(self) -> int:
        runtime = self.runtime

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, payload) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
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
