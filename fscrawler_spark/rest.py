"""Minimal HTTP control plane — the reference's REST CrawlerApi analog
(/root/reference/rest/.../CrawlerApi.java:55-151: GET status, POST
pause/resume).

A stdlib ThreadingHTTPServer on a daemon thread; every handler is a thin
wrapper over the file-marker control plane in plans/pipeline.py
(job_status / request_pause / clear_pause), so the HTTP surface and the
CLI verbs can never drift — both read the same manifest JSON. No Spark
interaction: safe to serve while a run is in flight, from the driver or
from a separate process on the same filesystem (a multi-day 100-TB run
on a shared cluster gets its `curl host:port/status` without touching
the driver).

Routes (reference paths accepted as aliases):
    GET  /status     | /_crawler/status     -> job_status() JSON
    GET  /checkpoint | /_crawler/checkpoint -> raw manifest JSON (the
         reference also serves the checkpoint object, CrawlerApi.java:55-151)
    GET  /table      | /_crawler/table      -> snapshot-table metadata
         (current id, tags, history) for ``table_root`` (defaults to the
         output dir when it IS a table, e.g. a --publish-table target) —
         read-only, O(metadata), no Spark; 404 when no table exists
    POST /pause      | /_crawler/pause      -> request a between-waves pause
    POST /resume     | /_crawler/resume     -> clear the pause request
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class StatusServer:
    """Context-manageable status endpoint bound to one job output dir.

    port=0 picks a free port (tests); the bound port is ``self.port``.
    Binds 127.0.0.1 by default — widen ``host`` deliberately.
    """

    def __init__(
        self,
        output_dir: str,
        port: int = 0,
        host: str = "127.0.0.1",
        table_root: str | None = None,
    ):
        from fscrawler_spark.plans import pipeline

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (stdlib naming)
                if self.path in ("/status", "/_crawler/status"):
                    self._send(200, pipeline.job_status(outer.output_dir))
                elif self.path in ("/checkpoint", "/_crawler/checkpoint"):
                    # the raw manifest object, like the reference's
                    # checkpoint route (rest/.../CrawlerApi.java:55-151)
                    # — already-local JSON, no Spark interaction
                    import os

                    p = os.path.join(outer.output_dir, "_checkpoint.json")
                    try:
                        with open(p) as f:
                            self._send(200, json.load(f))
                    except FileNotFoundError:
                        self._send(404, {"error": "no checkpoint yet"})
                    except json.JSONDecodeError:
                        # a torn mid-write read is the caller's retry case
                        self._send(503, {"error": "checkpoint being rewritten"})
                elif self.path in ("/table", "/_crawler/table"):
                    # read-only snapshot-table metadata for the publish
                    # target (or the output dir itself when it IS a
                    # table) — all local JSON parses, no Spark, so safe
                    # to serve while ticks keep committing
                    from fscrawler_spark.plans.snapshot_table import SnapshotTable

                    t = SnapshotTable(outer.table_root)
                    if not t.exists():
                        self._send(
                            404, {"error": f"no snapshot table at {outer.table_root}"}
                        )
                        return
                    # build the WHOLE payload before sending: (a) current
                    # derives from the same history read, so a commit
                    # racing us can't produce current != history[-1];
                    # (b) only the metadata reads sit in the try — a
                    # client hanging up mid-write (BrokenPipeError is an
                    # OSError) must not be mislabeled as a commit race
                    # and answered again on a dead socket
                    try:
                        hist = t.history()
                        payload = {
                            "root": outer.table_root,
                            "current": hist[-1]["snapshot_id"],
                            "tags": t.tags(),
                            "history": hist,
                        }
                    except (OSError, ValueError, IndexError, KeyError):
                        # a commit's rename raced one of our parses:
                        # same retry contract as the checkpoint route
                        self._send(503, {"error": "table being committed"})
                        return
                    self._send(200, payload)
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):  # noqa: N802
                if self.path in ("/pause", "/_crawler/pause"):
                    pipeline.request_pause(outer.output_dir)
                    self._send(200, {"pause_requested": True})
                elif self.path in ("/resume", "/_crawler/resume"):
                    pipeline.clear_pause(outer.output_dir)
                    self._send(200, {"pause_requested": False})
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def log_message(self, *args):  # quiet: the CLI owns stdout
                pass

        self.output_dir = output_dir
        self.table_root = table_root if table_root is not None else output_dir
        self._server = ThreadingHTTPServer((host, port), Handler)
        self.host = host
        self.port = int(self._server.server_address[1])
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True, name="fscrawler-rest"
        )

    def start(self) -> "StatusServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        # shutdown() waits on an event only serve_forever() sets — calling
        # it before start() (e.g. a finally block around a failed setup)
        # would deadlock forever; just release the port in that case
        if self._thread.is_alive():
            self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "StatusServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
