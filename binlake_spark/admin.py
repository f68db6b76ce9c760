"""Read-mostly HTTP admin plane for a lake table — the rebuild of the
reference's embedded HTTP servers: the wave node's monitor/alive/kill
endpoints (binlake-wave.http/.../handler/{AliveHandler,MonitorHandler,
KillHandler}.java) and the tower's control API, of which the
position-override is the one with a data-plane meaning
(binlake-manager/.../api/SetBinlogPosHandler.java:1-73 →
:meth:`LakeTable.set_stream_epoch`).

Spark-native shape: all state lives in the table's versioned snapshot
(lineage, offsets, watermarks), so the server is a thin stdlib
``http.server`` view over :class:`LakeTable` — zero extra state, safe to
run beside a live engine because every mutation goes through the same
atomic snapshot commit the engine uses.  ZK-path handlers
(CreateZNodes/SetLeader/SetCandidate…) have no analog by design: Spark's
checkpoint + the snapshot commit protocol replace ZK coordination.

Endpoints (JSON in/out):

* ``GET /alive`` — liveness (AliveHandler analog)
* ``GET /monitor`` — one-page health summary (MonitorHandler analog)
* ``GET /snapshot`` — the full current snapshot
* ``GET /offsets`` — per-bucket applied watermarks
* ``GET /lineage?n=20`` — most recent lineage entries
* ``GET /alarms`` — alarm history, when an AlarmManager is attached
* ``POST /set-position`` ``{"stream_id": s, "epoch": n}`` —
  administrative epoch override (SetBinlogPosHandler analog)
* ``POST /reset-watermarks`` ``{"buckets": [..] | null}``
* ``POST /rollback`` ``{"version": n | "tag"}`` — atomic revert to an
  earlier snapshot's state (LakeTable.rollback), auditable in lineage

Fleet mode (the tower's many-instances registry, binlake-manager
ApiCenter.java:27-34, made table-shaped): construct with
``tables={"name": LakeTable, ...}`` and every route above is also served
per table under ``/t/<name>/...``, plus ``GET /tables`` — one line of
health per registered table.  One admin process, many tables — the same
fan-in the tower gives one operator over a MySQL fleet.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class AdminServer:
    def __init__(self, table=None, alarms=None, host: str = "127.0.0.1",
                 port: int = 0, tables: dict | None = None):
        if table is None and not tables:
            raise ValueError("AdminServer needs a table or a tables registry")
        self.table = table if table is not None else next(iter(tables.values()))
        self.tables = dict(tables or {})
        self.alarms = alarms
        self._host, self._port = host, port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -------------------------------------------------------------- #
    @property
    def port(self) -> int:
        if self._httpd is None:
            raise RuntimeError("server not started")
        return self._httpd.server_address[1]

    def start(self) -> "AdminServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: D102 — silence stderr
                pass

            def _json(self, code: int, obj) -> None:
                body = json.dumps(obj, sort_keys=True, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _route(self, path):
                """(table, subpath) for fleet routes /t/<name>/..., or
                (default table, path) for the flat per-table API."""
                if path.startswith("/t/"):
                    parts = path.split("/", 3)
                    name = parts[2]
                    sub = "/" + (parts[3] if len(parts) > 3 else "")
                    return outer.tables.get(name), sub
                return outer.table, path

            def do_GET(self):  # noqa: N802 — http.server API casing
                url = urlparse(self.path)
                table, path = self._route(url.path)
                try:
                    if url.path.startswith("/t/") and table is None:
                        self._json(404, {"error": f"no table {url.path}"})
                    elif path == "/tables":
                        self._json(200, {
                            name: outer._monitor(t)
                            for name, t in sorted(outer.tables.items())
                        })
                    elif path == "/alive":
                        self._json(200, {"status": "SUCCESS"})
                    elif path == "/monitor":
                        self._json(200, outer._monitor(table))
                    elif path == "/snapshot":
                        self._json(200, table.snapshot())
                    elif path == "/offsets":
                        snap = table.snapshot()
                        self._json(200, {
                            "watermarks": snap["watermarks"],
                            "epochs": snap["epochs"],
                        })
                    elif path == "/lineage":
                        try:
                            n = int(parse_qs(url.query).get("n", ["20"])[0])
                        except ValueError:
                            self._json(400, {"error": "n must be an integer"})
                            return
                        # n=0 means zero entries, not all ([-0:] is the
                        # whole list)
                        self._json(
                            200,
                            table._all_lineage()[-n:] if n > 0 else [],
                        )
                    elif path == "/alarms":
                        evs = [] if outer.alarms is None else [
                            {"severity": e.severity, "rule": e.rule,
                             "stream_id": e.stream_id,
                             "message": e.message, "data": e.data}
                            for e in outer.alarms.events
                        ]
                        self._json(200, evs)
                    else:
                        self._json(404, {"error": f"no route {url.path}"})
                except Exception as e:  # surface, don't kill the server
                    self._json(500, {"error": str(e)})

            def do_POST(self):  # noqa: N802
                url = urlparse(self.path)
                table, path = self._route(url.path)
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if url.path.startswith("/t/") and table is None:
                        self._json(404, {"error": f"no table {url.path}"})
                    elif path == "/set-position":
                        prev = table.set_stream_epoch(
                            str(body["stream_id"]), int(body["epoch"])
                        )
                        self._json(200, {
                            "status": "SUCCESS", "previous_epoch": prev,
                            "epoch": int(body["epoch"]),
                        })
                    elif path == "/reset-watermarks":
                        cleared = table.reset_watermarks(
                            body.get("buckets")
                        )
                        self._json(200, {
                            "status": "SUCCESS", "cleared": cleared,
                        })
                    elif path == "/rollback":
                        if "tag" in body:
                            # explicit tag key: never coerced, so a tag
                            # whose NAME is all digits (e.g. "20260818")
                            # stays addressable over HTTP
                            v = str(body["tag"])
                        else:
                            v = body["version"]
                            # '3' means version 3, not a tag named "3" —
                            # coerce digit strings so JSON clients that
                            # stringify numbers still hit the version path
                            if isinstance(v, str) and v.lstrip("-").isdigit():
                                v = int(v)
                        try:
                            new_v = table.rollback(
                                int(v) if not isinstance(v, str) else v
                            )
                        except (FileNotFoundError, KeyError) as e:
                            # unknown version/tag is the caller's error,
                            # not a server fault
                            self._json(404, {
                                "error": f"unknown version or tag: {e}",
                            })
                            return
                        self._json(200, {
                            "status": "SUCCESS", "version": new_v,
                        })
                    else:
                        self._json(404, {"error": f"no route {url.path}"})
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    self._json(400, {"error": f"bad request: {e}"})
                except Exception as e:
                    self._json(500, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __enter__(self) -> "AdminServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -------------------------------------------------------------- #
    def _monitor(self, table=None) -> dict:
        table = self.table if table is None else table
        snap = table.snapshot()
        wms = [int(w) for w in snap["watermarks"].values()]
        return {
            "version": snap["version"],
            "num_buckets": snap["num_buckets"],
            "buckets_with_data": len(snap["files"]),
            "epochs": snap["epochs"],
            "watermark_min": min(wms) if wms else None,
            "watermark_max": max(wms) if wms else None,
            "lineage_entries": len(table._all_lineage()),
            "alarms": 0 if self.alarms is None else len(self.alarms.events),
        }
