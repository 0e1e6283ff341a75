"""HTTP query surface — the Spark mapping of the reference's web server
(/root/reference/server.go:99-177): ``POST /query/`` runs ;-separated
dialect statements and returns the ReturnData JSON contract
(utils.go:590-608 — status bits, per-statement entries, browser row cap),
``GET /info?info=fileClick`` serves the directory browser, and ``GET /``
serves a minimal bundled browser UI (csvtool_spark.webui — original
single-file page over the same JSON contract). The websocket
password/progress channel remains display plumbing out of engine scope
(SURVEY.md §2.1).

Scale note: the row cap exists because this surface is interactive — the
server clips each statement to ``SHOW_CAP/numcols`` rows exactly like the
reference's rowLimit (server.go:161-177); bulk extracts go through the
distributed sinks (engine.save_csv_dir / save_parquet), never HTTP.
"""

from __future__ import annotations

import datetime
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from csvtool_spark.dialect.errors import DialectError

#: status bits (utils.go:603-608)
DAT_BLANK = 0
DAT_ERROR = 1
DAT_GOOD = 2
DAT_BADPATH = 4
DAT_IOERR = 8

#: total-cell browser budget; per-statement row cap = SHOW_CAP // numcols
#: (the reference's 20000-cell clip, server.go:161-177)
SHOW_CAP = 20_000


def _json_val(v):
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.timedelta):
        return str(v)
    if isinstance(v, (list, tuple)):
        return [_json_val(x) for x in v]
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


def query_response(engine, text: str) -> dict:
    """Run ``text`` and build the ReturnData dict (pure function — the
    HTTP handler is a thin wrapper, so this is directly testable)."""
    from csvtool_spark.engine import _dialect_type

    ret: dict = {
        "status": DAT_BLANK,
        "originalQuery": text,
        "entries": [],
        "message": "",
        "clipped": False,
    }
    try:
        stmts = [s for s in text.split(";") if s.strip()]
        for stmt in stmts:
            df = engine.sql(stmt)
            numcols = len(df.columns)
            show_limit = max(1, SHOW_CAP // max(1, numcols))
            rows = df.limit(show_limit + 1).collect()
            clipped = len(rows) > show_limit
            if clipped:
                rows = rows[:show_limit]
                ret["clipped"] = True
            ret["entries"].append(
                {
                    "numrows": len(rows),
                    "showLimit": show_limit,
                    "numcols": numcols,
                    "types": [_dialect_type(f.dataType) for f in df.schema.fields],
                    "colnames": list(df.columns),
                    "vals": [[_json_val(v) for v in r] for r in rows],
                    "status": DAT_GOOD,
                    "query": stmt.strip(),
                    "clipped": clipped,
                }
            )
        ret["status"] |= DAT_GOOD
        ret["message"] = "Query successful. Returning data"
        if ret["clipped"]:
            cap = max((e["showLimit"] for e in ret["entries"] if e["clipped"]), default=0)
            ret["message"] = f"Showing only top {cap}"
    except DialectError as e:
        ret["status"] |= DAT_ERROR
        ret["message"] = str(e)
    except Exception as e:  # noqa: BLE001 — surfaced to the client like the reference
        ret["status"] |= DAT_ERROR
        ret["message"] = f"{type(e).__name__}: {e}"
    return ret


def browse_dir(path: str, mode: str = "open") -> dict:
    """Directory listing for the file browser (server.go fileBrowser)."""
    path = os.path.expanduser(path) or "/"
    out = {"path": path, "mode": mode, "dirs": [], "files": []}
    try:
        for entry in sorted(os.listdir(path)):
            full = os.path.join(path, entry)
            (out["dirs"] if os.path.isdir(full) else out["files"]).append(entry)
    except OSError:
        out["status"] = DAT_BADPATH
    return out


class CsvToolServer:
    """Threaded stdlib HTTP server wrapping a CsvEngine.

        srv = CsvToolServer(engine, port=0)   # 0 → ephemeral
        srv.start()
        ... POST {"query": "select ..."} to /query/ ...
        srv.stop()
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8060):
        self.engine = engine
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Cache-control", "no-store")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                try:
                    return json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return {}

            def do_POST(self):
                if self.path.startswith("/query"):
                    req = self._body()
                    self._send(query_response(outer.engine, req.get("query", "")))
                elif self.path.startswith("/info"):
                    self._do_info()
                else:
                    self.send_error(404)

            def do_GET(self):
                if self.path.startswith("/info"):
                    self._do_info()
                elif self.path in ("/", "/index.html"):
                    from csvtool_spark.webui import INDEX_HTML

                    body = INDEX_HTML.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_error(404)

            def _do_info(self):
                from urllib.parse import parse_qs, urlparse

                params = parse_qs(urlparse(self.path).query)
                info = (params.get("info") or [""])[0]
                if info == "fileClick":
                    req = self._body()
                    self._send(browse_dir(req.get("path", "."), req.get("mode", "open")))
                else:
                    self._send({})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(5)
