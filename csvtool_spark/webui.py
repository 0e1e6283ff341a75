"""Minimal bundled browser UI for the HTTP query surface.

One static page, no build system, no dependencies: a query box that POSTs
to ``/query/`` and renders each statement's ReturnData entry as a table
(the same JSON contract tests and programmatic clients use). This is an
original page written for this engine — the reference ships a separate
JS bundle (/root/reference/webgui/) whose query logic lives server-side
there too; only the *surface* (textarea → run → table, row-clip notice,
live progress + cancel) is mirrored. The reference pushes per-second
progress and takes cancel over a websocket (server.go:19-70,
utils.go:803-834); this page uses the server's SSE twin — an EventSource
on ``/progress?id=…`` plus ``POST /cancel/``. Password prompts and the
file-click browser UI stay out of scope.
"""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>csvtool-spark</title>
<style>
  :root { color-scheme: light dark; }
  body { font-family: ui-monospace, SFMono-Regular, Menlo, Consolas, monospace;
         margin: 1.5rem; max-width: 72rem; }
  textarea { width: 100%; height: 7rem; font: inherit; padding: .5rem;
             box-sizing: border-box; }
  button { font: inherit; padding: .35rem 1.2rem; margin-top: .4rem; }
  #msg { margin: .6rem 0; white-space: pre-wrap; }
  .err { color: #c0392b; }
  .ok  { color: #27ae60; }
  table { border-collapse: collapse; margin: .8rem 0 1.4rem; }
  th, td { border: 1px solid #8884; padding: .2rem .55rem; text-align: left;
           font-size: .85rem; }
  th { background: #8882; }
  caption { text-align: left; font-size: .8rem; opacity: .7; padding: .2rem 0; }
</style>
</head>
<body>
<h2>csvtool-spark</h2>
<textarea id="q" placeholder="select * from 'file.csv' where ...;  (ctrl+enter runs)"></textarea>
<br><button id="run">run</button>
<button id="cancel" hidden>cancel</button>
<span id="prog" style="opacity:.7; margin-left:.8rem;"></span>
<div id="msg"></div>
<div id="out"></div>
<script>
"use strict";
const $ = (id) => document.getElementById(id);

function cell(v) {
  return v === null ? "\\u2205" : String(v);
}

function render(data) {
  const msg = $("msg"), out = $("out");
  msg.textContent = data.message || "";
  msg.className = (data.status & 1) ? "err" : "ok";
  out.replaceChildren();
  for (const e of data.entries || []) {
    const t = document.createElement("table");
    const cap = document.createElement("caption");
    cap.textContent = e.query + (e.clipped ? "   [clipped to " + e.showLimit + " rows]" : "");
    t.appendChild(cap);
    const head = t.createTHead().insertRow();
    e.colnames.forEach((c, i) => {
      const th = document.createElement("th");
      th.textContent = c;
      th.title = e.types[i];
      head.appendChild(th);
    });
    const body = t.createTBody();
    for (const row of e.vals) {
      const tr = body.insertRow();
      for (const v of row) tr.insertCell().textContent = cell(v);
    }
    out.appendChild(t);
  }
}

let currentId = null;

async function run() {
  $("msg").textContent = "running\\u2026";
  $("msg").className = "";
  const qid = "q" + Date.now().toString(36) + Math.random().toString(36).slice(2, 8);
  currentId = qid;
  $("cancel").hidden = false;
  // live progress: one SSE event per active-stage tick, then `done`
  const es = new EventSource("/progress?id=" + qid);
  es.onmessage = (ev) => {
    const p = JSON.parse(ev.data);
    $("prog").textContent = "stage " + p.stage + ": " + p.completed + "/" + p.total + " tasks";
  };
  es.addEventListener("done", () => es.close());
  try {
    const r = await fetch("/query/", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ query: $("q").value, id: qid }),
    });
    render(await r.json());
  } catch (err) {
    $("msg").textContent = String(err);
    $("msg").className = "err";
  } finally {
    es.close();
    currentId = null;
    $("cancel").hidden = true;
    $("prog").textContent = "";
  }
}

async function cancelRun() {
  if (!currentId) return;
  $("prog").textContent = "cancelling\\u2026";
  await fetch("/cancel/", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ id: currentId }),
  });
}

$("run").addEventListener("click", run);
$("cancel").addEventListener("click", cancelRun);
$("q").addEventListener("keydown", (ev) => {
  if (ev.key === "Enter" && (ev.ctrlKey || ev.metaKey)) { ev.preventDefault(); run(); }
});
</script>
</body>
</html>
"""
