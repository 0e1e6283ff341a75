"""Minimal bundled browser UI for the HTTP query surface.

One static page, no build system, no dependencies: a query box that POSTs
to ``/query/`` and renders each statement's ReturnData entry as a table
(the same JSON contract tests and programmatic clients use). This is an
original page written for this engine — the reference ships a separate
JS bundle (/root/reference/webgui/) whose query logic lives server-side
there too; only the *surface* is mirrored:

- textarea → run → table, row-clip notice (server.go:161-177);
- live progress + cancel — the reference's websocket flow rides SSE here
  (EventSource on ``/progress?id=…`` + ``POST /cancel/``);
- file browser (reference ``fileClick``/fileBrowser, server.go:218,
  files.go:192-220): navigate directories, click a file to insert its
  quoted path into the query;
- password prompt for ``encrypt()``/``decrypt()`` (reference websocket
  SK_PASS push, server.go:40-60 + topbar.js:224-225): here the response
  carries ``needPassword: true``, the page prompts, and re-POSTs the
  query with the password (request-scoped server-side, never stored);
- save flow (reference help.js:15, server.go:126-130): the save button
  re-runs the page's statements with ``savePath`` set — every query on
  the page is written to csv (``-N`` suffixes for multi-statement);
- state echo (reference setState/getState, server.go:188-216 +
  index.js:23-88): the query box and history round-trip through
  ``/info?info=setState`` after each run and are restored from
  ``getState`` on page load.
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
  #browser { border: 1px solid #8884; padding: .5rem .8rem; margin: .6rem 0;
             font-size: .85rem; max-height: 18rem; overflow: auto; }
  #browser .bpath { opacity: .7; margin-bottom: .3rem; }
  #browser a { display: block; cursor: pointer; text-decoration: none;
               padding: .05rem 0; }
  #browser a.dir::before { content: "\\uD83D\\uDCC1 "; }
  #browser a.file::before { content: "\\uD83D\\uDCC4 "; }
</style>
</head>
<body>
<h2>csvtool-spark</h2>
<textarea id="q" placeholder="select * from 'file.csv' where ...;  (ctrl+enter runs)"></textarea>
<br><button id="run">run</button>
<button id="explain">explain</button>
<button id="browse">browse</button>
<button id="save">save</button>
<button id="cancel" hidden>cancel</button>
<span id="prog" style="opacity:.7; margin-left:.8rem;"></span>
<div id="browser" hidden></div>
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
let queryHistory = [];

async function postQuery(qid, password, savePath) {
  const body = { query: $("q").value, id: qid };
  if (password !== undefined) body.password = password;
  if (savePath) body.savePath = savePath;
  const r = await fetch("/query/", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(body),
  });
  return r.json();
}

// one POST under a fresh job id with its own progress subscription —
// currentId tracks the LIVE job so cancel always aborts the right one
async function runJob(password, savePath) {
  const qid = "q" + Date.now().toString(36) + Math.random().toString(36).slice(2, 8);
  currentId = qid;
  // live progress: one SSE event per active-stage tick, then `done`
  const es = new EventSource("/progress?id=" + qid);
  es.onmessage = (ev) => {
    const p = JSON.parse(ev.data);
    $("prog").textContent = "stage " + p.stage + ": " + p.completed + "/" + p.total + " tasks";
  };
  es.addEventListener("done", () => es.close());
  try {
    return await postQuery(qid, password, savePath);
  } finally {
    es.close();
  }
}

// state echo (reference index.js:58-64): after each successful run the
// page posts its history + query box; a reload restores them (getState)
async function pushState() {
  await fetch("/info?info=setState", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({
      haveInfo: true,
      currentQuery: $("q").value,
      history: queryHistory,
    }),
  });
}

async function restoreState() {
  try {
    const st = await (await fetch("/info?info=getState")).json();
    if (st && st.haveInfo) {
      queryHistory = st.history || [];
      if (st.currentQuery && !$("q").value) $("q").value = st.currentQuery;
    }
  } catch (err) { /* state echo is garnish; never block the page */ }
}

async function run(savePath) {
  $("msg").textContent = "running\\u2026";
  $("msg").className = "";
  $("cancel").hidden = false;
  try {
    let data = await runJob(undefined, savePath);
    if (data.needPassword) {
      // reference: websocket SK_PASS push -> browser prompt -> resend
      // (topbar.js:224-225); here: prompt and re-POST with the password
      // as a NEW job (own id + progress stream, cancellable)
      const pw = window.prompt("password for encrypt()/decrypt():");
      if (pw !== null) data = await runJob(pw, savePath);
    }
    render(data);
    if (!(data.status & 1)) {
      queryHistory.push({ query: data.originalQuery });
      pushState();
    }
  } catch (err) {
    $("msg").textContent = String(err);
    $("msg").className = "err";
  } finally {
    currentId = null;
    $("cancel").hidden = true;
    $("prog").textContent = "";
  }
}

// save flow (reference help.js:15): re-run the page's statements with a
// save path — every query on the page is written (-N suffixes when
// there are several); no extension means .csv
function saveRun() {
  const p = window.prompt(
    "save results to (.csv/.tsv/.txt/.jsonl[.gz]/.parquet/.orc; " +
    ".csv appended if bare):");
  if (p) run(p);
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

// --- file browser (reference fileClick flow, server.go:218) ---------------

async function browseTo(path) {
  const r = await fetch("/info?info=fileClick", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ path: path, mode: "open" }),
  });
  const d = await r.json();
  const box = $("browser");
  box.hidden = false;
  box.replaceChildren();
  if (d.status & 4) {  // DAT_BADPATH
    const p = document.createElement("div");
    p.className = "bpath err";
    p.textContent = "invalid path: " + (d.path || path);
    box.appendChild(p);
    return;
  }
  const p = document.createElement("div");
  p.className = "bpath";
  p.textContent = d.path;
  box.appendChild(p);
  const join = (base, name) => (base.endsWith("/") ? base : base + "/") + name;
  const add = (label, cls, onclick) => {
    const a = document.createElement("a");
    a.className = cls;
    a.textContent = label;
    a.addEventListener("click", onclick);
    box.appendChild(a);
  };
  if (d.parent && d.parent !== d.path) {
    add("..", "dir", () => browseTo(d.parent));
  }
  for (const name of d.dirs || []) {
    add(name + "/", "dir", () => browseTo(join(d.path, name)));
  }
  for (const name of d.files || []) {
    add(name, "file", () => {
      const q = $("q");
      const ins = "'" + join(d.path, name) + "'";
      const at = q.selectionStart ?? q.value.length;
      q.value = q.value.slice(0, at) + ins + q.value.slice(q.selectionEnd ?? at);
      q.focus();
      $("browser").hidden = true;
    });
  }
}

function toggleBrowser() {
  const box = $("browser");
  if (!box.hidden) { box.hidden = true; return; }
  browseTo(".");
}

// explain (engine-exceeds-reference): show the formatted Catalyst plan
// for each statement on the page without collecting it (POST /explain).
// Same password prompt-and-retry and cancellable job id as /query.
async function postExplain(password) {
  const qid = "e" + Date.now().toString(36) + Math.random().toString(36).slice(2, 8);
  currentId = qid;
  const body = { query: $("q").value, id: qid };
  if (password !== undefined) body.password = password;
  const r = await fetch("/explain/", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(body),
  });
  return r.json();
}

async function explainRun() {
  $("msg").textContent = "explaining\\u2026";
  $("msg").className = "";
  $("cancel").hidden = false;
  try {
    let data = await postExplain();
    if (data.needPassword) {
      const pw = window.prompt("password for encrypt()/decrypt():");
      if (pw !== null) data = await postExplain(pw);
    }
    const msg = $("msg"), out = $("out");
    msg.textContent = data.message || "";
    msg.className = (data.status & 1) ? "err" : "ok";
    out.replaceChildren();
    for (const p of data.plans || []) {
      const cap = document.createElement("div");
      cap.style.opacity = ".7";
      cap.style.fontSize = ".8rem";
      cap.textContent = p.query;
      out.appendChild(cap);
      const pre = document.createElement("pre");
      pre.style.fontSize = ".8rem";
      pre.textContent = p.plan;
      out.appendChild(pre);
    }
  } catch (err) {
    $("msg").textContent = String(err);
    $("msg").className = "err";
  } finally {
    currentId = null;
    $("cancel").hidden = true;
  }
}

$("run").addEventListener("click", () => run());
$("explain").addEventListener("click", explainRun);
$("browse").addEventListener("click", toggleBrowser);
$("save").addEventListener("click", saveRun);
$("cancel").addEventListener("click", cancelRun);
$("q").addEventListener("keydown", (ev) => {
  if (ev.key === "Enter" && (ev.ctrlKey || ev.metaKey)) { ev.preventDefault(); run(); }
});
restoreState();
</script>
</body>
</html>
"""
