"""Thin web UI + JSON API over an Engine.

The reference's surface is an egui desktop app (src/main.rs, src/ui/*);
this is its server-side equivalent: a stdlib HTTP server exposing the same
capabilities — text search (search.rs:40-49), search-by-image upload
(drag-and-drop, search.rs:28-31), find-similar per result (search.rs:100),
thumbnails (ui/mod.rs:50-59), folder management + reindex (folders.rs),
and settings (settings.rs:9-20) — as JSON endpoints plus a minimal HTML
front end.

Endpoints:
  GET  /                      HTML UI
  GET  /api/search?q=...      text query results
  POST /api/similar           image bytes → similarity results
  GET  /api/similar?id=N      find-similar on an indexed image
  GET  /api/thumbnail?id=N    PNG thumbnail
  GET  /api/folders           tracked folders
  POST /api/folders/add       {"folder": path}
  POST /api/folders/remove    {"folder": path}
  POST /api/reindex           start indexing
  POST /api/stop              stop indexing
  GET  /api/status            index size, indexing state, settings
  POST /api/settings          {"max_search_results": N, "max_distance": X}
"""

from __future__ import annotations

import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!DOCTYPE html>
<html><head><title>pixelbox-tpu</title><style>
body{font-family:sans-serif;margin:2em;background:#1b1b1f;color:#ddd}
input,button{font-size:1em;padding:.4em;background:#2a2a2f;color:#ddd;border:1px solid #555}
#results{display:flex;flex-wrap:wrap;gap:12px;margin-top:1em}
.card{width:180px;background:#26262b;padding:8px;border-radius:6px}
.card img{max-width:100%;border-radius:4px}
.card .name{font-size:.8em;word-break:break-all}
.card .dist{font-size:.75em;color:#9a9}
a{color:#8cf}
</style></head><body>
<h2>pixelbox-tpu</h2>
<div>
<input id="q" size="50" placeholder='query (tag:, exif:, all:, similar:, filename:)'>
<button onclick="search()">Search</button>
<button onclick="reindex()">Reindex</button>
<span id="status"></span>
</div>
<div id="results"></div>
<script>
async function search(){
  const q = document.getElementById('q').value;
  const r = await fetch('/api/search?q='+encodeURIComponent(q));
  render(await r.json());
}
async function similar(id){
  const r = await fetch('/api/similar?id='+id);
  render(await r.json());
}
async function reindex(){
  await fetch('/api/reindex', {method:'POST'});
  poll();
}
async function poll(){
  const r = await (await fetch('/api/status')).json();
  document.getElementById('status').textContent =
    r.indexing ? ('indexing… '+r.images+' images') : (r.images+' images');
  if (r.indexing) setTimeout(poll, 1000);
}
function render(items){
  const el = document.getElementById('results');
  el.innerHTML = '';
  for (const it of items){
    const d = document.createElement('div'); d.className='card';
    d.innerHTML = `<img src="/api/thumbnail?id=${it.id}">
      <div class="name">${it.filename}</div>
      <div class="dist">${it.distance==null?'':'dist '+it.distance.toFixed(4)}</div>
      <a href="#" onclick="similar(${it.id});return false">find similar</a>`;
    el.appendChild(d);
  }
}
poll();
document.getElementById('q').addEventListener('keydown', e=>{if(e.key=='Enter')search()});
</script></body></html>"""


def _results_json(engine, offset: int = 0, limit: int = 0):
    """Serialize cached results; offset/limit implement the pagination the
    reference stubbed but never wired (reference src/ui/mod.rs:61-82)."""
    results = engine.get_query_results() or []
    if offset:
        results = results[offset:]
    if limit:
        results = results[:limit]
    return [
        {
            "id": r.id,
            "filename": r.filename,
            "path": r.path,
            "resolution": list(r.resolution),
            "distance": r.distance_from_query,
            "tags": r.tags,
        }
        for r in results
    ]


class _ThumbCache:
    """Small LRU of encoded PNG thumbnails — the server-side analog of the
    reference's per-image-id texture cache (src/ui/mod.rs:50-59)."""

    def __init__(self, capacity: int = 512):
        from collections import OrderedDict

        self._od = OrderedDict()
        self._cap = capacity
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            if key in self._od:
                self._od.move_to_end(key)
                return self._od[key]
        return None

    def put(self, key, value):
        with self._lock:
            self._od[key] = value
            self._od.move_to_end(key)
            while len(self._od) > self._cap:
                self._od.popitem(last=False)


def make_handler(engine, lock: threading.Lock):
    thumb_cache = _ThumbCache()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code, body, ctype="application/json"):
            if isinstance(body, (dict, list)):
                body = json.dumps(body).encode()
            elif isinstance(body, str):
                body = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            qs = urllib.parse.parse_qs(parsed.query)
            try:
                if parsed.path == "/":
                    return self._send(200, _PAGE, "text/html")
                if parsed.path == "/api/search":
                    q = qs.get("q", [""])[0]
                    offset = int(qs.get("offset", ["0"])[0])
                    limit = int(qs.get("limit", ["0"])[0])
                    with lock:
                        engine.query(q)
                        return self._send(200, _results_json(engine, offset, limit))
                if parsed.path == "/api/similar":
                    image_id = int(qs["id"][0])
                    info = engine.catalog.get_image(image_id)
                    if info is None:
                        return self._send(404, {"error": "no such image"})
                    with lock:
                        rec = engine.load_image(info["path"])
                        if rec is None:
                            return self._send(410, {"error": "file unreadable"})
                        engine.query_by_image_hash_from_image(rec)
                        return self._send(200, _results_json(engine))
                if parsed.path == "/api/thumbnail":
                    image_id = int(qs["id"][0])
                    cached = thumb_cache.get(image_id)
                    if cached is not None:
                        return self._send(200, cached, "image/png")
                    info = engine.catalog.get_image(image_id)
                    if info is None or not info["thumbnail"]:
                        return self._send(404, {"error": "no thumbnail"})
                    from PIL import Image

                    from pixelbox_tpu.ingest.thumbnail import qoi_decode

                    rgb, _ = qoi_decode(info["thumbnail"])
                    buf = io.BytesIO()
                    Image.fromarray(rgb).save(buf, "PNG")
                    png = buf.getvalue()
                    thumb_cache.put(image_id, png)
                    return self._send(200, png, "image/png")
                if parsed.path == "/api/folders":
                    return self._send(200, engine.get_tracked_folders())
                if parsed.path == "/api/status":
                    return self._send(
                        200,
                        {
                            "images": engine.get_num_indexed_images(),
                            "indexing": engine.is_indexing_active(),
                            "max_search_results": engine.max_search_results,
                            "max_distance": engine.max_distance_from_query,
                        },
                    )
                return self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                return self._send(500, {"error": str(e)})

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b""
            try:
                if parsed.path == "/api/similar":
                    with lock:
                        rec = engine.load_image_from_memory(body, "upload", "")
                        if rec is None:
                            return self._send(400, {"error": "cannot decode image"})
                        engine.query_by_image_hash_from_image(rec)
                        return self._send(200, _results_json(engine))
                data = json.loads(body) if body else {}
                if parsed.path == "/api/folders/add":
                    engine.add_tracked_folder(data["folder"])
                    return self._send(200, engine.get_tracked_folders())
                if parsed.path == "/api/folders/remove":
                    engine.remove_tracked_folder(data["folder"])
                    return self._send(200, engine.get_tracked_folders())
                if parsed.path == "/api/reindex":
                    engine.start_indexing()
                    return self._send(200, {"started": True})
                if parsed.path == "/api/stop":
                    engine.stop_indexing()
                    return self._send(200, {"stopped": True})
                if parsed.path == "/api/settings":
                    if "max_search_results" in data:
                        engine.max_search_results = int(data["max_search_results"])
                    if "max_distance" in data:
                        engine.max_distance_from_query = float(data["max_distance"])
                    return self._send(200, {"ok": True})
                return self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                return self._send(500, {"error": str(e)})

    return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 8333):
    lock = threading.Lock()
    server = ThreadingHTTPServer((host, port), make_handler(engine, lock))
    print(f"pixelbox-tpu serving on http://{host}:{port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
