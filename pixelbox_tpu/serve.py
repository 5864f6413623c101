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
  POST /api/face-similar      image bytes → face-search results
  GET  /api/faces?id=N        stored face boxes for an indexed image
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
input[type=number]{width:6em}
#results{display:flex;flex-wrap:wrap;gap:12px;margin-top:1em}
.card{width:180px;background:#26262b;padding:8px;border-radius:6px}
.card img{max-width:100%;border-radius:4px}
.card .name{font-size:.8em;word-break:break-all}
.card .dist{font-size:.75em;color:#9a9}
a{color:#8cf}
#drop{border:2px dashed #555;border-radius:6px;padding:.6em 1em;display:inline-block;
      color:#aaa;cursor:pointer;margin-left:.5em}
#drop.hot{border-color:#8cf;color:#8cf}
#settings{margin-top:.6em;font-size:.85em;color:#aaa}
#pager{margin-top:.6em}
#pager button{margin-right:.4em}
</style></head><body>
<h2>pixelbox-tpu</h2>
<div>
<input id="q" size="50" placeholder='query (tag:, exif:, all:, similar:, filename:, text:)'>
<button onclick="search()">Search</button>
<button onclick="reindex()">Reindex</button>
<span id="drop">drop / click to search by image<input id="file" type="file"
  accept="image/*" style="display:none"></span>
<span id="status"></span>
</div>
<div id="settings">
max results <input id="maxres" type="number" min="1" max="10000">
max distance <input id="maxdist" type="number" step="0.05" min="0">
min search len <input id="minlen" type="number" min="0" max="255" title="auto-search after this many characters; 0 disables">
thumb px <input id="thumbsz" type="number" min="60" max="512">
scan <select id="scanmode" title="auto = guaranteed-exact; ivf = clustered ANN (approximate selection, exact distances)">
<option>auto</option><option>exact</option><option>fast</option>
<option>pallas</option><option>ivf</option></select>
nprobe <input id="nprobe" type="number" min="0" style="width:3.5em"
 title="ivf mode: clusters probed per query (higher = better recall; 0 = auto, 2% of clusters)">
<button onclick="saveSettings()">apply</button>
</div>
<div id="pager">
<button onclick="page(-1)">&#8592; prev</button>
<button onclick="page(1)">next &#8594;</button>
<span id="pageinfo"></span>
</div>
<div id="results"></div>
<script>
const PAGE = 60;
let offset = 0;
let searchSeq = 0;  // staleness guard: only the newest query may render
async function search(){
  const q = document.getElementById('q').value;
  offset = 0;
  const seq = ++searchSeq;
  const r = await fetch('/api/search?q='+encodeURIComponent(q)
                        +'&offset=0&limit='+PAGE);
  const items = await r.json();
  if (seq === searchSeq) render(items);
}
async function similar(id){
  offset = 0;
  const r = await fetch('/api/similar?id='+id);
  render(await r.json());
}
async function page(dir){
  offset = Math.max(0, offset + dir*PAGE);
  const r = await fetch('/api/results?offset='+offset+'&limit='+PAGE);
  render(await r.json());
}
async function searchByFile(file){
  offset = 0;
  const r = await fetch('/api/similar', {method:'POST', body:file});
  render(await r.json());
}
async function reindex(){
  await fetch('/api/reindex', {method:'POST'});
  poll();
}
let minSearchLen = 3;
async function saveSettings(){
  const body = {
    max_search_results: +document.getElementById('maxres').value,
    max_distance: +document.getElementById('maxdist').value};
  const ml = document.getElementById('minlen').value;
  if (ml !== '') { minSearchLen = +ml; body.search_min_length = minSearchLen; }
  const ts = +document.getElementById('thumbsz').value;
  if (ts >= 60) { applyThumbSize(ts); body.thumbnail_size = ts; }
  body.scan_mode = document.getElementById('scanmode').value;
  const npEl = document.getElementById('nprobe');
  // 0 (or any cleared-then-zero entry) resets to the recall-governed
  // auto default; only an untouched empty field is omitted.
  if (npEl.value !== '') body.ivf_nprobe = Math.max(0, +npEl.value || 0);
  await fetch('/api/settings', {method:'POST', body:JSON.stringify(body)});
}
function applyThumbSize(px){
  for (const c of document.querySelectorAll('.card')) c.style.width = px+'px';
}
async function poll(){
  const r = await (await fetch('/api/status')).json();
  document.getElementById('status').textContent =
    r.indexing ? ('indexing… '+r.images+' images') : (r.images+' images');
  const mr = document.getElementById('maxres');
  if (mr.value === '') mr.value = r.max_search_results;
  const md = document.getElementById('maxdist');
  if (md.value === '') md.value = r.max_distance;
  const ml = document.getElementById('minlen');
  if (ml.value === '') { ml.value = r.search_min_length; minSearchLen = r.search_min_length; }
  const ts = document.getElementById('thumbsz');
  if (ts.value === '') ts.value = r.thumbnail_size;
  const sm = document.getElementById('scanmode');
  if (!sm.dataset.touched) sm.value = r.scan_mode;
  sm.onchange = () => { sm.dataset.touched = 1; };
  const np = document.getElementById('nprobe');
  if (np.value === '' && r.ivf_nprobe) np.value = r.ivf_nprobe;
  if (r.indexing) setTimeout(poll, 1000);
}
function render(items){
  const el = document.getElementById('results');
  el.innerHTML = '';
  // Cards built with createElement/textContent only: filenames are
  // attacker-controlled (a file named <img onerror=...>.png must render
  // as text, never as markup).
  for (const it of items){
    const d = document.createElement('div'); d.className='card';
    const link = document.createElement('a');
    link.href = '/api/image?id='+encodeURIComponent(it.id);
    link.target = '_blank';  // full-image view (view panel analog)
    const img = document.createElement('img');
    img.src = '/api/thumbnail?id='+encodeURIComponent(it.id);
    link.appendChild(img);
    const name = document.createElement('div'); name.className='name';
    name.textContent = it.filename;
    name.title = it.path + (Object.keys(it.tags||{}).length
      ? '\\n' + Object.entries(it.tags).map(([k,v])=>k+': '+v).join('\\n')
      : '');
    const dist = document.createElement('div'); dist.className='dist';
    dist.textContent = it.distance==null ? '' : 'dist '+it.distance.toFixed(4);
    const a = document.createElement('a'); a.href='#';
    a.textContent = 'find similar';
    a.onclick = () => { similar(it.id); return false; };
    d.append(link, name, dist, a);
    el.appendChild(d);
  }
  document.getElementById('pageinfo').textContent =
    'page ' + (1 + offset/PAGE) + (items.length < PAGE ? ' (end)' : '');
  const ts = +document.getElementById('thumbsz').value;
  if (ts >= 60) applyThumbSize(ts);
}
const drop = document.getElementById('drop');
const fileInput = document.getElementById('file');
drop.onclick = () => fileInput.click();
fileInput.onchange = () => {
  if (fileInput.files.length) searchByFile(fileInput.files[0]);
};
// Drag-and-drop query — the reference's flagship interaction
// (src/ui/search.rs:28-31, 120-163): drop anywhere on the page.
for (const t of [document.body, drop]){
  t.addEventListener('dragover', e => {e.preventDefault(); drop.classList.add('hot');});
  t.addEventListener('dragleave', () => drop.classList.remove('hot'));
  t.addEventListener('drop', e => {
    e.preventDefault(); drop.classList.remove('hot');
    if (e.dataTransfer.files.length) searchByFile(e.dataTransfer.files[0]);
  });
}
poll();
document.getElementById('q').addEventListener('keydown', e=>{if(e.key=='Enter')search()});
// Auto-search past the minimum length (search.rs:40-49; settings.rs:
// "0 disables automatic searching"), debounced.
let searchTimer = null;
document.getElementById('q').addEventListener('input', e=>{
  clearTimeout(searchTimer);
  if (minSearchLen > 0 && e.target.value.length >= minSearchLen)
    searchTimer = setTimeout(search, 300);
});
document.getElementById('q').addEventListener('keydown', e=>{
  if (e.key=='Enter') clearTimeout(searchTimer);
});
</script></body></html>"""


def _serialize_results(results, offset: int = 0, limit: int = 0):
    """Serialize a result list; offset/limit implement the pagination the
    reference stubbed but never wired (reference src/ui/mod.rs:61-82)."""
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


def _results_json(engine, offset: int = 0, limit: int = 0):
    return _serialize_results(engine.get_query_results() or [], offset, limit)


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


def make_handler(engine, lock: threading.Lock, scan_service=None):
    thumb_cache = _ThumbCache()
    # UI-level settings (reference MainApp state, settings.rs:9-20):
    # search_min_length 0 disables auto-search; thumbnail_size is the
    # card width in px.
    ui_settings = {"search_min_length": 3, "thumbnail_size": 180}

    def _similar_by_record(rec):
        """Similarity results for a decoded record.

        With a scan service, concurrent requests coalesce into single
        device batches (serving.BatchingScanService) instead of
        serializing behind the engine lock; hashing the query image and
        assembling results stay on the request thread (the catalog uses
        per-thread connections).
        """
        import numpy as np

        # The batching service scans with the guaranteed-exact auto path:
        # result-identical to auto/exact/pallas, so those modes coalesce
        # freely.  IVF returns a different (probed) result set, so it
        # coalesces under its own kind (engine.ivf_scan_batched — both
        # return store row ids, so assembly is shared).
        ivf = engine.scan_mode == "ivf"
        if scan_service is not None \
                and (not ivf or "ivf" in getattr(scan_service, "kinds", ())) \
                and engine._sem_store is not None \
                and engine._sem_store.size > 0:
            scan_service.k = int(engine.max_search_results)
            scan_service.max_distance = float(engine.max_distance_from_query)
            # Read lock across scan→assemble: a compaction renumbering
            # between them would map rows through the wrong id table.
            with engine.index_rwlock.read_locked():
                dist, idx = scan_service.submit(
                    rec.visual_hash, kind="ivf" if ivf else "semantic"
                )
                keep = idx >= 0
                results = engine._build_results(idx[keep], dist[keep])
            with lock:
                engine._cached_search_results = results
            return results
        with lock:
            engine.query_by_image_hash_from_image(rec)
            return engine.get_query_results() or []

    def _phash_similar(ph):
        """Hamming search for an uploaded image's phash.  With a scan
        service + uniform-width store, concurrent requests coalesce into
        one device batch (kind="phash"); mixed-width (compat) stores take
        the engine's grouped zip-truncate path under the lock."""
        import numpy as np

        if (
            scan_service is not None
            and "phash" in getattr(scan_service, "kinds", ())
            and engine._ph_store is not None
            and engine._ph_store.size > 0
        ):
            try:
                scan_service.k = int(engine.max_search_results)
                scan_service.max_distance = float(
                    engine.max_distance_from_query
                )
                with engine.index_rwlock.read_locked():
                    dist, rows = scan_service.submit(
                        np.asarray(ph), kind="phash"
                    )
                    keep = rows >= 0
                    ids = engine.phash_ids_for_rows(rows[keep])
                results = engine._results_from_image_ids(ids, dist[keep])
                with lock:
                    engine._cached_search_results = results
                return results
            except ValueError:
                pass  # mixed-width store — grouped path below
        with lock:
            engine.query_by_phash(ph)
            return engine.get_query_results() or []

    def _face_similar(rgb):
        """Face search for an uploaded image: detect + embed the largest
        face, scan the face store (engine.query_by_face_hash semantics).
        With a scan service, concurrent face queries coalesce into one
        device batch (kind="face"; the batched call returns image ids
        directly — dedup + over-fetch retry live in the engine).
        Returns None when no face is detected (caller reports 422)."""
        import numpy as np

        from pixelbox_tpu.faces.detect import largest_face

        faces = engine.detect_and_embed_faces(rgb)
        if not faces:
            return None
        _, q_hash = largest_face(faces)
        if (
            scan_service is not None
            and "face" in getattr(scan_service, "kinds", ())
            and engine._face_store is not None
            and engine._face_store.size > 0
        ):
            scan_service.k = int(engine.max_search_results)
            scan_service.max_distance = float(engine.max_distance_from_query)
            with engine.index_rwlock.read_locked():
                dist, img_ids = scan_service.submit(
                    np.asarray(q_hash), kind="face"
                )
                keep = img_ids >= 0
                ids = [int(i) for i in img_ids[keep]]
            results = engine._results_from_image_ids(ids, dist[keep])
            with lock:
                engine._cached_search_results = results
            return results
        with lock:
            engine.query_by_face_hash(q_hash)
            return engine.get_query_results() or []

    def _text_fastpath(q):
        """Unfiltered ``text:`` queries coalesce through the scan
        service (kind="blip"): embed the text on the request thread,
        batch the device scan, assemble results.  Filtered/compound
        queries return None and take the normal engine path."""
        # Must agree with the engine path: only a query that TOKENIZES
        # to exactly one text: token qualifies (an unquoted multi-word
        # query tokenizes to text:'word1' + bare filename tokens — that
        # compound form takes the normal engine path).
        from pixelbox_tpu.query.tokenizer import tokenize_query

        try:
            tokens = tokenize_query(q)
        except Exception:
            return None
        if len(tokens) != 1 or not tokens[0].lower().startswith("text:"):
            return None
        text = tokens[0][5:].strip()
        if not text:
            return None
        if (
            scan_service is None
            or "blip" not in getattr(scan_service, "kinds", ())
            or getattr(engine, "blip_searcher", None) is None
            or getattr(engine, "_blip_store", None) is None
            or engine._blip_store.size == 0
        ):
            return None
        import numpy as np

        try:
            h = engine.blip_searcher.text_hashes([text])[0]
            scan_service.k = int(engine.max_search_results)
            with engine.index_rwlock.read_locked():
                dist, rows = scan_service.submit(np.asarray(h), kind="blip")
                keep = rows >= 0
                ids = engine.blip_ids_for_rows(rows[keep])
            return engine._results_from_image_ids(ids, dist[keep])
        except Exception:
            return None  # empty/missing blip store etc. — normal path

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
                    results = _text_fastpath(q)
                    if results is not None:
                        with lock:
                            engine._cached_search_results = results
                        return self._send(
                            200,
                            _results_json(engine, offset, limit),
                        )
                    with lock:
                        engine.query(q)
                        return self._send(200, _results_json(engine, offset, limit))
                if parsed.path == "/api/similar":
                    image_id = int(qs["id"][0])
                    info = engine.catalog.get_image(image_id)
                    if info is None:
                        return self._send(404, {"error": "no such image"})
                    # Find-similar on a result uses the STORED hash: no
                    # decode/embed, and the image matches itself exactly.
                    blob = engine.catalog.get_hash("semantic_hashes", image_id)
                    if blob is None:
                        return self._send(410, {"error": "no semantic hash"})
                    import numpy as np

                    from pixelbox_tpu.records import IndexedImage

                    rec = IndexedImage(
                        id=image_id, filename=info["filename"],
                        path=info["path"],
                        visual_hash=np.frombuffer(blob, dtype=np.uint8),
                    )
                    # Serialize the list returned to THIS request — the
                    # engine cache is shared and a concurrent query may
                    # overwrite it before we read it back.
                    return self._send(
                        200, _serialize_results(_similar_by_record(rec))
                    )
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
                if parsed.path == "/api/image":
                    # Full-image view (the reference's view panel,
                    # ui/view.rs:14-78): streams the ORIGINAL indexed
                    # file (no whole-file buffering — originals can be
                    # hundreds of MB and handler threads are concurrent).
                    import os
                    import shutil

                    image_id = int(qs["id"][0])
                    info = engine.catalog.get_image(image_id)
                    if info is None:
                        return self._send(404, {"error": "no such image"})
                    ext = info["path"].rsplit(".", 1)[-1].lower()
                    ctype = {
                        "jpg": "image/jpeg", "jpeg": "image/jpeg",
                        "jfif": "image/jpeg", "png": "image/png",
                        "gif": "image/gif", "webp": "image/webp",
                        "bmp": "image/bmp", "tiff": "image/tiff",
                    }.get(ext, "application/octet-stream")
                    from pixelbox_tpu.ingest.decode import split_zip_path

                    zp = split_zip_path(info["path"])
                    if zp is not None:
                        # Zip-member pseudo-path: stream from the archive.
                        import zipfile

                        try:
                            zf = zipfile.ZipFile(zp[0])
                        except (OSError, zipfile.BadZipFile):
                            return self._send(410, {"error": "file unreadable"})
                        with zf:
                            try:
                                zinfo = zf.getinfo(zp[1])
                            except KeyError:
                                return self._send(410, {"error": "file unreadable"})
                            self.send_response(200)
                            self.send_header("Content-Type", ctype)
                            self.send_header(
                                "Content-Length", str(zinfo.file_size)
                            )
                            self.end_headers()
                            with zf.open(zinfo) as f:
                                shutil.copyfileobj(f, self.wfile)
                        return None
                    try:
                        f = open(info["path"], "rb")
                    except OSError:
                        return self._send(410, {"error": "file unreadable"})
                    with f:
                        size = os.fstat(f.fileno()).st_size
                        self.send_response(200)
                        self.send_header("Content-Type", ctype)
                        self.send_header("Content-Length", str(size))
                        self.end_headers()
                        shutil.copyfileobj(f, self.wfile)
                    return None
                if parsed.path == "/api/results":
                    # Page through the cached results WITHOUT re-running the
                    # query (the pagination the reference stubbed,
                    # ui/mod.rs:61-82).
                    offset = int(qs.get("offset", ["0"])[0])
                    limit = int(qs.get("limit", ["0"])[0])
                    return self._send(200, _results_json(engine, offset, limit))
                if parsed.path == "/api/folders":
                    return self._send(200, engine.get_tracked_folders())
                if parsed.path == "/api/duplicates":
                    # NB: holds the engine lock for the whole self-scan —
                    # an admin-style operation; concurrent searches queue
                    # behind it.
                    by = qs.get("by", ["phash"])[0]
                    if by not in ("phash", "semantic"):
                        return self._send(
                            400, {"error": "by must be phash or semantic"}
                        )
                    md = float(
                        qs.get(
                            "max_distance",
                            ["0.1" if by == "phash" else "0.05"],
                        )[0]
                    )
                    # Lock like /api/search: the scan mutates the
                    # engine's derived-index caches.
                    if qs.get("groups", ["0"])[0] in ("1", "true"):
                        with lock:
                            groups = engine.find_duplicate_groups(
                                max_distance=md, by=by
                            )
                        return self._send(200, {"groups": groups})
                    with lock:
                        pairs = engine.find_duplicate_pairs(
                            max_distance=md, by=by
                        )
                    return self._send(
                        200,
                        {"pairs": [
                            {"a": a, "b": b, "distance": d}
                            for a, b, d in pairs
                        ]},
                    )
                if parsed.path == "/api/faces":
                    image_id = int(qs["id"][0])
                    if engine.catalog.get_image(image_id) is None:
                        return self._send(404, {"error": "no such image"})
                    return self._send(200, engine.get_faces(image_id))
                if parsed.path == "/api/status":
                    from pixelbox_tpu.ops.ivf import (
                        default_nprobe as _default_nprobe,
                    )

                    status = {
                        "images": engine.get_num_indexed_images(),
                        "indexing": engine.is_indexing_active(),
                        "max_search_results": engine.max_search_results,
                        "max_distance": engine.max_distance_from_query,
                        "scan_mode": engine.scan_mode,
                        "ivf_nprobe": engine.ivf_nprobe,  # null = auto
                        # What auto resolves to on the CURRENT clustered
                        # index — single-chip or mesh-sharded, whichever
                        # is live (null until an ivf query built one).
                        "ivf_nprobe_effective": (
                            engine.ivf_nprobe
                            or engine._ivf_tuned_nprobe
                            or (_default_nprobe(engine._ivf.n_clusters)
                                if engine._ivf is not None else None)
                            or (_default_nprobe(
                                    engine._ivf_sharded.n_clusters)
                                if engine._ivf_sharded is not None
                                else None)
                        ),
                        "ivf_clusters": engine.ivf_clusters,  # null = auto
                        "semantic_precision": engine.semantic_precision,
                        "embedder": engine._embedder_name,
                        "blip_enabled": engine._blip_enabled,
                        "ocr_enabled": engine.ocr_enabled,
                        "phash_compat": engine.phash_compat,
                        "faces_enabled": engine.faces_enabled,
                        "faces": (
                            engine._face_store.size
                            if engine._face_store is not None
                            else 0
                        ),
                        "watching": engine.is_watching(),
                        "watch_removals": getattr(
                            engine, "watch_removals", 0
                        ),
                        **ui_settings,
                    }
                    if scan_service is not None:
                        status["scan_batches"] = scan_service.batches_run
                        status["scan_queries"] = scan_service.queries_served
                    return self._send(200, status)
                return self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                return self._send(500, {"error": str(e)})

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b""
            try:
                if parsed.path == "/api/similar":
                    rec = engine.load_image_from_memory(body, "upload", "")
                    if rec is None:
                        return self._send(400, {"error": "cannot decode image"})
                    return self._send(
                        200, _serialize_results(_similar_by_record(rec))
                    )
                if parsed.path == "/api/phash-similar":
                    rec = engine.load_image_from_memory(body, "upload", "")
                    if rec is None:
                        return self._send(400, {"error": "cannot decode image"})
                    return self._send(
                        200, _serialize_results(_phash_similar(rec.phash))
                    )
                if parsed.path == "/api/face-similar":
                    from pixelbox_tpu.ingest.decode import decode_image_bytes

                    if engine._face_store is None or engine._face_store.size == 0:
                        return self._send(
                            410,
                            {"error": "no face index — index with --faces"},
                        )
                    decoded = decode_image_bytes(body, "upload", "")
                    if decoded is None:
                        return self._send(400, {"error": "cannot decode image"})
                    results = _face_similar(decoded.rgb)
                    if results is None:
                        return self._send(
                            422, {"error": "no face detected in query image"}
                        )
                    return self._send(200, _serialize_results(results))
                data = json.loads(body) if body else {}
                if parsed.path == "/api/folders/add":
                    engine.add_tracked_folder(data["folder"])
                    return self._send(200, engine.get_tracked_folders())
                if parsed.path == "/api/folders/remove":
                    if data.get("purge"):
                        with lock:
                            n = engine.remove_tracked_folder_and_images(
                                data["folder"]
                            )
                        return self._send(
                            200,
                            {"folders": engine.get_tracked_folders(),
                             "removed_images": n},
                        )
                    engine.remove_tracked_folder(data["folder"])
                    return self._send(200, engine.get_tracked_folders())
                if parsed.path == "/api/remove":
                    with lock:
                        ok = engine.remove_image(int(data["id"]))
                    if not ok:
                        return self._send(404, {"error": "no such image"})
                    return self._send(200, {"removed": int(data["id"])})
                if parsed.path == "/api/reindex":
                    engine.start_indexing()
                    return self._send(200, {"started": True})
                if parsed.path == "/api/stop":
                    engine.stop_indexing()
                    return self._send(200, {"stopped": True})
                if parsed.path == "/api/tag":
                    # Editable tags (reference roadmap item): body
                    # {"id": N, "name": ..., "value": ...}.
                    ok = engine.set_tag(
                        int(data["id"]), str(data["name"]),
                        str(data.get("value", "")),
                    )
                    if not ok:
                        return self._send(404, {"error": "no such image"})
                    return self._send(
                        200, {"tags": engine.catalog.get_tags(int(data["id"]))}
                    )
                if parsed.path == "/api/untag":
                    ok = engine.remove_tag(int(data["id"]), str(data["name"]))
                    return self._send(
                        200 if ok else 404,
                        {"tags": engine.catalog.get_tags(int(data["id"]))}
                        if ok else {"error": "no such tag"},
                    )
                if parsed.path == "/api/watch":
                    if data.get("stop"):
                        engine.stop_watching()
                    else:
                        engine.watch(
                            interval_s=float(data.get("interval", 30.0))
                        )
                    return self._send(200, {"watching": engine.is_watching()})
                if parsed.path == "/api/settings":
                    # Validate every field BEFORE applying any, so a bad
                    # value is a clean 400 with nothing half-applied.
                    try:
                        staged = {}
                        if "max_search_results" in data:
                            staged["max_search_results"] = int(
                                data["max_search_results"])
                        if "max_distance" in data:
                            staged["max_distance"] = float(
                                data["max_distance"])
                        if "search_min_length" in data:
                            staged["search_min_length"] = min(
                                255, max(0, int(data["search_min_length"]))
                            )
                        if "thumbnail_size" in data:
                            staged["thumbnail_size"] = min(
                                512, max(60, int(data["thumbnail_size"]))
                            )
                        if "ivf_nprobe" in data:
                            # null/0 = back to the recall-governed auto
                            # default (2% of clusters, floor 8).
                            v = data["ivf_nprobe"]
                            staged["ivf_nprobe"] = (
                                None if v in (None, 0, "0", "") else
                                max(1, int(v))
                            )
                        if "ivf_clusters" in data:
                            # null/0 = back to auto (~4·sqrt(N)); changing
                            # the count retrains on the next ivf query.
                            v = data["ivf_clusters"]
                            staged["ivf_clusters"] = (
                                None if v in (None, 0, "0", "") else
                                max(1, int(v))
                            )
                    except (TypeError, ValueError) as e:
                        return self._send(400, {"error": f"bad value: {e}"})
                    if "scan_mode" in data:
                        mode = str(data["scan_mode"])
                        if mode not in (
                            "auto", "exact", "fast", "pallas", "ivf"
                        ):
                            return self._send(
                                400, {"error": f"bad scan_mode: {mode}"}
                            )
                        staged["scan_mode"] = mode
                    if "max_search_results" in staged:
                        engine.max_search_results = staged["max_search_results"]
                    if "max_distance" in staged:
                        engine.max_distance_from_query = staged["max_distance"]
                    if "search_min_length" in staged:
                        ui_settings["search_min_length"] = staged[
                            "search_min_length"]
                    if "thumbnail_size" in staged:
                        ui_settings["thumbnail_size"] = staged["thumbnail_size"]
                    if "scan_mode" in staged:
                        engine.scan_mode = staged["scan_mode"]
                    if "ivf_nprobe" in staged:
                        engine.ivf_nprobe = staged["ivf_nprobe"]
                    if "ivf_clusters" in staged:
                        engine.ivf_clusters = staged["ivf_clusters"]
                    return self._send(200, {"ok": True})
                return self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                return self._send(500, {"error": str(e)})

    return Handler


def build_scan_service(engine):
    """Create, register, and warm the batching service for an engine —
    serve()'s startup path, factored out so tests can drive it."""
    from pixelbox_tpu.serving import BatchingScanService

    scan_service = BatchingScanService(
        lambda: engine._sem_store.device_index,
        k=engine.max_search_results,
        max_distance=engine.max_distance_from_query,
        # int4 libraries rescore candidates with the exact u8 metric
        # from the store's host mirror (engine.int4_rerank).
        rerank_rows_provider=(
            (lambda: engine._sem_store._host_rows)
            if engine.semantic_precision == "int4" and engine.int4_rerank
            else None
        ),
    )
    # Concurrent phash and unfiltered text: queries coalesce too.
    engine.attach_scan_service(scan_service)
    if engine._sem_store is not None and engine._sem_store.size > 0:
        # Pre-compile the common batch buckets so early traffic never
        # pays a cold XLA compile mid-request.
        scan_service.warmup(engine._sem_store.dim)
    # Registered modality kinds warm with their own query widths
    # (uniform phash / face stores; each bucket shape is a compile).
    import numpy as np

    if (
        "phash" in scan_service.kinds
        and engine._ph_store is not None
        and engine._ph_store.size > 0
        and bool(np.all(np.asarray(engine._ph_widths) == engine._ph_store.dim))
    ):
        scan_service.warmup(engine._ph_store.dim, kinds=("phash",))
    if "face" in scan_service.kinds:
        scan_service.warmup(engine._face_store.dim, kinds=("face",))
    if "blip" in scan_service.kinds and (
        engine._blip_store is not None and engine._blip_store.size > 0
    ):
        scan_service.warmup(engine._blip_store.dim, kinds=("blip",))
    if (
        engine.scan_mode == "ivf"
        and engine._sem_store is not None
        and engine._sem_store.size > 0
    ):
        # Serving in ivf mode: train/pack the clustered index (and
        # compile its probe buckets) before traffic arrives.  The
        # read lock matches the organic path (requests hold it across
        # submit→assemble): without it, a watcher append landing
        # mid-build would stamp a pack that's missing those rows as
        # current-version.
        with engine.index_rwlock.read_locked():
            scan_service.warmup(engine._sem_store.dim, kinds=("ivf",))
    return scan_service


def serve(engine, host: str = "127.0.0.1", port: int = 8333,
          batching: bool = True):
    """Run the web UI / JSON API.  ``batching=True`` (default) coalesces
    concurrent similarity queries into single device scans via
    serving.BatchingScanService."""
    lock = threading.Lock()
    scan_service = build_scan_service(engine) if batching else None
    server = ThreadingHTTPServer(
        (host, port), make_handler(engine, lock, scan_service)
    )
    print(f"pixelbox-tpu serving on http://{host}:{port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if scan_service is not None:
            scan_service.close()
        server.server_close()
