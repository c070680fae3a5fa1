"""HTTP editor/viewer service — the web-editor analog.

The reference's web editor (demos/web-editor) evaluates scripts in a
worker and streams rendered frames to a browser canvas. The TPU analog
is a small HTTP service: a single-page editor posts script text to
`/render`, the server traces it with the script engine, renders through
the tiled pipeline, and returns a PNG. Tapes can also be exported in
the canonical bytecode interchange format (`/tape`), the moral
equivalent of the web editor's bincoded VmData worker messages
(demos/web-editor/crate/src/lib.rs:30-45).

Endpoints:
  GET  /            the editor page
  POST /render      body = script text (.rhai subset) -> image/png
                    query: size (px), mode (2d|3d)
  POST /tape        body = script text -> application/octet-stream
                    (canonical bytecode words, little-endian)

Run: python -m fidget_tpu serve --port 8080
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = b"""<!doctype html>
<title>fidget_tpu editor</title>
<style>
 body { display: flex; font-family: monospace; margin: 0; height: 100vh; }
 textarea { flex: 1; font: 14px monospace; padding: 8px; border: 0;
            background: #1e1e2e; color: #cdd6f4; resize: none; }
 #right { flex: 1; display: flex; flex-direction: column; }
 img { image-rendering: pixelated; width: 100%; }
 #status { padding: 4px 8px; background: #11111b; color: #a6adc8; }
</style>
<textarea id=src spellcheck=false>
let r = 0.8;
let c = circle(#{ radius: r });
let bar = intersection(x.abs() - 0.1, y.abs() - 0.9);
draw(difference(c, bar));
</textarea>
<div id=right>
 <div id=status>edit to render</div>
 <img id=out>
</div>
<script>
const src = document.getElementById('src');
const out = document.getElementById('out');
const status = document.getElementById('status');
let timer = null, busy = false, dirty = false, lastUrl = null;
async function render() {
  if (busy) { dirty = true; return; }
  busy = true;
  try {
    const t0 = performance.now();
    const r = await fetch('/render?size=512',
                          {method: 'POST', body: src.value});
    if (r.ok) {
      const url = URL.createObjectURL(await r.blob());
      if (lastUrl) URL.revokeObjectURL(lastUrl);
      lastUrl = url;
      out.src = url;
      status.textContent =
        `rendered in ${(performance.now()-t0).toFixed(0)} ms`;
    } else {
      status.textContent = await r.text();
    }
  } catch (e) {
    status.textContent = String(e);
  } finally {
    busy = false;
    if (dirty) { dirty = false; render(); }
  }
}
src.addEventListener('input', () => {
  clearTimeout(timer); timer = setTimeout(render, 300);
});
render();
</script>
"""


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _body(self) -> str:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n).decode()

    def _send(self, code, ctype, data: bytes):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if urllib.parse.urlparse(self.path).path in ("/", "/index.html"):
            self._send(200, "text/html", _PAGE)
        else:
            self._send(404, "text/plain", b"not found")

    def do_POST(self):
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        try:
            if url.path == "/render":
                size = int(q.get("size", ["256"])[0])
                mode = q.get("mode", ["2d"])[0]
                data = self.server.app.render_png(self._body(), size, mode)
                self._send(200, "image/png", data)
            elif url.path == "/tape":
                data = self.server.app.tape_bytes(self._body())
                self._send(200, "application/octet-stream", data)
            else:
                self._send(404, "text/plain", b"not found")
        except Exception as e:  # noqa: BLE001 — report to the client
            self._send(400, "text/plain", str(e).encode())


class EditorApp:
    """Script -> frame/tape services behind the HTTP handlers.

    Rendered frames are cached on (script, size, mode) so a debounced
    editor re-requesting an unchanged script costs nothing. Renderer
    pipelines are shared through the zero-recompile bucketed frames
    (specialize=False), so shape edits re-render without recompiling.
    """

    def __init__(self, cache_frames: int = 32):
        self._lock = threading.Lock()
        self._frames: dict = {}
        self._cache_frames = cache_frames

    def _trace(self, script: str):
        from .script import eval_script

        return eval_script(script)

    def render_png(self, script: str, size: int, mode: str) -> bytes:
        from .io.image import png_bytes
        from .render.compose import render_layers
        from .render.effects import apply_shading
        from .render.region import ImageSize, VoxelSize
        from .render.render3d import VoxelRenderer
        from .shape import Shape

        size = max(64, min(1024, size))
        if mode == "3d":
            # clamp BEFORE the cache key: sizes 257..1024 all render at
            # 256, so they must share one cache entry
            size = min(256, size)
        key = (script, size, mode)
        with self._lock:
            cached = self._frames.get(key)
        if cached is not None:
            return cached
        res = self._trace(script)
        with self._lock:  # one TPU render at a time
            if mode == "3d":
                n = size
                r = VoxelRenderer(
                    Shape.from_tree(res.tree).tape(), VoxelSize(n, n, n),
                    specialize=False,  # edits re-render, zero recompiles
                )
                img = r.render(mode="normals")
                rgb = apply_shading(img.depth, img.normal, vdepth=n)[::-1]
            else:
                rgb = render_layers(
                    res.shapes, ImageSize(size, size), colors=res.colors
                )
        data = png_bytes(rgb)
        with self._lock:
            # evict+insert under the lock: concurrent requests on a
            # full cache would otherwise race next(iter(...))/pop and
            # turn a valid script into a spurious KeyError 400
            while len(self._frames) >= self._cache_frames:
                self._frames.pop(next(iter(self._frames)))
            self._frames[key] = data
        return data

    def tape_bytes(self, script: str) -> bytes:
        from .compiler.bytecode import as_bytes
        from .shape import Shape

        res = self._trace(script)
        return as_bytes(Shape.from_tree(res.tree).tape())


def serve(port: int = 8080, host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Starts the editor service (returns the server; call
    serve_forever() or shutdown() on it)."""
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.app = EditorApp()
    return srv


def main(port: int = 8080, host: str = "127.0.0.1") -> int:
    srv = serve(port, host)
    print(f"fidget_tpu editor on http://{host}:{port}/")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0
