"""Interactive viewer: orbit camera + browser-based train/infer loop.

Reference: ``reconstruction/nerf/gui.py`` (dearpygui ``NeRFGUI`` with an
``OrbitCamera``, a train mode interleaving ``Trainer.train_gui`` 16-step
bursts with preview renders, and an infer mode re-rendering on camera
motion, gui.py:55-120 + utils.py:896-1013).

This environment has no display stack, so the TPU-native equivalent serves
the same loop over HTTP from the training host: a single-threaded stdlib
server renders orbit-camera frames (JPEG) on demand while the train loop
polls for requests between step bursts — the exact train_gui structure with
the dearpygui callbacks replaced by query parameters. Open
``http://host:port/`` for a drag-to-orbit canvas (plain JS, no deps);
``/frame?theta=..&phi=..&radius=..&w=..&h=..`` returns one render and
``/state`` the live step/loss.
"""

from __future__ import annotations

import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

__all__ = ["OrbitCamera", "NeRFGUI"]

_PAGE = """<!doctype html><html><body style="margin:0;background:#111;color:#eee;font:13px monospace">
<div id="s" style="padding:4px">connecting...</div>
<img id="v" style="display:block" draggable="false">
<script>
let th=1.2, ph=0.0, r=%RADIUS%, drag=null, busy=false;
const img=document.getElementById('v'), st=document.getElementById('s');
function refresh(){ if(busy) return; busy=true;
  img.src='/frame?theta='+th+'&phi='+ph+'&radius='+r+'&t='+Date.now(); }
img.onload=()=>{busy=false;};
img.onerror=()=>{busy=false;};
img.onmousedown=e=>{drag=[e.clientX,e.clientY];e.preventDefault();};
window.onmouseup=()=>{drag=null;};
window.onmousemove=e=>{ if(!drag) return;
  ph-=(e.clientX-drag[0])*0.01; th-=(e.clientY-drag[1])*0.01;
  th=Math.min(3.0,Math.max(0.1,th)); drag=[e.clientX,e.clientY]; refresh(); };
window.onwheel=e=>{ r*=Math.pow(1.1,e.deltaY>0?1:-1); refresh(); };
setInterval(()=>{ fetch('/state').then(x=>x.json()).then(j=>{
  st.textContent='step '+j.step+'  loss '+j.loss.toFixed(5)+'  '+j.mode;
  if(j.training) refresh(); }); }, 1000);
refresh();
</script></body></html>"""


class OrbitCamera:
    """Spherical orbit camera around the origin (gui.py:10-52 semantics,
    parameterized by angles rather than incremental quaternion drags so a
    stateless HTTP query can reproduce any view)."""

    def __init__(self, W: int, H: int, radius: float = 2.0, fovy: float = 60.0):
        self.W, self.H = W, H
        self.radius = radius
        self.fovy = fovy

    def pose(self, theta: float, phi: float, radius: Optional[float] = None) -> np.ndarray:
        r = self.radius if radius is None else radius
        center = r * np.array([
            math.sin(theta) * math.sin(phi),
            math.cos(theta),
            math.sin(theta) * math.cos(phi),
        ], np.float32)

        def norm(v):
            return v / (np.linalg.norm(v) + 1e-10)

        fwd = -norm(center)
        up = np.array([0.0, -1.0, 0.0], np.float32)
        right = norm(np.cross(fwd, up))
        up = norm(np.cross(right, fwd))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.stack([right, up, fwd], axis=-1)
        pose[:3, 3] = center
        return pose

    def intrinsics(self, W: Optional[int] = None, H: Optional[int] = None):
        W = W or self.W
        H = H or self.H
        focal = H / (2 * math.tan(math.radians(self.fovy) / 2))
        return (focal, focal, W / 2, H / 2)


class NeRFGUI:
    """HTTP train/infer viewer (NeRFGUI parity, display-free).

    ``test_loop()`` serves frames from a fixed state; ``train_loop(scene)``
    interleaves ``train_steps``-step bursts with request handling, adapting
    the burst size to keep the UI responsive (gui.py:106-111)."""

    def __init__(self, trainer, state, W: int = 400, H: int = 400,
                 radius: float = 2.0, fovy: float = 60.0,
                 host: str = "127.0.0.1", port: int = 7860,
                 train_steps: int = 16):
        self.trainer = trainer
        self.state = state
        self.cam = OrbitCamera(W, H, radius, fovy)
        self.train_steps = train_steps
        # host-side mirror of state.step (one sync at init, none per step);
        # resumed states keep their grid-update cadence aligned
        self.step = int(getattr(state, "step", 0))
        self.loss = 0.0  # strict JSON: NaN would break the browser's parse
        self.training = False
        self._stop = False

        gui = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.replace("%RADIUS%", str(gui.cam.radius)).encode()
                    self._reply(body, "text/html")
                elif u.path == "/state":
                    body = json.dumps({
                        "step": gui.step, "loss": gui.loss,
                        "training": gui.training,
                        "mode": "train" if gui.training else "infer",
                    }).encode()
                    self._reply(body, "application/json")
                elif u.path == "/frame":
                    q = parse_qs(u.query)
                    g = lambda k, d: float(q.get(k, [d])[0])
                    body = gui.render_frame(
                        theta=g("theta", 1.2), phi=g("phi", 0.0),
                        radius=g("radius", gui.cam.radius),
                        W=int(g("w", gui.cam.W)), H=int(g("h", gui.cam.H)))
                    self._reply(body, "image/jpeg")
                elif u.path == "/stop":
                    gui._stop = True
                    self._reply(b"ok", "text/plain")
                else:
                    self.send_error(404)

            def _reply(self, body: bytes, ctype: str):
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.server = HTTPServer((host, port), Handler)
        self.server.timeout = 0.02  # handle_request returns fast when idle
        self.port = self.server.server_address[1]

    # ------------------------------------------------------------- rendering

    def render_frame(self, theta: float, phi: float, radius: float,
                     W: Optional[int] = None, H: Optional[int] = None) -> bytes:
        """One orbit-camera render -> JPEG bytes (test_gui, utils.py:964)."""
        import cv2

        W = W or self.cam.W
        H = H or self.cam.H
        pose = self.cam.pose(theta, phi, radius)
        params = self.state.ema_params if getattr(
            self.trainer.cfg, "ema_decay", 0) > 0 else self.state.params
        img, _ = self.trainer.render_image(
            params, self.state.occ, pose, self.cam.intrinsics(W, H), H, W)
        u8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", u8[..., ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert ok
        return bytes(buf.tobytes())

    # ----------------------------------------------------------------- loops

    def test_loop(self, max_seconds: Optional[float] = None):
        """Serve frames from the current (frozen) state until /stop."""
        t0 = time.time()
        while not self._stop:
            self.server.handle_request()
            if max_seconds is not None and time.time() - t0 > max_seconds:
                break

    def train_loop(self, scene, max_iters: Optional[int] = None):
        """Interleave train-step bursts with request handling
        (train_gui, utils.py:896-1013 + gui.py:94-111)."""
        data = self.trainer.scene_to_device(scene)
        total = max_iters if max_iters is not None else self.trainer.cfg.iters
        self.training = True
        aux = None
        while self.step < total and not self._stop:
            t0 = time.time()
            for _ in range(min(self.train_steps, total - self.step)):
                if (self.trainer.cfg.renderer == "occgrid"
                        # host-side counter: int(self.state.step) would force
                        # a device->host sync every iteration of the burst
                        and self.step
                        % self.trainer.cfg.update_extra_interval == 0):
                    self.state = self.trainer._update_grid(
                        self.state, full=int(self.state.occ.iter_density) < 16)
                    # same march-span/budget/compaction autotuners headless
                    # fit applies — without them GUI training pays the
                    # worst-case span + budget for the whole run
                    self.trainer._maybe_retune_march(self.state, aux)
                self.state, aux = self.trainer._train_step(self.state, data)
                self.step += 1
            self.loss = float(aux["loss"])  # forces completion of the burst
            # adapt the burst to ~500 ms, as the reference does (gui.py:108)
            dt = (time.time() - t0) / max(self.train_steps, 1)
            self.train_steps = int(min(64, max(4, 0.5 / max(dt, 1e-4))))
            self.server.handle_request()
        self.training = False
        return self.state

    def close(self):
        self.server.server_close()
