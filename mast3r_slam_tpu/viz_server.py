"""Live reconstruction viewer served over HTTP during a run.

TPU-native replacement for the reference's third process — the moderngl +
imgui live window (/root/reference/mast3r_slam/visualization.py:383-445,
spawned at main.py:192-197) with its pause/next UI messages
(visualization.py:324-332, WindowMsg at :33-38). On a headless TPU host
there is no GL stack and no display, so instead of an OpenGL window we run
a tiny stdlib HTTP server in a daemon thread: it serves the self-contained
WebGL viewer page (viz.live_html) which polls a compact binary scene
snapshot (``/scene``) and posts pause/step commands (``/ctrl``) that the
SLAM run loop honors between frames — the same control surface as the
reference's viz<->main queues (multiprocess_utils.py:26-29) without
processes or locks on device state.

The scene snapshot is built host-side from the keyframe store on a wall-
clock throttle (``refresh_s``), so the device stream is never stalled by
rendering; the only cost is the throttled device->host fetch of keyframe
pointmaps already paid by any exporter.
"""

from __future__ import annotations

import copy
import secrets
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from . import viz

MAGIC = 0x4D534C4D  # "MSLM"
VERSION = 1


def pack_scene(scene, n_kf=0, frame=0, paused=False):
    """Serialize a viz.build_scene dict into the /scene wire format.

    Layout (little-endian): 8 x u32 header [magic, version, npts, nlines,
    n_kf, frame, paused, 0], 4 x f32 [center xyz, scale], then npts*3 f32
    points, npts*3 u8 colors, zero-pad to 4-byte alignment, nlines*3 f32
    line endpoints, nlines*3 u8 line colors. The JS client in
    viz._LIVE_INIT_JS computes the same offsets from the counts.
    """
    pts = np.ascontiguousarray(scene["pts"], np.float32)
    cols = np.ascontiguousarray(scene["cols"], np.uint8)
    lpts = np.ascontiguousarray(scene["lpts"], np.float32)
    lcols = np.ascontiguousarray(scene["lcols"], np.uint8)
    c = np.asarray(scene["center"], np.float32)
    head = struct.pack("<8I", MAGIC, VERSION, len(pts), len(lpts),
                       int(n_kf), int(frame), int(bool(paused)), 0)
    head += struct.pack("<4f", float(c[0]), float(c[1]), float(c[2]),
                        float(scene["scale"]))
    body = pts.tobytes() + cols.tobytes()
    body += b"\0" * ((-len(body)) % 4)
    return head + body + lpts.tobytes() + lcols.tobytes()


def unpack_scene(blob):
    """Inverse of pack_scene (used by tests and programmatic clients)."""
    magic, ver, npts, nlines, n_kf, frame, paused, _ = struct.unpack_from(
        "<8I", blob, 0)
    assert magic == MAGIC and ver == VERSION
    cx, cy, cz, scale = struct.unpack_from("<4f", blob, 32)
    off = 48
    pts = np.frombuffer(blob, np.float32, npts * 3, off).reshape(-1, 3)
    off += npts * 12
    cols = np.frombuffer(blob, np.uint8, npts * 3, off).reshape(-1, 3)
    off += npts * 3
    off = (off + 3) & ~3
    lpts = np.frombuffer(blob, np.float32, nlines * 3, off).reshape(-1, 3)
    off += nlines * 12
    lcols = np.frombuffer(blob, np.uint8, nlines * 3, off).reshape(-1, 3)
    return {"pts": pts, "cols": cols, "lpts": lpts, "lcols": lcols,
            "center": np.array([cx, cy, cz], np.float32), "scale": scale,
            "n_kf": n_kf, "frame": frame, "paused": bool(paused)}


_EMPTY = pack_scene({"pts": np.zeros((0, 3), np.float32),
                     "cols": np.zeros((0, 3), np.uint8),
                     "lpts": np.zeros((0, 3), np.float32),
                     "lcols": np.zeros((0, 3), np.uint8),
                     "center": np.zeros(3, np.float32), "scale": 1.0})


class LiveViewer:
    """HTTP live viewer + run-loop pause/step control.

    Usage:
        viewer = LiveViewer(port=8080).start()
        system.run(dataset, viewer=viewer); viewer.stop()

    The run loop calls ``update(system)`` once per frame/window (throttled
    internally) and ``wait_if_paused()`` before consuming the next frame.
    """

    def __init__(self, port=0, c_conf_threshold=1.5, max_points=400_000,
                 refresh_s=2.0, host="127.0.0.1"):
        self.c_conf_threshold = c_conf_threshold
        self.max_points = max_points
        self.refresh_s = refresh_s
        self.paused = False
        self._step = threading.Event()
        self._blob = _EMPTY
        self._blob_lock = threading.Lock()
        self._last_update = 0.0
        self._frame = 0
        # per-run control token embedded in the served page: /ctrl requires
        # it (and POST), so a hostile web page in the operator's browser
        # cannot CSRF pause/resume a multi-hour run with a bare GET
        self.token = secrets.token_hex(8)
        self._last_snap = None   # (keyframes, factor_graph) refs from the
        #                          latest update() — lets a /ctrl conf
        #                          change re-render without a new frame
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    self._send(200, "text/html",
                               viz.live_html(viewer.token).encode())
                elif u.path == "/scene":
                    with viewer._blob_lock:
                        blob = viewer._blob
                    self._send(200, "application/octet-stream", blob)
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if u.path != "/ctrl":
                    self._send(404, "text/plain", b"not found")
                    return
                if q.get("t", [""])[0] != viewer.token:
                    self._send(403, "text/plain", b"bad token")
                    return
                if "conf" in q:
                    # runtime confidence-threshold control (the reference
                    # viewer's C_conf_threshold slider, WindowMsg at
                    # visualization.py:324-332); re-renders the served
                    # scene immediately, even while paused
                    try:
                        viewer.set_conf_threshold(float(q["conf"][0]))
                    except ValueError:
                        pass
                was_paused = viewer.paused
                if "toggle" in q:
                    viewer.paused = not viewer.paused
                elif "pause" in q:
                    viewer.paused = q["pause"][0] not in ("0", "false")
                if viewer.paused and not was_paused:
                    viewer._step.clear()   # no stale step past a new pause
                if "step" in q and viewer.paused:
                    viewer._step.set()     # step only makes sense paused
                self._send(200, "application/json",
                           b'{"paused": %s}'
                           % (b"true" if viewer.paused else b"false"))

        # localhost by default: the reconstruction should not be exposed on
        # the network unless explicitly requested (host="0.0.0.0")
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = None

    def start(self):
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    # ---- run-loop hooks ---------------------------------------------------

    def update(self, system, force=False):
        """Rebuild the scene snapshot if the refresh interval elapsed.

        Safe to call WITHOUT holding the system's state lock: only a
        shallow reference snapshot of the (immutable device-array) state is
        taken under ``system.state_lock``; the expensive device->host
        fetches in viz.build_scene run outside it, so the backend thread is
        never blocked on rendering.
        """
        self._frame = getattr(system, "last_frame_idx", self._frame)
        now = time.monotonic()
        if not force and now - self._last_update < self.refresh_s:
            return
        self._last_update = now
        lock = getattr(system, "state_lock", None)
        if lock is not None:
            with lock:
                kfs = copy.copy(system.keyframes)
                fg = (copy.copy(system.factor_graph)
                      if system.factor_graph is not None else None)
        else:
            kfs, fg = system.keyframes, system.factor_graph
        self._last_snap = (kfs, fg)
        self._render(kfs, fg)

    def _render(self, kfs, fg):
        scene = viz.build_scene(kfs, self.c_conf_threshold,
                                self.max_points, fg)
        blob = pack_scene(scene, n_kf=len(kfs), frame=self._frame,
                          paused=self.paused)
        with self._blob_lock:
            self._blob = blob

    def set_conf_threshold(self, value: float):
        """Change the point-cloud confidence threshold at runtime and
        re-render the served scene from the latest snapshot (so the slider
        works while the run is paused too — in single_thread mode nothing
        can invalidate the snapshot while the loop is blocked on
        ``wait_if_paused``). The next run-loop ``update`` also picks the
        new threshold up immediately."""
        self.c_conf_threshold = float(value)
        self._last_update = 0.0
        snap = self._last_snap
        if snap is None:
            return
        try:
            self._render(*snap)
        except RuntimeError:
            # single_thread runs DONATE store/edge buffers in place, so a
            # mid-run snapshot's arrays may be deleted by the time the
            # slider fires; the next update() (at most one frame away when
            # running — and while paused the snapshot is always live)
            # re-renders with the new threshold
            pass

    def wait_if_paused(self):
        """Block while paused; a queued step request releases ONE frame
        (the reference's pause/next semantics, visualization.py:324-332)."""
        while self.paused:
            if self._step.is_set():
                self._step.clear()
                return
            time.sleep(0.05)

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
