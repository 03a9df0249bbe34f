"""Frame serving: stream solver fields to remote consumers in real time.

The reference's "deployment" is a Unity scene — every frame OceanRenderer.cs
re-renders its textures and the GPU composites them to the local screen
(OceanRenderer.cs:98-136). The production-TPU analogue has no screen: the
chip that simulates is not the machine that renders, so the per-frame hand-off
becomes a network stream. This module is that hand-off:

    FrameServer — owns a runtime.Simulation, steps it, and broadcasts the
        requested field planes to every connected client with REAL-TIME drop
        semantics: a slow client's queue drops its oldest frames (the same
        bounded-ring policy as the native AsyncExporter) instead of applying
        backpressure to the solver loop — the simulation never waits on the
        network, exactly like the reference's render loop never waits on
        vsync of a second display.

    stream_frames — the matching client: a generator of
        (meta, {field: ndarray}) tuples.

Wire protocol (version tag "tpu-ocean/1", little-endian f32 planes):

    server → client on connect:  one JSON line
        {"proto": "tpu-ocean/1", "resolution": N, "length": L,
         "fields": [...], "dtype": "float32"}
    per frame:                   one JSON line
        {"step": k, "t": seconds}
      followed by the raw N×N f32 plane bytes of each declared field, in
      declared order (normal is N×N×3). Sizes derive from the header, so the
      stream needs no per-plane framing.

Everything is plain sockets + threads — serving is host-side IO, where
Python threads genuinely overlap (socket sends release the GIL) and a
dependency-free protocol keeps the client embeddable in any engine.
"""

from __future__ import annotations

import json
import queue
import socket
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

PROTO = "tpu-ocean/1"

#: fields streamable per frame (OceanFields leaves with a fixed wire shape)
STREAMABLE = ("height", "disp_x", "disp_z", "pos_x", "pos_z", "normal",
              "foam", "jacobian",
              # computed per frame from the solver, not an OceanFields leaf:
              # the analytic ∂h/∂t (solver.velocity) — what remote spray /
              # Doppler / FSI clients consume (examples/spray.py logic,
              # server-side fields, client-side particles)
              "velocity")


class FrameServer:
    """Broadcast a Simulation's fields to TCP clients, dropping for laggards.

    ``run(steps)`` drives the solver loop in the calling thread (accepting
    clients in the background); ``stop()``/context-manager exit shuts the
    listener and every client down. ``port=0`` binds an ephemeral port —
    read ``server.address`` after construction.
    """

    def __init__(self, sim, fields: Sequence[str] = ("height", "foam"),
                 host: str = "127.0.0.1", port: int = 0,
                 queue_frames: int = 4):
        unknown = set(fields) - set(STREAMABLE)
        if unknown:
            raise ValueError(f"cannot stream {sorted(unknown)}; "
                             f"streamable: {STREAMABLE}")
        if "velocity" in fields and not hasattr(sim.solver, "velocity"):
            raise ValueError(f"{type(sim.solver).__name__} does not "
                             f"provide velocity (∂h/∂t)")
        self.sim = sim
        self.fields = tuple(fields)
        self._queue_frames = queue_frames
        self.dropped_frames = 0          # across all clients, for observability
        self._clients = []               # list[(queue, socket)]
        self._lock = threading.Lock()
        self._stop = threading.Event()

        n = sim.cfg.resolution
        self._frame_bytes = sum(
            4 * int(np.prod(_plane_shape(name, n))) for name in self.fields)
        self._listener = socket.create_server((host, port))
        self._listener.settimeout(0.2)   # so the accept loop can observe stop
        self.address = self._listener.getsockname()
        self._header = (json.dumps({
            "proto": PROTO,
            "resolution": sim.cfg.resolution,
            # the PLANES' physical extent (cascades: display_length, not
            # band 0's length) — Simulation.world_length owns that rule
            "length": getattr(sim, "world_length", sim.cfg.length),
            "fields": list(self.fields),
            "dtype": "float32",
        }) + "\n").encode()
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    # ------------------------------------------------------------- plumbing

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except socket.timeout:
                continue
            except OSError:
                return                   # listener closed by stop()
            # bound the kernel send buffer to ~2 frames: an autotuned
            # multi-MB buffer would hide seconds of latency from the
            # drop-oldest policy (bytes already in the kernel cannot be
            # dropped) — the stream's staleness must be capped by
            # queue_frames, not by tcp_wmem
            conn.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF,
                            max(65536, 2 * self._frame_bytes))
            try:
                conn.sendall(self._header)
            except OSError:
                conn.close()
                continue
            q = queue.Queue(maxsize=self._queue_frames)
            sender = threading.Thread(target=self._send_loop,
                                      args=(q, conn), daemon=True)
            with self._lock:
                self._clients.append((q, conn))
            sender.start()

    def _send_loop(self, q: queue.Queue, conn: socket.socket):
        try:
            while True:
                try:
                    # bounded wait so a consumed/lost sentinel can never
                    # park this thread forever — stop() is always observed
                    payload = q.get(timeout=0.5)
                except queue.Empty:
                    if self._stop.is_set():
                        return
                    continue
                if payload is None:      # stop() sentinel
                    return
                conn.sendall(payload)
        except OSError:
            pass                         # client went away
        finally:
            conn.close()
            with self._lock:
                self._clients = [(cq, c) for cq, c in self._clients
                                 if cq is not q]

    def _broadcast(self, payload: bytes):
        if self._stop.is_set():          # racing stop(): don't bury sentinels
            return
        with self._lock:
            clients = list(self._clients)
        for q, _ in clients:
            while True:
                try:
                    q.put_nowait(payload)
                    break
                except queue.Full:       # real-time policy: drop its oldest
                    try:
                        oldest = q.get_nowait()
                        if oldest is None:   # stop() sentinel, not a frame:
                            try:             # hand it straight back and give
                                q.put_nowait(None)   # up on this payload
                            except queue.Full:
                                pass         # sender will time out on stop
                            break
                        self.dropped_frames += 1
                    except queue.Empty:
                        pass

    # ----------------------------------------------------------------- API

    @property
    def client_count(self) -> int:
        with self._lock:
            return len(self._clients)

    @property
    def stopped(self) -> bool:
        return self._stop.is_set()

    def frame_payload(self, fields) -> bytes:
        """meta line + raw planes for one OceanFields — exposed for tests."""
        import jax
        meta = (json.dumps({"step": self.sim.step_count,
                            "t": self.sim.step_count * self.sim.dt})
                + "\n").encode()

        def plane(name):
            if name == "velocity":
                x = self.sim.solver.velocity(self.sim.state)
            else:
                x = getattr(fields, name)
            return np.ascontiguousarray(
                np.asarray(jax.device_get(x)), dtype="<f4").tobytes()

        return meta + b"".join(plane(name) for name in self.fields)

    def run(self, steps: Optional[int] = None):
        """Step the simulation, broadcasting every frame; None = until
        stop(). The solver loop never blocks on a client."""
        done = 0
        while not self._stop.is_set() and (steps is None or done < steps):
            fields = self.sim.step()
            if self.client_count:        # device pull only when someone reads
                self._broadcast(self.frame_payload(fields))
            done += 1

    def stop(self):
        self._stop.set()
        self._listener.close()
        with self._lock:
            clients = list(self._clients)
        for q, conn in clients:
            # best-effort sentinel (make room if the queue is full) — the
            # sender sees None, or an OSError from the closed socket
            try:
                q.put_nowait(None)
            except queue.Full:
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                try:
                    q.put_nowait(None)
                except queue.Full:
                    pass
            try:
                conn.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


def _plane_shape(name: str, n: int) -> Tuple[int, ...]:
    return (n, n, 3) if name == "normal" else (n, n)


def _read_exact(sock_file, count: int) -> bytes:
    data = sock_file.read(count)
    if data is None or len(data) != count:
        raise ConnectionError("stream ended mid-frame")
    return data


def stream_frames(host: str, port: int,
                  max_frames: Optional[int] = None
                  ) -> Iterator[Tuple[dict, dict]]:
    """Connect to a FrameServer and yield (meta, {field: ndarray}) frames.

    The arrays are fresh copies (safe to hold). Stops after ``max_frames``
    or when the server closes the stream.
    """
    with socket.create_connection((host, port)) as sock:
        f = sock.makefile("rb")
        header = json.loads(f.readline())
        if header.get("proto") != PROTO:
            raise ConnectionError(f"not a tpu-ocean stream: {header!r}")
        n = header["resolution"]
        shapes = {name: _plane_shape(name, n) for name in header["fields"]}
        served = 0
        while max_frames is None or served < max_frames:
            line = f.readline()
            if not line:
                return                   # server closed between frames
            meta = json.loads(line)
            planes = {}
            for name, shape in shapes.items():
                raw = _read_exact(f, 4 * int(np.prod(shape)))
                planes[name] = np.frombuffer(raw, "<f4").reshape(shape).copy()
            yield meta, planes
            served += 1
