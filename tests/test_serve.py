"""Frame serving (tpu_ocean/serve.py): wire protocol round-trip, trajectory
fidelity vs an offline run of the same seed, and the real-time drop policy
(the solver loop must never block on a slow client)."""

import json
import os
import socket
import threading

import numpy as np
import pytest

from tpu_ocean.config import OceanConfig
from tpu_ocean.runtime import Simulation
from tpu_ocean.serve import FrameServer, stream_frames, PROTO

CFG = OceanConfig(resolution=64, length=64.0, wind=(8.0, 5.0), amplitude=0.5,
                  spectrum_layout="fft", normals_mode="stencil")


def test_stream_matches_offline_trajectory():
    fields = ("height", "normal", "foam")
    with FrameServer(Simulation(CFG, fft_backend="matmul"),
                     fields=fields) as server:
        host, port = server.address
        frames = []
        client_err = []

        def client():
            try:
                frames.extend(stream_frames(host, port, max_frames=3))
            except Exception as e:       # surface in the main thread
                client_err.append(e)

        t = threading.Thread(target=client)
        t.start()
        # wait for the subscription so no frame precedes the client
        while server.client_count == 0 and t.is_alive():
            pass
        server.run(steps=5)
        t.join(timeout=30)
        assert not t.is_alive() and not client_err, client_err

    assert [m["step"] for m, _ in frames] == [1, 2, 3]
    assert frames[0][1]["height"].shape == (64, 64)
    assert frames[0][1]["normal"].shape == (64, 64, 3)

    # the wire carries exactly the offline trajectory (same seed, same math)
    offline = Simulation(CFG, fft_backend="matmul")
    for meta, planes in frames:
        out = offline.step()
        assert meta["t"] == pytest.approx(meta["step"] * offline.dt)
        for name in fields:
            np.testing.assert_array_equal(planes[name],
                                          np.asarray(getattr(out, name)))


def test_slow_client_drops_frames_not_blocks():
    with FrameServer(Simulation(CFG, fft_backend="matmul"),
                     fields=("height", "foam"), queue_frames=1) as server:
        host, port = server.address
        # subscribe but never read — with a tiny receive window so the
        # kernel cannot absorb the stream: the sender blocks, the 1-frame
        # queue overflows → drops, never backpressure on the solver loop
        lazy = socket.socket()
        lazy.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        lazy.connect((host, port))
        try:
            while server.client_count == 0:
                pass
            server.run(steps=64)         # must complete promptly
            assert server.dropped_frames > 0
        finally:
            lazy.close()


def test_serves_sharded_simulation():
    """A domain-decomposed Simulation streams identically — device_get
    gathers the Z-sharded field shards into the same wire planes."""
    from tpu_ocean.parallel.mesh import make_mesh
    sharded = Simulation(CFG, fft_backend="matmul", mesh=make_mesh(shard=8))
    with FrameServer(sharded, fields=("height",)) as server:
        host, port = server.address
        frames = []
        t = threading.Thread(target=lambda: frames.extend(
            stream_frames(host, port, max_frames=2)))
        t.start()
        while server.client_count == 0 and t.is_alive():
            pass
        server.run(steps=3)
        t.join(timeout=30)
        assert not t.is_alive()

    offline = Simulation(CFG, fft_backend="matmul")
    for _, planes in frames:
        out = offline.step()
        np.testing.assert_allclose(planes["height"], np.asarray(out.height),
                                   rtol=1e-5, atol=1e-5)


def test_serves_cascade_simulation():
    """CascadeSimulation satisfies the same serving contract (cfg/dt/step):
    the combined multi-band surface streams like a single-patch one, and
    the advertised length is the cascade's display_length (= max band), not
    band 0's — bands here are ordered shortest-first to pin that."""
    from tpu_ocean.runtime import CascadeSimulation
    from tpu_ocean.cascade import default_cascade
    sim = CascadeSimulation(default_cascade(n=32,
                                            lengths=(17.0, 130.0, 1000.0)),
                            fft_backend="reference")
    with FrameServer(sim, fields=("height", "foam")) as server:
        host, port = server.address
        frames = []
        t = threading.Thread(target=lambda: frames.extend(
            stream_frames(host, port, max_frames=2)))
        t.start()
        while server.client_count == 0 and t.is_alive():
            pass
        server.run(steps=3)
        t.join(timeout=30)
        assert not t.is_alive()
    assert len(frames) == 2
    assert frames[0][1]["height"].shape == (32, 32)
    assert np.isfinite(frames[0][1]["height"]).all()

    # header check on the raw wire: the planes span 1000 m, not 17 m
    import json as _json
    sim2 = CascadeSimulation(default_cascade(n=32,
                                             lengths=(17.0, 130.0, 1000.0)),
                             fft_backend="reference")
    with FrameServer(sim2, fields=("height",)) as srv:
        with socket.create_connection(srv.address) as conn:
            header = _json.loads(conn.makefile("rb").readline())
    assert header["length"] == 1000.0


def test_rejects_unknown_field_and_foreign_stream():
    with pytest.raises(ValueError, match="stream"):
        FrameServer(Simulation(CFG, fft_backend="matmul"),
                    fields=("height", "vorticity"))

    imposter = socket.create_server(("127.0.0.1", 0))
    host, port = imposter.getsockname()

    def fake():
        conn, _ = imposter.accept()
        conn.sendall(json.dumps({"proto": "nope/9"}).encode() + b"\n")
        conn.close()

    t = threading.Thread(target=fake, daemon=True)
    t.start()
    with pytest.raises(ConnectionError, match="tpu-ocean"):
        list(stream_frames(host, port, max_frames=1))
    imposter.close()
    assert PROTO == "tpu-ocean/1"


def test_native_cpp_client_consumes_stream():
    """The dependency-free C++ client (native/stream_client.cpp — the
    engine-side consumer a production deployment embeds) reads the header
    and N intact frames from a live FrameServer."""
    import shutil
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    binary = os.path.join(root, "native", "tpu_ocean_stream_client")
    if not os.path.exists(binary):
        make = shutil.which("make")
        if make is None:
            pytest.skip("no make; native client not built")
        subprocess.run([make, "-C", os.path.join(root, "native")],
                       check=True, capture_output=True)

    with FrameServer(Simulation(CFG, fft_backend="matmul"),
                     fields=("height", "normal", "foam")) as server:
        host, port = server.address
        proc = subprocess.Popen([binary, host, str(port), "3"],
                                stdout=subprocess.PIPE, text=True)
        while server.client_count == 0 and proc.poll() is None:
            pass
        server.run(steps=5)
        out, _ = proc.communicate(timeout=60)
    assert proc.returncode == 0, out[-800:]
    assert "received 3/3 frames" in out
    assert out.count("height in [") == 3


def test_streams_computed_velocity_plane():
    """'velocity' is a computed wire field (solver.velocity, not an
    OceanFields leaf): the streamed plane equals the solver's analytic
    ∂h/∂t at the same state."""
    sim = Simulation(CFG, fft_backend="matmul")
    with FrameServer(sim, fields=("height", "velocity")) as server:
        host, port = server.address
        frames = []
        t = threading.Thread(target=lambda: frames.extend(
            stream_frames(host, port, max_frames=2)))
        t.start()
        while server.client_count == 0 and t.is_alive():
            pass
        server.run(steps=3)
        t.join(timeout=30)
        assert not t.is_alive()
    assert frames[-1][1]["velocity"].shape == (64, 64)
    assert np.isfinite(frames[-1][1]["velocity"]).all()
    offline = Simulation(CFG, fft_backend="matmul")
    for meta, planes in frames:
        offline.step()
        want = np.asarray(offline.solver.velocity(offline.state))
        np.testing.assert_array_equal(planes["velocity"], want)
