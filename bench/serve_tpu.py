"""Measure the serving hot path on the real TPU (VERDICT r3 #5).

test_serve.py proves the protocol functionally (CPU); this measures the
SYSTEM on hardware: a real_state Simulation stepping on the chip while a
FrameServer broadcasts to N concurrent clients at mixed {lod, frame_stride},
plus a deliberately slow client that must trigger drop-oldest (never
backpressure).

Metrics (wall-clock is CORRECT here, unlike kernel timing: every served
frame device_gets real f32 planes, and on this runtime a host pull of a
program's output forces everything enqueued before it — the serving loop's
wall therefore bounds true throughput INCLUDING transfer; CLAUDE.md's
benchlib rule is about dispatch-only loops with no pulls):

  * unserved steps/s — the Simulation loop alone (block+pull per frame);
  * served steps/s with N mixed-LOD clients — interference = ratio;
  * frames/s delivered per client (client-side receive count / wall);
  * dropped_frames under a stalled client, with the loop rate intact.

Run on the session TPU:
    timeout 900 python bench/serve_tpu.py [--res 1024] [--steps 300]
Writes bench/SERVE_TPU_r4.json. Reference anchor: OceanRenderer.cs:91-110 —
the per-frame consumer loop this subsystem replaces.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np
    import jax
    # honor an explicit CPU request (smoke tests) the way bench.py does:
    # the axon sitecustomize re-points JAX_PLATFORMS during interpreter
    # start, and only a post-import config update wins over it (CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.runtime import Simulation
    from tpu_ocean.serve import FrameServer, stream_frames

    from tpu_ocean.benchlib import enable_compile_cache
    enable_compile_cache()   # retries after outages skip Mosaic recompiles

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--fields", type=str, default="height,normal,velocity")
    ap.add_argument("--tag", type=str, default="r4")
    args = ap.parse_args()
    fields = tuple(args.fields.split(","))

    def note(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    cfg = OCEAN_DEMO.replace(resolution=args.res, length=float(args.res))
    kw = dict(fft_backend="pallas", real_state=True, pallas_fields=True,
              pack_channels=True)

    # ---- baseline: the unserved loop, forced by pulling one plane per frame
    sim = Simulation(cfg, **kw)
    note("compiling step...")
    sim.step()                                # compile outside the window
    if "velocity" in fields:
        np.asarray(jax.device_get(sim.solver.velocity(sim.state)))
    note("unserved baseline loop...")
    t0 = time.perf_counter()
    for _ in range(args.steps):
        f = sim.step()
        np.asarray(jax.device_get(f.height))  # the pull a consumer would do
    unserved_s = time.perf_counter() - t0
    unserved_sps = args.steps / unserved_s
    note(f"unserved: {unserved_sps:.2f} steps/s")

    # ---- served scenarios -------------------------------------------------
    def run_served(client_specs, with_staller, steps):
        """(steps/s, client frame counts, dropped, errors) with the given
        client set. client_specs: {tag: stream_frames kwargs}."""
        sim2 = Simulation(cfg, **kw)
        sim2.step()
        counts = {}
        errs = []

        def client(tag, **ckw):
            try:
                n = 0
                for _meta, _planes in stream_frames(*server.address,
                                                    max_frames=None, **ckw):
                    n += 1
                    counts[tag] = n
            except Exception as e:           # server close ends the stream
                if not isinstance(e, (ConnectionError, OSError)):
                    errs.append((tag, repr(e)))

        with FrameServer(sim2, fields=fields, queue_frames=4) as server:
            threads = [threading.Thread(target=client, args=(tag,),
                                        kwargs=ckw, daemon=True)
                       for tag, ckw in client_specs.items()]
            for t in threads:
                t.start()
            staller = None
            want = len(threads)
            if with_staller:
                # subscribes, never reads, tiny receive window
                staller = socket.socket()
                staller.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
                staller.connect(server.address)
                staller.sendall(b"{}\n")
                want += 1
            t_wait = time.perf_counter()
            while server.client_count < want:
                if time.perf_counter() - t_wait > 60.0:
                    # a client thread that failed to connect would
                    # otherwise spin this loop until the external timeout
                    # with no diagnostic (review finding, r5)
                    raise RuntimeError(
                        f"only {server.client_count}/{want} clients "
                        f"connected after 60 s; client errors: {errs}")
                time.sleep(0.01)
            t0 = time.perf_counter()
            server.run(steps=steps)
            served_s = time.perf_counter() - t0
            dropped = server.dropped_frames
            if staller is not None:
                staller.close()
        time.sleep(0.5)                      # let client threads observe EOF
        return steps / served_s, counts, dropped, errs

    # scenario A (the VERDICT r4 done-criterion): ONE lod=4 client — with
    # device-side pooling its pull volume is 1/16 of the planes
    note("serving loop: single lod=4 client...")
    lod4_sps, lod4_counts, _, lod4_errs = run_served(
        {"lod4": dict(lod=4)}, with_staller=False, steps=args.steps)
    note(f"served lod4-only: {lod4_sps:.2f} steps/s")

    # scenario A3: ONE full-res f16 client — the device-side cast halves
    # the pull itself, the ONLY lever that shrinks a full-res consumer's
    # dominant cost on this link (zlib only shrinks the socket bytes)
    note("serving loop: single full-res f16 client...")
    f16_sps, f16_counts, _, f16_errs = run_served(
        {"full_f16": dict(dtype="float16")}, with_staller=False,
        steps=args.steps)
    note(f"served full-f16-only: {f16_sps:.2f} steps/s")

    # scenario A2: ONE full-res zlib client — isolates the compressed
    # wire vs the raw full-res pull cost (scenario B's raw client)
    note("serving loop: single full-res zlib client...")
    zl_sps, zl_counts, _, zl_errs = run_served(
        {"full_zlib": dict(codec="zlib")}, with_staller=False,
        steps=args.steps)
    note(f"served full-zlib-only: {zl_sps:.2f} steps/s")

    # scenario B: the full mixed set (full-res raw, full-res zlib wire,
    # lod2+f16 wire, lod4+stride2) + a stalled client that must trigger
    # drop-oldest. full vs full_zlib isolates the compressed wire's value
    # on this link (the raw full-res client is the transfer-bound worst
    # case; smooth ocean planes compress ~2-3× at zlib-1)
    note("serving loop: mixed client set + staller...")
    served_sps, counts, dropped, errs = run_served(
        {"full": {}, "full_zlib": dict(codec="zlib"),
         "lod2_f16": dict(lod=2, dtype="float16"),
         "lod4_stride2": dict(lod=4, frame_stride=2)},
        with_staller=True, steps=args.steps)
    errs += lod4_errs + zl_errs + f16_errs
    served_s = args.steps / served_sps
    note(f"served mixed: {served_sps:.2f} steps/s")

    out = {
        "what": "serving hot path on hardware: real_state flagship stepping "
                "+ FrameServer broadcast to mixed-LOD clients + a stalled "
                "client (drop-oldest, never backpressure)",
        "res": args.res, "steps": args.steps, "fields": list(fields),
        "unserved_steps_per_s": round(unserved_sps, 2),
        "served_lod4_only_steps_per_s": round(lod4_sps, 2),
        "interference_lod4_only_pct": round(
            100.0 * (unserved_sps / lod4_sps - 1.0), 2),
        "served_full_f16_only_steps_per_s": round(f16_sps, 2),
        "interference_full_f16_only_pct": round(
            100.0 * (unserved_sps / f16_sps - 1.0), 2),
        "served_full_zlib_only_steps_per_s": round(zl_sps, 2),
        "interference_full_zlib_only_pct": round(
            100.0 * (unserved_sps / zl_sps - 1.0), 2),
        "client_frames_full_zlib_only": zl_counts,
        "served_steps_per_s": round(served_sps, 2),
        "interference_pct": round(100.0 * (unserved_sps / served_sps - 1.0),
                                  2),
        "client_frames_lod4_only": lod4_counts,
        "client_frames": counts,
        "client_frames_per_s": {k: round(v / served_s, 2)
                                for k, v in counts.items()},
        "dropped_frames_with_staller": dropped,
        "client_errors": errs,
        "note": "wall-clock valid here: every frame device_gets real f32 "
                "planes (forcing pull); this measures the SYSTEM incl. "
                "transfer, not the kernel (that is bench.py's job)",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"SERVE_TPU_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ok = (not errs and dropped > 0
          and counts.get("full", 0) > 0
          and counts.get("lod4_stride2", 0) > 0)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
