"""Native runtime components (C++ via ctypes): the literal O(N⁴) oracle must
agree with the factorized numpy oracle to fp64 roundoff, and the async
exporter must persist exactly what was submitted."""

import glob

import numpy as np
import pytest

from tpu_ocean import native
from tpu_ocean.config import OceanConfig
from tpu_ocean.oracle import Oracle

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_oracle_matches_factorized():
    cfg = OceanConfig(resolution=16, length=16.39, wind=(5.0, 3.0),
                      amplitude=0.01, choppiness=1.3)
    orc = Oracle(cfg)
    ref = orc.fields(2.7)
    got = native.oracle_fields(16, cfg.length, cfg.unit_width,
                               cfg.choppiness, 2.7, orc.h0, orc.h0_conj)
    for k in ("height", "disp_x", "disp_z", "pos_x", "pos_z",
              "foam", "jacobian", "normal"):
        r = np.asarray(getattr(ref, k))
        scale = np.max(np.abs(r)) + 1e-300
        assert np.max(np.abs(r - got[k])) / scale < 1e-10, k


def test_native_oracle_threading_invariant():
    cfg = OceanConfig(resolution=12, length=12.39, wind=(5.0, 3.0),
                      amplitude=0.01)
    orc = Oracle(cfg)
    one = native.oracle_fields(12, cfg.length, 1.0, 1.0, 0.5,
                               orc.h0, orc.h0_conj, num_threads=1)
    many = native.oracle_fields(12, cfg.length, 1.0, 1.0, 0.5,
                                orc.h0, orc.h0_conj, num_threads=4)
    np.testing.assert_array_equal(one["height"], many["height"])


def test_async_exporter_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((7, 5)) for _ in range(4)]
    with native.AsyncExporter(str(tmp_path)) as ex:
        for i, a in enumerate(arrays):
            assert ex.submit("field", i, a)
        ex.flush()
        assert ex.pending() == 0
    files = sorted(glob.glob(str(tmp_path / "*.npy")))
    assert len(files) == 4
    for i, f in enumerate(files):
        np.testing.assert_array_equal(np.load(f), arrays[i])


def test_exporter_capacity_backpressure(tmp_path):
    # 1 KB ring: a 2 KB submit must be rejected, not crash
    with native.AsyncExporter(str(tmp_path), capacity_bytes=1024) as ex:
        big = np.zeros(2048 // 8 * 4)
        ok = ex.submit("big", 0, big)
        assert not ok


def test_native_oracle_odd_n_matches_python():
    """Odd-N vertex coordinates use the INTEGER halfResolution
    (FFTMesh.cs:104) — the float N/2 form shifted every odd-N sample half
    a cell (45% height error at N=15; review finding, r5)."""
    for n in (9, 15):
        cfg = OceanConfig(resolution=n, length=float(n) + 0.39,
                          wind=(5.0, 3.0), amplitude=0.01,
                          spectrum_layout="centered",
                          dispersion_mode="quantized",
                          evolution_mode="absolute")
        rng = np.random.default_rng(1)
        o = Oracle(cfg, rng=rng)
        ref = o.fields(0.7)
        got = native.oracle_fields(n, cfg.length, cfg.unit_width,
                                   cfg.choppiness, 0.7, o.h0, o.h0_conj)
        err = (np.abs(np.asarray(got["height"]) - ref.height).max()
               / np.abs(ref.height).max())
        assert err < 1e-12, (n, err)


def test_exporter_reports_write_errors():
    """AsyncExporter.errors() counts failed writes; a truncated path is
    refused (not silently collided onto another file) and a flush with
    errors() == 0 guarantees every accepted submission landed complete
    (review findings, r5)."""
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        with native.AsyncExporter(d) as exp:
            a = np.zeros((4, 4))
            assert exp.submit("ok", 1, a)
            # a name long enough to overflow the 512-byte path buffer
            assert not exp.submit("x" * 600, 2, a)
            exp.flush()
            assert exp.errors() == 1
        assert len(glob.glob(os.path.join(d, "*.npy"))) == 1
