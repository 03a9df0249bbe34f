"""Gerstner / sinusoid pond solver vs straight numpy loops (SURVEY.md §4.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ocean.config import PondConfig, POND_DEMO
from tpu_ocean.gerstner import WaveBank, PondSolver, gerstner_eval, sinusoid_eval
from tpu_ocean import grids


def _numpy_gerstner(bank, x, z, t):
    """The 5-line loop: Σ over waves of the trochoidal offsets."""
    ox = np.zeros_like(x)
    oz = np.zeros_like(x)
    oy = np.zeros_like(x)
    for a, s, dx, dz, f, w in zip(bank.amps, bank.steeps, bank.dirs_x,
                                  bank.dirs_z, bank.freqs, bank.omegas):
        ph = f * (x * dx + z * dz) + w * t
        ox += s * a * dx * np.cos(ph)
        oz += s * a * dz * np.cos(ph)
        oy += a * np.sin(ph)
    return ox, oy, oz


def _reference_packed4(cfg, x, z, t):
    """Literal transliteration of Gerstner() (MistralWaterLib.cginc:71-99)."""
    amplitude = cfg.amplitude * cfg.amplitude_scale
    ab = np.array(cfg.w_direction_ab)
    cd = np.array(cfg.w_direction_cd)
    AB = cfg.steepness * amplitude * ab
    CD = cfg.steepness * amplitude * cd
    dot4 = cfg.frequency * np.stack([
        ab[0] * x + ab[1] * z, ab[2] * x + ab[3] * z,
        cd[0] * x + cd[1] * z, cd[2] * x + cd[3] * z], axis=-1)
    t4 = t * np.array(cfg.w_speed)
    COS = np.cos(dot4 + t4)
    SIN = np.sin(dot4 + t4)
    offx = COS @ np.array([AB[0], AB[2], CD[0], CD[2]])
    offz = COS @ np.array([AB[1], AB[3], CD[1], CD[3]])
    offy = SIN @ np.full(4, amplitude)
    return offx, offy, offz


def test_packed4_bank_matches_reference_shader_math():
    cfg = POND_DEMO
    bank = WaveBank.from_packed4(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(-50, 50, (16, 16))
    z = rng.uniform(-50, 50, (16, 16))
    t = 3.7
    f = gerstner_eval(bank, jnp.asarray(x, jnp.float32),
                      jnp.asarray(z, jnp.float32), t)
    ex, ey, ez = _reference_packed4(cfg, x, z, t)
    np.testing.assert_allclose(np.asarray(f.offset_x), ex, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f.offset_y), ey, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f.offset_z), ez, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("make_bank", [
    lambda: WaveBank.level_one(POND_DEMO),
    lambda: WaveBank.random(7, 16),
])
def test_bank_matches_numpy_loop(make_bank):
    bank = make_bank()
    rng = np.random.default_rng(1)
    x = rng.uniform(-20, 20, (8, 32))
    z = rng.uniform(-20, 20, (8, 32))
    t = 1.23
    f = gerstner_eval(bank, jnp.asarray(x, jnp.float32),
                      jnp.asarray(z, jnp.float32), t)
    ex, ey, ez = _numpy_gerstner(bank, x, z, t)
    np.testing.assert_allclose(np.asarray(f.offset_x), ex, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f.offset_y), ey, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f.offset_z), ez, rtol=1e-4, atol=1e-5)


def test_levelone_matches_reference_loop():
    """Literal transliteration of GerstnerLevelOne (MistralWaterLib.cginc:101-125)."""
    cfg = POND_DEMO
    amps = [0.7, 0.6, 0.6, 0.7, 0.9]
    steeps = [0.95, 0.615, 0.821, 0.462, 0.611]
    speeds = [-2.112, 0.6124, -0.878, -3.6234, 1.0]
    dirs = [(1, -0.2), (-0.9, 1), (0.2, 0.2), (-1.0, 0.77), (0.99, -1.145)]
    fs = [0.954, 1.52, 0.44, 0.21, 0.8]

    rng = np.random.default_rng(2)
    x = rng.uniform(-10, 10, (4, 4))
    z = rng.uniform(-10, 10, (4, 4))
    t = 0.9
    amplitude = cfg.amplitude * cfg.amplitude_scale
    ox = np.zeros_like(x); oz = np.zeros_like(x); oy = np.zeros_like(x)
    for i in range(5):
        ph = (cfg.frequency * fs[i] * (x * dirs[i][0] + z * dirs[i][1])
              + speeds[i] * cfg.frequency * fs[i] * t)
        ox += cfg.steepness * amplitude * steeps[i] * amps[i] * dirs[i][0] * np.cos(ph)
        oz += cfg.steepness * amplitude * steeps[i] * amps[i] * dirs[i][1] * np.cos(ph)
        oy += amplitude * amps[i] * np.sin(ph)

    bank = WaveBank.level_one(cfg)
    f = gerstner_eval(bank, jnp.asarray(x, jnp.float32),
                      jnp.asarray(z, jnp.float32), t)
    np.testing.assert_allclose(np.asarray(f.offset_x), ox, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f.offset_y), oy, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f.offset_z), oz, rtol=2e-4, atol=1e-6)


def test_normal_modes():
    bank = WaveBank.random(3, 8)
    x = jnp.linspace(-5, 5, 16).reshape(4, 4)
    z = jnp.linspace(-5, 5, 16).reshape(4, 4)
    flat = gerstner_eval(bank, x, z, 0.5, normal_mode="flat")
    # reference quirk: normal overwritten to (0,1,0) (MistralWaterLib.cginc:98)
    np.testing.assert_array_equal(np.asarray(flat.normal[..., 1]), 1.0)
    ana = gerstner_eval(bank, x, z, 0.5, normal_mode="analytic")
    norms = np.linalg.norm(np.asarray(ana.normal), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    # analytic normals tilt against the gradient of the height field
    assert float(np.abs(np.asarray(ana.normal[..., 0])).max()) > 0


def test_sinusoid_matches_reference_math():
    cfg = PondConfig(displacement_mode="wave", amplitude=5.0, frequency=1.3,
                     speed=0.8, smoothing=0.7)
    rng = np.random.default_rng(4)
    x = rng.uniform(-3, 3, (6, 6))
    z = rng.uniform(-3, 3, (6, 6))
    t = 2.1
    a = cfg.amplitude * 0.01
    want_y = (np.sin(cfg.speed * t + x * cfg.frequency) * a
              - np.cos(cfg.speed * t + z * cfg.frequency) * a)
    f = sinusoid_eval(cfg, jnp.asarray(x, jnp.float32),
                      jnp.asarray(z, jnp.float32), t)
    np.testing.assert_allclose(np.asarray(f.offset_y), want_y, rtol=1e-4,
                               atol=1e-6)
    norms = np.linalg.norm(np.asarray(f.normal), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_pond_solver_config3_shape_and_determinism():
    """BASELINE config 3 shape: 512² grid, 16 superposed waves."""
    cfg = PondConfig(resolution=512)
    bank = WaveBank.random(11, 16)
    solver = PondSolver(cfg, bank=bank)
    f1 = solver.fields(0.5)
    f2 = solver.fields(0.5)
    assert f1.offset_y.shape == (512, 512)
    assert np.array_equal(np.asarray(f1.offset_y), np.asarray(f2.offset_y))
    assert np.isfinite(np.asarray(f1.offset_y)).all()


def test_pond_serving_aliases_use_ocean_subtract_convention():
    """disp_x/disp_z aliases NEGATE the pond offsets so a consumer
    applying the shared ocean rule displaced = x − chop·disp recovers the
    shader's vertex.xyz += offs (review finding, r5); raw offsets stay."""
    bank = WaveBank.random(1, 4)
    x, z = grids.coordinate_grid(16, 1.0)
    f = gerstner_eval(bank, jnp.asarray(np.asarray(x, np.float32)),
                      jnp.asarray(np.asarray(z, np.float32)), 0.7)
    np.testing.assert_array_equal(np.asarray(f.disp_x),
                                  -np.asarray(f.offset_x))
    np.testing.assert_array_equal(np.asarray(f.disp_z),
                                  -np.asarray(f.offset_z))
    np.testing.assert_array_equal(np.asarray(f.height),
                                  np.asarray(f.offset_y))
