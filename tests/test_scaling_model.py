"""The analytic collective model (bench/scaling_model.py) must equal the
compiled HLO of the real distributed step on the fake 8-device mesh —
counts AND buffer bytes, across backends / chunking / fused fields
(VERDICT r1 #5: collective counts validated against the fake-mesh HLO)."""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "bench"))

from scaling_model import (step_collectives_model, hlo_collective_inventory,
                           compiled_step_hlo)


@pytest.mark.parametrize("backend,chunks,pallas_fields", [
    ("matmul", 1, False),
    ("matmul", 3, False),
    ("pallas", 1, False),
    ("pallas_fused", 1, False),
    ("pallas_fused", 3, False),
    ("pallas_fused", 1, True),
])
def test_model_matches_compiled_hlo(backend, chunks, pallas_fields):
    n = 64
    hlo = compiled_step_hlo(n, backend, chunks, pallas_fields)
    inv = hlo_collective_inventory(hlo)
    model = step_collectives_model(n, 8, backend, chunks, pallas_fields)

    a2a = inv.get("all-to-all", {"count": 0, "buffer_bytes": 0})
    assert a2a["count"] == model["all_to_all_count"]
    assert a2a["buffer_bytes"] == model["all_to_all_buffer_bytes"]

    cp = inv.get("collective-permute", {"count": 0, "buffer_bytes": 0})
    assert cp["count"] == model["collective_permute_count"]
    assert cp["buffer_bytes"] == model["halo_wire_bytes"]

    # no other collective families sneak into the step
    assert not set(inv) - {"all-to-all", "collective-permute"}


def test_packed_transpose_reduction_is_real():
    """pack_channels=True transposes 2 packed channels, not 3 — the wire
    cut must show up in the compiled HLO, and the model must track it."""
    hlo = compiled_step_hlo(64, "pallas_fused", 1, False, pack_channels=True)
    inv = hlo_collective_inventory(hlo)
    model = step_collectives_model(64, 8, "pallas_fused",
                                   pack_channels=True)
    assert inv["all-to-all"]["count"] == model["all_to_all_count"]
    assert inv["all-to-all"]["buffer_bytes"] == model["all_to_all_buffer_bytes"]
    unpacked = step_collectives_model(64, 8, "pallas_fused")
    assert (model["all_to_all_buffer_bytes"]
            == unpacked["all_to_all_buffer_bytes"] * 2 // 3)


def test_pallas_a2a_is_single_stacked_f32_collective():
    """The pallas path rides ONE all_to_all whose operand is the stacked
    f32[2, C, …] (re, im) buffer — complex never enters the collective, and
    the plane pair does not split into two collectives. The stack's HBM
    cost is the model's a2a_pack_copy_bytes = 2 × buffer (read both planes,
    write the contiguous operand) — the quantified side of the one-collective
    vs two trade (VERDICT r1 weak #7, bench/scaling_model.md)."""
    import re as _re
    hlo = compiled_step_hlo(64, "pallas", 1, False)
    a2a_lines = [ln for ln in hlo.splitlines()
                 if _re.search(r"=\s*[^=]*?\ball-to-all(?:-start)?\(", ln)]
    assert len(a2a_lines) == 1
    shapes = _re.findall(r"\b([a-z]+\d+)\[([\d,]+)\]", a2a_lines[0])
    assert shapes, a2a_lines[0]
    dt, dims = shapes[0]
    assert dt == "f32"                       # complex-free wire
    assert dims.split(",")[0] == "2"         # stacked (re, im) leading dim
    model = step_collectives_model(64, 8, "pallas")
    assert model["a2a_pack_copy_bytes"] == \
        2 * model["all_to_all_buffer_bytes"]
    # the jnp/matmul path sends complex directly — no pack copy there
    assert step_collectives_model(64, 8, "matmul")["a2a_pack_copy_bytes"] == 0


def test_live_channel_reduction_is_real():
    """The stencil-mode step transposes 3 channels, not 5 — the slope
    spectra are dead there and must not ride the wire."""
    hlo = compiled_step_hlo(64, "pallas_fused", 1, False)
    inv = hlo_collective_inventory(hlo)
    bytes_3ch = step_collectives_model(64, 8)["all_to_all_buffer_bytes"]
    bytes_5ch = step_collectives_model(64, 8,
                                       channels=5)["all_to_all_buffer_bytes"]
    assert inv["all-to-all"]["buffer_bytes"] == bytes_3ch < bytes_5ch


def test_half_spectrum_transpose_reduction_is_real():
    """half_spectrum=True: the last packed channel's mirror-balanced a2a
    moves N/2 rows — 1.5 channel-equivalents total on the wire, in its own
    collective, plus the two tiny Nyquist-row all_gathers. Model == HLO."""
    n = 128     # N/(2D) = 8: the mirror scheme's row-block floor at D=8
    hlo = compiled_step_hlo(n, "pallas", 1, False, pack_channels=True,
                            half_spectrum=True, real_state=True)
    inv = hlo_collective_inventory(hlo)
    model = step_collectives_model(n, 8, "pallas", pack_channels=True,
                                   half_spectrum=True)
    assert inv["all-to-all"]["count"] == model["all_to_all_count"] == 2
    assert (inv["all-to-all"]["buffer_bytes"]
            == model["all_to_all_buffer_bytes"])
    packed = step_collectives_model(n, 8, "pallas", pack_channels=True)
    # 1.5 / 2 channel-equivalents
    assert (model["all_to_all_buffer_bytes"] * 4
            == packed["all_to_all_buffer_bytes"] * 3)
    ag = inv.get("all-gather", {"count": 0, "buffer_bytes": 0})
    assert ag["count"] == 2
    assert ag["buffer_bytes"] == model["nyq_allgather_buffer_bytes"]
    # the all_gather is noise at production scale: its buffer ∝ D·N vs the
    # transpose's ∝ 1.5·N²/D — ratio 1.5·N/D², ~2 orders at config-5 size
    big = step_collectives_model(4096, 8, "pallas", pack_channels=True,
                                 half_spectrum=True)
    assert (big["nyq_allgather_buffer_bytes"] * 50
            < big["all_to_all_buffer_bytes"])
