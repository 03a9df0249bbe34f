"""bench.py orchestration — the round's artifact of record must be
outage-proof (VERDICT r2 #1): a dead tunnel is detected by a cheap canary,
sweep attempts retry past banked variants, and a fully failed run still
embeds the newest archived validated measurement inline.

The subprocess scheduling is driven here with a scripted fake _run_child
(no TPU, no subprocesses); one test runs the real --in-process path on CPU
end to end.
"""

import importlib.util
import json
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ok_result(label, ms):
    return {"backend": label, "per_step_s": ms * 1e-3, "suspect": False,
            "forcing": "tinypull", "ladder_ks": [16, 128, 1024],
            "ladder_walls_s": [0.03, 0.09, 0.46],
            "fit_max_rel_resid": 0.003, "intercept_ms": 30.0}


def _run_main(mod, monkeypatch, capsys, argv, fake_child):
    monkeypatch.setattr(mod, "_run_child", fake_child)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    monkeypatch.setattr(sys, "argv", ["bench.py"] + argv)
    rc = mod.main()
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert lines, "main printed no JSON line"
    return rc, json.loads(lines[-1])


def test_outage_recovery_banks_headline(monkeypatch, capsys, tmp_path):
    """2 dead canaries, then a partial sweep, then the fast-retry tail:
    the headline must come out non-null with the outage recorded."""
    mod = _load_bench()
    monkeypatch.setattr(mod, "_LEDGER", str(tmp_path / "ledger.json"))
    calls = {"canary": 0, "sweep": 0}

    def fake_child(task, args, timeout_s, fields=False, skip=(), fast=False):
        if task == "canary":
            calls["canary"] += 1
            if calls["canary"] <= 2:
                return {"error": f"no result (timeout after {timeout_s:.0f}s)"}
            return {"ok": True, "devices": 1, "startup_s": 45.0}
        if task == "realsweep":
            calls["sweep"] += 1
            if calls["sweep"] == 1:
                # outage killed the tail: only the flagship streamed out
                assert skip == [] and not fast
                return {"sweep": [_ok_result("pallas+fields", 0.55)]}
            # retry resumes past the banked variant on the reduced ladder
            assert "pallas+fields" in skip and fast
            rs = [_ok_result("pallas+fields+packed", 0.42),
                  _ok_result("pallas+fields+packed+half", 0.40),
                  _ok_result("pallas_fused+fields+packed", 0.418),
                  _ok_result("pallas_fused+fields+packed+half", 0.422),
                  _ok_result("pallas", 0.65)]
            for r in rs:
                r["ladder"] = "reduced"
            return {"sweep": rs}
        if task == "calibrate":
            return {"measurable": True, "achieved_tflops": 172.0,
                    "intercept_ms": 30.0, "forcing": "tinypull"}
        raise AssertionError(f"unexpected child {task}")

    rc, out = _run_main(mod, monkeypatch, capsys,
                        ["--budget-s", "1200"], fake_child)
    assert rc == 0
    assert out["value"] is not None
    assert out["backend"] == "pallas+fields+packed+half"  # fastest valid
    assert out["parity_grade_backend"] == "pallas+fields"
    assert out["outage"] == {"canary_attempts": 3, "sweep_attempts": 2}
    assert out["ladder"] == "reduced"
    # roofline fields ride the headline AND every valid variant (r3 #6)
    assert 0 < out["mfu"] < 1 and 0 < out["hbm_roofline_frac"]
    assert {v["backend"] for v in out["variants"]} == {
        "pallas+fields", "pallas+fields+packed",
        "pallas+fields+packed+half", "pallas_fused+fields+packed",
        "pallas_fused+fields+packed+half", "pallas"}
    assert all("mfu" in v and "hbm_roofline_frac" in v
               for v in out["variants"])
    # the validated headline was archived for future failed runs
    with open(str(tmp_path / "ledger.json")) as f:
        led = json.load(f)
    assert led["result"]["value"] == out["value"]
    assert led["captured_unix"] > 0


def test_total_outage_embeds_last_validated_inline(monkeypatch, capsys,
                                                   tmp_path):
    """Every canary dead for the whole budget: value null, but the newest
    archived validated measurement rides INLINE with its age."""
    mod = _load_bench()
    ledger = tmp_path / "ledger.json"
    ledger.write_text(json.dumps({
        "captured_unix": __import__("time").time() - 7200.0,
        "result": {"metric": "m", "value": 2.5e9, "vs_baseline": 39.7}}))
    monkeypatch.setattr(mod, "_LEDGER", str(ledger))

    def fake_child(task, args, timeout_s, fields=False, skip=(), fast=False):
        if task == "canary":
            return {"error": f"no result (timeout after {timeout_s:.0f}s)"}
        raise AssertionError(f"dead tunnel must gate {task} child")

    # a small budget drains through canary attempts alone (sleep is no-op,
    # so cap iterations by exhausting the clock with a fake perf_counter)
    t = {"now": 0.0}

    def fake_clock():
        t["now"] += 50.0          # each canary costs ~50 fake seconds
        return t["now"]

    monkeypatch.setattr(mod.time, "perf_counter", fake_clock)
    rc, out = _run_main(mod, monkeypatch, capsys,
                        ["--budget-s", "600"], fake_child)
    assert rc == 1
    assert out["value"] is None
    assert out["outage"]["canary_attempts"] >= 1
    inline = out["last_validated"]
    assert inline["result"]["value"] == 2.5e9
    assert inline["age_hours"] == pytest.approx(2.0, abs=0.2)


def test_ledger_round_trip(monkeypatch, tmp_path):
    mod = _load_bench()
    monkeypatch.setattr(mod, "_LEDGER", str(tmp_path / "ledger.json"))
    mod._store_ledger({"metric": "m", "value": 123.0})
    result, age_h, src = mod._load_ledger()
    assert result["value"] == 123.0
    assert age_h is not None and age_h < 0.1
    assert src.endswith("ledger.json")


def test_ledger_precision_tiers_never_mix(monkeypatch, tmp_path):
    """VERDICT r4 weak #1: a faster bfloat16 run must NOT displace the f32
    number of record; the failed-run fallback must stay parity-grade."""
    mod = _load_bench()
    monkeypatch.setattr(mod, "_LEDGER", str(tmp_path / "ledger.json"))
    f32 = {"metric": "m", "value": 2.5e9,
           "backend": "pallas+fields+packed+half", "ms_per_step": 0.3979}
    mod._store_ledger(f32)
    # a faster bf16 entry lands in its own slot, not over the f32 one
    bf16 = {"metric": "m (bf16)", "value": 3.9e9,
            "backend": "pallas+fields+packed+half+bf16",
            "ms_per_step": 0.2694}
    mod._store_ledger(bf16)
    with open(str(tmp_path / "ledger.json")) as f:
        doc = json.load(f)
    assert doc["result"]["ms_per_step"] == 0.3979          # f32 untouched
    assert doc["result_bf16"]["ms_per_step"] == 0.2694
    assert "+bf16" in doc["result_bf16"]["backend"]
    # the fallback served in a nulled window is the f32 entry
    result, _, _ = mod._load_ledger()
    assert result["ms_per_step"] == 0.3979
    # keep-faster still works WITHIN a tier (slower f32 probe rejected)
    mod._store_ledger(dict(f32, ms_per_step=0.45))
    result, _, _ = mod._load_ledger()
    assert result["ms_per_step"] == 0.3979
    # ...and a faster f32 run replaces the f32 slot only
    mod._store_ledger(dict(f32, ms_per_step=0.39))
    with open(str(tmp_path / "ledger.json")) as f:
        doc = json.load(f)
    assert doc["result"]["ms_per_step"] == 0.39
    assert doc["result_bf16"]["ms_per_step"] == 0.2694


def test_ledger_bf16_only_file_never_serves_fallback(monkeypatch, tmp_path):
    """A ledger holding ONLY a bf16 tier must not become the headline
    fallback — the loader skips it down the path chain."""
    mod = _load_bench()
    ledger = tmp_path / "ledger.json"
    ledger.write_text(json.dumps({
        "captured_unix_bf16": __import__("time").time(),
        "result_bf16": {"metric": "m", "value": 3.9e9,
                        "backend": "pallas+bf16", "ms_per_step": 0.2694}}))
    monkeypatch.setattr(mod, "_LEDGER", str(ledger))
    monkeypatch.setattr(mod, "_LEDGER_FALLBACK",
                        str(tmp_path / "missing.json"))
    result, age_h, src = mod._load_ledger()
    assert result is None


def test_variant_label_carries_precision():
    mod = _load_bench()
    assert mod._variant_label("pallas", True, True, True) == \
        "pallas+fields+packed+half"
    assert mod._variant_label("pallas", True, True, True, "bfloat16") == \
        "pallas+fields+packed+half+bf16"
    # the step model parses bf16-suffixed labels like untagged ones
    f1, b1 = mod._step_model("pallas+fields+packed+half", 1024)
    f2, b2 = mod._step_model("pallas+fields+packed+half+bf16", 1024)
    assert (f1, b1) == (f2, b2)


def test_repo_ledgers_are_parity_grade():
    """The shipped per-resolution ledgers must hold untagged-f32 results
    in the fallback slot (the r4 bf16 displacement, re-banked in r5)."""
    import glob
    bench_dir = os.path.join(os.path.dirname(_BENCH), "bench")
    paths = glob.glob(os.path.join(bench_dir, "BENCH_latest_validated*.json"))
    assert paths
    for path in paths:
        with open(path) as f:
            doc = json.load(f)
        assert "result" in doc, path
        assert "+bf16" not in doc["result"].get("backend", ""), path
        if "result_bf16" in doc:
            assert "+bf16" in doc["result_bf16"]["backend"], path


def test_in_process_cpu_end_to_end(monkeypatch, capsys, tmp_path):
    """The real measurement path (no subprocesses) on CPU: one JSON line,
    non-null value, parity-grade recorded beside the packed headline."""
    mod = _load_bench()
    monkeypatch.setattr(mod, "_LEDGER", str(tmp_path / "ledger.json"))
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--in-process", "--res", "32",
                         "--steps", "8", "--no-calibrate"])
    rc = mod.main()
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    out = json.loads(lines[-1])
    assert rc == 0
    assert out["value"] is not None and out["value"] > 0
    assert "ms_per_step" in out and out["ms_per_step"] > 0


def test_no_progress_sweep_attempts_are_bounded(monkeypatch, capsys,
                                                tmp_path):
    """A sweep child that persistently omits some variants must not spin
    the retry loop until the budget: two consecutive no-progress attempts
    bank what exists (regression: the pre-r4 loop burned 15 REAL minutes
    when the fake sweep covered 4 of 5 variants)."""
    mod = _load_bench()
    monkeypatch.setattr(mod, "_LEDGER", str(tmp_path / "ledger.json"))
    calls = {"sweep": 0}

    def fake_child(task, args, timeout_s, fields=False, skip=(), fast=False):
        if task == "canary":
            return {"ok": True, "devices": 1, "startup_s": 45.0}
        if task == "realsweep":
            calls["sweep"] += 1
            # always the same single variant — everything else is missing
            return {"sweep": [_ok_result("pallas+fields", 0.55)]}
        if task == "calibrate":
            return {"measurable": True, "achieved_tflops": 172.0,
                    "intercept_ms": 30.0, "forcing": "tinypull"}
        raise AssertionError(f"unexpected child {task}")

    t0 = __import__("time").perf_counter()
    rc, out = _run_main(mod, monkeypatch, capsys,
                        ["--budget-s", "1200"], fake_child)
    assert rc == 0
    assert out["value"] is not None
    assert out["backend"] == "pallas+fields"
    assert calls["sweep"] <= 4          # 1 productive + <= 2 stale + slack
    assert __import__("time").perf_counter() - t0 < 60.0


def test_matmul_fallback_label_carries_variant_switches(monkeypatch, capsys,
                                                        tmp_path):
    """When the complex-free sweep banks nothing and the matmul fallback
    child answers, its label must carry every variant switch (notably
    +bf16) — a bare 'matmul' label would masquerade as parity-grade and
    write the wrong ledger tier (review finding, r5)."""
    mod = _load_bench()
    monkeypatch.setattr(mod, "_LEDGER", str(tmp_path / "ledger.json"))

    def fake_child(task, args, timeout_s, fields=False, skip=(), fast=False):
        if task == "canary":
            return {"ok": True, "devices": 1, "startup_s": 45.0}
        if task == "realsweep":
            # deterministic refusals for every sweep variant → fallback
            return {"sweep": [
                {"backend": lbl, "error": "ValueError: nope"}
                for lbl in [mod._variant_label(b, f, p, h, "bfloat16")
                            for b, f, p, h in mod._REAL_SWEEP]]}
        if task == "matmul":
            return {"backend": "matmul", "per_step_s": 5e-4,
                    "suspect": False, "forcing": "tinypull"}
        if task == "calibrate":
            return {"measurable": True, "achieved_tflops": 172.0,
                    "intercept_ms": 30.0, "forcing": "tinypull"}
        raise AssertionError(f"unexpected child {task}")

    rc, out = _run_main(mod, monkeypatch, capsys,
                        ["--budget-s", "1200", "--precision", "bfloat16"],
                        fake_child)
    assert rc == 0
    assert out["backend"] == "matmul+bf16"
    assert "parity_grade_backend" not in out      # bf16 is never parity
    with open(str(tmp_path / "ledger.json")) as f:
        doc = json.load(f)
    assert "result" not in doc                    # f32 slot untouched
    assert doc["result_bf16"]["backend"] == "matmul+bf16"
