"""CI coverage for bench.py itself (VERDICT r2 weak #1: the bench script
must not rot between TPU sessions). Runs the real bench code path in-process
on the CPU backend with the --tiny config: train window, flushed JSON line,
pallas check, and the deadline-gating logic."""

import json
import sys

import pytest


def test_bench_tiny_smoke(monkeypatch, capsys, tmp_path):
    import bench

    # stable cache dir (NOT tmp_path): the tiny train step costs ~3.5 min
    # of XLA CPU compile; a run-scoped dir re-pays it every suite run,
    # while stale entries after code changes are simply cache misses
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--tiny", "--warmup", "2", "--steps", "2",
        "--skip_eval", "--cache_dir", "/tmp/dftpu_test_compile_cache",
        "--deadline", "600",
    ])
    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines, "bench printed no JSON line"
    for ln in lines:  # every emitted line must be a complete result object
        obj = json.loads(ln)
        assert obj["metric"] == "sds_iters_per_sec"
        assert obj["unit"] == "it/s"
        assert obj["value"] > 0
        assert obj["vs_baseline"] > 0
    final = json.loads(lines[-1])
    assert "pallas_check" in final
    assert final["pallas_check"].startswith("ok"), final["pallas_check"]


@pytest.mark.slow
def test_bench_tiny_sd_smoke(monkeypatch, capsys, tmp_path):
    """SDS (nano UNet/VAE) actually in the measured step — the full bench
    code path incl. guidance plumbing (slow: the fused render+SDS+grad
    program costs minutes of XLA CPU compile on this host)."""
    import bench

    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--tiny_sd", "--warmup", "2", "--steps", "2",
        "--skip_eval", "--cache_dir", str(tmp_path / "cache"),
        "--deadline", "1800",
    ])
    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines
    final = json.loads(lines[-1])
    assert final["value"] > 0


@pytest.mark.slow
def test_bench_deadline_skips_optional_stages(monkeypatch, capsys, tmp_path):
    """An exhausted deadline must still produce the train-metric line and
    must skip (not attempt) the eval stages."""
    import bench

    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--tiny", "--warmup", "2", "--steps", "2",
        "--cache_dir", str(tmp_path / "cache"), "--deadline", "0",
    ])
    monkeypatch.setattr(bench, "t_start", bench.time.monotonic() - 10.0)
    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines
    final = json.loads(lines[-1])
    assert final["value"] > 0
    assert "pallas_check" not in final
    assert final.get("eval_rays_per_sec_512_skipped") == "deadline"
    assert final.get("eval_fps_800_skipped") == "deadline"
