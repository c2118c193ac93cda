"""Unattended TPU measurement autopilot for the round-3 stage plan.

The axon tunnel has been wedged for long stretches (NOTES.md round-3c);
working windows are scarce and may open while nobody is watching. This
orchestrator exploits any window automatically:

  - waits for the device (subprocess probe; the orchestrator itself never
    imports jax, so it cannot wedge),
  - runs the measurement stages of scripts/tpu_session.sh in priority
    order, each as a `timeout`-bounded subprocess,
  - applies the stage-6 decision rule (re-bench with the binned scatter
    only if it beats v2 at BOTH production J) automatically,
  - re-probes the device between stages and goes back to waiting if the
    tunnel wedges mid-plan,
  - persists per-stage state in STATE_DIR so a restart resumes where it
    left off (completed stages are never re-run).

Results land in STATE_DIR/<stage>.log plus a rolling summary.md. Code
default flips (scatter impl, probe impl, attention impl) remain a human
decision made from the logs — the autopilot only measures.

Usage:  nohup python scripts/tpu_autopilot.py > /tmp/autopilot/driver.log 2>&1 &
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_DIR = os.environ.get("AUTOPILOT_DIR", "/tmp/autopilot")
PROBE_TIMEOUT = 120          # seconds for one jax.devices() probe
PROBE_INTERVAL = 120         # seconds between probes while wedged
ENV = dict(os.environ, PYTHONPATH=f"{REPO}:/root/.axon_site")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_tpu() -> bool:
    """One subprocess probe: does jax see the device within PROBE_TIMEOUT?"""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); import jax.numpy as jnp; "
             "x=jnp.ones((8,8)); (x@x).block_until_ready(); print(d[0])"],
            env=ENV, cwd=REPO, timeout=PROBE_TIMEOUT,
            capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_tpu():
    n = 0
    while not probe_tpu():
        n += 1
        log(f"tunnel wedged (probe #{n}); retry in {PROBE_INTERVAL}s")
        time.sleep(PROBE_INTERVAL)
    log("TPU is up")


def run_stage(name: str, argv, timeout: int, env_extra=None) -> int:
    """Run one stage as a bounded subprocess, teeing to STATE_DIR/name.log."""
    path = os.path.join(STATE_DIR, f"{name}.log")
    env = dict(ENV, **(env_extra or {}))
    log(f"stage {name}: {' '.join(argv)} (timeout {timeout}s)")
    t0 = time.time()
    with open(path, "w") as f:
        try:
            r = subprocess.run(argv, env=env, cwd=REPO, timeout=timeout,
                               stdout=f, stderr=subprocess.STDOUT)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = 124
    log(f"stage {name}: rc={rc} in {time.time() - t0:.0f}s -> {path}")
    return rc


def read_log(name: str) -> str:
    path = os.path.join(STATE_DIR, f"{name}.log")
    return open(path).read() if os.path.exists(path) else ""


def mark_done(name: str, ok: bool):
    with open(os.path.join(STATE_DIR, f"{name}.done"), "w") as f:
        f.write("ok" if ok else "failed")


def is_done(name: str) -> bool:
    return os.path.exists(os.path.join(STATE_DIR, f"{name}.done"))


def last_json_line(text: str):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def parse_binned_ab(text: str):
    """Parse mb_scatter_binned output into {J: {label: ms}}."""
    out, j = {}, None
    for line in text.splitlines():
        m = re.match(r"--- J=(\d+),", line)
        if m:
            j = int(m.group(1))
            out[j] = {}
            continue
        m = re.match(r"(.+?)\s*:\s*([0-9.]+) ms", line)
        if m and j is not None:
            out[j][m.group(1).strip()] = float(m.group(2))
    return out


def binned_wins(ab) -> bool:
    """Stage-6 gate: binned beats v2 at BOTH production J."""
    need = [262144, 131072]
    for j in need:
        tbl = ab.get(j, {})
        b = tbl.get("oct binned (sort+k)")
        v2 = tbl.get("oct v2 (default)")
        if b is None or v2 is None or b >= v2:
            return False
    return True


def summarize():
    lines = ["# autopilot summary", ""]
    for name in STAGE_ORDER:
        state = ("done" if is_done(name) else "pending")
        extra = ""
        if is_done(name):
            j = last_json_line(read_log(name))
            if j and "metric" in j:
                extra = f" — {j.get('metric')}={j.get('value')} " \
                        f"(vs_baseline {j.get('vs_baseline')})"
        lines.append(f"- {name}: {state}{extra}")
    with open(os.path.join(STATE_DIR, "summary.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


PY = sys.executable
STAGES = {
    # THE round deliverable: a clean bench number + warm compile cache.
    "s1_bench": ([PY, "bench.py"], 1500, None),
    # binned-vs-v2 scatter A/B (the 88 ms/step lever).
    "s5_binned_ab": ([PY, "scripts/mb_scatter_binned.py"], 1200, None),
    # conditional: re-bench with binned as the scatter impl.
    "s6_bench_binned": ([PY, "bench.py", "--skip_eval"], 1200,
                        {"DFTPU_SCATTER_IMPL": "binned"}),
    # probe-gather impl A/B (17 ms/step train + big eval share).
    "s2_probe_ab": ([PY, "scripts/mb_occ_probe.py"], 900, None),
    # post-v5 eval profile at 800^2 on the trained-shape ball scene.
    "s3_eval800": ([PY, "scripts/profile_eval.py", "--ball", "--H", "800",
                    "--out", os.path.join(STATE_DIR, "trace_eval800")],
                   1800, None),
    # VAE encode diagnosis (45 ms/step at 19% MXU).
    "s7_vae": ([PY, "scripts/mb_sd_vae.py"], 1200, None),
    # bf16 hash-table A/B (VERDICT weak #3).
    "s8_bf16tab": ([PY, "bench.py", "--grid_table_bf16", "--skip_eval"],
                   1200, None),
    # attention impl A/B (flash is the new default; isolate its effect).
    "s9_attn": ([PY, "bench.py", "--skip_eval"], 1200,
                {"DFTPU_ATTN_IMPL": "einsum"}),
    # train trace post-compaction (diagnosis material for the next levers).
    "s4_train_trace": ([PY, "bench.py", "--skip_eval", "--profile",
                        os.path.join(STATE_DIR, "prof_train")], 1800, None),
}
STAGE_ORDER = ["s1_bench", "s5_binned_ab", "s6_bench_binned", "s2_probe_ab",
               "s3_eval800", "s7_vae", "s8_bf16tab", "s9_attn",
               "s4_train_trace"]


def main():
    os.makedirs(STATE_DIR, exist_ok=True)
    log(f"autopilot start; state in {STATE_DIR}")
    for name in STAGE_ORDER:
        if is_done(name):
            log(f"stage {name}: already done, skipping")
            continue
        if name == "s6_bench_binned":
            ab = parse_binned_ab(read_log("s5_binned_ab"))
            if not binned_wins(ab):
                log(f"stage {name}: binned did not win both J "
                    f"({json.dumps(ab)}); skipping re-bench")
                mark_done(name, True)
                summarize()
                continue
        wait_for_tpu()
        argv, timeout, env_extra = STAGES[name]
        rc = run_stage(name, argv, timeout, env_extra)
        # a stage that died may have wedged the tunnel rather than failed:
        # re-probe; if the device is gone, leave the stage pending and wait.
        if rc != 0 and not probe_tpu():
            log(f"stage {name}: rc={rc} AND tunnel wedged — one retry "
                "after recovery")
            wait_for_tpu()
            rc = run_stage(name, argv, timeout, env_extra)
        mark_done(name, rc == 0)
        summarize()
    log("autopilot: all stages attempted")
    summarize()


if __name__ == "__main__":
    main()
