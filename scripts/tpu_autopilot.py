"""Unattended TPU measurement autopilot (round-4 stage plan).

The axon tunnel has been wedged for long stretches (NOTES.md round-3c);
working windows are scarce and may open while nobody is watching. This
orchestrator exploits any window automatically:

  - waits for the device (subprocess probe; the orchestrator itself never
    imports jax, so it cannot wedge),
  - runs the measurement stages in priority order, each as a
    `timeout`-bounded subprocess,
  - enforces a FIXED-COMMIT tree guard: the round-3 autopilot's A/B
    stages were invalidated by measuring across commits on cold caches;
    now every stage refuses to run unless HEAD equals the plan commit
    and the tree is clean,
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

# Round-4 plan. All it/s stages are valid A/Bs ONLY against the same tree:
# the round-3 autopilot invalidated stages 8-9 by measuring across commits
# with cold caches (NOTES r3). PLAN_COMMIT pins the tree; see check_tree().
PLAN_COMMIT = None  # set via --commit or AUTOPILOT_COMMIT; None = HEAD at start
STAGES = {
    # full bench on the settled tree: train it/s + pallas_check + both
    # eval metrics; also (re)warms the persistent cache for the driver.
    "s1_bench": ([PY, "bench.py", "--deadline", "2400"], 2600, None),
    # compaction A/B (VERDICT r3 next #2): default-on vs off.
    "s2_nocompact": ([PY, "bench.py", "--skip_eval", "--no_grid_compact",
                      "--deadline", "1500"], 1700, None),
    # bf16 hash-table A/B (stale two rounds, VERDICT r3 next #4).
    "s3_bf16tab": ([PY, "bench.py", "--grid_table_bf16", "--skip_eval",
                    "--deadline", "1500"], 1700, None),
    # attention impl A/B (flash default; isolate vs einsum).
    "s4_attn": ([PY, "bench.py", "--skip_eval", "--deadline", "1500"], 1700,
                {"DFTPU_ATTN_IMPL": "einsum"}),
    # train trace on the settled programs (scatter-copy + next levers).
    "s5_train_trace": ([PY, "bench.py", "--skip_eval", "--profile",
                        os.path.join(STATE_DIR, "prof_train"),
                        "--deadline", "1500"], 1700, None),
    # eval residual attribution after the r3d restructure.
    "s6_eval800": ([PY, "scripts/profile_eval.py", "--ball", "--H", "800",
                    "--out", os.path.join(STATE_DIR, "trace_eval800")],
                   1800, None),
    # VAE encode re-diagnosis (57.5 ms fwd+bwd @512^2, 27% MXU).
    "s7_vae": ([PY, "scripts/mb_sd_vae.py"], 1200, None),
}
STAGE_ORDER = ["s1_bench", "s2_nocompact", "s3_bf16tab", "s4_attn",
               "s5_train_trace", "s6_eval800", "s7_vae"]


def tree_state():
    """(commit, dirty) of the repo the stages would measure."""
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                           capture_output=True, text=True).stdout.strip()
    return head, bool(dirty)


def check_tree(plan_commit: str) -> bool:
    """Fixed-commit guard (VERDICT r3 next #4): cross-commit it/s numbers
    are not comparable (different programs, cold caches). Refuse to run
    any stage when HEAD moved off the plan commit or the tree is dirty."""
    head, dirty = tree_state()
    if head != plan_commit:
        log(f"TREE GUARD: HEAD {head[:9]} != plan commit "
            f"{plan_commit[:9]} — refusing to measure a different tree")
        return False
    if dirty:
        log("TREE GUARD: working tree is dirty — refusing to measure "
            "uncommitted state")
        return False
    return True


def main():
    os.makedirs(STATE_DIR, exist_ok=True)
    global PLAN_COMMIT
    PLAN_COMMIT = (PLAN_COMMIT or os.environ.get("AUTOPILOT_COMMIT")
                   or tree_state()[0])
    with open(os.path.join(STATE_DIR, "plan_commit"), "w") as f:
        f.write(PLAN_COMMIT)
    log(f"autopilot start; state in {STATE_DIR}; "
        f"plan commit {PLAN_COMMIT[:9]}")
    for name in STAGE_ORDER:
        if is_done(name):
            log(f"stage {name}: already done, skipping")
            continue
        if not check_tree(PLAN_COMMIT):
            log("autopilot: stopping (tree guard); re-launch on the plan "
                "commit or start a fresh plan")
            return
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
