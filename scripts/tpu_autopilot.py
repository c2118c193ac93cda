"""Unattended TPU measurement autopilot (round-4 stage plan).

The axon tunnel has been wedged for long stretches (NOTES.md round-3c);
working windows are scarce and may open while nobody is watching. This
orchestrator exploits any window automatically:

  - waits for the device (subprocess probe; the orchestrator itself never
    imports jax, so it cannot wedge),
  - runs the measurement stages in priority order, each as a
    `timeout`-bounded subprocess,
  - enforces a FIXED-TREE guard: the round-3 autopilot's A/B stages were
    invalidated by measuring across commits on cold caches; now every
    stage waits for a clean code tree, and if the program-relevant paths
    changed since the plan was pinned, the plan re-pins and restarts so
    every recorded number is same-tree (docs-only commits don't reset it),
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


MAX_ATTEMPTS = 3


def mark_done(name: str, ok: bool):
    with open(os.path.join(STATE_DIR, f"{name}.done"), "w") as f:
        f.write("ok" if ok else "failed")


def is_done(name: str) -> bool:
    return os.path.exists(os.path.join(STATE_DIR, f"{name}.done"))


def attempts(name: str) -> int:
    p = os.path.join(STATE_DIR, f"{name}.attempts")
    return int(open(p).read()) if os.path.exists(p) else 0


def bump_attempts(name: str) -> int:
    n = attempts(name) + 1
    with open(os.path.join(STATE_DIR, f"{name}.attempts"), "w") as f:
        f.write(str(n))
    return n


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
# with cold caches (NOTES r3). The code-tree fingerprint pins the tree;
# see wait_for_clean_tree().
STAGES = {
    # full bench on the settled tree: train it/s + pallas_check + both
    # eval metrics; also (re)warms the persistent cache for the driver.
    "s1_bench": ([PY, "bench.py", "--deadline", "2400"], 2600, None),
    # compaction A/B (VERDICT r3 next #2): default-on vs off.
    "s2_nocompact": ([PY, "bench.py", "--skip_eval", "--no_grid_compact",
                      "--deadline", "1500"], 1700, None),
    # (s3_bf16tab RETIRED r5b: the --grid_table_bf16 train lever was
    # removed after five failed slots — its step compiles >25 min remotely
    # and the provisional window showed a regression, 5.372 vs 5.729.)
    # (s4_attn RETIRED r5b: 3rd watchdog; einsum provisional 5.729 ==
    # parity with flash's measured 5.818 — flash stays default, the env
    # switch stays as the CPU-compat path, not a lever.)
    # train trace on the settled programs (scatter-copy + next levers).
    "s5_train_trace": ([PY, "bench.py", "--skip_eval", "--profile",
                        os.path.join(STATE_DIR, "prof_train"),
                        "--deadline", "1500"], 1700, None),
    # RETIRED r4: s8_scatter_t (binned-t won, now default), s10_eval_short
    # (lost 0.664 vs 1.02 FPS), s9_eval_bf16p (no win) — levers removed.
    # RETIRED r5b — every A/B DECIDED via scripts/eval_ab.py (fast
    # in-process harness; single-lever profile_eval runs pay ~16 min of
    # startup each and are only worth it when a trace is needed):
    #   s6_eval800 / e5_eval_scatter / e3,e4 group sizes — scatter frame
    #     + group 4096 are the defaults now (1.643 vs 1.548 FPS);
    #   s7/s7b VAE GN — bf16 output default (44.5 vs 57.5 ms encode).
    # NOTE for per-op trace users: perfetto op durations over this tunnel
    # carry a ~18 ms quantum (NOTES r5b) — trust DFTPU_EVAL_TIMING stage
    # walls and the mb_* microbenches instead.
}
# Round-5 final plan. The r5b session DECIDED (scripts/eval_ab.py,
# NOTES r5b): scatter frame ON, group 4096, live margin (see trainer),
# GN bf16 ON, eval_table_bf16 stays ON, col-gather and the bf16-train-
# table + short-march + bf16-probe levers REMOVED. Remaining useful
# stages: the full bench (re-warms the cache for the driver), the train
# trace, and the compaction confirmation.
STAGE_ORDER = ["s1_bench", "s5_train_trace", "s2_nocompact"]


# Paths whose content determines the measured programs. NOTES.md / docs /
# test-only commits do NOT invalidate a measurement plan; changes to these
# do (different programs, different numbers — not comparable A/Bs).
CODE_PATHS = ["dreamfusion_tpu", "bench.py", "__graft_entry__.py",
              "scripts", "csrc"]


def tree_state():
    """(code_fingerprint, dirty) of the repo the stages would measure.

    The fingerprint is the concatenated git object ids of the
    program-relevant paths at HEAD — the same code tree under a docs-only
    commit keeps the same fingerprint, so the plan survives NOTES/VERDICT
    commits (round-3's commit-pinned guard stopped on ANY commit)."""
    ids = []
    for p in CODE_PATHS:
        r = subprocess.run(["git", "rev-parse", f"HEAD:{p}"], cwd=REPO,
                           capture_output=True, text=True)
        ids.append(r.stdout.strip() or "absent")
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--"] + CODE_PATHS, cwd=REPO,
        capture_output=True, text=True).stdout.strip()
    return "+".join(ids), bool(dirty)


def wait_for_clean_tree(plan_fp: str) -> str:
    """Tree guard v2 (VERDICT r3 next #4, refined): cross-tree it/s numbers
    are not comparable, but the round-3 guard STOPPED the whole plan on any
    commit — wasting scarce tunnel windows. Now: wait while the code tree
    is dirty (dev in progress); when the clean code fingerprint differs
    from the plan's, RE-PIN to the new tree and reset every stage (archived
    as .done.old) so all numbers are same-tree again."""
    n = 0
    while True:
        fp, dirty = tree_state()
        if not dirty:
            break
        n += 1
        if n == 1 or n % 10 == 0:
            log("TREE GUARD: code tree dirty — waiting for a commit "
                "before measuring")
        time.sleep(60)
    if fp != plan_fp:
        log(f"TREE GUARD: code tree changed — re-pinning plan and "
            f"resetting stages (old results archived as .done.old)")
        for name in STAGE_ORDER:
            p = os.path.join(STATE_DIR, f"{name}.done")
            if os.path.exists(p):
                os.replace(p, p + ".old")
            lp = os.path.join(STATE_DIR, f"{name}.log")
            if os.path.exists(lp):
                os.replace(lp, lp + ".old")
            ap = os.path.join(STATE_DIR, f"{name}.attempts")
            if os.path.exists(ap):
                os.remove(ap)
        with open(os.path.join(STATE_DIR, "plan_fp"), "w") as f:
            f.write(fp)
    return fp


def main():
    os.makedirs(STATE_DIR, exist_ok=True)
    plan_fp = tree_state()[0]
    with open(os.path.join(STATE_DIR, "plan_fp"), "w") as f:
        f.write(plan_fp)
    log(f"autopilot start; state in {STATE_DIR}; "
        f"plan fingerprint {plan_fp[:9]}…")
    idx = 0
    while idx < len(STAGE_ORDER):
        name = STAGE_ORDER[idx]
        if is_done(name):
            log(f"stage {name}: already done, skipping")
            idx += 1
            continue
        new_fp = wait_for_clean_tree(plan_fp)
        if new_fp != plan_fp:
            plan_fp = new_fp
            idx = 0          # restart the plan on the new tree
            continue
        wait_for_tpu()
        argv, timeout, env_extra = STAGES[name]
        rc = run_stage(name, argv, timeout, env_extra)
        if rc == 0 and "bench.py" in " ".join(argv):
            # bench's watchdog exits 0 with whatever lines were flushed —
            # on a cold cache that can be only the compile-safe warmup
            # provisional. A bench stage without a real (non-provisional)
            # measured line is NOT a result; the attempt's value is that
            # it wrote its programs to the persistent cache, so the retry
            # runs warm and lands the pinned measured window.
            j = last_json_line(read_log(name))
            if not j or j.get("provisional"):
                log(f"stage {name}: exited 0 but only a provisional line "
                    "landed (cold-cache watchdog) — treating as retryable")
                rc = 125
        if rc != 0:
            # transient infra failures are the COMMON case here (the
            # remote-compile leg drops connections independently of the
            # device leg, NOTES r3/r4a) — a failed stage must RETRY, not
            # be skipped for the rest of the plan. Cap attempts so a
            # deterministic stage bug can't loop the plan forever.
            n = bump_attempts(name)
            if not probe_tpu():
                log(f"stage {name}: rc={rc} AND tunnel wedged — waiting "
                    "for recovery before the retry")
                wait_for_tpu()
            if n < MAX_ATTEMPTS:
                log(f"stage {name}: rc={rc}, attempt {n}/{MAX_ATTEMPTS} — "
                    "retrying")
                time.sleep(60)   # let a flapping endpoint settle
                continue
            log(f"stage {name}: rc={rc} after {n} attempts — marking "
                "failed and moving on")
        mark_done(name, rc == 0)
        summarize()
        idx += 1
    log("autopilot: all stages attempted")
    summarize()


if __name__ == "__main__":
    main()
