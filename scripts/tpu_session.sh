#!/bin/bash
# Ordered TPU measurement plan for when the tunnel recovers.
# (mirrored at /tmp/tpu_session.sh; canonical copy lives in scripts/)
# Run stages individually (don't fire all at once — each needs inspection).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

stage=${1:-1}

case $stage in
1) # existence proof + compaction measurement + cache warm (~16 min budget)
   timeout 1200 python bench.py 2>&1 | tee /tmp/bench_r3_run.log ;;
2) # probe-gather microbench (small programs, fast compiles)
   timeout 900 python scripts/mb_occ_probe.py 2>&1 | tee /tmp/mb_occ_probe.log ;;
3) # post-v5 eval profile, trained-scene shape, honest frame walls
   timeout 1800 python scripts/profile_eval.py --ball --H 800 \
     --out /tmp/trace_eval800_v7 2>&1 | tee /tmp/prof_eval800_v7.log ;;
4) # train trace post-compaction (only if bench shows a surprise)
   timeout 1800 python bench.py --skip_eval --profile /tmp/prof_r3b \
     2>&1 | tee /tmp/bench_prof_r3b.log ;;
5) # binned vs unbinned oct scatter A/B + bare sort cost (new, round 3c)
   timeout 1200 python scripts/mb_scatter_binned.py 2>&1 | tee /tmp/mb_scatter_binned.log ;;
6) # if stage 5 says binned wins at both J: re-bench with it as default
   timeout 1200 env DFTPU_SCATTER_IMPL=binned python bench.py 2>&1 | tee /tmp/bench_r3_binned.log ;;
esac
# stage 7: VAE encode diagnosis (45 ms @ 19% MXU — trace + per-op attribution)
if [ "$1" = 7 ]; then
  timeout 1200 python scripts/mb_sd_vae.py 2>&1 | tee /tmp/mb_sd_vae.log
fi
# stage 8: RETIRED r5b (--grid_table_bf16 removed)
if [ "$1" = 8 ]; then
  echo "retired"
fi
# stage 9: attention impl A/B (flash is the new TPU default; isolate its effect)
if [ "$1" = 9 ]; then
  timeout 1200 env DFTPU_ATTN_IMPL=einsum python bench.py --skip_eval 2>&1 | tee /tmp/bench_r3_einsum_attn.log
fi
