#!/usr/bin/env bash
# The post-outage measurement queue (NEXT.md): run every TPU-blocked check
# and bench in one serial pass the moment the tunnel answers, logging each
# step to its own file under $LOGDIR (default /tmp/tpu_queue). Serial on
# purpose: the remote compile service is contended by concurrent processes
# (.claude/skills/verify/SKILL.md), and each step's compiles warm the
# persistent cache for the next.
#
#   bash tools/run_tpu_queue.sh [logdir]
#
# Steps are bounded with `timeout` so one wedged compile cannot eat the
# session; a step that times out logs FAIL and the queue moves on.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/tpu_queue}"
mkdir -p "$LOGDIR"

run() { # run <minutes> <name> <cmd...>
  local mins="$1" name="$2"; shift 2
  echo "=== $name (timeout ${mins}m) $(date -u +%H:%M:%S)"
  if timeout "${mins}m" "$@" >"$LOGDIR/$name.log" 2>&1; then
    echo "    OK: $(tail -c 400 "$LOGDIR/$name.log" | tr '\n' ' ')"
  else
    echo "    FAIL (exit $?): see $LOGDIR/$name.log"
  fi
}

# 1-2. kernel exactness after this round's kernel edits (REQUIRED), both widths
run 20 check_kernels      python tools/check_kernels.py
run 20 check_kernels_x64  python tools/check_kernels.py --x64
# 3. the headline bench (also certifies kernels at production section size)
run 30 bench              python bench.py
# 4. fetch transport check + end-to-end delivery band ladder (sets the
#    colorize_convert_fetch default; probe_overlap is the older plain-vs-
#    banded A/B, superseded but kept for cross-checks)
run 15 probe_fetch        python tools/probe_fetch.py
run 15 probe_delivery     python tools/probe_delivery.py 1e8
run 15 probe_overlap      python tools/probe_overlap.py 1e8
# 5. re-verify the earliest-ties exact16 rate (the tool's ties arg was fixed)
run 25 bench_exact16      python tools/bench_exact16.py 1e9 earliest
# 6. strategy ladder post-wmax-clamp (solar-sail row included)
run 45 bench_strategies   python tools/bench_strategies.py
# 7. sequence rates on the real vmapped program
run 30 bench_sequence     python tools/bench_sequence.py
# 8. DEPTH wire-channel delivery certificate + warm delivery times
run 45 probe_depth_wire   python tools/probe_depth_wire.py

echo "=== queue done $(date -u +%H:%M:%S); logs in $LOGDIR"
