#!/bin/bash
# Runs the full TPU verification + measurement sequence once the axon
# tunnel is reachable. Safe to leave running: it polls until the TPU
# answers, then runs each step with a bounded timeout, logging to
# /tmp/tpu_seq.log. Steps are ordered so the most important artifacts
# land first (smoke -> bench numbers -> goldens).
set -u
cd /root/repo
LOG=/tmp/tpu_seq.log
echo "=== tpu_sequence $(date) ===" >> "$LOG"

# 1. Wait for the TPU (each probe bounded; tunnel hangs when down).
while true; do
  if timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "TPU reachable $(date)" >> "$LOG"
    break
  fi
  echo "TPU still down $(date)" >> "$LOG"
  sleep 240
done

run() {
  local name="$1"; shift
  echo "--- $name start $(date)" >> "$LOG"
  timeout "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? $(date)" >> "$LOG"
}

# 2. Mosaic smoke of every kernel family: opaque + MLAB + trig-MBOIT +
#    depth peeling + RTAO + opacity-opt + VPT, each cross-checked or
#    NaN-checked vs the CPU interpreter (tests/test_tpu_smoke.py).
run smoke 2400 env LINEVIS_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q -m ""

# 3. Example drives (tornado AA quality + stress MLAB).
run tornado 2400 python examples/render_tornado.py
run stress_mlab 2400 python examples/render_stress_mlab.py

# 4. Benchmark (streams JSON lines; also warms /root/repo/.jax_cache).
run bench 7200 python bench.py

# 5. Ray-tracer TPU smoke.
run rt_smoke 1800 python examples/smoke_ray_tracer_tpu.py

# 6. Measured geometry parity: capsules vs 8-subdiv triangle tubes at
#    1080p (docs/GEOMETRY_PARITY.json + the >= 0.99 gate).
run parity 5400 env LINEVIS_TPU_PARITY=1 python -m pytest tests/test_geometry_parity.py -q -m ""

# 7. BASELINE-config goldens at full resolution.
run baseline_goldens 7200 python -m tests.golden_gen_baseline

echo "=== tpu_sequence done $(date) ===" >> "$LOG"
