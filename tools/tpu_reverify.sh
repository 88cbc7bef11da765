#!/usr/bin/env bash
# One-command on-chip re-verification pass (VERDICT r2 #6 bench freshness).
# Run whenever the TPU tunnel returns after kernel-touching commits:
#
#   bash tools/tpu_reverify.sh [outdir]
#
# Every step is bounded with a timeout (NEVER kill a hung TPU compile by
# hand — it wedges the remote helper; let the timeout expire instead).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_reverify_$(date -u +%Y%m%dT%H%M)}"
mkdir -p "$OUT"
echo "== outputs -> $OUT"

probe() {
  timeout 180 python -c \
    "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))" \
    >/dev/null 2>&1
}

if ! probe; then
  echo "TPU unreachable (probe failed) — aborting" >&2
  exit 3
fi
echo "== TPU reachable"

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "== $name"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -5 "$OUT/$name.log"
  echo "== $name rc=$rc"
}

# 1. North-star bench (dense + 32k z-tile + MCClassS full-step lines).
run bench 3000 python bench.py

# 2. MCClassS step breakdown (hierarchy share — r4 small-N item).
run profile_step 2400 python tools/profile_step.py

# 3. Whole-scene 32k train step breakdown (hierarchy share).
run exp_whole_scene_32k 1800 python tools/exp_whole_scene.py 32768 --breakdown

# 4. Whole-scene scaling (r4 numbers in docs/ROUND4.md: 65k 104 ms,
#    131k 305 ms net; remat not useful at grow 16 — re-run after any
#    tile/hierarchy kernel change).
run exp_whole_scene_65k 2400 python tools/exp_whole_scene.py 65536
run exp_whole_scene_131k 3000 python tools/exp_whole_scene.py 131072

# 5. Data-pipeline soak at ScanNet scene count (steps/s + input stall).
run data_soak 3000 python tools/exp_data_soak.py --scenes 1200 --steps 40

# 6. Entry-point compile check on the real chip.
run graft_entry 1800 python __graft_entry__.py

echo "== done; update LAST_VERIFIED in bench.py + docs/ROUND3.md from $OUT"
