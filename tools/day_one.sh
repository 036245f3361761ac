#!/usr/bin/env bash
# Real-weight day-one validation (VERDICT r4 item 6).
#
# Run this ONCE on the first host that has both network access and the real
# checkpoint (SDMatte.safetensors / SDMatte_plus.safetensors, ~11 GB —
# reference load semantics: /root/reference/sdmatte_nodes.py:298-323).  The
# dev environment this framework was built in is zero-egress, so the real
# weights have never been loaded; this script closes that standing gap and
# produces every artifact the docs currently mark "pending real weights":
#
#   1. manifest diff + load report + layout signatures + golden dump +
#      quality metrics          -> $OUT/parity_report.json, parity_golden.npz
#   2. frozen layout signatures -> $OUT/layout_stats.json (regression-check
#      later loader changes with --check-stats)
#   3. speed-mode quality table ON REAL WEIGHTS -> $OUT/speed_modes.log
#      (paste the table into docs/MIGRATING.md, replacing the random-weight
#      upper-bound rows)
#   4. headline bench refresh   -> $OUT/bench.json (paste into README's
#      measured table)
#
# Usage: tools/day_one.sh /path/to/SDMatte.safetensors [outdir]

set -euo pipefail
CKPT=${1:?usage: tools/day_one.sh /path/to/SDMatte.safetensors [outdir]}
OUT=${2:-day_one_artifacts}
# Resolve both to absolute paths BEFORE the cd below, so an invocation from
# anywhere (relative checkpoint, default/relative outdir) keeps working.
CKPT=$(readlink -f "$CKPT")
mkdir -p "$OUT"
OUT=$(readlink -f "$OUT")
cd "$(dirname "$0")/.."

echo "== 1/4 parity pack (manifest, load, layout, golden, quality) =="
python -m sdmatte_tpu.parity_pack --ckpt "$CKPT" \
    --out "$OUT/parity_report.json" \
    --golden-out "$OUT/parity_golden.npz" \
    --emit-stats "$OUT/layout_stats.json"

echo "== 2/4 speed-mode quality table on real weights =="
python benchmarks/ab_speed_modes.py --ckpt "$CKPT" \
    2>&1 | tee "$OUT/speed_modes.log"

echo "== 3/4 headline bench (parity lanes + extras) =="
SDMATTE_BENCH_EXTRAS=1 SDMATTE_BENCH_BUDGET_S=7200 \
    python bench.py > "$OUT/bench.json"
cat "$OUT/bench.json"

echo "== 4/4 follow-ups (manual) =="
cat <<'EOF'
  * diff the golden dump against a torch-side dump of the reference
    (torch script documented in benchmarks/golden.py) — target MAE <= 1e-2
  * paste $OUT/speed_modes.log's table into docs/MIGRATING.md (replaces the
    random-weight upper bounds) and $OUT/bench.json into README's table
  * commit $OUT/layout_stats.json so CI can regression-check the loader
    against the real file's layout signatures (--check-stats)
  * optional: load this plugin in a live ComfyUI (pip install -e .; symlink
    into custom_nodes/) and run example_workflow/ end-to-end — the last
    env-blocked item from SURVEY component 12
EOF
echo "day-one artifacts in $OUT/"
