#!/usr/bin/env bash
# Pre-commit quality gate for gance_tpu — the TPU-native analog of the
# reference's CI step (/root/reference/.circleci/config.yml:30-56 runs
# pytest + pylint + black + isort + mypy on every commit).
#
# This environment has no ruff/black/mypy and pip installs are forbidden, so
# the gate is built from what the image provides:
#   1. version agreement   (gance_tpu.__version__ == pyproject == CHANGELOG head)
#   2. syntax              (compileall over the package, tests, tools, root CLIs)
#   3. static lint         (tools/lint.py — AST pass: unused imports, undefined
#                           names at module scope, accidental tabs, debug prints)
#   4. fast test subset    (pytest -m "not tpu and not slow")
#
# Usage:
#   tools/run_checks.sh          # full gate (lint + fast tests)
#   tools/run_checks.sh --quick  # skip pytest (sub-second static-only gate)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 version agreement"
python - <<'EOF'
import re, sys, pathlib
import gance_tpu
pyproject = pathlib.Path("pyproject.toml").read_text()
pv = re.search(r'^version = "([^"]+)"', pyproject, re.M).group(1)
ch = pathlib.Path("CHANGELOG.md").read_text()
cv = re.search(r"^## (\d+\.\d+\.\d+)", ch, re.M).group(1)
ok = gance_tpu.__version__ == pv == cv
print(f"  package={gance_tpu.__version__} pyproject={pv} changelog={cv}")
sys.exit(0 if ok else 1)
EOF

echo "== 2/4 syntax (compileall)"
python -m compileall -q gance_tpu tests tools \
    bench.py __graft_entry__.py train.py serve_network.py \
    music_into_networks.py project_video_to_file.py synthesize_images.py \
    process_images.py check_move_networks.py media_tools.py network_metrics.py

echo "== 3/4 static lint (tools/lint.py)"
python tools/lint.py gance_tpu tools tests bench.py __graft_entry__.py train.py serve_network.py

if [[ "${1:-}" == "--quick" ]]; then
  echo "== 4/4 pytest SKIPPED (--quick)"
  exit 0
fi

echo "== 4/4 fast tests (not tpu and not slow)"
python -m pytest tests/ -q -x -m "not tpu and not slow" -p no:cacheprovider
echo "ALL CHECKS PASSED"
