#!/usr/bin/env bash
# Local CI runner -- the same checks the workflow runs, for environments
# without GitHub runners (this container). Usage: scripts/ci.sh
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu
python -m pytest tests/ -q
python __graft_entry__.py
echo "CI OK"
