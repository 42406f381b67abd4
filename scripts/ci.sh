#!/usr/bin/env bash
# CI-style gate: run the full test suite from a CLEAN export of HEAD —
# exactly what a fresh clone would see (round-2 shipped red because a
# last-minute edit was committed without re-running the suite; this script
# is the guard).  Usage: ./scripts/ci.sh [pytest args]
set -euo pipefail
repo_root="$(cd "$(dirname "$0")/.." && pwd)"
tmp="$(mktemp -d /tmp/cat_ci.XXXXXX)"
trap 'rm -rf "$tmp"' EXIT
git -C "$repo_root" archive HEAD | tar -x -C "$tmp"
echo "clean export of $(git -C "$repo_root" rev-parse --short HEAD) -> $tmp"
cd "$tmp"
python -m pytest tests/ -q "$@"
