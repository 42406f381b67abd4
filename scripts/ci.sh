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
# packaging smoke: the sdist+wheel must build from a clean export (pinned
# deps in setup.py; `python -m build` isn't in this image, setuptools is)
python setup.py -q sdist bdist_wheel >/dev/null
ls dist/*.whl dist/*.tar.gz >/dev/null && echo "packaging smoke OK: $(ls dist)"
# full suite (overrides the fast-tier default filter from pytest.ini)
python -m pytest tests/ -q --override-ini=addopts= "$@"
