#!/bin/sh
# Full test tier: fast tests PLUS the slow golden-track / convergence / E2E
# tests that `pytest` alone deselects (pytest.ini addopts -m "not slow").
# CI / pre-merge gates MUST run this, not bare pytest — the regenerated
# goldens (mcl_track.npz etc.) only gate here (ADVICE r2).
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m "" "$@"
