#!/bin/sh
# Full test pyramid, heavy interpret-mode suites included (~80 min on 1 vCPU).
# The default `pytest tests/` run excludes -m heavy (see pytest.ini).
exec python -m pytest tests/ -q -m "heavy or not heavy" --durations=30 "$@"
