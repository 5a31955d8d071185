#!/usr/bin/env bash
# ray job submit wrapper for the index build (SCALE.md).
# On a real cluster:   RAY_JOB_ADDRESS=http://head:8265 ./tools/submit_job.sh --input ... --index ...
# In this sandbox (no cluster): falls back to a local run of the same CLI.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ -n "${RAY_JOB_ADDRESS:-}" ]; then
  exec ray job submit --address "$RAY_JOB_ADDRESS" --working-dir . \
    -- python -m rayfts.cli build "$@"
else
  echo "[submit_job] no RAY_JOB_ADDRESS — running locally" >&2
  exec python -m rayfts.cli build "$@"
fi
