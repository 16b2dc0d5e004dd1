#!/bin/bash
# Wait (bounded) for the flaky axon TPU tunnel, then exec the given command.
#
#   scripts/with_tpu.sh [-b BUDGET_S] CMD [ARGS...]
#
# The tunnel on this machine goes down for hours at a time; jax backend
# init then BLOCKS inside PJRT before raising UNAVAILABLE. Probing must
# therefore happen in a timeout-wrapped SUBPROCESS (an in-process
# try/except can stall unboundedly). Probes repeat every 60 s until the
# budget (default 4 h) is spent; on success the command runs with the
# inherited environment (JAX_PLATFORMS=axon). Exit 9 if the budget runs
# out, so queued jobs fail loudly instead of hanging on backend init.
set -u
BUDGET=14400
if [ "${1:-}" = "-b" ]; then BUDGET=$2; shift 2; fi
DEADLINE=$(( $(date +%s) + BUDGET ))
ATTEMPT=0
while true; do
  ATTEMPT=$((ATTEMPT + 1))
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[with_tpu] backend up after $ATTEMPT probe(s); running: $*" >&2
    exec "$@"
  fi
  LEFT=$(( DEADLINE - $(date +%s) ))
  if [ "$LEFT" -le 0 ]; then
    echo "[with_tpu] budget exhausted after $ATTEMPT probes; giving up" >&2
    exit 9
  fi
  echo "[with_tpu] probe $ATTEMPT failed; ${LEFT}s budget left" >&2
  sleep 60
done
