#!/usr/bin/env bash
# Paper main-result sweep (reference: quadjax/scripts/covo_quadrotor.sh):
# N=8192, H=32, lambda=0.01 on tracking_zigzag without domain randomization,
# for MPPI / CoVO-online / CoVO-offline.
set -euo pipefail
cd "$(dirname "$0")/.."

for controller in mppi covo_online covo_offline; do
    python -m covo_mpc_tpu.cli \
        --task tracking_zigzag \
        --controller "$controller" \
        --controller-params N8192_H32_lam0.01 \
        --mode eval \
        --noDR \
        --name "${controller}_main" \
        "$@"
done
