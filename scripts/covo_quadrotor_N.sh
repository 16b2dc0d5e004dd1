#!/usr/bin/env bash
# Sample-count ablation (reference: quadjax/scripts/covo_quadrotor_N.sh):
# N in {16..1024}, H=32, lambda=0.01 over the three sampling controllers.
set -euo pipefail
cd "$(dirname "$0")/.."

for n in 16 32 64 128 256 512 1024; do
    for controller in mppi covo_online covo_offline; do
        python -m covo_mpc_tpu.cli \
            --task tracking_zigzag \
            --controller "$controller" \
            --controller-params "N${n}_H32_lam0.01" \
            --mode eval \
            --noDR \
            --name "${controller}_N${n}" \
            "$@"
    done
done
