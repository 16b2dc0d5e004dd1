"""Small shared utilities."""

from covo_mpc_tpu.utils.keys import fold_in_batch

__all__ = ["fold_in_batch"]
