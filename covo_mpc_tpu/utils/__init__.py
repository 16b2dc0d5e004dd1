"""Small shared utilities."""

from covo_mpc_tpu.utils.keys import fold_in_batch
from covo_mpc_tpu.utils.vma import match_vma, pvary

__all__ = ["fold_in_batch", "match_vma", "pvary"]
