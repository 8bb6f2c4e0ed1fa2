from reseek_tpu.ops.substmx import build_smx, weighted_matrices
from reseek_tpu.ops.sw_np import sw_score, sw_align
from reseek_tpu.ops.lddt import lddt_mu_fast

__all__ = ["build_smx", "weighted_matrices", "sw_score", "sw_align",
           "lddt_mu_fast"]
