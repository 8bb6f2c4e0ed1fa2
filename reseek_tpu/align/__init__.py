from reseek_tpu.align.pipeline import PairAligner, AlignResult
from reseek_tpu.align.cigar import path_to_cigar, cigar_to_path

__all__ = ["PairAligner", "AlignResult", "path_to_cigar", "cigar_to_path"]
