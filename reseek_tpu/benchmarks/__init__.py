from reseek_tpu.benchmarks.scop40 import Scop40Eval

__all__ = ["Scop40Eval"]
