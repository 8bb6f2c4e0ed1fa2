from reseek_tpu.parallel.topk import (merge_topk_sharded,
                                      sharded_prefilter_search)

__all__ = ["merge_topk_sharded", "sharded_prefilter_search"]
