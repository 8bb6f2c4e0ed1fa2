from reseek_tpu.parallel.multihost import (distributed_fast_search,
                                           global_mesh, host_shard_bounds,
                                           init_distributed)
from reseek_tpu.parallel.topk import (merge_topk_distributed,
                                      merge_topk_sharded,
                                      sharded_prefilter_search)

__all__ = ["merge_topk_sharded", "merge_topk_distributed",
           "sharded_prefilter_search", "distributed_fast_search",
           "global_mesh", "host_shard_bounds", "init_distributed"]
