from reseek_tpu.parallel.sharded import make_mesh, make_sharded_search_step

__all__ = ["make_mesh", "make_sharded_search_step"]
