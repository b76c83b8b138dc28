from caduceus_tpu.parallel.mesh import make_mesh, batch_sharding, replicated

__all__ = ["make_mesh", "batch_sharding", "replicated"]
