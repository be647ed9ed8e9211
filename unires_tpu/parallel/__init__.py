from .sharding import make_sharded_admm_step, build_mesh  # noqa: F401
