from .sharding import make_sharded_admm_step, build_mesh  # noqa: F401
from .fit_batch import fit_batch, batch_mesh, make_batch_chunk  # noqa: F401
