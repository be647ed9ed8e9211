from .cg import cg  # noqa: F401
from .admm import make_admm_step, make_compute_nll, admm_aux, step_size  # noqa: F401
from .scaling_gn import update_scaling  # noqa: F401
from .rigid import update_rigid  # noqa: F401
