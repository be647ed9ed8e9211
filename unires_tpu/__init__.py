"""unires-tpu: TPU-native unified super-resolution / denoising for 3D medical images.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
brudfors/UniRes (multi-channel joint-total-variation MAP reconstruction via
ADMM + CG, with data-driven hyper-parameters, rigid pose and even/odd slice
scaling updates).
"""

__version__ = "0.1.0"

from .settings import Settings, settings  # noqa: F401
from .models.proj_op import ProjOp, proj_info  # noqa: F401
from .models.forward import proj_apply, check_adjoint  # noqa: F401
from .pipeline.run import init, fit, preproc  # noqa: F401
