"""unires-tpu: TPU-native unified super-resolution / denoising for 3D medical images.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
brudfors/UniRes (multi-channel joint-total-variation MAP reconstruction via
ADMM + CG, with data-driven hyper-parameters, rigid pose and even/odd slice
scaling updates).
"""

__version__ = "0.2.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt-out: UNIRES_TPU_NO_COMPILE_CACHE).

    First compiles over a remote-TPU tunnel cost 30-60 s per unique shape in
    round-1 profiling; the persistent cache turns warm-process restarts into
    millisecond lookups. Harmless when the backend ignores it.
    """
    import os

    if os.environ.get("UNIRES_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "unires_tpu_jax")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .settings import Settings, settings  # noqa: F401
from .models.proj_op import ProjOp, proj_info  # noqa: F401
from .models.forward import proj_apply, check_adjoint  # noqa: F401
from .pipeline.run import init, fit, preproc  # noqa: F401
from .pipeline.run import fit_batch, preproc_batch  # noqa: F401
