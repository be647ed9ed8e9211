from .atlas import default_atlas  # noqa: F401
