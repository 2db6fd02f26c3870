from . import manifest, scalars  # noqa: F401
