from . import generator, readers  # noqa: F401
