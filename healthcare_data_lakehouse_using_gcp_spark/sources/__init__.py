from . import generator, readers, snapshots  # noqa: F401
