from . import fact, models, reports, staging  # noqa: F401
