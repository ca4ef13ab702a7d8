from . import matrix, regression, statistics  # noqa: F401
