from . import dense  # noqa: F401
