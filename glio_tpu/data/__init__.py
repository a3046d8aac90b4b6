from . import episode, simulator  # noqa: F401
