from . import sliding_window  # noqa: F401
