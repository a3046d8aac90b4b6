from . import banded_pcg  # noqa: F401
