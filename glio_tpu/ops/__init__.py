from . import knn_pallas  # noqa: F401
