from . import rinex, ephemeris, atmosphere, spp, dd, converter  # noqa: F401
