from . import atmosphere, converter, dd, ephemeris, rinex, rtk, spp, tools  # noqa: F401
