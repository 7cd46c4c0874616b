from .dmc import DMC, VMC
from .engine import dmc_native, build as build_native_engine
from .pimc import PIMC
