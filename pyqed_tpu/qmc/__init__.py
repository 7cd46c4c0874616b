from .dmc import DMC, PIMC, VMC
from .engine import dmc_native, build as build_native_engine
