from .spo import SPO, SPO2, SPO3, SPON, ResultSPO
