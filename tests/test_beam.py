"""Beam drawing conveniences."""
import numpy as np
import pytest
class TestDraw:
    """draw()/draw_profile() conveniences (reference vendored diffractio:
    scalar_fields_X.py:1008, scalar_fields_XY.py:1407,1936)."""

    def test_draw_files_and_profile(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        import os
        from pyqed_tpu.beam.beam import (ScalarFieldX, ScalarFieldXY,
                                         ScalarFieldXZ)
        x = np.linspace(-200, 200, 128)
        f = ScalarFieldX(x, 0.6328)
        f.u = np.exp(-(x / 50) ** 2).astype(complex)
        p = tmp_path / "x.png"
        f.draw(filename=str(p))
        assert p.stat().st_size > 1000
        y = np.linspace(-150, 150, 64)
        g = ScalarFieldXY(x, y, 0.6328)
        X, Y = np.meshgrid(x, y, indexing="ij")
        g.u = np.exp(-((X / 60) ** 2 + (Y / 40) ** 2))
        g.draw(kind="amplitude", filename=str(tmp_path / "xy.png"))
        s, prof = g.draw_profile((0.0, -100.0), (0.0, 100.0), npoints=64)
        # the profile along x=0 equals the stored column
        mid = np.argmin(np.abs(x))
        col = np.interp(np.linspace(-100, 100, 64), y,
                        np.asarray(g.u[mid]).real)
        assert np.max(np.abs(prof.real - col)) < 1e-6
        z = np.linspace(100, 500, 16)
        h = ScalarFieldXZ(x, z, 0.6328)
        h.incident_field(np.exp(-(x / 50) ** 2).astype(complex))
        h.propagate()
        h.draw(filename=str(tmp_path / "xz.png"))
        assert (tmp_path / "xz.png").stat().st_size > 1000
