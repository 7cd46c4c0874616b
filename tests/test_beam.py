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


class TestMTF:
    def test_slit_mtf_is_triangle(self):
        """The incoherent MTF of an ideal slit (sinc PSF) is the
        triangle function up to the diffraction cutoff (reference:
        scalar_fields_X.py:914, utils_optics.py:531)."""
        from pyqed_tpu.beam.beam import ScalarFieldX, mtf_ideal
        lam, D, f = 0.6328, 5000.0, 100000.0
        x = np.linspace(-400, 400, 4096)
        fld = ScalarFieldX(x, lam)
        fld.u = np.sinc(D * x / (lam * f)).astype(complex)
        fx, mtf = fld.MTF()
        ideal, fcut = mtf_ideal(fx, lam, D, f, kind="1D")
        sel = np.abs(fx) < 0.9 * fcut
        assert np.max(np.abs(mtf[sel] - ideal[sel])) < 0.02
        # 2D circular-pupil ideal curve: monotone, 0 at cutoff, 1 at 0
        m2, fc2 = mtf_ideal(np.linspace(0, 2 * fcut, 100), lam, D, f,
                            kind="2D")
        assert abs(m2[0] - 1.0) < 1e-12
        assert m2[-1] == 0.0
        assert np.all(np.diff(m2) < 1e-12)

    def test_mtf_2d_normalized(self):
        from pyqed_tpu.beam.beam import ScalarFieldXY
        x = np.linspace(-100, 100, 64)
        y = np.linspace(-100, 100, 64)
        g = ScalarFieldXY(x, y, 0.6328)
        X, Y = np.meshgrid(x, y, indexing="ij")
        g.u = np.exp(-(X ** 2 + Y ** 2) / 200.0)
        fx, fy, mtf = g.MTF()
        assert abs(mtf[32, 32] - 1.0) < 1e-12
        assert mtf.max() <= 1.0 + 1e-9


class TestDrawVectorAndSeveral:
    def test_vector_draw_and_several_fields(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        from pyqed_tpu.beam.beam import (ScalarFieldXY, VectorFieldXY,
                                         draw_several_fields)
        x = np.linspace(-100, 100, 48)
        y = np.linspace(-100, 100, 48)
        X, Y = np.meshgrid(x, y, indexing="ij")
        env = np.exp(-((X / 40) ** 2 + (Y / 40) ** 2)).astype(complex)
        v = VectorFieldXY(x, y, 0.6328).incident_field(env, 1j * env)
        fig, axs = v.draw(filename=str(tmp_path / "vec.png"))
        assert (tmp_path / "vec.png").stat().st_size > 1000
        assert len(axs) == 4          # Ex, Ey, Ez, total
        f1 = ScalarFieldXY(x, y, 0.6328)
        f1.u = env
        f2 = ScalarFieldXY(x, y, 0.6328)
        f2.u = env * (X + 1j * Y)
        draw_several_fields([f1, f2], titles=("a", "b"),
                            filename=str(tmp_path / "sev.png"))
        assert (tmp_path / "sev.png").stat().st_size > 1000
