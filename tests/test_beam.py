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


class TestDrawingModule:
    """beam/drawing.py: unified draw dispatch, video export, volume
    slicer, and the utils_math edge/rotate helpers (VERDICT r4 #7 —
    reference: pyqed/beam/utils_drawing.py, utils_slicer.py,
    utils_math.py:865,1057,1074)."""

    def _xyz(self):
        from pyqed_tpu.beam import ScalarFieldXYZ, gauss_beam
        from pyqed_tpu.beam.beam import ScalarFieldXY
        x = np.linspace(-80, 80, 32)
        y = np.linspace(-80, 80, 32)
        z = np.linspace(0, 400, 6)
        f0 = ScalarFieldXY(x, y, 0.6328)
        gauss_beam(f0, 25.0)
        vol = ScalarFieldXYZ(x, y, z, 0.6328)
        vol.incident_field(f0.u)
        vol.propagate()
        return vol

    def test_draw_dispatch_and_slices(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        from pyqed_tpu.beam import draw, slices
        from pyqed_tpu.beam.beam import ScalarFieldX
        import jax.numpy as jnp
        x = np.linspace(-100, 100, 64)
        f = ScalarFieldX(x, 0.6328, u=np.exp(-(x / 30) ** 2))
        fig, ax = draw(f, filename=str(tmp_path / "x.png"))
        assert (tmp_path / "x.png").stat().st_size > 1000
        vol = self._xyz()
        fig, axs = slices(vol, output=str(tmp_path / "slices.png"))
        assert len(axs) == 3
        assert (tmp_path / "slices.png").stat().st_size > 1000
        # draw() routes XYZ volumes to slices
        fig, axs = draw(vol, filename=str(tmp_path / "vol.png"))
        assert (tmp_path / "vol.png").stat().st_size > 1000
        # slicing through an explicit physical point picks those planes
        fig, axs = slices(vol, point=(0.0, 0.0, 240.0))
        assert "z = 240" in axs[0].get_title()

    def test_video_export(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        from pyqed_tpu.beam import video
        from pyqed_tpu.beam.beam import ScalarFieldXZ
        x = np.linspace(-100, 100, 48)
        z = np.linspace(0, 500, 8)
        f = ScalarFieldXZ(x, z, 0.6328)
        f.incident_field(np.exp(-(x / 30) ** 2).astype(complex))
        f.propagate()
        out = video(f, str(tmp_path / "scan.mp4"), fps=4)
        import os
        assert os.path.exists(out) and os.path.getsize(out) > 1000
        # raw 3D stack path
        stack = np.abs(np.asarray(self._xyz().u))
        out2 = video(stack, str(tmp_path / "vol.gif"), fps=4)
        assert os.path.exists(out2) and os.path.getsize(out2) > 1000

    def test_prepare_and_normalize(self):
        from pyqed_tpu.beam import prepare_drawing, normalize_draw
        u = np.array([1 + 1j, 2.0, -3j])
        assert np.allclose(prepare_drawing(u, "intensity"),
                           [2.0, 4.0, 9.0])
        assert np.allclose(prepare_drawing(u, "phase"),
                           np.angle(u))
        img = normalize_draw([1.0, 4.0], normalize=True)
        assert np.allclose(img, [0.25, 1.0])
        assert np.allclose(normalize_draw([1.0, 4.0], cut_value=2.0),
                           [1.0, 2.0])

    def test_rotate_image_and_edge_filters(self):
        from pyqed_tpu.beam.fieldutils import (rotate_image,
                                               filter_edge_1D,
                                               filter_edge_2D)
        x = np.linspace(-1, 1, 41)
        z = np.linspace(-1, 1, 41)
        Z, X = np.meshgrid(z, x, indexing="ij")
        img = np.exp(-((X - 0.3) ** 2 + Z ** 2) / 0.02)
        # +90 deg about the origin moves the +x blob to -z (the scipy
        # ndimage.rotate convention the reference uses — verified
        # against scipy directly)
        rot = np.asarray(rotate_image(x, z, img, 90.0, (0.0, 0.0)))
        iz, ix = np.unravel_index(np.argmax(rot), rot.shape)
        assert abs(z[iz] + 0.3) < 0.1 and abs(x[ix]) < 0.1
        # edge filter: ~1 at center, smaller at borders, monotone edge
        # reference form: exp(-(2(x-c)/Dx)^p) -> exactly 1/e at the
        # border when size=1, ~0 when size<1
        w1 = filter_edge_1D(x, size=1.0, exponent=16)
        assert abs(w1[0] - np.exp(-1)) < 1e-12
        w = filter_edge_1D(x, size=0.8, exponent=16)
        assert w[len(x) // 2] > 0.999 and w[0] < 1e-10
        W = filter_edge_2D(x, z, size=0.8, exponent=16)
        assert W.shape == (len(x), len(z))
        assert np.allclose(W, np.outer(w, filter_edge_1D(z, 0.8, 16)))
