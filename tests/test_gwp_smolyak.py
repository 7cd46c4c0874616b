"""Moving-Gaussian basis and Smolyak sparse-grid tests."""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.grid.gwp import WPD, overlap_real, kinetic_real
from pyqed_tpu.grid.smolyak import SparseGrid, AdaptiveSparseGrid


class TestGWPBasis:
    def test_overlap_normalization(self):
        assert np.isclose(float(overlap_real(1.3, 0.0, 1.3, 0.0)), 1.0)

    def test_kinetic_diagonal(self):
        """<g|T|g> = a/(4m)."""
        a, m = 2.0, 3.0
        assert np.isclose(float(kinetic_real(a, 0.0, a, 0.0, m)),
                          a / (4 * m), atol=1e-12)

    def test_ho_spectrum_from_gaussian_basis(self):
        """HO eigenvalues from a fixed Gaussian basis to ~1e-6."""
        wpd = WPD(np.linspace(-4, 4, 21), widths=2.0, mass=1.0)
        w, U = wpd.eigenstates(V=lambda x: 0.5 * x**2, k=4)
        assert np.allclose(np.asarray(w), [0.5, 1.5, 2.5, 3.5], atol=1e-5)

    def test_dynamics_unitary_and_correct(self):
        """Coherent-state oscillation in the Gaussian basis."""
        wpd = WPD(np.linspace(-5, 5, 25), widths=2.0, mass=1.0)
        wpd.buildH(lambda x: 0.5 * x**2)
        x = np.linspace(-6, 6, 400)
        psi0 = (1 / np.pi) ** 0.25 * np.exp(-0.5 * (x - 1.0) ** 2)
        c0 = np.asarray(wpd.project(psi0, x))
        res = wpd.run(c0, dt=2 * np.pi / 200, nt=200, nout=200)
        psiT = np.asarray(wpd.wavefunction(res.psi, jnp.asarray(x)))
        ov = abs(np.vdot(psi0, psiT) * (x[1] - x[0]))
        assert ov > 1 - 1e-4, ov


class TestSmolyak:
    def test_point_counts_match_reference(self):
        """(reference: pyqed/smolyak/test.py — 17 points for 2D level 3,
        31 points for 3D level 3)."""
        sg2 = SparseGrid(2, 3)
        sg2.generate_points()
        assert sg2.npts == 17
        sg3 = SparseGrid(3, 3)
        sg3.generate_points()
        assert sg3.npts == 31

    def test_interpolation_exact_at_nodes(self):
        sg = SparseGrid(2, 4)
        sg.generate_points()
        f = lambda x, y: 4 * x * (1 - x) * 4 * y * (1 - y)
        sg.fit(f)
        vals = np.asarray(sg.eval(sg.points))
        assert np.allclose(vals, sg.fv, atol=1e-12)

    def test_interpolation_converges(self):
        f = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
        errs = []
        rng = np.random.default_rng(0)
        q = rng.uniform(0.1, 0.9, size=(200, 2))
        for level in [3, 5, 7]:
            sg = SparseGrid(2, level)
            sg.generate_points()
            sg.fit(f)
            got = np.asarray(sg.eval(q))
            errs.append(np.max(np.abs(got - f(q[:, 0], q[:, 1]))))
        assert errs[1] < errs[0] / 2
        assert errs[2] < errs[1] / 2

    def test_combination_coefficients_sum(self):
        """CT coefficients sum to 1 (partition of unity of the scheme)."""
        sg = SparseGrid(3, 4)
        levels, coeffs = sg.combination_technique()
        assert sum(coeffs) == 1

    def test_adaptive_refines_peak(self):
        f = lambda x, y: np.exp(-50 * ((x - 0.3) ** 2 + (y - 0.7) ** 2))
        sg = AdaptiveSparseGrid(2, 3)
        sg.generate_points()
        sg.fit(f)
        n0 = sg.npts
        added = sg.refine(f, tol=1e-4, max_new=40)
        assert added > 0 and sg.npts == n0 + added
        q = np.array([[0.3, 0.7], [0.32, 0.68]])
        err = np.max(np.abs(np.asarray(sg.eval(q)) - f(q[:, 0], q[:, 1])))
        sg2 = SparseGrid(2, 3)
        sg2.generate_points()
        sg2.fit(f)
        err0 = np.max(np.abs(np.asarray(sg2.eval(q)) - f(q[:, 0], q[:, 1])))
        assert err < err0
