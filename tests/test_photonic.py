"""Transfer-matrix / QNM / layered Green's function tests."""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.beam import (
    rt_coefficients, transmittance_spectrum, quasinormal_modes, Multilayer,
)


class TestTransferMatrix:
    def test_energy_conservation_lossless(self):
        """|r|^2 + |t|^2 = 1 for a lossless stack (same in/out media)."""
        ns, ls = [2.0, 1.5, 2.0], [0.3, 0.5, 0.2]
        for w in [1.0, 2.3, 5.7]:
            r, t = rt_coefficients(w, ns, ls)
            assert np.isclose(abs(complex(r))**2 + abs(complex(t))**2, 1.0,
                              atol=1e-10), w

    def test_quarter_wave_antireflection(self):
        """n2 = sqrt(n1*n3) quarter-wave layer: r = 0 at design frequency."""
        n1, n3 = 1.0, 2.25
        n2 = np.sqrt(n1 * n3)
        lam0 = 1.0
        w0 = 2 * np.pi / lam0
        l = lam0 / (4 * n2)
        r, t = rt_coefficients(w0, [n2], [l], n_in=n1, n_out=n3)
        assert abs(complex(r)) < 1e-10

    def test_fabry_perot_resonances(self):
        """Etalon transmission peaks at omega_m = m pi c/(n l)."""
        n, l = 3.0, 1.0
        ws = np.linspace(0.5, 4.0, 2000)
        T = np.asarray(transmittance_spectrum(ws, [n], [l]))
        from scipy.signal import find_peaks
        pk, _ = find_peaks(T, height=0.99)
        expected = np.pi / (n * l) * np.arange(1, 4)
        for e in expected:
            assert np.min(np.abs(ws[pk] - e)) < 5e-3, e


class TestQNM:
    def test_etalon_qnm(self):
        """Etalon QNMs: omega_m = (m pi - i atanh? )/(n l) ... known:
        omega = [m pi - i ln((n+1)/(n-1))/1]/ (n l) for n1=1 outside.
        Check Newton-found modes satisfy Re near m pi/(n l), Im < 0."""
        n, l = 3.0, 1.0
        guesses = np.pi / (n * l) * np.array([1, 2])
        modes = quasinormal_modes([n], [l], guesses)
        exact_re = np.pi / (n * l) * np.array([1, 2])
        exact_im = -np.log((n + 1) / (n - 1)) / (n * l)
        for m, er in zip(modes, exact_re):
            assert abs(m.real - er) < 1e-6
            assert abs(m.imag - exact_im) < 1e-6


class TestMultilayer:
    def test_free_space_limit(self):
        """chi = 0: G == G0."""
        z = np.linspace(0, 10, 100)
        ml = Multilayer(z, np.ones_like(z))
        G = np.asarray(ml.G(2.0))
        G0 = np.asarray(ml.green0(2.0))
        assert np.allclose(G, G0, atol=1e-12)

    def test_slab_modifies_ldos(self):
        z = np.linspace(0, 20, 400)
        eps = np.where(np.abs(z - 10) < 2, 4.0, 1.0)
        ml = Multilayer(z, eps)
        ldos = np.asarray(ml.ldos(1.5))
        assert np.all(np.isfinite(ldos))
        # LDOS inside the slab differs from outside
        inside = ldos[np.abs(z - 10) < 1.5].mean()
        outside = ldos[np.abs(z - 10) > 6].mean()
        assert abs(inside - outside) > 0.05


class TestDyadicGF:
    def test_ldos_identity(self):
        """Im G0_nn(r -> r) = k/(6 pi) — the free-space LDOS."""
        from pyqed_tpu.beam.photonic import dyadic_G0
        lam = 1.0
        k = 2 * np.pi / lam
        G = np.asarray(dyadic_G0(np.array([0.0, 0.0, 1e-4]),
                                 np.zeros(3), lam))
        for i in range(3):
            assert abs(G[i, i].imag - k / (6 * np.pi)) < 1e-6

    def test_far_field_transverse(self):
        from pyqed_tpu.beam.photonic import dyadic_G0
        G = np.asarray(dyadic_G0(np.array([0.0, 0.0, 200.0]),
                                 np.zeros(3), 1.0))
        assert abs(G[2, 2]) / abs(G[0, 0]) < 0.01

    def test_mirror_purcell(self):
        """z-dipole close to a perfect mirror: Gamma/Gamma0 -> 2."""
        import jax.numpy as jnp
        from pyqed_tpu.beam.photonic import (dyadic_Gs_interface,
                                             purcell_factor)
        lam, z0 = 1.0, 0.05
        Gs = dyadic_Gs_interface(np.array([0.0, 0.0, z0]),
                                 np.array([0.0, 0.0, z0]), lam,
                                 1.0, 1e9)
        f = purcell_factor(jnp.asarray(Gs), lam)
        assert 1.7 < f < 2.1
        # x-dipole (parallel) is SUPPRESSED near a mirror
        fx = purcell_factor(jnp.asarray(Gs), lam, orientation=0)
        assert fx < 0.5


class TestSlabAndChiral:
    """Slab dyadic GF (reference: pyqed/dgf/propagator.py:117 Gs123) and
    ChiralMultilayer (reference stub at :302 made real)."""

    def test_slab_reduces_to_single_interface(self):
        """eps3 = eps2: the second image vanishes; remote far interface:
        only the z=0 image contributes."""
        from pyqed_tpu.beam import dyadic_Gs_slab
        R1 = np.array([0.3, -0.2, 0.8])
        R2 = np.array([-0.1, 0.4, 0.5])
        S = np.asarray(dyadic_Gs_slab(R1, R2, lam=5.0, eps1=4.0, eps2=1.0,
                                      eps3=1.0, spacing=100.0))
        # direct static image formula for the z=0 interface
        cd = (4.0 - 1.0) / (4.0 + 1.0)
        d = R1 - R2 * np.array([1, 1, -1])
        r2 = d @ d
        Sref = -cd * (3 * np.outer(d, d) - np.eye(3) * r2) / r2 ** 2.5
        Sref = Sref @ np.diag([1.0, 1.0, -1.0])
        assert np.max(np.abs(S - Sref)) < 1e-12

    def test_slab_symmetries(self):
        """Reference invariants (pyqed/dgf/propagator.py:155-159):
        yx = xy, zx = -xz, zy = -yz."""
        from pyqed_tpu.beam import dyadic_Gs_slab
        R1 = np.array([0.3, -0.2, 0.8]); R2 = np.array([-0.5, 0.4, 0.6])
        S = np.asarray(dyadic_Gs_slab(R1, R2, lam=3.0, eps1=2.0, eps2=1.0,
                                      eps3=5.0, spacing=2.0))
        assert np.isclose(S[1, 0], S[0, 1], atol=1e-14)
        assert np.isclose(S[2, 0], -S[0, 2], atol=1e-14)
        assert np.isclose(S[2, 1], -S[1, 2], atol=1e-14)

    def test_slab_total_includes_bulk(self):
        from pyqed_tpu.beam import dyadic_G_slab, dyadic_G0, dyadic_Gs_slab
        R1 = np.array([0.0, 0.0, 1.0]); R2 = np.array([0.2, 0.0, 0.7])
        G = np.asarray(dyadic_G_slab(R1, R2, 4.0, 2.0, 1.0, 3.0, 2.5))
        G0 = np.asarray(dyadic_G0(R1, R2, 4.0, 1.0))
        S = np.asarray(dyadic_Gs_slab(R1, R2, 4.0, 2.0, 1.0, 3.0, 2.5))
        assert np.allclose(G, G0 + S)

    def test_chiral_kappa0_matches_achiral(self):
        from pyqed_tpu.beam import ChiralMultilayer, Multilayer
        z = np.linspace(-5, 5, 200)
        eps = np.where(np.abs(z) < 1.0, 2.25, 1.0)
        ml = Multilayer(z, eps, eps0=1.0)
        cm = ChiralMultilayer(z, eps, kappa=0.0, eps0=1.0)
        k = 2.1
        Ga = np.asarray(ml.G(k))
        Gc = np.asarray(cm.green(k))
        assert np.max(np.abs(Gc[0] - Ga)) < 1e-10
        assert np.max(np.abs(Gc[1] - Ga)) < 1e-10

    def test_chiral_rotation_analytic(self):
        from pyqed_tpu.beam import ChiralMultilayer
        z = np.linspace(0, 2.0, 400)
        kappa = 0.01
        cm = ChiralMultilayer(z, eps=1.0, kappa=kappa, eps0=1.0,
                              kappa0=kappa)
        k = 3.0
        L = z[-1] - z[0] + (z[1] - z[0])
        theta = cm.optical_rotation(k)
        assert abs(theta - 0.5 * k * 2 * kappa * L) < 1e-3

    def test_chiral_modes_split(self):
        """kappa != 0: the two circular Green functions differ."""
        from pyqed_tpu.beam import ChiralMultilayer
        z = np.linspace(-4, 4, 160)
        eps = np.where(np.abs(z) < 1.5, 2.0, 1.0)
        kap = np.where(np.abs(z) < 1.5, 0.3, 0.0)
        cm = ChiralMultilayer(z, eps, kap)
        G = np.asarray(cm.green(1.7))
        assert np.max(np.abs(G[0] - G[1])) > 1e-3
