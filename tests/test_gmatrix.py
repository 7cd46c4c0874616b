"""Wilson G-matrix for curvilinear coordinates (qchem/geometry.py).

Reference pyqed/namd/gmat.py is untranslated MATLAB pseudocode; ours is
pinned against closed-form kinetic metrics.
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.qchem.geometry import gmatrix, gmatrix_grid


def test_diatomic_stretch_reduced_mass():
    """Bond-length coordinate of a diatomic: G_rr = 1/mu."""
    m1, m2 = 1836.0, 3671.0

    def geom(q):
        r = q[0]
        # atoms on z axis, center of mass fixed
        z1 = -m2 / (m1 + m2) * r
        z2 = m1 / (m1 + m2) * r
        return jnp.array([[0.0, 0.0, z1], [0.0, 0.0, z2]])

    G, Ginv = gmatrix(geom, jnp.array([2.0]), jnp.array([m1, m2]))
    mu = m1 * m2 / (m1 + m2)
    assert abs(float(G[0, 0]) - 1.0 / mu) < 1e-12
    assert abs(float(Ginv[0, 0]) - mu) < 1e-8


def test_diatomic_rotation_inertia():
    """Rotation angle about COM: G_theta_theta = 1/I, I = mu r^2."""
    m1, m2, r0 = 1836.0, 1836.0, 2.5

    def geom(q):
        th = q[0]
        z1 = -0.5 * r0
        z2 = 0.5 * r0
        c, s = jnp.cos(th), jnp.sin(th)
        return jnp.array([[z1 * s, 0.0, z1 * c], [z2 * s, 0.0, z2 * c]])

    G, _ = gmatrix(geom, jnp.array([0.3]), jnp.array([m1, m2]))
    mu = m1 * m2 / (m1 + m2)
    I = mu * r0 ** 2
    assert abs(float(G[0, 0]) - 1.0 / I) < 1e-10


def test_linear_coordinates_metric():
    """Linear map x = ref + q1 v1 + q2 v2: Ginv_ij = sum m v_i.v_j."""
    rng = np.random.default_rng(0)
    natm = 4
    ref = rng.standard_normal((natm, 3))
    v1 = rng.standard_normal((natm, 3))
    v2 = rng.standard_normal((natm, 3))
    m = rng.uniform(1000, 4000, natm)

    def geom(q):
        return (jnp.asarray(ref) + q[0] * jnp.asarray(v1)
                + q[1] * jnp.asarray(v2))

    G, Ginv = gmatrix(geom, jnp.array([0.1, -0.2]), jnp.asarray(m))
    Gi_exact = np.array(
        [[np.sum(m[:, None] * v1 * v1), np.sum(m[:, None] * v1 * v2)],
         [np.sum(m[:, None] * v2 * v1), np.sum(m[:, None] * v2 * v2)]])
    assert np.allclose(np.asarray(Ginv), Gi_exact, atol=1e-8)
    assert np.allclose(np.asarray(G), np.linalg.inv(Gi_exact), atol=1e-10)


def test_gmatrix_grid_vmap():
    """Grid version matches pointwise; metric varies with q for a bend."""
    m = jnp.array([1836.0, 16 * 1836.0, 1836.0])
    r0 = 1.8

    def geom(q):
        # symmetric bend: two H about a fixed O
        th = q[0]
        return jnp.array([
            [r0 * jnp.sin(th), 0.0, r0 * jnp.cos(th)],
            [0.0, 0.0, 0.0],
            [-r0 * jnp.sin(th), 0.0, r0 * jnp.cos(th)]])

    qs = jnp.linspace(0.5, 1.2, 5)[:, None]
    Gs, Ginvs = gmatrix_grid(geom, qs, m)
    assert Gs.shape == (5, 1, 1)
    for i, q in enumerate(np.asarray(qs)):
        G, _ = gmatrix(geom, jnp.asarray(q), m)
        assert abs(float(Gs[i, 0, 0]) - float(G[0, 0])) < 1e-12
    # both H move on circles radius r0: Ginv = 2 m_H r0^2, q-independent
    assert np.allclose(np.asarray(Ginvs)[:, 0, 0], 2 * 1836.0 * r0 ** 2,
                       atol=1e-8)
