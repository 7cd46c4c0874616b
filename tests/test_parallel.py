"""Multi-device sharding tests on the virtual 8-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8 — SURVEY.md §4's
TPU stand-in for multi-chip)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pyqed_tpu.parallel import make_mesh, shard_along, pad_to_multiple


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


class TestMesh:
    @requires_8
    def test_make_mesh_axes(self):
        mesh = make_mesh({"ado": 8})
        assert mesh.devices.size == 8
        mesh2 = make_mesh({"dp": 2, "tp": -1})
        assert mesh2.shape["tp"] == 4

    def test_bad_sizes_raise(self):
        with pytest.raises(ValueError):
            make_mesh({"a": 3})

    @requires_8
    def test_pad_to_multiple(self):
        x = jnp.ones((10, 3))
        y, n = pad_to_multiple(x, 8)
        assert y.shape == (16, 3) and n == 10


class TestShardedSolvers:
    @requires_8
    def test_heom_sharded_step_matches_unsharded(self):
        """ADO-axis sharding must not change the numerics."""
        from __graft_entry__ import _heom_setup, _heom_step_fn
        H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
            nsite=2, nexp_per_bath=2, lmax=3)
        step, nado, n = _heom_step_fn(H, keys, plus_idx, minus_idx, Q,
                                      cvec, nuvec)
        rng = np.random.default_rng(0)
        a_re = rng.standard_normal((nado, n, n)).astype(np.float32)
        a_im = rng.standard_normal((nado, n, n)).astype(np.float32)

        ref = jax.jit(step)(a_re, a_im)

        mesh = make_mesh({"ado": 8})
        pad = (-nado) % 8

        def padded_step(re, im):
            r, i = step(re[:nado], im[:nado])
            r = jnp.concatenate([r, jnp.zeros((pad, n, n), r.dtype)])
            i = jnp.concatenate([i, jnp.zeros((pad, n, n), i.dtype)])
            return r, i

        sh = NamedSharding(mesh, P("ado", None, None))
        a_re_p = jax.device_put(np.concatenate(
            [a_re, np.zeros((pad, n, n), np.float32)]), sh)
        a_im_p = jax.device_put(np.concatenate(
            [a_im, np.zeros((pad, n, n), np.float32)]), sh)
        out = jax.jit(padded_step, in_shardings=(sh, sh),
                      out_shardings=(sh, sh))(a_re_p, a_im_p)
        assert np.allclose(np.asarray(out[0])[:nado], np.asarray(ref[0]),
                           atol=1e-5)
        assert np.allclose(np.asarray(out[1])[:nado], np.asarray(ref[1]),
                           atol=1e-5)

    @requires_8
    def test_frequency_sharded_echo_map(self):
        """omega1-sharded photon-echo map equals the replicated result."""
        from pyqed_tpu.signal.sos import _photon_echo
        E = jnp.asarray([0.0, 1.0, 2.05])
        dip = jnp.asarray(np.ones((3, 3)) - np.eye(3))
        gamma = jnp.asarray([0.01, 0.01, 0.01])
        w = jnp.asarray(np.linspace(0.8, 1.2, 32))

        def pe(w1):
            S = _photon_echo(E, dip, -w1, w, 0.0, [0], [1], [2], gamma)
            return jnp.real(S), jnp.imag(S)

        ref = pe(w)
        mesh = make_mesh({"omega": 8})
        wsh = NamedSharding(mesh, P("omega"))
        w_p = jax.device_put(np.asarray(w), wsh)
        out = jax.jit(pe, in_shardings=(wsh,),
                      out_shardings=NamedSharding(mesh, P("omega", None)))(w_p)
        assert np.allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-10)

    @requires_8
    def test_walker_sharded_dmc(self):
        """DMC with the walker axis sharded over the mesh produces the same
        physics (HO ground state)."""
        from pyqed_tpu.qmc import DMC
        mesh = make_mesh({"walker": 8})
        dmc = DMC(ndim=1, potential=lambda x: 0.5 * jnp.sum(x**2))
        E, trace, xf = dmc.run_sharded(jax.random.PRNGKey(0), mesh,
                                       nwalkers=4096, nsteps=800, dt=0.02,
                                       eref=0.5, nequil=300)
        assert np.isclose(float(E), 0.5, atol=0.03)
