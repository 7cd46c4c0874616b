"""Multi-chip sharding demo on a virtual 8-device CPU mesh.

Runs the three production shardings (the same ones the driver's
multichip dryrun validates) end to end and checks sharded == unsharded:
  1. HEOM with the ADO (hierarchy) axis sharded,
  2. photon-echo response map with the pump-frequency axis sharded,
  3. SPO2 wavepacket with the leading grid axis sharded (context
     parallelism — the FFT along it becomes an XLA all-to-all).
On real hardware the same code runs over an ICI mesh; here
--xla_force_host_platform_device_count=8 stands in (SURVEY.md §4)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.parallel import make_mesh
from pyqed_tpu.open.heom import HEOMSolver
from pyqed_tpu.open.bath import DrudeBath
from pyqed_tpu.signal.sos import photon_echo_t2series
from pyqed_tpu.models.mol import Mol
from pyqed_tpu.grid.spo import SPO2

print("devices:", len(jax.devices()))
mesh = make_mesh({"shard": 8})

# 1 ---- ADO-sharded HEOM
H = np.array([[1.0, 0.2], [0.2, -1.0]])
Q = np.diag([1.0, -1.0])
bath = DrudeBath(temperature=1.0, cutoff=0.5, reorg=0.1)
c, nu = bath.pade(1)
rho0 = np.diag([1.0, 0.0]).astype(complex)
ops = [np.diag([1.0, 0.0])]
r1 = HEOMSolver(H, bath=[(Q, c, nu)], lmax=4).run(
    rho0, dt=0.002, nt=200, e_ops=ops, mesh=mesh)
r0 = HEOMSolver(H, bath=[(Q, c, nu)], lmax=4).run(
    rho0, dt=0.002, nt=200, e_ops=ops)
d1 = float(jnp.max(jnp.abs(r1.observables - r0.observables)))
print(f"HEOM ADO-sharded == unsharded: {d1:.2e}")

# 2 ---- omega-sharded photon echo
E = np.array([0.0, 1.0, 2.05, 2.1])
dip = np.random.default_rng(1).random((4, 4))
dip = dip + dip.T
mol = Mol(np.diag(E), dip)
mol.gamma = np.full(4, 0.01)
w = np.linspace(0.8, 1.2, 64)
S1 = photon_echo_t2series(mol, w, w, [0.0, 0.5], e_idx=[1], f_idx=[2, 3],
                          mesh=mesh)
S0 = photon_echo_t2series(mol, w, w, [0.0, 0.5], e_idx=[1], f_idx=[2, 3])
d2 = float(jnp.max(jnp.abs(S1 - S0)))
print(f"PE omega-sharded == unsharded:  {d2:.2e}")

# 3 ---- grid-sharded SPO2 (context parallelism)
x = np.linspace(-6, 6, 64, endpoint=False)
y = np.linspace(-6, 6, 32, endpoint=False)
X, Y = np.meshgrid(x, y, indexing="ij")
surf = [0.5 * (X**2 + Y**2), 0.5 * (X**2 + Y**2) + 1.0]
cpl = [[(0, 1), 0.1 * np.exp(-X**2)]]
psi0 = np.zeros((64, 32, 2), complex)
psi0[:, :, 0] = np.exp(-X**2 - Y**2)
sA = SPO2(x, y, masses=[1.0, 1.0], nstates=2, mesh=mesh, kernel="xla")
sA.set_DPES(surf, cpl)
rA = sA.run(psi0, dt=0.01, nt=50, nout=50)
sB = SPO2(x, y, masses=[1.0, 1.0], nstates=2, kernel="xla")
sB.set_DPES(surf, cpl)
rB = sB.run(psi0, dt=0.01, nt=50, nout=50)
d3 = float(jnp.max(jnp.abs(rA.psi - rB.psi)))
print(f"SPO grid-sharded == unsharded:  {d3:.2e}")

assert max(d1, d2, d3) < 1e-10
print("ALL SHARDINGS CONSISTENT")
