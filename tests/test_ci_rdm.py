"""CI 1-RDMs and natural orbitals (reference: pyqed/qchem/dvr/casci.py
make_rdm1/natural_orbitals — the GTO CI family here)."""
import numpy as np
import pytest


def _h2(r=1.4):
    from pyqed_tpu.qchem import Molecule
    return Molecule([("H", (0, 0, 0.0)), ("H", (0, 0, r))],
                    basis="sto-3g").RHF().run()


class TestRDM1:
    def test_rdm1_so_matches_operator_oracle(self):
        """D[p,q] == <Psi| a+_p a_q |Psi> built INDEPENDENTLY as a dense
        operator through build_hamiltonian (one-hot h, g=0) — pins the
        sign/phase conventions of the direct RDM loop."""
        from pyqed_tpu.qchem.ci import FCI, build_hamiltonian

        ci = FCI(_h2())
        ci.run()
        D = ci._rdm1_so()
        c = np.asarray(ci.civec)[:, 0]
        ns = ci.ns
        for p in range(ns):
            for q in range(ns):
                h = np.zeros((ns, ns))
                h[p, q] = 1.0
                M = build_hamiltonian(ci.dets, h, np.zeros((ns,) * 4))
                assert abs(D[p, q] - c @ M @ c) < 1e-12

    def test_trace_and_hermiticity(self):
        from pyqed_tpu.qchem.ci import CISD

        ci = CISD(_h2())
        ci.run()
        D = ci.make_rdm1()
        assert abs(np.trace(D) - 2.0) < 1e-12
        assert np.allclose(D, D.T, atol=1e-12)
        # AO repr traces against the overlap metric
        mol = ci.mf.mol
        S = np.asarray(mol.intor()[0])
        Dao = ci.make_rdm1(ao_repr=True)
        assert abs(np.sum(Dao * S) - 2.0) < 1e-10

    def test_natural_occupations_dissociation(self):
        """Static correlation: at equilibrium the bonding NO holds ~1.96
        electrons; at r=4.5 bohr the two NOs approach 1,1."""
        from pyqed_tpu.qchem.ci import FCI

        occ_eq, _ = FCI(_h2(1.4)).natural_orbitals()
        assert occ_eq[0] > 1.9 and occ_eq[1] < 0.1
        assert abs(occ_eq.sum() - 2.0) < 1e-12
        occ_st, _ = FCI(_h2(7.0)).natural_orbitals()
        assert abs(occ_st[0] - 1.0) < 0.02 and abs(occ_st[1] - 1.0) < 0.02

    def test_casci_rdm_embeds_core(self):
        """LiH CASCI(2,2): core orbital pinned at occupation 2, active
        block matches the FCI natural structure, trace = nelec."""
        from pyqed_tpu.qchem import Molecule
        from pyqed_tpu.qchem.ci import CASCI

        mf = Molecule([("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))],
                      basis="sto-3g").RHF().run()
        cas = CASCI(mf, ncas=2, nelecas=2)
        cas.run()
        D = cas.make_rdm1()
        assert abs(np.trace(D) - 4.0) < 1e-12
        assert abs(D[0, 0] - 2.0) < 1e-12
        occ, C = cas.natural_orbitals()
        assert abs(occ[0] - 2.0) < 1e-12 and occ[1] > 1.8
        assert C.shape[0] == np.asarray(mf.mo_coeff).shape[0]
