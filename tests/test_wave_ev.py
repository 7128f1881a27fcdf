"""wave-ev spectral tool: mapped (--align) assembly semantics and the
alpha cut-placement study (reference applications/wave/wave-ev.cc).

--align deforms the mesh with a clamping MappingQCache so the interface
coincides with the outermost node (wave-ev.cc:246-262); with the domain
truncated to the covered cells this compresses exactly the two outermost
cells by (1 - alpha).  We verify the per-cell-Jacobian assembly exactly
and the study's headline phenomenon: the unstabilized cut mass matrix
degenerates as alpha -> 0 while the aligned (deformed, uncut) one stays
uniformly well conditioned.
"""

import numpy as np
import pytest

from gdm.grid import Grid
from gdm.ops1d import assemble_1d, mass_1d, stiffness_1d
from gdm.tools.eigen import build_ev_operators, condition_number


def test_mapped_assembly_uniform_scale():
    p, n, h = 3, 12, 0.25
    jac = np.full(n, 2.0 * h)
    M = assemble_1d(p, n, h, 0, 0, jac=jac)
    S = assemble_1d(p, n, h, 1, 1, jac=jac)
    np.testing.assert_allclose(M.band, 2.0 * mass_1d(p, n, h).band,
                               rtol=1e-14, atol=1e-16)
    np.testing.assert_allclose(S.band, 0.5 * stiffness_1d(p, n, h).band,
                               rtol=1e-14, atol=1e-16)


def test_mapped_assembly_integral_identities():
    """sum(M) integrates 1 over the mapped domain; S annihilates
    constants regardless of the deformation."""
    p, n, h, alpha = 5, 14, 0.1, 0.37
    jac = np.full(n, h)
    jac[0] = jac[-1] = h * (1 - alpha)
    M = assemble_1d(p, n, h, 0, 0, jac=jac).full()
    S = assemble_1d(p, n, h, 1, 1, jac=jac).full()
    np.testing.assert_allclose(M.sum(), (n - 2 * alpha) * h, rtol=1e-13)
    np.testing.assert_allclose(S @ np.ones(n + 1), 0.0, atol=1e-12)
    # partition of unity: row sums of M are the mapped lumped masses
    np.testing.assert_allclose(M.sum(axis=0).sum(), M.sum(), rtol=1e-14)


def test_align_alpha_zero_is_uniform():
    grid, _, M, S = build_ev_operators(
        fe_degree=3, n_subdivisions_1D=20, radius=1.0, alpha=0.0,
        align=True)
    n = grid.cells[0]
    h = grid.h[0]
    np.testing.assert_allclose(M, mass_1d(3, n, h).full(), rtol=1e-14,
                               atol=1e-16)
    np.testing.assert_allclose(S, stiffness_1d(3, n, h).full(), rtol=1e-14,
                               atol=1e-16)


def test_alpha_study_align_vs_cut():
    """The experiment the tool exists for (wave/README.MD): small cut
    fraction alpha degrades kappa(M) without ghost penalty; the aligned
    (mesh-deformed) discretization stays well conditioned."""
    alpha = 0.01
    _, _, M_cut, _ = build_ev_operators(
        fe_degree=3, n_subdivisions_1D=20, radius=1.0, alpha=alpha,
        align=False, gp_scale=0.0)
    _, _, M_al, _ = build_ev_operators(
        fe_degree=3, n_subdivisions_1D=20, radius=1.0, alpha=alpha,
        align=True)
    k_cut, _ = condition_number(M_cut)
    k_al, _ = condition_number(M_al)
    k0, _ = condition_number(
        build_ev_operators(fe_degree=3, n_subdivisions_1D=20, radius=1.0,
                           alpha=0.0, align=True)[2])
    assert k_cut > 50 * k_al, (k_cut, k_al)
    assert k_al < 10 * k0, (k_al, k0)


def test_wave_ev_cli_align(capsys, tmp_path, monkeypatch):
    from gdm.tools import wave_ev

    monkeypatch.chdir(tmp_path)
    wave_ev.main([
        "--compute_kappa_m", "--compute_gev", "--fe_degree", "3",
        "--n_subdivisions", "20", "--alpha", "0.3", "--align",
        "--write_m", "--write_ascii", "--file_prefix", "out",
    ])
    out = capsys.readouterr().out
    assert "condition number:" in out and "max ev(M\\S):" in out
    assert (tmp_path / "out_M.dat").exists()


def test_wave_ev_cli_alpha_2d(capsys):
    """--alpha interface-placement study in 2D (round 4: the cut
    spectral path is dim-generic; the reference tool hardcodes dim=1,
    wave-ev.cc:306)."""
    from gdm.tools import wave_ev

    wave_ev.main([
        "--compute_kappa_m", "--fe_degree", "3", "--n_subdivisions", "12",
        "--alpha", "0.3", "--dim", "2", "--rescale_matrix",
    ])
    out = capsys.readouterr().out
    assert "condition number:" in out
