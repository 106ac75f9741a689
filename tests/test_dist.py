"""Distributed tests on the virtual 8-device CPU mesh: shard-vs-replicated
equivalence for SpMV, the staged sweep, and the full solve (SURVEY.md
section 4 'distributed tests without a cluster')."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from helmholtz_tpu import HelmholtzConfig, assemble_problem
from helmholtz_tpu.dist import (dist_state_from_preconditioner,
                                distributed_solve, halo_stencil_matvec,
                                make_mesh)
from helmholtz_tpu.fd import stencil
from helmholtz_tpu.ops.spmv import stencil_matvec, stencil_matvec_flat
from helmholtz_tpu.precond import setup_preconditioner
from helmholtz_tpu.precond.sweeping import apply_preconditioner
from helmholtz_tpu.solve import gmres

NDEV = 8


def _problem(n=32, b=3, wave_num=2.0, const=20.0):
    cfg = HelmholtzConfig(n=n, b=b, wave_num=wave_num, const=const)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_ = setup_preconditioner(prob.A, hm, cfg.b)
    return cfg, prob, P_


def test_mesh_has_8_devices():
    assert len(jax.devices()) == NDEV


def test_halo_spmv_matches_single_device():
    cfg, prob, _ = _problem()
    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))

    def local(A_loc, u_loc):
        return halo_stencil_matvec(A_loc, u_loc, "layers", NDEV)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("layers"), prob.A), P("layers")),
        out_specs=P("layers")))
    y_dist = np.asarray(fn(prob.A, u))
    y_ref = np.asarray(stencil_matvec(prob.A, u))
    np.testing.assert_allclose(y_dist, y_ref, rtol=1e-12, atol=1e-9)


def test_staged_sweep_matches_single_device():
    cfg, prob, P_ = _problem()
    state = dist_state_from_preconditioner(P_)
    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))

    from helmholtz_tpu.dist.sweep import dist_apply_preconditioner
    from helmholtz_tpu.dist.partition import DistSweepState

    row, repl = P("layers"), P()
    in_specs = (
        DistSweepState(
            G_pad=jax.tree.map(lambda _: row, state.G_pad),
            TF=jax.tree.map(lambda _: repl, state.TF),
            hf_cs=jax.tree.map(lambda _: repl, state.hf_cs),
            hf_cn=jax.tree.map(lambda _: repl, state.hf_cn),
            a_cs=jax.tree.map(lambda _: row, state.a_cs),
            a_cn=jax.tree.map(lambda _: row, state.a_cn),
            b=state.b, d2_replace=state.d2_replace),
        row)

    fn = jax.jit(jax.shard_map(
        lambda S, fl: dist_apply_preconditioner(
            S, fl, axis_name="layers", n_devices=NDEV,
            n_rows_global=cfg.n),
        mesh=mesh, in_specs=in_specs, out_specs=row))
    u_dist = np.asarray(fn(state, f))
    u_ref = np.asarray(apply_preconditioner(P_, f))
    np.testing.assert_allclose(u_dist, u_ref, rtol=1e-9, atol=1e-9)


def test_distributed_solve_matches_single_device():
    cfg, prob, P_ = _problem()
    state = dist_state_from_preconditioner(P_)
    mesh = make_mesh(NDEV)

    res_d = distributed_solve(mesh, prob.A, state, prob.f_grid,
                              rtol=1e-3, maxiter=200)
    res_s = gmres(lambda v: stencil_matvec_flat(prob.A, v), prob.f_vec,
                  M=P_, restart=20, rtol=1e-3, maxiter=200)
    assert bool(res_d.converged)
    assert int(res_d.iterations) == int(res_s.iterations)
    np.testing.assert_allclose(res_d.x.to_np().reshape(-1),
                               np.asarray(res_s.x), rtol=1e-6, atol=1e-9)


def test_distributed_solve_unpreconditioned():
    cfg, prob, _ = _problem(n=16, b=2)
    mesh = make_mesh(NDEV)
    res = distributed_solve(mesh, prob.A, None, prob.f_grid,
                            rtol=1e-2, maxiter=2000)
    A = prob.A.toscipy()
    f = np.asarray(prob.f_vec)
    x = res.x.to_np().reshape(-1)
    assert np.linalg.norm(A @ x - f) / np.linalg.norm(f) <= 1.1e-2


def test_bad_partition_raises():
    cfg, prob, P_ = _problem(n=30, b=3)  # 30 % 8 != 0
    state = dist_state_from_preconditioner(P_)
    mesh = make_mesh(NDEV)
    with pytest.raises(ValueError, match="not divisible"):
        distributed_solve(mesh, prob.A, state, prob.f_grid)
    cfg2, prob2, P2 = _problem(n=32, b=6)  # b >= n_loc = 4
    with pytest.raises(ValueError, match="must be <"):
        distributed_solve(mesh, prob2.A, dist_state_from_preconditioner(P2),
                          prob2.f_grid)


def test_staged_sweep_padded_g_matches_single_device():
    """The distributed sweep must also accept the lane-padded G layout the
    TPU setup produces (pad_lanes=True -> (.., 128, 128) blocks at n=32)."""
    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_plain = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=False)
    P_pad = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=True)
    assert P_pad.G.re.shape[-1] == 128

    state = dist_state_from_preconditioner(P_pad)
    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))

    from helmholtz_tpu.dist.sweep import dist_apply_preconditioner
    from helmholtz_tpu.dist.partition import DistSweepState

    row, repl = P("layers"), P()
    in_specs = (
        DistSweepState(
            G_pad=jax.tree.map(lambda _: row, state.G_pad),
            TF=jax.tree.map(lambda _: repl, state.TF),
            hf_cs=jax.tree.map(lambda _: repl, state.hf_cs),
            hf_cn=jax.tree.map(lambda _: repl, state.hf_cn),
            a_cs=jax.tree.map(lambda _: row, state.a_cs),
            a_cn=jax.tree.map(lambda _: row, state.a_cn),
            b=state.b, d2_replace=state.d2_replace),
        row)

    fn = jax.jit(jax.shard_map(
        lambda S, fl: dist_apply_preconditioner(
            S, fl, axis_name="layers", n_devices=NDEV,
            n_rows_global=cfg.n),
        mesh=mesh, in_specs=in_specs, out_specs=row))
    u_dist = np.asarray(fn(state, f))
    u_ref = np.asarray(apply_preconditioner(P_plain, f, impl="xla"))
    np.testing.assert_allclose(u_dist, u_ref, rtol=1e-9, atol=1e-9)


def _sweep_specs(state):
    from helmholtz_tpu.dist.partition import DistSweepState

    row, repl = P("layers"), P()
    return DistSweepState(
        G_pad=jax.tree.map(lambda _: row, state.G_pad),
        TF=jax.tree.map(lambda _: repl, state.TF),
        hf_cs=jax.tree.map(lambda _: repl, state.hf_cs),
        hf_cn=jax.tree.map(lambda _: repl, state.hf_cn),
        a_cs=jax.tree.map(lambda _: row, state.a_cs),
        a_cn=jax.tree.map(lambda _: row, state.a_cn),
        b=state.b, d2_replace=state.d2_replace,
        g_w=None if state.g_w is None else row,
        g_lo=None if state.g_lo is None else row,
        g_stride=state.g_stride)


def _dist_apply(state, f, n_rows, impl="auto", in_spec=None):
    from helmholtz_tpu.dist.sweep import dist_apply_preconditioner

    mesh = make_mesh(NDEV)
    row = P("layers") if f.ndim == 2 else P(None, "layers")
    fn = jax.jit(jax.shard_map(
        lambda S, fl: dist_apply_preconditioner(
            S, fl, axis_name="layers", n_devices=NDEV,
            n_rows_global=n_rows, impl=impl),
        mesh=mesh, in_specs=(_sweep_specs(state), row), out_specs=row,
        check_vma=False))
    return np.asarray(fn(state, f))


def test_staged_sweep_pallas_impl_matches_single_device():
    """The Pallas local-sweep path of the distributed apply (interpret mode
    on CPU) must bit-match the XLA staged path and the single-device apply
    (VERDICT round 1 item 2)."""
    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_pad = setup_preconditioner(prob.A, hm, cfg.b, pad_lanes=True)
    state = dist_state_from_preconditioner(P_pad)
    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))

    u_pallas = _dist_apply(state, f, cfg.n, impl="pallas")
    u_xla = _dist_apply(state, f, cfg.n, impl="xla")
    u_ref = np.asarray(apply_preconditioner(P_pad, f, impl="xla"))
    np.testing.assert_allclose(u_pallas, u_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(u_xla, u_ref, rtol=1e-9, atol=1e-9)


def test_staged_sweep_batched_matches_vmapped_single():
    """A batch of RHS through one staged schedule == per-RHS applies."""
    cfg, prob, P_ = _problem()
    state = dist_state_from_preconditioner(P_)
    rng = np.random.default_rng(8)
    F = jnp.asarray(rng.standard_normal((3, cfg.n, cfg.n))
                    + 1j * rng.standard_normal((3, cfg.n, cfg.n)))

    u_dist = _dist_apply(state, F, cfg.n, impl="xla")
    u_ref = np.asarray(jax.vmap(
        lambda f: apply_preconditioner(P_, f, impl="xla"))(F))
    np.testing.assert_allclose(u_dist, u_ref, rtol=1e-9, atol=1e-9)


def test_staged_sweep_boundary_b_equals_nloc_minus_1():
    """b = n_loc - 1: the F band fills almost all of device 0 (the
    b ~ n_loc boundary VERDICT round 1 flagged as untested)."""
    cfg, prob, P_ = _problem(n=64, b=7)   # n_loc = 8
    state = dist_state_from_preconditioner(P_)
    rng = np.random.default_rng(9)
    f = jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n)))

    u_dist = _dist_apply(state, f, cfg.n, impl="xla")
    u_ref = np.asarray(apply_preconditioner(P_, f, impl="xla"))
    np.testing.assert_allclose(u_dist, u_ref, rtol=1e-9, atol=1e-9)


def test_distributed_solve_batched_rhs():
    """distributed_solve with a (B, L, n) batch: every RHS converges and
    matches its own single-device solve."""
    cfg, prob, P_ = _problem()
    state = dist_state_from_preconditioner(P_)
    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(10)
    F = jnp.stack([
        prob.f_grid,
        jnp.asarray(rng.standard_normal((cfg.n, cfg.n))
                    + 1j * rng.standard_normal((cfg.n, cfg.n))),
    ])

    res = distributed_solve(mesh, prob.A, state, F, rtol=1e-3, maxiter=200)
    assert res.x.shape == (2, cfg.n * cfg.n)
    X = res.x.to_np()
    A = prob.A.toscipy()
    for k in range(2):
        fk = np.asarray(F[k]).reshape(-1)
        xk = X[k]
        # legacy-tol semantics are on the preconditioned residual; check
        # the true residual against a modest multiple of rtol
        assert np.linalg.norm(A @ xk - fk) / np.linalg.norm(fk) < 5e-2
        r_single = gmres(lambda v: stencil_matvec_flat(prob.A, v),
                         jnp.asarray(fk), M=P_, restart=20, rtol=1e-3,
                         maxiter=200)
        np.testing.assert_allclose(xk, np.asarray(r_single.x),
                                   rtol=1e-5, atol=1e-8)


def test_halo_overlap_dataflow_schedule():
    """Overlap guard (BASELINE config 4): both ppermutes must be issued
    BEFORE the interior compute in program order, and their outputs
    consumed only by the trailing boundary fixup — the dataflow shape that
    lets XLA's latency-hiding scheduler run the collective-permute under
    the interior 5-point apply."""
    cfg, prob, _ = _problem()
    n_loc = cfg.n // NDEV

    def local(A_loc, u_loc):
        return halo_stencil_matvec(A_loc, u_loc, "layers", NDEV)

    mesh = make_mesh(NDEV)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("layers"), prob.A), P("layers")),
        out_specs=P("layers"))
    closed = jax.make_jaxpr(fn)(prob.A,
                                jnp.zeros((cfg.n, cfg.n), prob.A.dtype))
    # descend into the shard_map body
    [smap_eqn] = [e for e in closed.jaxpr.eqns
                  if "shard_map" in e.primitive.name]
    body = smap_eqn.params["jaxpr"]
    eqns = body.eqns if hasattr(body, "eqns") else body.jaxpr.eqns
    perm_idx = [i for i, e in enumerate(eqns)
                if "ppermute" in e.primitive.name]
    assert len(perm_idx) == 2, [e.primitive.name for e in eqns]
    perm_vars = set()
    for i in perm_idx:
        perm_vars.update(map(id, eqns[i].outvars))
    consumers = [i for i, e in enumerate(eqns)
                 if any(id(v) in perm_vars for v in e.invars)]
    assert consumers, "permute results must be consumed"
    # interior work (the big elementwise eqns) sits between issue and use
    first_use = min(consumers)
    interior = [i for i, e in enumerate(eqns)
                if e.primitive.name in ("mul", "add") and e.outvars and
                getattr(e.outvars[0].aval, "shape", ()) == (n_loc, cfg.n)]
    assert interior, "expected interior elementwise work"
    n_between = sum(1 for i in interior if max(perm_idx) < i < first_use)
    assert n_between >= 3, (perm_idx, first_use, interior)


def test_scaling_harness_smoke():
    """bench.scaling runs end-to-end on the virtual mesh and reports
    efficiencies for every device count."""
    from helmholtz_tpu.bench.scaling import scaling_report

    rep = scaling_report(strong_n=32, weak_rows_per_dev=8, b=3,
                         ndevs=(1, 2, 4))
    assert rep["backend"] == "cpu-virtual"
    assert [r["n_devices"] for r in rep["strong"]] == [1, 2, 4]
    for r in rep["strong"]:
        assert r["converged"] and r["solve_s"] > 0
        assert 0 < r["strong_efficiency"]
    for r in rep["weak_apply_constant_work"]:
        assert 0 < r["weak_efficiency"]
    for r in rep["weak_solve_square_grids"]:
        assert r["converged"]
    assert len(rep["apply"]) == 3


def test_staged_sweep_bf16_g_matches_single_device():
    """Distributed sweep with bf16-stored G (the reduced-precision factor
    stack): matches the single-device bf16 apply."""
    cfg = HelmholtzConfig(n=32, b=3, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1", complex_dtype=jnp.complex64)
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity,
                                   complex_dtype=jnp.complex64)
    P_ = setup_preconditioner(prob.A, hm, cfg.b, g_dtype=jnp.bfloat16)
    state = dist_state_from_preconditioner(P_)
    assert state.G_pad.re.dtype == jnp.bfloat16
    rng = np.random.default_rng(11)
    f = jnp.asarray((rng.standard_normal((cfg.n, cfg.n))
                     + 1j * rng.standard_normal((cfg.n, cfg.n)))
                    .astype(np.complex64))
    u_dist = _dist_apply(state, f, cfg.n, impl="xla")
    u_ref = np.asarray(apply_preconditioner(P_, f, impl="xla"))
    np.testing.assert_allclose(u_dist, u_ref, rtol=1e-5,
                               atol=1e-5 * np.abs(u_ref).max())


def test_halo_overlap_tpu_hlo_schedule():
    """VERDICT r2 item 7: pin the ACTUAL TPU schedule, not just jaxpr
    dataflow.  AOT-compile the halo SpMV for a real 4-chip v5e topology
    (deviceless — jax.experimental.topologies) and assert in the optimized,
    scheduled HLO that compute fusions are placed BETWEEN
    collective-permute-start and collective-permute-done: the
    latency-hiding scheduler really does run the halo exchange under the
    interior stencil apply."""
    import re

    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x2x1")
    except Exception as e:          # no TPU PJRT plugin in this env
        pytest.skip(f"deviceless TPU AOT unavailable: {e}")
    import numpy as _np
    from jax.sharding import Mesh, NamedSharding
    from helmholtz_tpu.core.complexlib import CArray, complexify
    from helmholtz_tpu.core.sparse import Stencil5

    ndev, n = 4, 256
    mesh = Mesh(_np.array(topo.devices[:ndev]), ("layers",))
    row = NamedSharding(mesh, P("layers"))

    def local(A_loc_pair, u_pair):
        A_loc = complexify(A_loc_pair)
        out = halo_stencil_matvec(A_loc, complexify(u_pair), "layers", ndev)
        return CArray(jnp.real(out), jnp.imag(out))

    leaf = jax.ShapeDtypeStruct((n, n), jnp.float32, sharding=row)
    pair = CArray(leaf, leaf)
    A_pair = Stencil5(cc=pair, cw=pair, ce=pair, cs=pair, cn=pair)
    spec5 = Stencil5(*([CArray(P("layers"), P("layers"))] * 5))
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda s: s, spec5), P("layers")),
        out_specs=P("layers"), check_vma=False))
    txt = fn.lower(A_pair, pair).compile().as_text()
    assert "is_scheduled=true" in txt
    lines = txt.splitlines()
    starts = [i for i, l in enumerate(lines)
              if "collective-permute-start" in l and "=" in l]
    dones = [i for i, l in enumerate(lines)
             if "collective-permute-done" in l and "=" in l]
    assert starts and dones, "no async collective-permute pair in HLO"
    overlapped = [i for i, l in enumerate(lines)
                  if re.search(r"fusion\(", l)
                  and min(starts) < i < max(dones)]
    # the interior stencil apply (several fusions) must sit between the
    # permute start and its done in the final schedule
    assert len(overlapped) >= 2, (starts, dones, overlapped)
