"""Real multi-process execution test: two OS processes x 4 virtual CPU
devices joined by `jax.distributed` into one 8-device mesh, running the
full distributed preconditioned solve (SURVEY.md section 5 'distributed
communication backend'; upgrades dist.multihost from a single-process
no-op to an exercised path — cross-process collectives emulate DCN)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_solve():
    n, b = 32, 3
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), coord, str(n), str(b)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes agree on the (replicated) solve outcome
    assert all(o["global_devices"] == 8 for o in outs)
    assert all(o["converged"] for o in outs)
    assert outs[0]["iterations"] == outs[1]["iterations"]
    np.testing.assert_allclose(outs[0]["residual_norm"],
                               outs[1]["residual_norm"], rtol=1e-12)

    # and it matches the single-process 8-virtual-device reference
    from helmholtz_tpu import HelmholtzConfig, assemble_problem
    from helmholtz_tpu.dist import (dist_state_from_preconditioner,
                                    distributed_solve, make_mesh)
    from helmholtz_tpu.fd import stencil
    from helmholtz_tpu.precond import setup_preconditioner

    cfg = HelmholtzConfig(n=n, b=b, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_ = setup_preconditioner(prob.A, hm, cfg.b)
    ref = distributed_solve(make_mesh(8), prob.A,
                            dist_state_from_preconditioner(P_),
                            prob.f_grid, rtol=1e-3, maxiter=200)
    assert outs[0]["iterations"] == int(ref.iterations)
    np.testing.assert_allclose(outs[0]["residual_norm"],
                               float(ref.residual_norm), rtol=1e-9)
