"""Worker process for the real multi-process (multi-host-emulated) test.

Launched twice by tests/test_multihost.py: two OS processes, each with 4
virtual CPU devices, joined through `jax.distributed` into one 8-device
global mesh — the same initialization path a real pod slice uses
(dist.multihost; cross-process collectives stand in for DCN).

Usage: python multihost_worker.py <process_id> <coordinator> <n> <b>
Prints one JSON line with the solve summary.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    proc_id = int(sys.argv[1])
    coord = sys.argv[2]
    n = int(sys.argv[3])
    b = int(sys.argv[4])

    from helmholtz_tpu import HelmholtzConfig, assemble_problem
    from helmholtz_tpu.dist import (dist_state_from_preconditioner,
                                    distributed_solve)
    from helmholtz_tpu.dist.multihost import global_layer_mesh, initialize
    from helmholtz_tpu.fd import stencil
    from helmholtz_tpu.precond import setup_preconditioner

    info = initialize(coord, 2, proc_id)
    assert info["processes"] == 2, info
    assert info["global_devices"] == 8, info

    cfg = HelmholtzConfig(n=n, b=b, wave_num=2.0, const=20.0)
    prob = assemble_problem(cfg, "c1_f1")
    hm = stencil.build_hm_stencils(cfg.n, cfg.b, cfg.const, cfg.eta,
                                   cfg.omega, cfg.h, prob.c_full,
                                   fidelity=cfg.fidelity)
    P_ = setup_preconditioner(prob.A, hm, cfg.b)
    state = dist_state_from_preconditioner(P_)

    mesh = global_layer_mesh()
    res = distributed_solve(mesh, prob.A, state, prob.f_grid,
                            rtol=1e-3, maxiter=200)
    # replicated outputs are addressable on every process
    print(json.dumps({
        "process": proc_id,
        "global_devices": info["global_devices"],
        "iterations": int(res.iterations),
        "converged": bool(res.converged),
        "residual_norm": float(res.residual_norm),
    }), flush=True)


if __name__ == "__main__":
    main()
