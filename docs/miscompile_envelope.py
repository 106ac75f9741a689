"""Automated miscompile-envelope probe (VERDICT round 4, task 8).

Turns the manual fresh-process matrix of `docs/miscompile_repro.py` into
ONE runnable: each (n, variant) cell runs in its own subprocess (a crash
kills the TPU worker process — isolation is the point), outcomes are
classified (ok / crash / timeout), and the result is emitted as
`MISCOMPILE_ENVELOPE.jsonl` together with a data-derived recommendation
for `HELMHOLTZ_TPU_HOSTLOOP_MIN_N` (the smallest probed n with ANY
crashing variant — the reroute must cover the weakest member of the nest
family, since full GMRES contains the `twoapply`/`arnoldi` structure).

Re-testing after a backend update is one command:

    python docs/miscompile_envelope.py --out MISCOMPILE_ENVELOPE.jsonl

Default matrix: the boundary sizes of the round-3/4 findings (1279 ok /
1407 bad / 2047 bad-even-for-nest) x the variants that localized the bug.
`--quick` probes the two boundary cells only; `--ns/--variants` override.
Each cell pays a full assemble + recompute-setup at its n, so the full
matrix is tens of minutes on the live chip — budget accordingly.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPRO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "miscompile_repro.py")


def probe(n: int, variant: str, timeout_s: float = 1800.0,
          chunk_loop: str | None = None) -> dict:
    env = dict(os.environ)
    if chunk_loop:
        env["HELMHOLTZ_TPU_RECOMPUTE_CHUNK_LOOP"] = chunk_loop
    t0 = time.time()
    try:
        cp = subprocess.run(
            [sys.executable, REPRO, str(n), variant],
            capture_output=True, text=True, timeout=timeout_s, env=env)
        wall = time.time() - t0
        tail = (cp.stdout + cp.stderr)[-4000:]
        if cp.returncode == 0 and f"RESULT {variant} n={n} ok=True" \
                in cp.stdout:
            outcome = "ok"
        elif "UNAVAILABLE" in tail or "worker process crashed" in tail \
                or cp.returncode < 0:
            outcome = "crash"
        else:
            outcome = "fail"
        detail = "" if outcome == "ok" else tail.strip().splitlines()[-1:]
    except subprocess.TimeoutExpired:
        wall = time.time() - t0
        outcome, detail = "timeout", [f"> {timeout_s:.0f}s"]
    return {"n": n, "variant": variant, "outcome": outcome,
            "wall_s": round(wall, 1), "chunk_loop": chunk_loop,
            "detail": detail}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+",
                    default=[1279, 1407, 2047])
    ap.add_argument("--variants", nargs="+",
                    default=["nest", "twoapply"])
    ap.add_argument("--quick", action="store_true",
                    help="probe only (1279, twoapply) ok-boundary and "
                         "(1407, twoapply) bad-boundary")
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--chunk-loop", default=None,
                    choices=["fori", "scan", "checkpoint"])
    ap.add_argument("--out", default=None, metavar="JSONL")
    args = ap.parse_args(argv)

    cells = ([(1279, "twoapply"), (1407, "twoapply")] if args.quick
             else [(n, v) for n in args.ns for v in args.variants])
    rows = []
    for n, variant in cells:
        rec = probe(n, variant, args.timeout, args.chunk_loop)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    bad = sorted(r["n"] for r in rows if r["outcome"] != "ok")
    ok_ns = sorted(r["n"] for r in rows if r["outcome"] == "ok")
    summary = {
        "tag": "miscompile_envelope",
        "probed": [[n, v] for n, v in cells],
        "largest_all_ok_n": (max(nn for nn in ok_ns
                                 if all(r["outcome"] == "ok"
                                        for r in rows if r["n"] == nn))
                             if ok_ns and any(
                                 all(r["outcome"] == "ok"
                                     for r in rows if r["n"] == nn)
                                 for nn in ok_ns) else None),
        "smallest_bad_n": bad[0] if bad else None,
        "recommended_hostloop_min_n": bad[0] if bad else "off",
        "backend": os.environ.get("JAX_PLATFORMS", "(default)"),
        "date": time.strftime("%Y-%m-%d"),
        "note": "recommended_hostloop_min_n = smallest probed n with any "
                "crashing variant; 'off' means the compiled nest survived "
                "every probe and the reroute can be disabled "
                "(HELMHOLTZ_TPU_HOSTLOOP_MIN_N=off).",
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            for r in rows + [summary]:
                fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
