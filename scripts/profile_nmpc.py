#!/usr/bin/env python
"""Where do the NMPC solves/s go? (VERDICT r3 #4)

Profiles the frenet AL/projected-Newton solver (solvers/nmpc.py) on the
live backend and answers two questions the bench's single MFU number
cannot:

1. **Wall-clock breakdown** — the solver's inner iteration has exactly
   three compute pieces (one fused ``jacfwd`` pass, one unrolled 10x10
   SPD solve, one 8-candidate vmapped line search). Each is re-created
   here from the same private building blocks the solver uses
   (``_smooth_cost``/``_wall_residuals``/``_objective``/
   ``_solve_spd_unrolled``) and timed standalone inside a fori chain at
   the full batch width, so `t_iteration ~= t_jac + t_spd + t_ls` can be
   compared against the measured full solve at its iteration cap
   (al_outer x gn_iters + the final certifying inner solve; the vmapped
   ``while_loop``'s wall clock is set by the LAST lane to converge, so
   the cap IS the per-lane iteration count that matters).

2. **Roofline position** — peak FLOP numbers for the VPU are not
   published per chip, so the ceilings are MEASURED here on the same
   device: an unrolled FMA chain (arithmetic intensity ~32 FLOP/byte,
   compute-bound) for the f32 VPU ceiling and a large single-pass
   reduction for HBM read bandwidth. The solver's achieved FLOP/s
   (XLA cost analysis / wall clock) lands somewhere between "VPU-bound"
   and "latency/dependency-bound"; this prints the fraction.

Usage:  python scripts/profile_nmpc.py [--batch 2048] [--json out.json]

The resulting numbers and the ceiling statement live in BASELINE.md
(NMPC row) — re-run this after touching solvers/nmpc.py hot paths.
"""

import argparse
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from irbfn_tpu.dynamics.params import fullscale_params  # noqa: E402
from irbfn_tpu.solvers import NMPCConfig, solve_lattice_point  # noqa: E402
from irbfn_tpu.solvers.nmpc import (_control_bounds, _objective,  # noqa: E402
                                    _rollout_rk4, _smooth_cost,
                                    _solve_spd_unrolled, _wall_residuals)


def _med_time(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _cost_flops(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def _chain(fn_batch, x, reps):
    """fori-chain ``reps`` dependent evaluations of a batched op inside one
    jit (the data dependency defeats XLA's inter-iteration parallelism) and
    return a reduced scalar — same sync discipline as bench.py."""

    def run(xx):
        def body(_, acc):
            y = fn_batch(xx + 1e-20 * acc)
            return acc + jnp.sum(y)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    return jax.jit(run)


def _slope_time(fn_batch, x, reps):
    """Per-evaluation time of a batched op via the TWO-chain-length slope
    (CLAUDE.md timing discipline: a single timed call through the axon
    tunnel attributes the ~25 ms RTT to the op — round-4 advisor measured
    the old single-call ceilings under-reporting 10-25x)."""
    t1 = _med_time(_chain(fn_batch, x, reps), x, warmup=1, iters=3)
    t2 = _med_time(_chain(fn_batch, x, 2 * reps), x, warmup=1, iters=3)
    return (t2 - t1) / reps


def measure_ceilings():
    """Measured single-chip f32 VPU FMA ceiling + HBM read bandwidth.

    Both ops are sub-ms, so both use the chain-slope (the 1e-20*acc feedback
    in ``_chain`` fuses into the elementwise chain / the reduction — no extra
    materialized array, just a dependent re-read per iteration)."""
    n = 1 << 22  # 16 MB operand: streams HBM once, 64 fused FMAs per element
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9

    def fma_chain(v):
        y = v
        for _ in range(64):
            y = y * 1.000001 + 1e-6
        return y

    t = _slope_time(fma_chain, x, reps=32)
    vpu_flops = 2.0 * 64 * n / t  # FMA = 2 FLOP

    big = jnp.ones((1 << 28,), jnp.float32)  # 1 GiB
    tb = _slope_time(lambda v: jnp.sum(v)[None], big, reps=4)
    hbm_bw = big.nbytes / tb
    return vpu_flops, hbm_bw


def lattice_rows(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.column_stack([
        rng.uniform(-0.2, 2.0, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(1, 7, n), rng.uniform(-1, 1, n),
        rng.uniform(3, 7, n), rng.uniform(-2.6, 2.6, n),
        rng.uniform(-1, 1, n), rng.uniform(-0.1, 0.1, n),
    ]).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=32,
                    help="chain length for per-iteration component timing")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--trace_dir", type=str, default=None,
                    help="optionally also dump a jax.profiler trace of one "
                    "warm full-batch solve (works only where the backend "
                    "supports device tracing)")
    args = ap.parse_args()

    B = args.batch
    cfg = NMPCConfig()
    p = fullscale_params(mu=1.0, cs=5.0, dtype=jnp.float32)
    rows = lattice_rows(B)

    # --- full solve (chain-slope: a single timed call would fold one
    # ~25 ms tunnel RTT into t_full, ~14% at batch 2048) -------------------
    full = jax.jit(lambda r: solve_lattice_point(r, p, cfg).accel.sum())
    t_full = _slope_time(lambda r: solve_lattice_point(r, p, cfg).accel,
                         rows, reps=3)
    flops_full = _cost_flops(full, rows)
    rate = B / t_full

    if args.trace_dir:
        try:
            with jax.profiler.trace(args.trace_dir):
                float(full(rows))
            print(f"profiler trace written to {args.trace_dir}")
        except Exception as e:  # axon tunnel may not support device tracing
            print(f"profiler trace unavailable on this backend: {e!r}")

    # --- per-iteration components (solver internals re-created 1:1 with
    # _solve_single's inner body; see that function for why each exists) ---
    T, n_u = cfg.horizon, 2 * cfg.horizon
    n_con = 4 * (T + 1)
    lo, hi = _control_bounds(cfg, jnp.float32)
    lo_f, hi_f = jnp.tile(lo, T), jnp.tile(hi, T)

    # row -> (x0, goal, curv) exactly as solve_lattice_point unpacks it
    # (nmpc_data_generator_frenet.py:33 ABI)
    x0s = jnp.stack([jnp.zeros_like(rows[:, 0]), rows[:, 0], rows[:, 1],
                     rows[:, 2], rows[:, 3], rows[:, 5], rows[:, 6]], axis=-1)
    goals = jnp.zeros_like(x0s).at[:, 3].set(rows[:, 4])
    curvs = rows[:, 7]
    u0 = jnp.zeros((B, n_u), jnp.float32)
    lam0 = jnp.zeros((B, n_con), jnp.float32)
    rho0 = jnp.full((B,), cfg.penalty0, jnp.float32)

    def one_jac(u, x0, goal, curv, lam, rho):
        smooth = partial(_smooth_cost, x0=x0, goal=goal, curv=curv,
                         p=p, cfg=cfg)
        wall = partial(_wall_residuals, x0=x0, curv=curv, p=p, cfg=cfg)
        smooth_vg = jax.value_and_grad(smooth)

        def comb(uu):
            v, gs = smooth_vg(uu)
            w = wall(uu, lam_state=lam, rho=rho)
            return (gs, w), (v, gs, w)

        (H_s, Jw), (v, gs, w) = jax.jacfwd(comb, has_aux=True)(u)
        return jnp.sum(H_s) + jnp.sum(Jw) + v + jnp.sum(gs) + jnp.sum(w)

    def jac_batch(u):
        return jax.vmap(one_jac)(u, x0s, goals, curvs, lam0, rho0)

    def spd_batch(u):
        # same 10x10 SPD solve shape/dtype as the inner body's damped system
        A = (jnp.eye(n_u) * 3.0
             + 1e-3 * u[:, :, None] * u[:, None, :])
        return jax.vmap(_solve_spd_unrolled)(A, u).sum(axis=1)

    def ls_batch(u):
        def one(uu, x0, goal, curv, lam, rho):
            obj = partial(_objective, x0=x0, goal=goal, curv=curv, p=p,
                          cfg=cfg)
            ts = 0.5 ** jnp.arange(cfg.linesearch_steps, dtype=jnp.float32)
            cands = jnp.clip(uu[None] - ts[:, None] * (uu[None] + 0.01),
                             lo_f[None], hi_f[None])
            fc = jax.vmap(lambda c: obj(c, lam_state=lam, rho=rho))(cands)
            return jnp.min(fc)

        return jax.vmap(one)(u, x0s, goals, curvs, lam0, rho0)

    def rollout_batch(u):
        def one(uu, x0, curv):
            return _rollout_rk4(x0, uu.reshape(T, 2), curv, p, cfg).sum()

        return jax.vmap(one)(u, x0s, curvs)

    comps = {}
    for name, fn in [("jacfwd_pass", jac_batch), ("spd_solve", spd_batch),
                     ("line_search", ls_batch),
                     ("rollout_primal", rollout_batch)]:
        chained = _chain(fn, u0, args.reps)
        t1 = _med_time(chained, u0, warmup=1, iters=3)
        chained2 = _chain(fn, u0, 2 * args.reps)
        t2 = _med_time(chained2, u0, warmup=1, iters=3)
        comps[name] = (t2 - t1) / args.reps  # slope: fixed costs cancel
        flops = _cost_flops(jax.jit(lambda u: jnp.sum(fn(u))), u0)
        comps[name + "_flops"] = flops

    # --- ceilings --------------------------------------------------------
    vpu_flops, hbm_bw = measure_ceilings()

    iters_cap = (cfg.al_outer + 1) * cfg.gn_iters
    t_iter_sum = (comps["jacfwd_pass"] + comps["spd_solve"]
                  + comps["line_search"])
    t_model = iters_cap * t_iter_sum

    # XLA cost_analysis counts a while/fori body ONCE (trip count not
    # multiplied), so flops_full badly under-counts the capped solve.
    # Executed-FLOP model: iteration components (measured loop-free) times
    # the iteration cap — the same decomposition as the wall-clock model.
    flops_iter = (comps["jacfwd_pass_flops"] + comps["spd_solve_flops"]
                  + comps["line_search_flops"])
    flops_exec = iters_cap * flops_iter

    out = {
        "batch": B,
        "solves_per_sec": round(rate, 1),
        "t_full_s": t_full,
        "iters_cap": iters_cap,
        "t_jacfwd_us": round(1e6 * comps["jacfwd_pass"], 1),
        "t_spd_us": round(1e6 * comps["spd_solve"], 1),
        "t_linesearch_us": round(1e6 * comps["line_search"], 1),
        "t_rollout_us": round(1e6 * comps["rollout_primal"], 1),
        "t_iter_sum_us": round(1e6 * t_iter_sum, 1),
        "t_model_vs_full": round(t_model / t_full, 3),
        "flops_full_costanalysis": flops_full,  # loop bodies counted ONCE
        "flops_exec_model": flops_exec,
        "achieved_flops": flops_exec / t_full,
        "vpu_ceiling_flops": vpu_flops,
        "hbm_bw_bytes_per_s": hbm_bw,
        "pct_of_measured_vpu_ceiling": round(
            100.0 * (flops_exec / t_full) / vpu_flops, 2),
        "flops_per_solve": flops_exec / B,
    }
    print(json.dumps(out, indent=2))

    share = {k: comps[k] / t_iter_sum for k in
             ("jacfwd_pass", "spd_solve", "line_search")}
    print("\nper-iteration wall share: "
          + ", ".join(f"{k} {100 * v:.0f}%" for k, v in share.items()))
    print(f"sum-of-parts model covers {100 * t_model / t_full:.0f}% of the "
          f"measured full solve at the {iters_cap}-iteration cap "
          "(the remainder = while_loop state carry + AL outer overhead)")
    print(f"achieved {flops_exec / t_full / 1e9:.1f} GFLOP/s "
          "(executed-FLOP model; XLA cost_analysis counts loop bodies once: "
          f"{flops_full / 1e9:.1f} GFLOP) of a measured "
          f"{vpu_flops / 1e12:.2f} TFLOP/s f32 VPU ceiling "
          f"({out['pct_of_measured_vpu_ceiling']}%) — HBM read "
          f"{hbm_bw / 1e9:.0f} GB/s")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
