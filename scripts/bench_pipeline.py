"""Pipeline-parallelism performance evidence (VERDICT r4 weak #6).

Single real chip is environmental here, but the GPipe bubble is still
measurable on the virtual CPU mesh: with the host's one core, wall time
is proportional to TOTAL compute across stages, and the schedule runs
``v*M + S - 1`` ticks of which only ``v*M`` carry a given microbatch's
useful work — so with the total batch held fixed, the measured step time
vs microbatch count M directly exposes the bubble overhead factor

    t(M) / t(M->inf)  ~  (v*M + S - 1) / (v*M)     (analytic GPipe)

and the bubble fraction is (S-1)/(v*M + S - 1).  This script measures
the forward step at S=4 stages for the plain (v=1) and interleaved (v=2)
schedules across M, and prints measured-vs-analytic overhead.

Run: python scripts/bench_pipeline.py        (CPU, virtual 8 devices)
"""

import dataclasses
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from rtts.config import AttentionConfig, MeshConfig, ReformerStackConfig  # noqa: E402
from rtts.models.stack import stack_apply, stack_init  # noqa: E402
from rtts.parallel.mesh import make_mesh  # noqa: E402

S = 4                     # pipeline stages
B, L, D = 32, 128, 128    # fixed TOTAL batch — M divides it


def _cfg(**kw):
    acfg = AttentionConfig(kind="full", num_heads=4, head_dim=32,
                           use_pallas=False, flash=False)
    return ReformerStackConfig(num_layers=8, d_model=D, d_ff=4 * D,
                               dropout=0.0, reversible=False, causal=False,
                               attention=acfg, use_pallas_ffn=False, **kw)


def _time(fn, *args, iters=3, repeats=5):
    fn(*args)[0].block_until_ready()          # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print(f"devices: {len(jax.devices())} (virtual CPU), stages S={S}, "
          f"total batch {B} x {L} x {D}", flush=True)
    base = _cfg()
    key = jax.random.PRNGKey(0)
    params = stack_init(key, base, cross_attend=False)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, L, D))
    mask = jnp.ones((B, L), bool)

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=S))
    rows = []
    for v in (1, 2):
        for M in ((2, 4, 8, 16, 32) if v == 1 else (4, 8, 16, 32)):
            cfg = dataclasses.replace(base, pipeline_axis="model",
                                      pipeline_microbatches=M,
                                      pipeline_interleave=v,
                                      pipeline_remat=False)
            with mesh:
                fn = jax.jit(lambda p, xx, c=cfg: (stack_apply(
                    p, c, xx, mask, rng=None, deterministic=True),))
                dt = _time(fn, params, x)
            rows.append((v, M, dt))
            print(f"v={v} M={M:2d}: {dt*1e3:8.2f} ms", flush=True)

    # Normalize to a reference M within each schedule: the measured ratio
    # t(M)/t(M_ref) should follow the analytic overhead ratio
    # [(vM+S-1)/(vM)] / [(vM_ref+S-1)/(vM_ref)] if the schedule's cost is
    # the GPipe bubble (deviation at the largest M = per-tick fixed costs
    # as microbatches shrink toward one row).
    print("\nschedule     t(M)/t(Mref)   analytic ratio   bubble-frac "
          "(S-1)/(vM+S-1)", flush=True)
    M_ref = 16
    for v in (1, 2):
        sub = [(M, dt) for (vv, M, dt) in rows if vv == v]
        dt_ref = dict(sub)[M_ref]
        ana_ref = (v * M_ref + S - 1) / (v * M_ref)
        for M, dt in sub:
            meas = dt / dt_ref
            ana = ((v * M + S - 1) / (v * M)) / ana_ref
            bub = (S - 1) / (v * M + S - 1)
            print(f"v={v} M={M:2d}      {meas:6.3f}x        {ana:6.3f}x"
                  f"          {bub:5.1%}", flush=True)


if __name__ == "__main__":
    main()
