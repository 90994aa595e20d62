"""Batch-scaling arm of the roofline closure (VERDICT r4 #2): is the
flagship step's 12% MFU a hardware ceiling or a shape choice?

Measures the full flagship train step (fwd+bwd+Adam) at fixed sequence
shape and growing per-chip batch.  If frames/s and MFU scale with B, the
b8 MFU number is batch-starvation (amortizable per-op overhead + small
matmul shapes), not a kernel defect — the multi-chip DP path trains at
the larger global batch with the same per-chip shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_batch_scaling.py
"""

import sys

import jax

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from probe_flash import _make_step, _time_step  # noqa: E402

from rtts.bench import _device_peak_flops, flagship_bench_config  # noqa: E402
from rtts.utils.profiling import enable_compilation_cache  # noqa: E402


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    peak = _device_peak_flops() or 197e12
    for tok, mel in ((128, 512), (256, 1024)):
        print(f"\n=== tokens {tok} x mel {mel} ===", flush=True)
        for b in (8, 16, 32, 64):
            cfg = flagship_bench_config()
            step, p0, s0 = _make_step(cfg, b, tok, mel)
            dt, temp_mb, flops, loss = _time_step(step, p0, s0)
            mfu = flops / dt / peak
            print(f"b{b:3d}: {dt*1e3:7.2f} ms  {b*mel/dt/1e3:7.1f} kframes/s"
                  f"  {flops/1e9:8.1f} GF  MFU {100*mfu:5.2f}%"
                  f"  temp {temp_mb:.0f} MB", flush=True)
            del step, p0, s0


if __name__ == "__main__":
    main()
