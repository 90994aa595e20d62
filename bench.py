#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: end-to-end text->wav real-time factor per chip (target
< 0.05 per BASELINE.json); vs_baseline = target / measured (>1 = beating
the target).  Runs on whatever device jax selects (TPU under axon)."""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    from rtts.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from rtts.bench import flagship_bench_config, run_bench

    # headline = e2e RTF at the FLAGSHIP scale (configs/base.yaml:
    # d_model 512, 6+6 layers, LSH enc+dec) — not the lighter base config
    line = run_bench(flagship_bench_config(), which="e2e")
    # the driver expects exactly one JSON line on stdout
    d = json.loads(line)
    detail = d.pop("detail", {}) or {}
    if detail.get("mfu") is not None:
        d["mfu"] = round(detail["mfu"], 5)
    print(json.dumps(d))


if __name__ == "__main__":
    main()
