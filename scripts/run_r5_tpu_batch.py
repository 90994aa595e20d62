"""One-process runner for the round-5 TPU measurement batch: roofline
attribution (VERDICT r4 #2), VMEM sort/gather primitives (#5), latency
bands + ServingEngine re-measure (#7/#8).  Single device init — the
axon tunnel wedged twice this round, so fewer fresh processes = fewer
chances to land in a wedge window.
"""

import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main():
    import probe_roofline

    print("\n########## ROOFLINE ##########", flush=True)
    try:
        probe_roofline.main()
    except Exception:
        traceback.print_exc()

    print("\n########## VMEM SORT/GATHER ##########", flush=True)
    try:
        import probe_vmem_sort

        probe_vmem_sort.bench()
    except Exception:
        traceback.print_exc()

    print("\n########## LATENCY ##########", flush=True)
    try:
        import json

        from rtts.bench import bench_latency

        out = bench_latency()
        print(json.dumps(out), flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
