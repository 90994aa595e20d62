"""True multi-process dryrun (VERDICT r2 item 4; SURVEY.md §3.5/§6.8).

Spawns TWO local processes that really run ``jax.distributed.initialize``
(coordinator on 127.0.0.1), each with 4 virtual CPU devices, build the
(dcn, data, model) = (2, 2, 2) mesh over the 8 GLOBAL devices, and execute
one sharded train step — batch sharded over (dcn, data), TP params over
model, gradient psums crossing the process boundary.  The parent also runs
the identical step in ONE process with 8 virtual devices and asserts the
losses match: the multi-process path (rtts.parallel.mesh.
initialize_distributed + the DCN mesh axis) is thereby executed, not just
unit-tested.

Usage:
    python scripts/multihost_dryrun.py            # parent: ref + 2 children
    python scripts/multihost_dryrun.py --child COORD NPROC PID  # internal
"""

from __future__ import annotations

import os
import pathlib
import socket
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

N_PER_PROC = 4
N_PROCS = 2
N_GLOBAL = N_PER_PROC * N_PROCS


def _train_loss() -> float:
    """One sharded train step over the global (dcn, data, model) mesh.

    Runs identically in the single-process reference (8 local devices) and
    in each of the 2 distributed processes (4 local + 4 remote devices);
    the loss is fully replicated so any process can read it.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rtts.config import MeshConfig, OptimConfig
    from rtts.models import reformer_tts as M
    from rtts.parallel.mesh import make_mesh
    from rtts.parallel.sharding import (batch_sharding, make_param_shardings,
                                        replicated)
    from rtts.text import vocab_size
    from rtts.train.losses import make_stop_target, tts_loss
    from rtts.train.optim import make_optimizer
    from __graft_entry__ import _tiny_cfg

    assert len(jax.devices()) == N_GLOBAL, (
        f"need {N_GLOBAL} global devices, have {len(jax.devices())}")
    mesh = make_mesh(MeshConfig(dcn_parallel=N_PROCS, data_parallel=2,
                                model_parallel=2))

    cfg = _tiny_cfg(vocab_size())
    params = M.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(OptimConfig(warmup_steps=10, total_steps=100))
    opt_state = optimizer.init(params)

    B, L, T = 4, 64, 64
    rng = np.random.default_rng(123)
    tokens_h = rng.integers(3, vocab_size(), (B, L)).astype(np.int32)
    tmask_h = np.ones((B, L), bool)
    mel_h = rng.standard_normal((B, T, cfg.n_mels)).astype(np.float32) * 0.5
    mmask_h = np.ones((B, T), bool)

    def globalize(host_arr, sharding):
        return jax.make_array_from_callback(
            host_arr.shape, sharding, lambda idx: host_arr[idx])

    with mesh:
        p_shard = make_param_shardings(params, mesh, tensor_parallel=True)
        params = jax.tree.map(globalize,
                              jax.tree.map(lambda x: np.asarray(x), params),
                              p_shard)
        opt_state = jax.tree.map(
            lambda x: globalize(np.asarray(x), replicated(mesh))
            if hasattr(x, "shape") else x, opt_state)
        batch = {
            "tokens": globalize(tokens_h, batch_sharding(mesh, 2)),
            "tmask": globalize(tmask_h, batch_sharding(mesh, 2)),
            "mel": globalize(mel_h, batch_sharding(mesh, 3)),
            "mmask": globalize(mmask_h, batch_sharding(mesh, 2)),
        }

        @jax.jit
        def train_step(params, opt_state, batch, rng):
            def loss_fn(p):
                pre, post, stop = M.forward(
                    p, cfg, batch["tokens"], batch["tmask"], batch["mel"],
                    batch["mmask"], rng=rng, deterministic=False)
                return tts_loss(pre, post, stop, batch["mel"],
                                make_stop_target(batch["mmask"]),
                                batch["mmask"])[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        params, opt_state, loss = train_step(params, opt_state, batch,
                                             jax.random.PRNGKey(1))
        return float(loss)


def _run_child(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # the REAL multihost path under test: explicit-signal init through the
    # rtts config surface
    from rtts.config import MeshConfig
    from rtts.parallel.mesh import initialize_distributed

    initialize_distributed(MeshConfig(coordinator_address=coordinator,
                                      num_processes=num_processes,
                                      process_id=process_id))
    assert jax.process_count() == num_processes, jax.process_count()
    loss = _train_loss()

    # cross-host preemption agreement: a stop signaled on ONE process
    # must be seen by EVERY process at the same step boundary
    from rtts.train.interrupt import GracefulStop, stop_requested_global

    stop = GracefulStop()
    assert stop_requested_global(stop) is False
    if jax.process_index() == 1:
        stop.request_stop()            # "SIGTERM reached only host 1"
    assert stop_requested_global(stop) is True, (
        "single-host stop signal did not propagate to all processes")

    if jax.process_index() == 0:
        print(f"MULTIHOST_LOSS {loss!r}", flush=True)
        print("MULTIHOST_STOP_AGREEMENT OK", flush=True)


def _run_ref() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    loss = _train_loss()
    print(f"REF_LOSS {loss!r}", flush=True)


def _spawn(args, n_devices, extra_env=None):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n_devices}".strip())
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra_env:
        env.update(extra_env)
    return subprocess.Popen([sys.executable, os.path.abspath(__file__)] + args,
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _extract(tag: str, out: str) -> float:
    for line in out.splitlines():
        if line.startswith(tag):
            return float(line.split(None, 1)[1])
    raise RuntimeError(f"no {tag} in output:\n{out}")


def main() -> None:
    # reference: one process, 8 devices
    ref = _spawn(["--ref"], N_GLOBAL)
    ref_out, ref_err = ref.communicate(timeout=900)
    if ref.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{ref_err[-3000:]}")
    ref_loss = _extract("REF_LOSS", ref_out)

    # distributed: two processes, 4 devices each
    coord = f"127.0.0.1:{_free_port()}"
    children = [
        _spawn(["--child", coord, str(N_PROCS), str(pid)], N_PER_PROC)
        for pid in range(N_PROCS)
    ]
    outs = []
    for pid, ch in enumerate(children):
        out, err = ch.communicate(timeout=900)
        if ch.returncode != 0:
            for other in children:
                other.kill()
            raise RuntimeError(
                f"child {pid} failed (rc={ch.returncode}):\n{err[-3000:]}")
        outs.append(out)
    mh_loss = _extract("MULTIHOST_LOSS", "".join(outs))
    if "MULTIHOST_STOP_AGREEMENT OK" not in "".join(outs):
        raise RuntimeError("cross-host stop agreement check did not run")

    diff = abs(mh_loss - ref_loss)
    print(f"multihost_dryrun: 2 processes x {N_PER_PROC} devices, "
          f"mesh (dcn 2, data 2, model 2)")
    print(f"  single-process loss {ref_loss!r}")
    print(f"  multi-process loss  {mh_loss!r}  |diff| {diff:.3e}")
    if not (diff <= 1e-5 * max(1.0, abs(ref_loss))):
        raise RuntimeError("multihost loss does not match single-process loss")
    print("multihost_dryrun OK")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        _run_child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--ref":
        _run_ref()
    else:
        main()
