"""Pipeline parallelism for Reformer stacks over a mesh axis.

Beyond-reference capability (SURVEY.md §3.4 lists the reference's only
parallelism as optional Lightning DDP; PARITY.md §3.4 documents this row):
stage the stack's layers across devices and stream microbatches through
them, GPipe-style.  TPU-native shape — no send/recv runtime, no NCCL:

- layer parameters are STACKED along a leading unit axis and sharded over
  the ``pipe`` mesh axis with ``shard_map`` — during the step each device
  computes with (and holds gradients for) only its ``num_layers/S``
  layers.  Resting storage follows the trainer's param shardings
  (replicated by default): the stacking happens in-graph, so XLA shards
  the stacked operand without a second resident copy when params are
  donated;
- the fill/drain schedule is one ``lax.scan`` of ``M + S - 1`` ticks; at
  every tick each stage applies its layers to the activation pair it
  holds, then the pair hops to the next stage via a single neighbor
  ``ppermute`` — XLA overlaps the DMA with the next tick's compute;
- the BACKWARD schedule is not hand-written: the scan+ppermute forward is
  differentiated by JAX, and the transpose of a neighbor ppermute is the
  reverse hop, so autodiff yields exactly the reverse-staged pipeline
  (with per-tick rematerialization via ``jax.checkpoint`` so the scan
  saves O(1) activations per tick instead of the whole stack).

Semantics: identical math to the plain-residual two-stream path
(``reversible_sequence(reversible=False)``) — each microbatch runs the
same sequential sublayers, batch rows never interact inside a stack, so
outputs match the single-device forward to f32 reduction tolerance
(tested, fwd + grads, encoder and cross-attending decoder).  In training
mode with dropout enabled the per-layer rng keys fold in the microbatch
index so dropout masks (and, as a side effect, LSH hash draws) are
independent across microbatches — the masks differ from the
single-device draw (mask shapes are per-microbatch) but are unbiased and
deterministic given the step rng; at dropout 0 the keys match the
sequential schedule exactly, so train-mode parity holds (both tested).

Scheduling notes (why GPipe, not 1F1B): under jit the whole step is one
XLA program — there is no per-microbatch optimizer tick to interleave, so
1F1B's memory advantage collapses into the remat knob while its schedule
complexity remains; the bubble fraction (S-1)/(M+S-1) is controlled by
``pipeline_microbatches``.

``pipeline_interleave: v`` adds the Megatron-style interleaved (circular)
schedule: each device holds ``v`` non-contiguous layer chunks (device s
gets chunks s, S+s, …, (v-1)S+s) and the activation pair makes ``v`` laps
around the stage ring (the last stage's ppermute wraps to stage 0).
Microbatches are injected in groups of S at consecutive ticks — within a
group the circulating laps never collide (m + c is injective per device
over a vS window), and group g starts at tick g·vS, exactly when stage 0
finishes the previous group's last lap.  Total schedule: v·M + S - 1
ticks of 1/v the per-tick work, so the bubble shrinks v× at FIXED
microbatch size (raising M instead shrinks microbatches and starves the
MXU).  Parity with the sequential path is tick-schedule-independent and
tested at v=2 (fwd + grads).

Constraints (validated with actionable errors): uniform attention kind
across layers (stages index one stacked parameter tree), ``num_layers``
divisible by the stage count, local batch divisible by the microbatch
count, and no simultaneous ``seq_parallel_axis`` (both contract the model
axis; pick one per stack).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rtts.config import ReformerStackConfig


def _batch_axes(mesh: Mesh):
    """Mesh axes the batch dim rides (dcn outermost, then data)."""
    from rtts.parallel.mesh import DATA_AXIS, DCN_AXIS

    axes = tuple(a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.axis_names)
    if not axes:
        return None
    return axes if len(axes) > 1 else axes[0]


def pipeline_stack_apply(
    params,
    cfg: ReformerStackConfig,
    x: jnp.ndarray,                     # (B, L, D)
    mask: Optional[jnp.ndarray],        # (B, L) bool
    memory: Optional[jnp.ndarray],      # (B, Lm, D) or None
    memory_mask: Optional[jnp.ndarray],
    rng: Optional[jax.Array],
    deterministic: bool,
    compute_dtype,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Run ``params['layers']`` as a pipeline over ``cfg.pipeline_axis``.

    Returns the two-stream mean (B, L, D) in float32 — the caller applies
    the final LN, exactly like ``reversible_sequence``.
    """
    from rtts.models.stack import _layer_kinds, make_stack_layer_fns

    if mesh is None:
        from rtts.parallel.mesh import current_mesh

        mesh = current_mesh()
    axis = cfg.pipeline_axis
    if mesh is None or axis not in mesh.shape:
        raise ValueError(
            f"pipeline parallelism needs a Mesh with axis {axis!r}; "
            f"enter one (`with mesh:`) or pass mesh= explicitly")
    if cfg.seq_parallel_axis:
        raise ValueError(
            "pipeline_axis and seq_parallel_axis are mutually exclusive "
            "per stack (both consume the model axis)")
    if cfg.reversible is True:
        raise ValueError(
            "pipeline stages run plain two-stream residuals (activation "
            "memory is bounded per tick by pipeline_remat, so reversible "
            "reconstruction buys nothing across stages); set "
            "reversible: auto or false on a pipelined stack")
    kinds = _layer_kinds(cfg)
    if len(set(kinds)) > 1:
        raise ValueError(
            "pipeline parallelism requires a uniform attention kind "
            f"(stages share one stacked parameter tree); got {kinds}")

    n_stages = mesh.shape[axis]
    cross = memory is not None
    ppu = 2 if cross else 1             # pairs per unit (self [+ cross])
    n_units = cfg.num_layers
    if n_units % n_stages:
        raise ValueError(
            f"num_layers ({n_units}) must divide over {n_stages} pipeline "
            f"stages on axis {axis!r}")
    v = max(1, cfg.pipeline_interleave)
    if n_units % (v * n_stages):
        raise ValueError(
            f"num_layers ({n_units}) must divide over "
            f"pipeline_interleave ({v}) x {n_stages} stages "
            f"= {v * n_stages} layer chunks")
    u_chunk = n_units // (v * n_stages)

    b, l, d = x.shape
    n_micro = cfg.pipeline_microbatches or n_stages
    if v > 1 and n_micro % n_stages:
        raise ValueError(
            f"pipeline_interleave={v} injects microbatches in groups of "
            f"the stage count; pipeline_microbatches ({n_micro}) must be "
            f"a multiple of {n_stages}")
    dp = 1
    baxes = _batch_axes(mesh)
    if baxes is not None:
        for a in (baxes if isinstance(baxes, tuple) else (baxes,)):
            dp *= mesh.shape[a]
    if b % (dp * n_micro):
        raise ValueError(
            f"batch {b} must divide into {n_micro} microbatches per "
            f"data-parallel rank (dp={dp})")

    # in training mode WITH dropout, each microbatch must draw its own
    # masks: a stage applies the same per-layer keys to every microbatch
    # it sees, so without a fold all microbatches would share identical
    # dropout masks.  The fold also varies the LSH hash draw per
    # microbatch (equally valid rotations), so it engages only when
    # dropout actually needs it — at p=0 the keys match the sequential
    # path exactly and train-mode outputs stay parity-equal (tested).
    a = cfg.attention
    fold_micro = (not deterministic
                  and (cfg.dropout > 0.0 or a.attention_dropout > 0.0))

    layer_fns = make_stack_layer_fns(cfg, cross, deterministic,
                                     compute_dtype)
    # kinds are uniform => the (f, g) callables repeat every ppu pairs;
    # stages apply layer_fns[0:ppu] with their own stacked params
    unit_fns = layer_fns[:ppu]

    # ---- stack per-unit params along a leading axis (sharded over pipe) --
    # Stacking order is SHARD order: device s's u_chunk*v-slice holds its
    # chunks lap-major (chunk s units, then chunk S+s units, …), so the
    # interleaved schedule indexes its lap-k chunk at [k*u_chunk, +u_chunk).
    # At v=1 this is the identity (contiguous blocks per stage).
    order = [(k * n_stages + s) * u_chunk + i
             for s in range(n_stages)
             for k in range(v)
             for i in range(u_chunk)]
    layers: List[Any] = params["layers"]
    stacked = [
        jax.tree.map(lambda *xs: jnp.stack(xs),
                     *[layers[u * ppu + j] for u in order])
        for j in range(ppu)
    ]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, n_units * ppu * 2)
    keys = keys.reshape((n_units, ppu, 2) + keys.shape[1:])
    if v > 1:
        # layer u's key travels with layer u's params, so the per-layer
        # key assignment (and LSH hash draws at dropout 0) is schedule-
        # independent and matches the sequential path
        keys = keys[jnp.asarray(order)]

    if mask is None:
        mask = jnp.ones((b, l), bool)
    if not cross:
        memory = jnp.zeros((b, 1, 1), jnp.float32)      # dummy, ignored
        memory_mask = jnp.ones((b, 1), bool)
    elif memory_mask is None:
        memory_mask = jnp.ones(memory.shape[:2], bool)

    # ring: the wrap hop (S-1 -> 0) carries lap-k activations back to
    # stage 0 as lap k+1; at v=1 stage 0 always injects, so whatever the
    # wrap delivers is unused (and its cotangent is zero through the
    # `where`) — one perm serves both schedules
    perm = ([(i, (i + 1) % n_stages) for i in range(n_stages)]
            if n_stages > 1 else [])

    def local_fn(p_stk, keys_stk, x_l, mask_l, mem_l, memmask_l):
        rank = jax.lax.axis_index(axis)
        bl = x_l.shape[0]
        mb = bl // n_micro
        micro_x = x_l.reshape((n_micro, mb) + x_l.shape[1:])
        micro_mask = mask_l.reshape((n_micro, mb) + mask_l.shape[1:])
        micro_mem = mem_l.reshape((n_micro, mb) + mem_l.shape[1:])
        micro_mm = memmask_l.reshape((n_micro, mb) + memmask_l.shape[1:])

        def stage_fn(h, m_idx, lap):
            # h: (2, mb, L, D) activation pair; m_idx: microbatch id here;
            # lap: which of this device's v chunks to apply (0 at v=1)
            h1, h2 = h[0], h[1]
            msk = jax.lax.dynamic_index_in_dim(micro_mask, m_idx, 0, False)
            mem = (jax.lax.dynamic_index_in_dim(micro_mem, m_idx, 0, False)
                   if cross else None)
            mm = (jax.lax.dynamic_index_in_dim(micro_mm, m_idx, 0, False)
                  if cross else None)
            for i in range(u_chunk):
                for j, (f, g) in enumerate(unit_fns):
                    if v == 1:
                        p = jax.tree.map(lambda a: a[i], p_stk[j])
                        kf = keys_stk[i, j, 0]
                        kg = keys_stk[i, j, 1]
                    else:
                        # lap is traced: the local shard is lap-major
                        # (see the stacking-order comment above)
                        idx = lap * u_chunk + i
                        p = jax.tree.map(
                            lambda a: jax.lax.dynamic_index_in_dim(
                                a, idx, 0, False), p_stk[j])
                        ku = jax.lax.dynamic_index_in_dim(
                            keys_stk, idx, 0, False)
                        kf = ku[j, 0]
                        kg = ku[j, 1]
                    if fold_micro:
                        kf = jax.random.fold_in(kf, m_idx)
                        kg = jax.random.fold_in(kg, m_idx)
                    aux = {"mask": msk, "memory_mask": mm,
                           "rng_f": kf, "rng_g": kg}
                    h1 = h1 + f(p["f"], h2, mem, aux, None)[0]
                    h2 = h2 + g(p["g"], h1, mem, aux)
            return jnp.stack([h1, h2])

        if cfg.pipeline_remat:
            stage_fn = jax.checkpoint(stage_fn)

        def tick(carry, t):
            recv, out_buf = carry
            t_rel = t - rank
            if v == 1:
                lap = 0
                m = t_rel
                inject = rank == 0
                at_last_chunk = None        # statically: every tick
            else:
                # microbatch m enters chunk c at tick m' + c where
                # m' = (m // S)*vS + (m % S) (groups of S injected at
                # consecutive ticks every vS); inverting at (t, rank):
                phi = jnp.mod(t_rel, v * n_stages)
                lap = phi // n_stages
                m = ((t_rel - phi) // (v * n_stages)) * n_stages \
                    + (phi % n_stages)
                inject = (rank == 0) & (lap == 0)
                at_last_chunk = lap == v - 1
            m_c = jnp.clip(m, 0, n_micro - 1)
            feed = jax.lax.dynamic_index_in_dim(micro_x, m_c, 0, False)
            feed = jnp.stack([feed, feed]).astype(jnp.float32)
            inp = jnp.where(inject, feed, recv)
            h = stage_fn(inp, m_c, lap)
            y = (h[0] + h[1]) * 0.5
            # only the final chunk's output of a real microbatch lands in
            # slot m; fill/drain garbage and intermediate laps are routed
            # to the dummy slot n_micro
            valid = (m >= 0) & (m < n_micro)
            if at_last_chunk is not None:
                valid = valid & at_last_chunk
            slot = jnp.where(valid, m_c, n_micro)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, y, slot, 0)
            recv = jax.lax.ppermute(h, axis, perm) if perm else h
            return (recv, out_buf), None

        recv0 = jnp.zeros((2, mb) + x_l.shape[1:], jnp.float32)
        out0 = jnp.zeros((n_micro + 1, mb) + x_l.shape[1:], jnp.float32)
        (_, out_buf), _ = jax.lax.scan(
            tick, (recv0, out0), jnp.arange(v * n_micro + n_stages - 1))
        # only the last stage's buffer holds real outputs; broadcast it
        out = jnp.where(rank == n_stages - 1, out_buf[:n_micro], 0.0)
        out = jax.lax.psum(out, axis)
        return out.reshape(x_l.shape)

    baxes = _batch_axes(mesh)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(baxes), P(baxes), P(baxes), P(baxes)),
        out_specs=P(baxes),
        check_vma=False,
    )
    return fn(stacked, keys, x.astype(jnp.float32), mask, memory,
              memory_mask)
