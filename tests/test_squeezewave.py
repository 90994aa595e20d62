"""SqueezeWave tests (SURVEY.md §5.3 item 3): flow invertibility, logdet
identities, weight-norm folding, loss sanity, training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.config import SqueezeWaveConfig
from rtts.models import squeezewave as SW
from rtts.train.vocoder_loss import squeezewave_loss


def small_cfg(**kw):
    base = dict(n_mels=16, n_flows=6, n_group=32, n_early_every=2,
                n_early_size=8, wn_layers=3, wn_channels=32, wn_kernel_size=3,
                hop_length=64, audio_segment_length=1024,
                compute_dtype="float32")
    base.update(kw)
    return SqueezeWaveConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    params = SW.init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    B, M = 2, 16
    T = M * cfg.hop_length
    mel = jax.random.normal(key, (B, M, cfg.n_mels))
    audio = jax.random.normal(jax.random.fold_in(key, 1), (B, T)) * 0.1
    return cfg, params, mel, audio


def test_forward_shapes_and_z(setup):
    cfg, params, mel, audio = setup
    z, log_s_list, log_det_list = SW.forward(params, cfg, mel, audio)
    L = audio.shape[1] // cfg.n_group
    assert z.shape == (2, L, cfg.n_group)
    # flows after each early output shrink the coupling half
    assert len(log_s_list) == cfg.n_flows
    assert len(log_det_list) == cfg.n_flows
    assert np.isfinite(np.asarray(z)).all()


def test_roundtrip_forward_inverse(setup):
    """infer(z-of-forward) must reconstruct the audio exactly: run the
    inverse on the forward's z by substituting it for the noise draw."""
    cfg, params, mel, audio = setup
    z, _, _ = SW.forward(params, cfg, mel, audio)

    # manual inverse: replicate infer but start from the given z
    def invert(z):
        sched = SW._channel_schedule(cfg)
        n_final = sched[-1][0]
        n_early_total = cfg.n_group - n_final
        x = z[..., n_early_total:]
        chunks = [z[..., i * cfg.n_early_size:(i + 1) * cfg.n_early_size]
                  for i in range(n_early_total // cfg.n_early_size)]
        l = z.shape[1]
        mel_up = SW.upsample_mel(mel, l)
        for k in range(cfg.n_flows - 1, -1, -1):
            n_rem, early = sched[k]
            fp = params["flows"][k]
            n_half = n_rem // 2
            a0, a1 = x[..., :n_half], x[..., n_half:]
            st = SW.wn_apply(fp["wn"], a0, mel_up, cfg.wn_layers, cfg.wn_channels)
            log_s, t = st[..., :n_half], st[..., n_half:]
            a1 = (a1 - t) * jnp.exp(-log_s)
            x = jnp.concatenate([a0, a1], axis=-1)
            x = x @ jnp.linalg.inv(fp["inv1x1"]["w_1x1"])
            if early:
                x = jnp.concatenate([chunks.pop(), x], axis=-1)
        return SW.unsqueeze_audio(x)

    recon = invert(z)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(audio),
                               atol=1e-4, rtol=1e-3)


def test_logdet_matches_slogdet(setup):
    cfg, params, mel, audio = setup
    _, _, log_det_list = SW.forward(params, cfg, mel, audio)
    L = audio.shape[1] // cfg.n_group
    for k, ld in enumerate(log_det_list):
        w = params["flows"][k]["inv1x1"]["w_1x1"]
        _, ref = jnp.linalg.slogdet(w)
        np.testing.assert_allclose(float(ld), float(L * ref), rtol=1e-5)


def test_zero_init_flows_are_identity_coupling(setup):
    """End convs start at zero => log_s = 0, t = 0 at init: z is just the
    chain of orthogonal 1x1 rotations of the audio (norm preserved)."""
    cfg, params, mel, audio = setup
    z, log_s_list, _ = SW.forward(params, cfg, mel, audio)
    for ls in log_s_list:
        assert float(jnp.abs(ls).max()) == 0.0
    np.testing.assert_allclose(float(jnp.linalg.norm(z)),
                               float(jnp.linalg.norm(audio)), rtol=1e-4)


def test_infer_shapes_and_finite(setup):
    cfg, params, mel, _ = setup
    audio = SW.infer(params, cfg, mel, rng=jax.random.PRNGKey(3))
    assert audio.shape == (2, mel.shape[1] * cfg.hop_length)
    assert np.isfinite(np.asarray(audio)).all()


def test_fold_weightnorm_preserves_infer(setup):
    cfg, params, mel, _ = setup
    a1 = SW.infer(params, cfg, mel, rng=jax.random.PRNGKey(4))
    folded = SW.fold_weightnorm(params)
    a2 = SW.infer(folded, cfg, mel, rng=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               atol=1e-4, rtol=1e-3)


def test_loss_decreases_training(setup):
    import optax

    cfg, params, mel, audio = setup

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            z, ls, ld = SW.forward(p, cfg, mel, audio)
            return squeezewave_loss(z, ls, ld, cfg.sigma)[0]
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    p = params
    for _ in range(30):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()

def test_roundtrip_with_log_s_clamp(setup):
    """log_s_clamp must preserve exact invertibility: the bound is applied
    identically in forward and inverse (rtts/models/squeezewave.py::
    _bound_log_s), so infer(forward(audio)) == audio still holds — and with
    a large pre-clamp log_s the UNclamped inverse must NOT reconstruct,
    proving the clamp is active in both directions."""
    cfg0, params0, mel, audio = setup
    # zero-init end convs give log_s == 0 — perturb them so log_s is O(1)
    # and a 0.5 bound actually bites
    key = jax.random.PRNGKey(7)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jax.random.normal(key, x.shape, x.dtype), params0)
    cfg = small_cfg(log_s_clamp=0.5)
    z, log_s_list, _ = SW.forward(params, cfg, mel, audio)
    assert float(jnp.max(jnp.abs(log_s_list[-1]))) <= 0.5 + 1e-6
    assert float(jnp.max(jnp.abs(log_s_list[-1]))) > 0.45  # bound is active
    recon = SW._infer_chunk(params, mel, z, cfg=cfg)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(audio),
                               atol=1e-4, rtol=1e-3)
    # inverse WITHOUT the clamp must disagree (the clamp changed forward)
    recon_unclamped = SW._infer_chunk(params, mel, z, cfg=cfg0)
    assert float(jnp.max(jnp.abs(recon_unclamped - audio))) > 1e-3
