import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def _tree(scale=1.0):
    return {"params": {"a": jnp.ones((3, 4)) * scale,
                       "list": [jnp.zeros((2,)), jnp.ones((5,)) * scale]},
            "opt_state": {"mu": jnp.full((3, 4), 0.5 * scale)},
            "step_arr": jnp.asarray(7)}


def test_save_restore_round_trip(tmp_path):
    t = _tree(2.0)
    save_checkpoint(tmp_path, t, step=10, metric=1.5)
    path = latest_checkpoint(tmp_path)
    assert path and path.endswith("step_10")
    restored, step = restore_checkpoint(path, _tree(0.0))
    assert step == 10
    np.testing.assert_array_equal(np.asarray(restored["params"]["a"]),
                                  np.asarray(t["params"]["a"]))
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["mu"]),
                                  np.asarray(t["opt_state"]["mu"]))


def test_partial_restore_params_only(tmp_path):
    t = _tree(3.0)
    save_checkpoint(tmp_path, t, step=5)
    restored, step = restore_checkpoint(latest_checkpoint(tmp_path),
                                        {"params": _tree(0.0)["params"]})
    np.testing.assert_array_equal(np.asarray(restored["params"]["list"][1]),
                                  np.asarray(t["params"]["list"][1]))


def test_retention_keeps_latest_and_best(tmp_path):
    for step, metric in [(1, 5.0), (2, 1.0), (3, 3.0), (4, 4.0), (5, 2.0)]:
        save_checkpoint(tmp_path, _tree(step), step=step, metric=metric,
                        keep=3)
    kept = sorted(p.name for p in tmp_path.glob("step_*"))
    assert "step_5" in kept          # latest always kept
    assert "step_2" in kept          # best metric kept
    assert len(kept) <= 3


def test_shape_mismatch_raises(tmp_path):
    save_checkpoint(tmp_path, {"params": {"a": jnp.ones((3, 4))}}, step=1)
    with pytest.raises(ValueError, match="shape"):
        restore_checkpoint(latest_checkpoint(tmp_path),
                           {"params": {"a": jnp.ones((2, 2))}})


def test_missing_leaf_raises(tmp_path):
    save_checkpoint(tmp_path, {"params": {"a": jnp.ones(2)}}, step=1)
    with pytest.raises(ValueError, match="missing"):
        restore_checkpoint(latest_checkpoint(tmp_path),
                           {"params": {"a": jnp.ones(2), "b": jnp.ones(2)}})


def test_epoch_batcher_is_pure_function_of_step(tmp_path):
    """batch_at(step) must be identical across independently constructed
    batchers (the property that makes mid-epoch resume bit-exact)."""
    from rtts.config import AudioConfig, DatasetConfig, TextConfig
    from rtts.data.corpus import generate_corpus
    from rtts.data.dataset import EpochBatcher, Manifest, TextMelDataset
    from rtts.data.preprocess import preprocess_corpus

    cfg = DatasetConfig(data_dir=str(tmp_path / "data"), audio=AudioConfig(),
                        text=TextConfig(pad_to_multiple=16), num_workers=0)
    generate_corpus(tmp_path, n_utterances=7)
    man = Manifest.load(preprocess_corpus(cfg, str(tmp_path / "transcripts.txt")))
    ds = TextMelDataset(man, cfg)
    a = EpochBatcher(ds, batch_size=2, seed=3)
    b = EpochBatcher(ds, batch_size=2, seed=3)
    spe = a.steps_per_epoch()
    assert spe == 4
    # cross an epoch boundary; query b out of order (resume-style)
    for step in [0, 1, 5, 9, 2]:
        ba, bb = a.batch_at(step), b.batch_at(step)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])
    # different epochs shuffle differently
    assert not all(
        np.array_equal(a.batch_at(s)["tokens"], a.batch_at(s + spe)["tokens"])
        for s in range(spe))


def test_train_resume_is_bit_exact(tmp_path):
    """Train 4 steps straight vs train 2 + resume to 4: final params must
    match BIT-EXACTLY (step-pure batches + fold_in(step) rng)."""
    import jax

    from rtts.config import apply_overrides, from_dict, Config
    from rtts.data.corpus import generate_corpus
    from rtts.data.preprocess import preprocess_corpus
    from rtts.train.train_tts import train_tts

    over = [
        f"dataset.data_dir={tmp_path / 'data'}",
        "dataset.batch_size=2", "dataset.num_workers=0",
        "model.d_model=32", "model.n_mels=80",
        "model.dec_prenet_hidden=16",
        "model.encoder.num_layers=1", "model.encoder.d_model=32",
        "model.encoder.d_ff=64",
        "model.encoder.attention.num_heads=2",
        "model.encoder.attention.head_dim=16",
        "model.decoder.num_layers=1", "model.decoder.d_model=32",
        "model.decoder.d_ff=64", "model.decoder.causal=true",
        "model.decoder.attention.num_heads=2",
        "model.decoder.attention.head_dim=16",
        "model.compute_dtype=float32",
        "experiment.logging.log_every_steps=1",
        "experiment.logging.eval_every_steps=2",
        "experiment.eval_batches=1",
        "experiment.checkpoint.keep=9",
    ]
    cfg = from_dict(Config, apply_overrides({}, over))
    generate_corpus(tmp_path / "data", n_utterances=5)
    preprocess_corpus(cfg.dataset, str(tmp_path / "data" / "transcripts.txt"))

    train_tts(cfg, str(tmp_path / "A"), max_steps=4)
    train_tts(cfg, str(tmp_path / "B"), max_steps=2)
    train_tts(cfg, str(tmp_path / "B"), max_steps=4)  # resumes from step 2

    from rtts.train.checkpoint import latest_checkpoint
    pa = latest_checkpoint(tmp_path / "A" / "checkpoints")
    pb = latest_checkpoint(tmp_path / "B" / "checkpoints")
    assert pa.endswith("step_4") and pb.endswith("step_4")
    za = np.load(pathlib.Path(pa) / "leaves.npz")
    zb = np.load(pathlib.Path(pb) / "leaves.npz")
    assert set(za.files) == set(zb.files)
    for k in za.files:
        np.testing.assert_array_equal(za[k], zb[k], err_msg=k)


# -- AsyncCheckpointer ---------------------------------------------------


def test_async_save_matches_sync(tmp_path):
    from rtts.train.checkpoint import AsyncCheckpointer

    t = _tree(3.0)
    with AsyncCheckpointer() as ck:
        ck.save(tmp_path / "a", t, step=5, metric=0.1)
    sync_dir = tmp_path / "b"
    save_checkpoint(sync_dir, t, step=5, metric=0.1)
    ra, _ = restore_checkpoint(latest_checkpoint(tmp_path / "a"), _tree(0.0))
    rb, _ = restore_checkpoint(latest_checkpoint(sync_dir), _tree(0.0))
    for la, lb in zip(jax.tree_util.tree_leaves(ra),
                      jax.tree_util.tree_leaves(rb)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_async_save_snapshots_before_donation(tmp_path):
    """The tree is copied to host inside save(): overwriting the arrays
    right after save() returns (what a donated train step does) must not
    corrupt the checkpoint."""
    from rtts.train.checkpoint import AsyncCheckpointer

    buf = np.ones((256, 256), np.float32)
    with AsyncCheckpointer() as ck:
        ck.save(tmp_path, {"w": jnp.asarray(buf)}, step=1)
        buf[:] = -1.0  # the jnp.asarray copied already; mutate the source
    restored, _ = restore_checkpoint(latest_checkpoint(tmp_path),
                                     {"w": jnp.zeros((256, 256))})
    np.testing.assert_array_equal(np.asarray(restored["w"]), 1.0)


def test_async_saves_serialize_in_order(tmp_path):
    from rtts.train.checkpoint import AsyncCheckpointer

    with AsyncCheckpointer() as ck:
        for s in (1, 2, 3):
            ck.save(tmp_path, _tree(float(s)), step=s, metric=float(s),
                    keep=10)
    path = latest_checkpoint(tmp_path)
    assert path and path.endswith("step_3")
    restored, step = restore_checkpoint(path, _tree(0.0))
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored["params"]["a"]),
                                  3.0 * np.ones((3, 4)))


def test_async_error_surfaces_on_wait(tmp_path):
    from rtts.train.checkpoint import AsyncCheckpointer

    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file where the checkpoint dir should go")
    ck = AsyncCheckpointer()
    ck.save(blocker / "sub", _tree(), step=1)
    with pytest.raises(Exception):
        ck.wait()
    # the error is consumed: the checkpointer is reusable afterwards
    ck.save(tmp_path / "ok", _tree(), step=2)
    ck.wait()
    assert latest_checkpoint(tmp_path / "ok")
