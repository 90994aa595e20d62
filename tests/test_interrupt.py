"""Graceful preemption handling (SURVEY.md §6.3): SIGTERM/SIGINT turn
into a checkpoint-and-clean-exit at the next step boundary, and the
interrupted run resumes to the same final state as an uninterrupted one."""

import signal

import numpy as np
import pytest

from rtts.train.interrupt import GracefulStop


def test_graceful_stop_sets_flag_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with GracefulStop() as s:
        assert not s.stop_requested
        signal.raise_signal(signal.SIGTERM)
        assert s.stop_requested
    assert signal.getsignal(signal.SIGTERM) is before


def test_second_sigint_reaches_original_handler():
    with GracefulStop() as s:
        signal.raise_signal(signal.SIGINT)
        assert s.stop_requested
        # the second signal restores the previous disposition and
        # re-delivers: under pytest that is Python's default handler,
        # which raises KeyboardInterrupt
        with pytest.raises(KeyboardInterrupt):
            signal.raise_signal(signal.SIGINT)
    # context exit reinstalls the original handlers even after the re-raise
    assert signal.getsignal(signal.SIGINT) is signal.default_int_handler


def test_request_stop_is_equivalent_to_first_signal():
    with GracefulStop() as s:
        s.request_stop()
        assert s.stop_requested


class _StopAfterPolls:
    """Injection stub: reports stop once it has been polled n times
    (i.e. after n completed train steps)."""

    def __init__(self, n: int):
        self.n = n
        self.polls = 0

    @property
    def stop_requested(self) -> bool:
        self.polls += 1
        return self.polls >= self.n


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    from rtts.data.corpus import generate_corpus
    from rtts.data.preprocess import preprocess_corpus
    from tests.test_train_harness import _cfg

    root = tmp_path_factory.mktemp("interrupt")
    data_dir = str(root / "data")
    cfg = _cfg(data_dir)
    generate_corpus(root, n_utterances=8)
    preprocess_corpus(cfg.dataset, str(root / "transcripts.txt"))
    return data_dir


def _params_leaves(ckpt_path):
    import pathlib

    with np.load(pathlib.Path(ckpt_path) / "leaves.npz") as z:
        return {k: np.array(z[k]) for k in z.files if k.startswith("params")}


def test_interrupted_train_resumes_to_identical_state(prepared, tmp_path):
    from rtts.train.checkpoint import latest_checkpoint
    from rtts.train.train_tts import train_tts
    from tests.test_train_harness import _cfg

    cfg = _cfg(prepared)

    # A: uninterrupted 4-step run
    work_a = tmp_path / "straight"
    train_tts(cfg, str(work_a), max_steps=4)

    # B: stopped after 2 steps (mid-interval: 2 is neither an eval step
    # nor a save_every step in this config, so the interrupt save is the
    # only reason a checkpoint exists), then resumed to 4
    work_b = tmp_path / "interrupted"
    m = train_tts(cfg, str(work_b), max_steps=4, stop=_StopAfterPolls(2))
    assert m["interrupted_at_step"] == 2
    ck = latest_checkpoint(work_b / "checkpoints")
    assert ck is not None and ck.rstrip("/").endswith("2")
    m2 = train_tts(cfg, str(work_b), max_steps=4)
    assert "interrupted_at_step" not in m2

    # the resumed run must land on the exact same parameters
    ck_a = latest_checkpoint(work_a / "checkpoints")
    ck_b = latest_checkpoint(work_b / "checkpoints")
    assert ck_a.rstrip("/").endswith("4") and ck_b.rstrip("/").endswith("4")
    pa, pb = _params_leaves(ck_a), _params_leaves(ck_b)
    assert pa.keys() == pb.keys() and pa
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)


def test_interrupted_vocoder_saves_checkpoint(prepared, tmp_path):
    from rtts.train.checkpoint import latest_checkpoint
    from rtts.train.train_vocoder import train_vocoder
    from tests.test_train_harness import _cfg

    cfg = _cfg(prepared)
    work = tmp_path / "voc"
    m = train_vocoder(cfg, str(work), max_steps=10, stop=_StopAfterPolls(3))
    assert m["interrupted_at_step"] == 3
    ck = latest_checkpoint(work / "checkpoints")
    assert ck is not None and ck.rstrip("/").endswith("3")


def test_stop_requested_global_single_process():
    """Single-process path: pure local-flag passthrough, no device work
    (the multi-process all-gather agreement is exercised for real by the
    2-process run in scripts/multihost_dryrun.py)."""
    from rtts.train.interrupt import GracefulStop, stop_requested_global

    stop = GracefulStop()
    assert stop_requested_global(stop) is False
    stop.request_stop()
    assert stop_requested_global(stop) is True
