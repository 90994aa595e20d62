"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md §5.3 item 6: distributed-without-a-cluster via
``xla_force_host_platform_device_count`` — pjit/shard_map tests assert
sharding and numerical equality against single-device runs, all on CPU.

Note: this environment's axon site-hook pins JAX_PLATFORMS=axon (the real
TPU), so the env var alone is not enough — we must also set the config flag
before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# -- quick tier (`pytest -m quick`) -------------------------------------------
# One or two representative tests per subsystem, curated to finish in
# <5 min on this 1-core host (the full suite takes ~30-50 min).  Kept as
# node-id prefixes here — one place to curate — rather than pytestmark
# scattered over 50 files.  Parametrized variants of a listed test are
# all included (prefix match on the bare node id).
QUICK = [
    # config / text / audio frontends
    "test_config.py::test_from_dict_rejects_unknown_keys",
    "test_config.py::test_overrides_dot_paths",
    "test_text.py::test_encode_batch_shapes_and_padding",
    "test_g2p.py",
    "test_audio.py::test_log_mel_shapes_and_batching",
    # LSH core + oracle parity + masking
    "test_lsh.py::test_single_chunk_equals_full",
    "test_lsh.py::test_causal_no_future_leakage",
    "test_hf_parity.py::test_lsh_attention_matches_hf",
    # sort-gather modes, flash kernel, pallas interpret
    "test_sort_gather.py::test_onehot_close_to_take_bf16",
    "test_flash_attention.py::test_shared_qk_flash_matches_naive",
    "test_pallas_ops.py::test_pallas_attend_matches_reference[1-1-False]",
    # reversible + model forward
    "test_model_lsh.py::test_lsh_reversible_grads_match_plain",
    "test_model_m1.py::test_forward_shapes",
    # attention dropout (incl. the positional draw)
    "test_attention_dropout.py::test_positional_dropout_statistics_and_scaling",
    # vocoder
    "test_squeezewave.py::test_roundtrip_forward_inverse",
    "test_squeezewave.py::test_fold_weightnorm_preserves_infer",
    # data pipeline + scraper goldens
    "test_data_pipeline.py::test_manifest_and_clips",
    "test_download_parsing.py::test_timed_transcript_page_golden",
    # decode/serving
    "test_decode_modes.py::test_staged_matches_fixed_kv_full",
    "test_kv_local.py::test_auto_mode_resolves_local",
    "test_continuous.py::test_shape_validation",
    # checkpoint / optimizer
    "test_checkpoint.py::test_save_restore_round_trip",
    "test_grad_accum.py::test_lr_at_step_tracks_schedule_and_accumulation",
    # parallelism (mesh, SP, ZeRO)
    "test_mesh.py",
    "test_seq_parallel.py::test_seq_parallel_matches_single_device[allgather-False]",
    "test_pipeline_parallel.py::test_pipeline_matches_single_device[1-False-full]",
    "test_zero_sharding.py",
    # quality scalars + CLI surface
    "test_quality.py",
    "test_guided_attention.py::test_weight_matrix_semantics",
    "test_cli.py::test_help_lists_verbs",
    # hosted-tracker adapter (offline degradation + forwarding)
    "test_tracking.py::test_missing_sdk_degrades_to_none_with_warning",
    "test_tracking.py::test_metric_logger_forwards_scalars_artifacts_and_finish",
]


def pytest_collection_modifyitems(config, items):
    matched = set()
    collected_files = set()
    for item in items:
        bare = item.nodeid.split("tests/")[-1]
        collected_files.add(bare.split("::")[0])
        for q in QUICK:
            if bare == q or bare.startswith(q + "::") or bare.startswith(q):
                item.add_marker(pytest.mark.quick)
                matched.add(q)
    # A QUICK entry whose file WAS collected but which matched no item is a
    # stale node id (e.g. a renamed parametrization) — fail loudly instead
    # of silently shrinking the quick tier (ADVICE r4).  Entries whose file
    # wasn't collected at all (single-file pytest invocations) are fine.
    # ...and node-id invocations (pytest file.py::test_x) legitimately
    # collect a file without most of its items — don't enforce there.
    node_id_invocation = any("::" in str(a) for a in config.args)
    stale = [q for q in QUICK
             if q not in matched and q.split("::")[0] in collected_files
             and not node_id_invocation]
    if stale:
        raise pytest.UsageError(
            "conftest.QUICK entries matched no collected test (stale node "
            "ids?): " + ", ".join(stale))
