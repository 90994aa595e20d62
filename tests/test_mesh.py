"""Mesh construction + multi-host init guard (SURVEY.md §3.5/§6.8)."""

import jax
import numpy as np
import pytest

from rtts.config import MeshConfig
from rtts.parallel.mesh import make_mesh, should_initialize


def test_should_initialize_single_process_default():
    # no coordinator anywhere -> never initialize (the round-1 bug was a
    # jax.process_count() guard, which is 1 before init by definition)
    assert not should_initialize(MeshConfig(), env={})
    assert not should_initialize(None, env={})


def test_should_initialize_explicit_config():
    assert should_initialize(
        MeshConfig(coordinator_address="10.0.0.1:1234"), env={})
    assert should_initialize(
        MeshConfig(num_processes=4, process_id=2), env={})


def test_should_initialize_env_opt_in_only():
    assert should_initialize(MeshConfig(), env={"RTTS_MULTIHOST": "1"})
    assert not should_initialize(MeshConfig(), env={"RTTS_MULTIHOST": "0"})
    # single-host TPU-VM images set generic cluster vars; must NOT trigger
    assert not should_initialize(
        MeshConfig(), env={"TPU_WORKER_HOSTNAMES": "a,b"})


def test_make_mesh_2d():
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_make_mesh_dcn_outermost():
    mesh = make_mesh(MeshConfig(dcn_parallel=2, data_parallel=2,
                                model_parallel=2))
    assert tuple(mesh.axis_names) == ("dcn", "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    # dcn groups are contiguous device blocks (slice-major ordering)
    devs = np.asarray(mesh.devices)
    flat = [d.id for d in devs.reshape(-1)]
    assert flat == sorted(flat)


def test_make_mesh_overcommit_raises():
    with pytest.raises(ValueError, match="needs"):
        make_mesh(MeshConfig(data_parallel=16, model_parallel=2))


def test_make_mesh_auto_dp_accounts_for_dcn():
    n = len(jax.devices())
    mesh = make_mesh(MeshConfig(dcn_parallel=2, model_parallel=1))
    assert dict(mesh.shape) == {"dcn": 2, "data": n // 2, "model": 1}
