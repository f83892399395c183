"""Multi-host simulation: the sharded mapping step over 2 processes x 4
virtual CPU devices (jax.distributed + gloo collectives) must reproduce the
single-process 8-device numerics exactly (SURVEY.md §4: multi-host tests
via jax.distributed multi-process simulation).

The subprocess workers (tests/multihost_worker.py) exercise the REAL wiring
— jax.distributed.initialize, a global ('rays',) mesh spanning processes,
replicated global inputs, cross-process gradient all-reduce — not a mock.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_process_result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mh") / "result.json")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), "2", str(pid), "4", out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    with open(out) as f:
        return json.load(f)


def test_two_processes_match_single_process(two_process_result):
    res = two_process_result
    assert res["n_processes"] == 2 and res["n_global_devices"] == 8

    # single-process reference on this process's own 8 virtual devices
    from unislam_tpu.parallel import sharding as sh
    from unislam_tpu.parallel import sim

    mesh = sh.make_mesh(8)
    p = sim.build_tiny_mapping_problem(mesh=mesh)
    opt_tree, _, loss = sim.run_tiny_step(p)
    ref_loss = float(loss)
    ref_sums = sim.param_checksums(opt_tree)

    assert np.isfinite(res["loss"])
    np.testing.assert_allclose(res["loss"], ref_loss, rtol=1e-6)
    assert set(res["checksums"]) == set(ref_sums)
    for name, val in ref_sums.items():
        np.testing.assert_allclose(res["checksums"][name], val, rtol=1e-5,
                                   err_msg=name)


@pytest.mark.slow
def test_two_process_e2e_slam_matches_single(tmp_path):
    """VERDICT r3 #6: N frames of the tiny SLAM loop (tracking + selection
    + mapping + keyframe adds) across 2 real processes must reproduce the
    single-process 8-device trajectory."""
    out = str(tmp_path / "slam.json")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), "2", str(pid), "4", out, "slam"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    with open(out) as f:
        res = json.load(f)
    assert res["n_processes"] == 2 and res["n_global_devices"] == 8

    from unislam_tpu.parallel import sharding as sh
    from unislam_tpu.parallel import sim
    est_ref, losses_ref = sim.run_tiny_slam(mesh=sh.make_mesh(8), n_frames=6)

    est_mp = np.asarray(res["est7"], np.float32)
    assert est_mp.shape == est_ref.shape
    # Cross-process gloo reductions reassociate differently from the local
    # 8-device reduction, and Adam flips update signs on near-zero table
    # gradients under any reduction-order change (each flip costs one
    # lr-sized step — same rationale as the 8-device e2e test in
    # test_engine.py). Demand cm-scale trajectory agreement on the ~3 m toy
    # scene plus matching loss curves.
    np.testing.assert_allclose(est_mp, est_ref, atol=1e-2)
    np.testing.assert_allclose(res["losses"], losses_ref, rtol=1e-3)


def test_distributed_env_contract_no_env_is_noop():
    from unislam_tpu.parallel import distributed as dist
    for var in ("UNISLAM_COORDINATOR", "UNISLAM_NUM_PROCESSES",
                "UNISLAM_PROCESS_ID"):
        assert var not in os.environ
    assert dist.initialize_from_env() == 0
