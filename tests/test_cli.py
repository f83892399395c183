"""End-to-end CLI test: drive run.py as a real subprocess over an on-disk
fake-Replica fixture (reference entry point: /root/reference/run.py:25-41).

This covers the glue no in-process test touches: config load + inherit_from
resolution, dataset dispatch by path, SLAMRuntime construction, output
artifact layout, the reproducibility snapshot, and --resume restoring from
the latest checkpoint.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          check=True, timeout=timeout, capture_output=True,
                          text=True)


@pytest.mark.slow
def test_run_cli_end_to_end_and_resume(tmp_path):
    fx = str(tmp_path / "fake_replica")
    _run(["examples/make_fake_replica.py", fx, "6"], timeout=300)
    cfg_path = os.path.join(fx, "fake_room.yaml")
    out = str(tmp_path / "out")

    _run(["run.py", cfg_path, "--output", out, "--platform", "cpu",
          "--n_frames", "4"], timeout=1200)

    # artifact layout (reference dumps config + src snapshot + ckpts +
    # meshes under the output dir, UNISLAM.py:146-158)
    assert os.path.exists(os.path.join(out, "config.yaml"))
    assert os.path.isdir(os.path.join(out, "src_snapshot", "unislam_tpu"))
    assert os.path.exists(os.path.join(out, "output.txt"))
    ckpts = os.listdir(os.path.join(out, "ckpts"))
    assert ckpts, "no checkpoint written"
    meshes = [m for m in os.listdir(os.path.join(out, "mesh"))
              if m.endswith(".ply")]
    assert meshes, "no final mesh written"
    txt = open(os.path.join(out, "output.txt")).read()
    assert "ate-rmse" in txt.lower() or "rmse" in txt.lower()

    # --resume: restores from the latest ckpt, continues to the new end,
    # and PRESERVES the original source snapshot (ADVICE r4)
    marker = os.path.join(out, "src_snapshot", "MARKER")
    open(marker, "w").write("pre-resume snapshot")
    r = _run(["run.py", cfg_path, "--output", out, "--platform", "cpu",
              "--n_frames", "6", "--resume"], timeout=1200)
    assert "resumed from" in r.stdout
    assert os.path.exists(marker), "snapshot overwritten on --resume"
    # the resumed run processed the remaining frames and re-finalized
    assert txt != open(os.path.join(out, "output.txt")).read()
