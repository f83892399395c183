"""HTTP live-viewer server: endpoints, sanitization, post-hoc fallback.

Covers the TPU-native replacement for the reference's interactive GUI
(/root/reference/src/tools/visualizer_util.py) — see
unislam_tpu/utils/webviewer.py.
"""

import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest

from unislam_tpu.utils import playback, webviewer
from unislam_tpu.utils.mesh_io import write_ply


@pytest.fixture()
def run_dir(tmp_path):
    """A fake run output dir: live.json + two mesh snapshots."""
    out = tmp_path / "run"
    mesh_dir = out / "mesh"
    mesh_dir.mkdir(parents=True)
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    colors = np.full((4, 3), 0.5, np.float32)
    write_ply(str(mesh_dir / "mesh_000010.ply"), verts, faces, colors)
    write_ply(str(mesh_dir / "mesh_000020.ply"), verts + 1.0, faces, colors)
    est = np.tile(np.eye(4, dtype=np.float32), (21, 1, 1))
    est[:, 0, 3] = np.linspace(0, 2, 21)
    playback.write_live_state(str(out), 20, 40, est, est,
                              mesh_dir=str(mesh_dir))
    return str(out)


@pytest.fixture()
def server(run_dir):
    srv = webviewer.start_background(run_dir, port=0)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()
    srv.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_serves_viewer_page(server):
    status, ctype, body = _get(server + "/")
    assert status == 200 and "text/html" in ctype
    text = body.decode()
    assert "<html" in text and "parsePLY" in text  # the embedded app


def test_state_endpoint_live(server):
    status, ctype, body = _get(server + "/state")
    assert status == 200 and "json" in ctype
    state = json.loads(body)
    assert state["frame"] == 20 and state["n_img"] == 40
    assert len(state["est_t"]) == 21
    assert state["mesh"] == "mesh_000020.ply"  # newest snapshot, name only
    assert state["meshes"] == ["mesh_000010.ply", "mesh_000020.ply"]
    assert not state["done"]


def test_mesh_endpoint_roundtrip(server, tmp_path):
    status, _, body = _get(server + "/mesh/mesh_000010.ply")
    assert status == 200
    p = tmp_path / "dl.ply"
    p.write_bytes(body)
    from unislam_tpu.utils.mesh_io import read_ply
    verts, faces, colors = read_ply(str(p))
    assert verts.shape == (4, 3) and faces.shape == (2, 3)
    assert colors is not None


def test_mesh_traversal_rejected(server, run_dir):
    # a secret outside mesh/ must not be reachable via path tricks
    secret = os.path.join(run_dir, "secret.ply")
    with open(secret, "w") as f:
        f.write("nope")
    for path in ("/mesh/../secret.ply", "/mesh/%2e%2e/secret.ply",
                 "/mesh/missing.ply", "/mesh/live.json"):
        try:
            status, _, body = _get(server + path)
        except urllib.error.HTTPError as e:
            status, body = e.code, e.read()
        assert status == 404 or b"nope" not in body


def test_posthoc_state_from_checkpoint(tmp_path):
    # no live.json: /state falls back to the latest checkpoint
    out = tmp_path / "done_run"
    (out / "ckpts").mkdir(parents=True)
    est = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    np.savez(str(out / "ckpts" / "ckpt_000004.npz"),
             est_c2w=est, gt_c2w=est,
             __meta__=np.frombuffer(json.dumps({"idx": 4}).encode(),
                                    dtype=np.uint8))
    srv = webviewer.start_background(str(out), port=0)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        status, _, body = _get(base + "/state")
        assert status == 200
        state = json.loads(body)
        assert state["done"] and state["frame"] == 4
        assert len(state["est_t"]) == 5
    finally:
        srv.shutdown()
        srv.server_close()
