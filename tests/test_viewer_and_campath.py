"""Viewer socket protocol + camera-path interpolation tests."""

import json
import socket
import threading

import numpy as np

from gags_tpu.utils.viewer import ViewerServer
from gags_tpu.utils.campath import interpolate_path, simple_interpolation
from gags_tpu.core.camera import look_at


def test_viewer_roundtrip():
    srv = ViewerServer(port=0)
    port = srv.listener.getsockname()[1]

    result = {}

    def client():
        c = socket.create_connection(("127.0.0.1", port))
        vm = np.eye(4, dtype=np.float32)
        msg = dict(
            resolution_x=8, resolution_y=4, train=True, fov_x=1.0, fov_y=0.8,
            z_near=0.01, z_far=100.0, shs_python=False, rot_scale_python=False,
            keep_alive=True, scaling_modifier=1.0,
            view_matrix=vm.flatten().tolist(),
            view_projection_matrix=vm.flatten().tolist(),
        )
        raw = json.dumps(msg).encode()
        c.sendall(len(raw).to_bytes(4, "little") + raw)
        img = b""
        while len(img) < 8 * 4 * 3:
            img += c.recv(8 * 4 * 3 - len(img))
        n = int.from_bytes(c.recv(4), "little")
        result["verify"] = c.recv(n).decode()
        result["img"] = img
        c.close()

    t = threading.Thread(target=client)
    t.start()
    while not srv.try_connect():
        pass
    req = srv.receive()
    assert req.width == 8 and req.height == 4
    assert req.do_training and req.keep_alive
    # y/z flip then transpose of identity stays sign-flipped diag
    np.testing.assert_allclose(np.abs(np.diag(req.viewmat)), 1.0)
    srv.send(np.zeros((4, 8, 3), np.float32), "ok")
    t.join(timeout=5)
    assert result["verify"] == "ok"
    assert len(result["img"]) == 96
    srv.close()


def _ring_poses(n=8, r=4.0):
    c2ws = []
    for a in np.linspace(0, 2 * np.pi, n, endpoint=False):
        eye = np.array([r * np.cos(a), 0.5, r * np.sin(a)])
        vm = look_at(eye, np.zeros(3), np.array([0, -1.0, 0]))
        c2ws.append(np.linalg.inv(vm))
    return np.stack(c2ws)


def test_interpolate_path_smooth():
    c2ws = _ring_poses()
    out = interpolate_path(c2ws, 40)
    assert out.shape == (40, 4, 4)
    # all interpolated cameras look roughly at the origin
    for vm in out:
        p = vm[:3, :3] @ np.zeros(3) + vm[:3, 3]
        assert p[2] > 0  # origin in front of every camera
    # positions stay near the ring radius
    centers = np.stack([-vm[:3, :3].T @ vm[:3, 3] for vm in out])
    radii = np.linalg.norm(centers[:, [0, 2]], axis=1)
    assert (np.abs(radii - 4.0) < 1.0).all()


def test_simple_interpolation_counts():
    c2ws = _ring_poses(4)
    vms = np.stack([np.linalg.inv(c) for c in c2ws])
    out = simple_interpolation(vms, 5)
    assert out.shape == (3 * 5 + 1, 4, 4)


def test_training_viewer_poll():
    """TrainingViewer serves pending SIBR requests without stalling training
    when idle (reference train.py:109-123 semantics)."""
    import time

    from gags_tpu.utils.viewer import TrainingViewer

    srv = ViewerServer(port=0)
    port = srv.listener.getsockname()[1]
    tv = TrainingViewer(
        srv, lambda req: np.full((req.height, req.width, 3), 0.5, np.float32), "src"
    )
    tv.poll(1, 10)  # no client connected: immediate no-op

    out = {}

    def client():
        c = socket.create_connection(("127.0.0.1", port))
        vm = np.eye(4, dtype=np.float32)
        msg = dict(
            resolution_x=8, resolution_y=4, train=True, fov_x=1.0, fov_y=0.8,
            z_near=0.01, z_far=100.0, shs_python=False, rot_scale_python=False,
            keep_alive=True, scaling_modifier=1.0,
            view_matrix=vm.flatten().tolist(),
            view_projection_matrix=vm.flatten().tolist(),
        )
        raw = json.dumps(msg).encode()
        c.sendall(len(raw).to_bytes(4, "little") + raw)
        img = b""
        while len(img) < 96:
            img += c.recv(96 - len(img))
        n = int.from_bytes(c.recv(4), "little")
        out["verify"] = c.recv(n)
        out["img"] = img
        c.close()

    t = threading.Thread(target=client)
    t.start()
    deadline = time.time() + 10
    while "verify" not in out and time.time() < deadline:
        tv.poll(2, 10)
        time.sleep(0.01)
    t.join(timeout=5)
    assert out["verify"] == b"src"
    assert out["img"][0] == 127  # 0.5 * 255
    # disconnected client: poll hits the EOF path and drops the connection
    for _ in range(20):
        tv.poll(3, 10)
        if srv.conn is None:
            break
        time.sleep(0.01)
    assert srv.conn is None
    tv.close()
