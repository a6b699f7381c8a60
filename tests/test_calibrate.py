"""Calibration tests: ChArUco pose detection, robot-world hand-eye solve,
and the RealEnv fixed-camera calibration path — all on synthetic data
(reference behavior: `src/real_world/utils/real_env.py:340-412,509-556`)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gsdx.realworld.calibrate import (  # noqa: E402
    detect_charuco_pose,
    make_charuco_board,
    solve_hand_eye,
)


def _board_image(px_per_m=2500):
    """Frontal render of the default board plus its pixel scale."""
    board, _ = make_charuco_board()
    sx, sy = board.getChessboardSize()
    sq = board.getSquareLength()
    w_px = int(sx * sq * px_per_m)
    h_px = int(sy * sq * px_per_m)
    img = board.generateImage((w_px, h_px))
    return board, img


def _rot(axis, deg):
    r, _ = cv2.Rodrigues(np.asarray(axis, np.float64)
                         * np.deg2rad(deg))
    return r


def test_charuco_pose_self_consistent():
    """Detected pose reprojects the board's chessboard corners onto the
    detector's measured corner pixels."""
    board, img = _board_image()
    h, w = img.shape[:2]
    # Pad so the detector has quiet borders.
    canvas = np.full((h + 200, w + 200), 255, np.uint8)
    canvas[100:100 + h, 100:100 + w] = img
    k = np.array([[1200.0, 0, canvas.shape[1] / 2],
                  [0, 1200.0, canvas.shape[0] / 2], [0, 0, 1]])

    res = detect_charuco_pose(canvas, k, board=board)
    assert res is not None, "board not detected in synthetic image"
    rvec, tvec = res

    detector = cv2.aruco.CharucoDetector(board)
    corners, ids, _, _ = detector.detectBoard(canvas)
    obj = board.getChessboardCorners()[ids.reshape(-1)]
    proj, _ = cv2.projectPoints(obj, rvec, tvec, k, np.zeros(5))
    err = np.abs(proj.reshape(-1, 2) - corners.reshape(-1, 2)).max()
    assert err < 1.0, f"max reprojection error {err:.2f}px"


def _hom(r, t):
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = np.asarray(t).reshape(3)
    return m


def test_solve_hand_eye_recovers_truth():
    """Eye-in-hand rig with a fixed board: exact synthetic poses round-trip
    through cv2.calibrateRobotWorldHandEye (the reference's Tsai call)."""
    rng = np.random.default_rng(3)
    T_b2w = _hom(_rot([0, 0, 1], 30.0), [0.2, -0.1, 0.05])  # base->world
    T_g2c = _hom(_rot([1, 0, 0], -15.0), [0.01, 0.03, -0.02])  # gripper->cam

    R_board2cam, t_board2cam, R_g2b, t_g2b = [], [], [], []
    for _ in range(8):
        ax = rng.normal(size=3)
        T_g2b_i = _hom(_rot(ax / np.linalg.norm(ax), rng.uniform(5, 60)),
                       rng.uniform(-0.3, 0.3, 3))
        # point chain world->base->gripper->cam; board frame == world frame
        T_w2c = T_g2c @ np.linalg.inv(T_g2b_i) @ np.linalg.inv(T_b2w)
        R_board2cam.append(T_w2c[:3, :3])
        t_board2cam.append(T_w2c[:3, 3])
        R_g2b.append(T_g2b_i[:3, :3])
        t_g2b.append(T_g2b_i[:3, 3])

    calib = solve_hand_eye(R_board2cam, t_board2cam, R_g2b, t_g2b)
    np.testing.assert_allclose(calib["R_base2world"], T_b2w[:3, :3], atol=1e-6)
    np.testing.assert_allclose(calib["t_base2world"], T_b2w[:3, 3], atol=1e-6)
    np.testing.assert_allclose(calib["R_gripper2cam"], T_g2c[:3, :3], atol=1e-6)
    np.testing.assert_allclose(calib["t_gripper2cam"], T_g2c[:3, 3], atol=1e-6)


def test_real_env_calibrate_fixed_cameras(tmp_path):
    """RealEnv.calibrate_fixed_cameras on a static board image yields
    cam->world extrinsics that are the inverse of the detected board pose,
    and they survive a save/load round-trip."""
    import time

    from gsdx.realworld.cameras import StaticImageSource
    from gsdx.realworld.real_env import RealEnv
    from gsdx.realworld.robot import FakeArm

    board, img = _board_image(px_per_m=1500)
    h, w = img.shape[:2]
    canvas = np.full((h + 120, w + 120), 255, np.uint8)
    canvas[60:60 + h, 60:60 + w] = img
    color = np.repeat(canvas[:, :, None], 3, axis=2)
    k = np.array([[900.0, 0, color.shape[1] / 2],
                  [0, 900.0, color.shape[0] / 2], [0, 0, 1]], np.float32)

    env = RealEnv([StaticImageSource(color, k=k, fps=60)], arm=FakeArm(),
                  capture_fps=30, obs_fps=30)
    try:
        env.start()
        time.sleep(0.4)
        R_c2w, t_c2w = env.calibrate_fixed_cameras(board=board)
    finally:
        env.stop()

    assert len(R_c2w) == 1
    rvec, tvec = detect_charuco_pose(color, k, board=board)
    R_b2c, _ = cv2.Rodrigues(rvec)
    np.testing.assert_allclose(R_c2w[0], R_b2c.T, atol=1e-6)
    np.testing.assert_allclose(t_c2w[0], -R_b2c.T @ tvec, atol=1e-6)

    path = str(tmp_path / "calib.pkl")
    env.R_base2world = np.eye(3)
    env.t_base2world = np.zeros(3)
    env.save_calibration(path)
    env2 = RealEnv([StaticImageSource(color, k=k)], arm=FakeArm())
    env2.load_calibration(path)
    np.testing.assert_allclose(env2.R_cam2world[0], R_c2w[0])
    np.testing.assert_allclose(env2.t_cam2world[0], t_c2w[0])
