"""Camera calibration: ChArUco board detection + robot-world hand-eye solve.

Host-side OpenCV reuse, matching the reference
(`src/real_world/utils/real_env.py:80-92,402-412`,
`src/real_world/calibrate.py:12-98`): per-camera ChArUco pose gives
board->camera; with the robot holding the board,
`cv2.calibrateRobotWorldHandEye` (Tsai) yields base->world and
gripper->camera transforms.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np


def make_charuco_board(squares_x: int = 6, squares_y: int = 5,
                       square_len: float = 0.04, marker_len: float = 0.03):
    import cv2

    adict = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    board = cv2.aruco.CharucoBoard(
        (squares_x, squares_y), square_len, marker_len, adict
    )
    return board, adict


def detect_charuco_pose(image: np.ndarray, k: np.ndarray,
                        dist: Optional[np.ndarray] = None,
                        board=None) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(rvec, tvec) board pose in the camera frame, or None if not found."""
    import cv2

    if board is None:
        board, _ = make_charuco_board()
    if dist is None:
        dist = np.zeros(5)
    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY) if image.ndim == 3 else image
    detector = cv2.aruco.CharucoDetector(board)
    charuco_corners, charuco_ids, _, _ = detector.detectBoard(gray)
    if charuco_corners is None or len(charuco_corners) < 4:
        return None
    ok, rvec, tvec = cv2.aruco.estimatePoseCharucoBoard(
        charuco_corners, charuco_ids, board, k, dist, None, None
    )
    if not ok:
        return None
    return rvec.reshape(3), tvec.reshape(3)


def solve_hand_eye(
    R_board2cam: List[np.ndarray], t_board2cam: List[np.ndarray],
    R_gripper2base: List[np.ndarray], t_gripper2base: List[np.ndarray],
) -> Dict[str, np.ndarray]:
    """Robot-world hand-eye (`real_env.py:402-412`): returns R/t base->world
    and R/t gripper->cam given paired board and gripper poses."""
    import cv2

    R_b2w, t_b2w, R_g2c, t_g2c = cv2.calibrateRobotWorldHandEye(
        [np.asarray(R) for R in R_board2cam],
        [np.asarray(t).reshape(3, 1) for t in t_board2cam],
        [np.asarray(R) for R in R_gripper2base],
        [np.asarray(t).reshape(3, 1) for t in t_gripper2base],
    )
    return {
        "R_base2world": R_b2w,
        "t_base2world": t_b2w.reshape(3),
        "R_gripper2cam": R_g2c,
        "t_gripper2cam": t_g2c.reshape(3),
    }


def save_calibration(path: str, calib: Dict[str, np.ndarray]) -> None:
    with open(path, "wb") as f:
        pickle.dump(calib, f)


def load_calibration(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        return pickle.load(f)
