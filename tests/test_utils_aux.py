"""Aux subsystems: viz overlays, timers, tracking resume, RealEnv facade."""

import os
import time

import numpy as np

from gsdx.utils.profiling import Timer
from gsdx.utils.viz import (
    TrailVisualizer,
    draw_arrow_on_image,
    draw_mask_on_image,
    draw_points_on_image,
    project_points,
    visualize_push,
)


def test_project_points():
    intr = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    extr = np.eye(4)
    pts = np.array([[0.0, 0.0, 2.0], [0.1, 0.0, 2.0]])
    px = project_points(pts, intr, extr)
    np.testing.assert_allclose(px[0], [64, 48], atol=1e-6)
    np.testing.assert_allclose(px[1], [69, 48], atol=1e-6)


def test_draw_overlays(rng):
    img = (rng.uniform(size=(96, 128, 3)) * 255).astype(np.uint8)
    out = draw_points_on_image(img, np.array([[30, 40], [60, 20]]))
    assert out.shape == img.shape and not np.array_equal(out, img)
    out2 = draw_arrow_on_image(out, (10, 10), (100, 80))
    mask = np.zeros((96, 128))
    mask[20:50, 30:70] = 1
    out3 = draw_mask_on_image(out2, mask)
    assert out3.dtype == np.uint8
    out4 = visualize_push(img, np.array([[50, 50]]), (10, 10), (90, 90),
                          target_2d=np.array([[100, 60]]))
    assert out4.shape == img.shape

    tv = TrailVisualizer(history=5)
    for t in range(8):
        img = tv.draw(img, np.array([[10 + 5 * t, 20 + 3 * t]]))
    assert img.shape == (96, 128, 3)


def test_timer():
    t = Timer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        time.sleep(0.01)
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.02
    assert "a" in t.summary()


def test_real_env_with_fakes():
    from gsdx.realworld.cameras import SyntheticSource
    from gsdx.realworld.real_env import RealEnv
    from gsdx.realworld.robot import FakeArm

    env = RealEnv([SyntheticSource(width=64, height=48, fps=60)],
                  arm=FakeArm(), capture_fps=30, obs_fps=30)
    env.R_cam2world = [np.eye(3)]
    env.t_cam2world = [np.zeros(3)]
    try:
        env.start()
        time.sleep(0.4)
        obs = env.get_obs(get_color=True, get_depth=True)
        assert obs["color"].shape == (1, 48, 64, 3)
        assert obs["depth"].shape == (1, 48, 64)
        assert obs["pose"].shape == (6,)

        eef = env.get_eef_points()
        assert eef.shape == (1, 3)

        # a push drives the arm through the choreography and back to reset
        env.step(np.array([0.3, 0.0, 0.35, 0.0]))
        pose_after = env.arm.get_position()
        np.testing.assert_allclose(pose_after, env.arm.pose)

        # gripper variant toggles the gripper
        env.step_gripper(np.array([0.3, 0.0, 0.35, 0.0]))
        assert env.arm.gripper_open  # reopened at the end
    finally:
        env.stop()


def test_tracking_resume(tmp_path, rng):
    """Resume reproduces the exact state the checkpoint captured."""
    import jax
    import jax.numpy as jnp

    from gsdx.track.optimizer import GroupAdam
    from gsdx.track.trainer import (
        _template_after_compact,
        load_tracking_state,
        save_tracking_state,
    )

    adam = GroupAdam()
    params, variables = _template_after_compact(128, 4, 1.0)
    params = params.replace(means3d=jnp.asarray(
        rng.normal(size=(128, 3)).astype(np.float32)))
    opt_state = adam.init(params)
    key = jax.random.PRNGKey(7)
    outputs = [{"means3D": np.zeros((10, 3), np.float32)}]
    path = os.path.join(tmp_path, "state.ckpt")
    save_tracking_state(path, 3, params, opt_state, variables, key, outputs)

    template = {
        "t": jnp.asarray(0), "params": _template_after_compact(128, 4, 1.0)[0],
        "opt_state": adam.init(_template_after_compact(128, 4, 1.0)[0]),
        "variables": variables, "key": jax.random.PRNGKey(0),
    }
    state, outs = load_tracking_state(path, template)
    assert int(state["t"]) == 3
    np.testing.assert_array_equal(np.asarray(state["params"].means3d),
                                  np.asarray(params.means3d))
    assert len(outs) == 1
