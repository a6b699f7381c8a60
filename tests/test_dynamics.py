"""GNN dynamics: forward contract + learning on a synthetic push dataset."""

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.dynamics.train import TrainConfig, make_train_step, init_params
from gsdx.dynamics.utils import umeyama
from gsdx.graph.dataset import EpisodeStore, GraphDatasetConfig, GraphSampler

MODEL_CFG = ModelConfig(nf_particle=64, nf_relation=64, nf_effect=64, n_his=2)
DATA_CFG = GraphDatasetConfig(
    n_his=2, n_future=2, max_nobj=24, max_tool=1, max_nR=160,
    fps_radius_range=(0.05, 0.05), adj_radius_range=(0.35, 0.35),
    state_noise_train=0.001, topk=4,
)
TRAIN_CFG = TrainConfig(
    batch_size=8, n_his=2, n_future=2, lr=3e-3, length_weight=0.01,
)


def synth_episodes(rng, n_ep=4, T=30, P=40):
    """Rope-ish particles dragged by a nearby tool."""
    episodes, eefs, pairs = [], [], []
    win = DATA_CFG.n_his + DATA_CFG.n_future
    for e in range(n_ep):
        pts = np.zeros((T, P, 3), np.float32)
        pts[0] = np.stack(
            [np.linspace(0, 1, P), np.zeros(P), np.zeros(P)], -1
        ) + rng.normal(scale=0.02, size=(P, 3))
        tool = np.zeros((T, 1, 3), np.float32)
        tool[0, 0] = pts[0, rng.integers(P)] + [0.0, 0.15, 0.0]
        push = np.array([0.02, -0.01, 0.0], np.float32)
        for t in range(1, T):
            tool[t] = tool[t - 1] + push
            d = np.linalg.norm(pts[t - 1] - tool[t - 1], axis=-1)
            w = np.exp(-(d**2) / 0.02)[:, None]
            pts[t] = pts[t - 1] + w * push
        episodes.append(pts)
        eefs.append(tool)
        rows = []
        for t in range(T - win):
            rows.append([e] + list(range(t, t + win)))
        pairs.append(np.array(rows, np.int32))
    return EpisodeStore.from_numpy(episodes, eefs, pairs)


def test_forward_shapes():
    model = DynamicsPredictor(MODEL_CFG)
    key = jax.random.PRNGKey(0)
    params = init_params(model, TRAIN_CFG, DATA_CFG, key)
    N = DATA_CFG.max_nobj + DATA_CFG.max_tool
    B = 2
    out, motion = model.apply(
        params,
        jnp.zeros((B, 2, N, 3)), jnp.zeros((B, N, 2)),
        jnp.zeros((B, DATA_CFG.max_nR, N)), jnp.zeros((B, DATA_CFG.max_nR, N)),
        jnp.zeros((B, DATA_CFG.max_nobj, 1)), jnp.zeros((B, N, 3)),
    )
    assert out.shape == (B, DATA_CFG.max_nobj, 3)
    assert motion.shape == (B, DATA_CFG.max_nobj, 3)


def test_training_reduces_loss(rng):
    store = synth_episodes(rng)
    sampler = GraphSampler(store, DATA_CFG, phase="train")
    model = DynamicsPredictor(MODEL_CFG)
    key = jax.random.PRNGKey(1)
    params = init_params(model, TRAIN_CFG, DATA_CFG, key)
    train_step, eval_step, tx = make_train_step(model, TRAIN_CFG)
    opt_state = tx.init(params)

    losses = []
    for i in range(80):
        key, sub = jax.random.split(key)
        batch = sampler.sample(sub, TRAIN_CFG.batch_size)
        params, opt_state, loss, _ = train_step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10]), (
        f"loss did not halve: {np.mean(losses[:10])} -> {np.mean(losses[-10:])}"
    )


def test_umeyama_recovers_rigid_transform(rng):
    src = rng.normal(size=(2, 30, 3)).astype(np.float32)
    theta = 0.7
    R_true = np.array(
        [[np.cos(theta), -np.sin(theta), 0],
         [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1]], np.float32)
    t_true = np.array([0.3, -0.2, 0.5], np.float32)
    dst = src @ R_true.T + t_true
    mask = np.ones((2, 30), bool)
    mask[:, 25:] = False
    dst[:, 25:] = 99.0  # masked points must not matter
    s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(R)[0], R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t)[0], t_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), 1.0)
