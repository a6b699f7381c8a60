"""Checkpoint round-trip + pre-r3 GNN param-tree migration."""

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.dynamics.train import TrainConfig, init_params
from gsdx.graph.dataset import GraphDatasetConfig
from gsdx.io.checkpoint import load_checkpoint, save_checkpoint


def _small_params():
    cfg = ModelConfig(nf_particle=16, nf_relation=16, nf_effect=16, n_his=2)
    model = DynamicsPredictor(cfg)
    data_cfg = GraphDatasetConfig(n_his=2, max_nobj=8, max_nR=32, topk=3)
    return init_params(model, TrainConfig(n_his=2), data_cfg,
                       jax.random.PRNGKey(0))


def test_roundtrip(tmp_path):
    params = _small_params()
    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, params)
    restored = load_checkpoint(path, jax.tree.map(jnp.zeros_like, params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_pre_r3_dense0_migration(tmp_path):
    """Checkpoints written when Propagator params lived in a Dense_0
    submodule ({module: {Dense_0: {kernel, bias}}}) must still restore into
    the current flat layout ({module: {kernel, bias}})."""
    params = _small_params()

    def to_old(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if set(v.keys()) == {"kernel", "bias"}:
                    out[k] = {"Dense_0": dict(v)}
                else:
                    out[k] = to_old(v)
            else:
                out[k] = v
        return out

    old_format = {"params": to_old(params["params"])}
    assert old_format != params  # the migration path is actually exercised
    path = str(tmp_path / "old.ckpt")
    save_checkpoint(path, old_format)

    restored = load_checkpoint(path, jax.tree.map(jnp.zeros_like, params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)
