"""Numerical parity of the flax DynamicsPredictor vs a torch transcription
of the reference architecture (`src/gnn/model.py:70-246`).

torch (CPU) is available in the image; this test builds the reference
network shape-for-shape in torch, copies the SAME weights into the flax
params, and checks the forward outputs agree to float tolerance — the
strongest architecture-parity check available without the reference's CUDA
environment.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.dynamics.train import TrainConfig, init_params
from gsdx.graph.dataset import GraphDatasetConfig


class TorchDynamicsPredictor(torch.nn.Module):
    """Faithful torch transcription of the reference forward pass."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        nf = cfg.nf_effect
        in_dim = (cfg.n_his * cfg.state_dim
                  + (cfg.n_his - 1) * cfg.motion_dim
                  + cfg.attr_dim + cfg.action_dim)
        rel_dim = (cfg.rel_attr_dim * 2 + cfg.rel_group_dim
                   + cfg.rel_distance_dim * cfg.n_his)

        def mlp3(i, h, o):
            return torch.nn.Sequential(
                torch.nn.Linear(i, h), torch.nn.ReLU(),
                torch.nn.Linear(h, h), torch.nn.ReLU(),
                torch.nn.Linear(h, o), torch.nn.ReLU())

        self.particle_encoder = mlp3(in_dim, cfg.nf_particle, nf)
        self.relation_encoder = mlp3(rel_dim, cfg.nf_relation, nf)
        self.particle_propagator = torch.nn.Linear(nf * 2, nf)
        self.relation_propagator = torch.nn.Linear(nf * 3, nf)
        self.non_rigid_predictor = torch.nn.Sequential(
            torch.nn.Linear(nf, nf), torch.nn.ReLU(),
            torch.nn.Linear(nf, nf), torch.nn.ReLU(),
            torch.nn.Linear(nf, 3))

    def forward(self, state, attrs, Rr, Rs, p_instance, action):
        cfg = self.cfg
        B, n_his, N, sd = state.shape
        n_p = p_instance.shape[1]
        n_s = N - n_p
        Rr_t = Rr.transpose(1, 2)
        state_t = state.transpose(1, 2).reshape(B, N, n_his * sd)

        p_inputs = attrs
        if cfg.state_dim == 3:
            p_inputs = torch.cat([p_inputs, state_t], 2)
        elif cfg.state_dim == 1:
            z = state_t.reshape(B, N, n_his, sd)[..., 2]
            p_inputs = torch.cat([attrs, z], 2)
        if cfg.motion_dim > 0:
            s = state_t.reshape(B, N, n_his, sd)
            motion = (s[:, :, 1:] - s[:, :, :-1]).reshape(
                B, N, (n_his - 1) * 3)
            p_inputs = torch.cat([p_inputs, motion], 2)
        if cfg.action_dim > 0:
            p_inputs = torch.cat([p_inputs, action], 2)

        rel = []
        rel += [Rr.bmm(attrs), Rs.bmm(attrs)]
        g = torch.cat([p_instance,
                       torch.zeros(B, n_s, p_instance.shape[2])], 1)
        rel.append(torch.sum(torch.abs(Rr.bmm(g) - Rs.bmm(g)), 2,
                             keepdim=True))
        rel.append(Rr.bmm(state_t) - Rs.bmm(state_t))
        rel_inputs = torch.cat(rel, 2)

        enc = self.particle_encoder(p_inputs)
        rel_enc = self.relation_encoder(rel_inputs)
        eff = enc
        for _ in range(cfg.pstep):
            er = Rr.bmm(eff)
            es = Rs.bmm(eff)
            rel_eff = torch.relu(self.relation_propagator(
                torch.cat([rel_enc, er, es], 2)))
            agg = Rr_t.bmm(rel_eff)
            eff = torch.relu(
                self.particle_propagator(torch.cat([enc, agg], 2)) + eff)
        motion = self.non_rigid_predictor(eff[:, :n_p])
        pred = state[:, -1, :n_p] + torch.clamp(motion, -100.0, 100.0)
        return pred, motion


def _copy_mlp3(flax_scope, tmod):
    for li, lin in enumerate([tmod[0], tmod[2], tmod[4]]):
        flax_scope[f"Dense_{li}"]["kernel"] = jnp.asarray(
            lin.weight.detach().numpy().T)
        flax_scope[f"Dense_{li}"]["bias"] = jnp.asarray(
            lin.bias.detach().numpy())


@pytest.mark.parametrize(
    "state_dim,motion_dim",
    [(0, 0), (1, 3),
     # (3,0) full-state: no shipped config uses it — slow tier
     pytest.param(3, 0, marks=pytest.mark.slow)])
def test_flax_matches_torch_reference(rng, state_dim, motion_dim):
    # (0,0) = rope config; (1,3) = cloth/sloth/dog; (3,0) = full-state
    cfg = ModelConfig(nf_particle=48, nf_relation=48, nf_effect=48,
                      state_dim=state_dim, motion_dim=motion_dim,
                      n_his=3, pstep=3)
    dcfg = GraphDatasetConfig(n_his=3, max_nobj=20, max_tool=1, max_nR=80)
    model = DynamicsPredictor(cfg)
    params = init_params(model, TrainConfig(n_his=3), dcfg,
                         jax.random.PRNGKey(0))

    torch.manual_seed(0)
    tmodel = TorchDynamicsPredictor(cfg)

    p = params["params"]
    _copy_mlp3(p["particle_encoder"], tmodel.particle_encoder)
    _copy_mlp3(p["relation_encoder"], tmodel.relation_encoder)
    _copy_mlp3(p["non_rigid_predictor"], tmodel.non_rigid_predictor)
    for name, lin in [("particle_propagator", tmodel.particle_propagator),
                      ("relation_propagator", tmodel.relation_propagator)]:
        p[name]["kernel"] = jnp.asarray(
            lin.weight.detach().numpy().T)
        p[name]["bias"] = jnp.asarray(lin.bias.detach().numpy())

    B, N, n_p, nR = 2, 21, 20, 80
    state = rng.normal(scale=0.1, size=(B, 3, N, 3)).astype(np.float32)
    attrs = np.zeros((B, N, 2), np.float32)
    attrs[:, :n_p, 0] = 1
    attrs[:, n_p:, 1] = 1
    Rr = np.zeros((B, nR, N), np.float32)
    Rs = np.zeros((B, nR, N), np.float32)
    for b in range(B):
        for e in range(40):
            Rr[b, e, rng.integers(N)] = 1
            Rs[b, e, rng.integers(N)] = 1
    p_inst = np.ones((B, n_p, 1), np.float32)
    action = rng.normal(scale=0.01, size=(B, N, 3)).astype(np.float32)

    pred_j, motion_j = model.apply(
        params, jnp.asarray(state), jnp.asarray(attrs), jnp.asarray(Rr),
        jnp.asarray(Rs), jnp.asarray(p_inst), jnp.asarray(action))
    with torch.no_grad():
        pred_t, motion_t = tmodel(
            torch.tensor(state), torch.tensor(attrs), torch.tensor(Rr),
            torch.tensor(Rs), torch.tensor(p_inst), torch.tensor(action))

    np.testing.assert_allclose(np.asarray(pred_j), pred_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(motion_j), motion_t.numpy(),
                               atol=2e-5)
