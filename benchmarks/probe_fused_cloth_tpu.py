"""On-chip probe for the fused Pallas GNN forward at the CLOTH family shapes
(state_dim=1, motion_dim=3, 150 objects -> 256-node pad, max_nR=1200,
connect_all) — closes the PARITY caveat "cloth shapes not yet timed on chip"
(VERDICT r3 #9: fused support landed in r4 with interpret parity only).

Same protocol as probe_fused_tpu.py (rope): parity vs the XLA twin at B=8,
then scan-chained per-forward timing at the MPPI batch B=1000 (un-chained
repeat calls return fake-fast cached results on this box).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 2400 python -u \
       benchmarks/probe_fused_cloth_tpu.py
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import init_params
from gsdx.graph.edges import construct_edge_indices_batch
from gsdx.io.config import load_config
from gsdx.kernels.gnn_forward import (fused_gnn_forward,
                                      gnn_forward_xla_twin, pack_gnn_params)

print("devices:", jax.devices(), flush=True)

train_cfg, model_cfg, data_cfg = load_config("configs/cloth.yaml")
model = DynamicsPredictor(model_cfg)
params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))
packed = pack_gnn_params(params, n_his=train_cfg.n_his)

n_obj = data_cfg.max_nobj  # 150
N = n_obj + 1
N_PAD = 256  # > 128 objects -> double pad (kernel asserts 128/256)
E = -(-data_cfg.max_nR // 8) * 8


def make_inputs(B, seed=0):
    r = np.random.default_rng(seed)
    states = jnp.asarray(
        r.normal(0, 0.05, (B, train_cfg.n_his, N, 3)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    tool_mask = jnp.zeros((B, N), bool).at[:, n_obj:].set(True)
    recv, send = construct_edge_indices_batch(
        states[:, -1], sum(data_cfg.adj_radius_range) / 2, mask, tool_mask,
        n_obj=n_obj, topk=data_cfg.topk, max_nR=data_cfg.max_nR,
        connect_all=data_cfg.connect_all)
    if E > data_cfg.max_nR:
        fill = jnp.full((B, E - data_cfg.max_nR), -1, jnp.int32)
        recv = jnp.concatenate([recv, fill], axis=1)
        send = jnp.concatenate([send, fill], axis=1)
    attrs = jnp.zeros((B, N_PAD, 2)).at[:, :n_obj, 0].set(1.0).at[:, n_obj:N, 1].set(1.0)
    action = jnp.zeros((B, N_PAD, 3)).at[:, n_obj:N].set(
        jnp.asarray(r.normal(0, 0.01, (B, 1, 3)).astype(np.float32)))
    st_t = jnp.swapaxes(states, 1, 2).reshape(B, N, -1)
    st_pad = jnp.zeros((B, N_PAD, st_t.shape[-1])).at[:, :N].set(st_t)
    g = jnp.zeros((B, N_PAD, 1)).at[:, :n_obj, 0].set(1.0)
    return attrs, action, st_pad, g, recv, send


# ---- parity at B=8 ----
ins = make_inputs(8)
fused = jax.jit(lambda *a: fused_gnn_forward(
    packed, *a, pstep=model_cfg.pstep))
twin = jax.jit(lambda *a: gnn_forward_xla_twin(
    packed, *a, pstep=model_cfg.pstep))
t0 = time.perf_counter()
out_f = np.asarray(fused(*ins))
print(f"fused first call (compile): {time.perf_counter()-t0:.1f}s", flush=True)
out_t = np.asarray(twin(*ins))
delta = np.abs(out_f[:, :n_obj, :3] - out_t[:, :n_obj, :3])
scale = np.abs(out_t[:, :n_obj, :3]).max()
print(f"parity B=8: max|delta| {delta.max():.3e} (out scale {scale:.3e})",
      flush=True)
assert np.isfinite(out_f).all()
assert delta.max() < max(5e-2, 5e-2 * scale), delta.max()

# ---- timing at B=1000: scan-chained, one dispatch ----
B = 1000
ins_b = make_inputs(B, seed=1)
SCAN = 10


def make_chain(fn):
    @jax.jit
    def chain(attrs, action, st, g, recv, send):
        def body(carry, _):
            out = fn(attrs, action + carry, st, g, recv, send)
            return out[:, :, :3] * 1e-9, out[0, 0, 0]

        carry, outs = jax.lax.scan(
            body, jnp.zeros_like(action), None, length=SCAN)
        return outs

    return chain


results = {}
for name, fn in (("fused", lambda *a: fused_gnn_forward(
        packed, *a, pstep=model_cfg.pstep)),
                 ("twin", lambda *a: gnn_forward_xla_twin(
                     packed, *a, pstep=model_cfg.pstep))):
    ch = make_chain(fn)
    out = ch(*ins_b)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = ch(*ins_b)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / SCAN)
    results[name] = best
    print(f"B={B} per forward ({name}, {SCAN}-step chained): "
          f"{best*1e3:.2f} ms", flush=True)
print(f"fused speedup vs twin: {results['twin']/results['fused']:.2f}x",
      flush=True)
print("FUSED CLOTH TPU PROBE OK", flush=True)
