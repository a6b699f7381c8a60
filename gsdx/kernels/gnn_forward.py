"""Fused Pallas forward for the GNN dynamics model (MPPI rollout hot path).

The reference evaluates 10k sampled pushes per planning interaction through
the interaction network (`src/real_world/plan.py:297-302`, `src/gnn/
model.py:112-246`); at B=1000 the XLA graph materializes ~14 GB of HBM
activations per unit push (every (B, n_rel, 512) tensor round-trips HBM),
which measured 31 ms/push on TPU v5e — HBM-bound at ~5% MXU utilization.

This kernel runs the ENTIRE forward (both encoders, pstep rounds of message
passing, motion head) for one sample per grid step with every intermediate
held in VMEM, so HBM traffic collapses to the per-sample inputs (a few KB)
plus one resident copy of the weights:

  * Edges arrive as receiver/sender INDEX vectors (-1 = empty slot), not
    (n_rel, N) one-hot matrices: the one-hots are rebuilt in-VMEM by an
    iota-compare (two (E, N) VPU compares), so the 400 MB/push of HBM
    one-hot traffic disappears. An index of -1 matches no node: the slot's
    relation input is all-zero and its effect never aggregates — exactly
    the all-zero rows `construct_edges` emits for unused slots.
  * The relation encoder's first layer is algebraically split into
    node-side projections (attr_r/attr_s/distance blocks of W1 applied to
    the node features BEFORE edge selection — one-hot row selection
    commutes with right-multiplication), so `rel_inputs` is never
    assembled: h1 = relu(OHr @ nr + OHs @ ns + |OHr g - OHs g| w_g + b1).
  * Weights are stored bf16 and upcast at use. Numerics match the XLA
    baseline class exactly: XLA's DEFAULT f32 matmul on TPU truncates both
    operands to bf16 in one MXU pass with f32 accumulation, and bf16(w)
    upcast to f32 re-truncates to the same bf16. Activations stay f32.

Shapes are padded to MXU-friendly sizes (N -> 128 or 256 nodes, E -> a
multiple of 8); supported model families (`src/config/{rope,cloth,dog,
sloth}.yaml`, input assembly `src/gnn/model.py:112-199`):

  * rope: state_dim=0, motion_dim=0 (particle inputs attr+action);
  * cloth/dog/sloth: state_dim=1 (z-only history) + motion_dim=3 (history
    differences). Both are LINEAR in the history-major node state `st`, so
    they fold into one (3*n_his, F) node-side matrix at pack time
    (`w1p_st = S_z @ W_z + D @ W_motion`, S_z the z-row selector, D the
    forward-difference operator) — the kernel just adds `st @ w1p_st`,
    which is all-zero for rope.

Common requirements: attr_dim=2, rel_group_dim=1, rel_distance_dim=3*n_his,
action_dim=3, nf=512.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAD = 128  # node slots (objects + tool), padded
F = 512  # nf_effect == nf_particle == nf_relation


class PackedGNN(NamedTuple):
    """Flax DynamicsPredictor params repacked for the fused kernel.

    All weight matrices bf16 (see module docstring), biases f32 stacked as
    rows of (1, F).
    """

    # relation encoder layer 1, split by input block (node-side form)
    w1r_attr_r: jnp.ndarray  # (2, F)
    w1r_attr_s: jnp.ndarray  # (2, F)
    w1r_g: jnp.ndarray  # (1, F)
    w1r_dist: jnp.ndarray  # (3*n_his, F)
    w2r: jnp.ndarray  # (F, F)
    w3r: jnp.ndarray  # (F, F)
    # particle encoder layer 1, split
    w1p_attr: jnp.ndarray  # (2, F)
    # folded node-state block: S_z @ W_z + D @ W_motion (zeros for rope) —
    # kept f32 (tiny) so the fold itself loses no precision before the
    # kernel's own one-pass bf16 dot
    w1p_st: jnp.ndarray  # (3*n_his, F)
    w1p_act: jnp.ndarray  # (3, F)
    w2p: jnp.ndarray  # (F, F)
    w3p: jnp.ndarray  # (F, F)
    # propagators (row-partitioned Propagator kernels)
    wr0: jnp.ndarray  # (F, F) relation_prop seg 0 (applied to enc_r)
    wr1: jnp.ndarray  # (F, F) seg 1 (receiver effect)
    wr2: jnp.ndarray  # (F, F) seg 2 (sender effect)
    wp0: jnp.ndarray  # (F, F) particle_prop seg 0 (applied to enc_p)
    wp1: jnp.ndarray  # (F, F) seg 1 (aggregated effect)
    # motion head
    wh1: jnp.ndarray  # (F, F)
    wh2: jnp.ndarray  # (F, F)
    wh3: jnp.ndarray  # (F, 8)  (3 used)
    biases: jnp.ndarray  # (12, F) f32: b1r b2r b3r brp b1p b2p b3p bpp bh1 bh2 bh3 pad


def pack_gnn_params(params, n_his: int = 3, dtype=jnp.bfloat16) -> PackedGNN:
    """Repack a flax DynamicsPredictor param tree (rope or cloth/dog/sloth
    family configs — see module docstring for the folded state/motion form).

    ``dtype=jnp.bfloat16`` (default) stores weights with exactly the
    rounding XLA's DEFAULT TPU matmul applies per-op to f32 operands;
    ``jnp.float32`` keeps full precision (CPU/interpret math-parity tests).
    """
    p = params["params"] if "params" in params else params
    bf = dtype

    def dense(mod, i):
        d = p[mod][f"Dense_{i}"]
        return d["kernel"], d["bias"]

    k1r, b1r = dense("relation_encoder", 0)
    k2r, b2r = dense("relation_encoder", 1)
    k3r, b3r = dense("relation_encoder", 2)
    k1p, b1p = dense("particle_encoder", 0)
    k2p, b2p = dense("particle_encoder", 1)
    k3p, b3p = dense("particle_encoder", 2)
    kh1, bh1 = dense("non_rigid_predictor", 0)
    kh2, bh2 = dense("non_rigid_predictor", 1)
    kh3, bh3 = dense("non_rigid_predictor", 2)
    krel = p["relation_propagator"]["kernel"]
    brel = p["relation_propagator"]["bias"]
    kpar = p["particle_propagator"]["kernel"]
    bpar = p["particle_propagator"]["bias"]

    nd = 3 * n_his
    assert k1r.shape[0] == 5 + nd, (
        f"fused kernel supports the rope-layout rel inputs, got {k1r.shape}")
    n_state_in = 2 + n_his + 3 * (n_his - 1) + 3
    if k1p.shape[0] == 5:  # rope: attr(2) + action(3)
        w1p_st = jnp.zeros((nd, F), jnp.float32)
        k1p_act = k1p[2:5]
    elif k1p.shape[0] == n_state_in:
        # cloth/dog/sloth: attr(2) + state_z(n_his) + motion(3*(n_his-1))
        # + action(3) (`src/gnn/model.py:136-146`). Fold the z-selection and
        # forward-difference operators into one (3*n_his, F) matrix over the
        # history-major node state.
        k1p_z = k1p[2 : 2 + n_his]  # (n_his, F)
        k1p_mo = k1p[2 + n_his : 2 + n_his + 3 * (n_his - 1)]
        k1p_act = k1p[n_state_in - 3 : n_state_in]
        s_z = np.zeros((nd, n_his), np.float32)
        for h in range(n_his):
            s_z[3 * h + 2, h] = 1.0
        dmat = np.zeros((nd, 3 * (n_his - 1)), np.float32)
        for h in range(n_his - 1):
            for dd in range(3):
                dmat[3 * (h + 1) + dd, 3 * h + dd] += 1.0
                dmat[3 * h + dd, 3 * h + dd] -= 1.0
        w1p_st = (jnp.asarray(s_z) @ k1p_z.astype(jnp.float32)
                  + jnp.asarray(dmat) @ k1p_mo.astype(jnp.float32))
    else:
        raise AssertionError(
            f"unsupported particle-encoder input layout: {k1p.shape}")

    wh3 = jnp.zeros((F, 8), kh3.dtype).at[:, :3].set(kh3)
    biases = jnp.stack([
        b1r, b2r, b3r, brel, b1p, b2p, b3p, bpar, bh1, bh2,
        jnp.zeros((F,), b1r.dtype).at[:3].set(bh3),
        jnp.zeros((F,), b1r.dtype),
    ]).astype(jnp.float32)
    return PackedGNN(
        w1r_attr_r=k1r[0:2].astype(bf), w1r_attr_s=k1r[2:4].astype(bf),
        w1r_g=k1r[4:5].astype(bf), w1r_dist=k1r[5 : 5 + nd].astype(bf),
        w2r=k2r.astype(bf), w3r=k3r.astype(bf),
        w1p_attr=k1p[0:2].astype(bf), w1p_st=w1p_st.astype(jnp.float32),
        w1p_act=k1p_act.astype(bf),
        w2p=k2p.astype(bf), w3p=k3p.astype(bf),
        wr0=krel[0:F].astype(bf), wr1=krel[F : 2 * F].astype(bf),
        wr2=krel[2 * F : 3 * F].astype(bf),
        wp0=kpar[0:F].astype(bf), wp1=kpar[F : 2 * F].astype(bf),
        wh1=kh1.astype(bf), wh2=kh2.astype(bf), wh3=wh3.astype(bf),
        biases=biases,
    )


def _f32(w):
    return w.astype(jnp.float32)


def _gnn_kernel(attrs_ref, act_ref, st_ref, g_ref, recv_ref, send_ref,
                *w_refs, out_ref, pstep: int):
    (w1r_attr_r, w1r_attr_s, w1r_g, w1r_dist, w2r, w3r, w1p_attr, w1p_st,
     w1p_act, w2p, w3p, wr0, wr1, wr2, wp0, wp1, wh1, wh2, wh3,
     biases) = w_refs
    b = biases[:]  # (12, F) f32

    def dot(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    attrs = attrs_ref[0]  # (N_PAD, 2) f32
    act = act_ref[0]  # (N_PAD, 3)
    st = st_ref[0]  # (N_PAD, 3*n_his)
    g = g_ref[0]  # (N_PAD, 1)

    # In-VMEM one-hot edge matrices from index vectors (-1 -> zero row),
    # built TRANSPOSED: indices arrive on lanes as (1, E), so comparing
    # against a sublane iota yields Rr^T (N_PAD, E) with no vector
    # transpose; selections contract dim 0 (MXU-native) and the
    # aggregation consumes Rr^T directly.
    E = recv_ref.shape[2]
    npad = attrs.shape[0]  # 128 or 256 node slots
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (npad, E), 0)
    ohr_t = (jnp.broadcast_to(recv_ref[0], (npad, E)) == iota_n
             ).astype(jnp.float32)
    ohs_t = (jnp.broadcast_to(send_ref[0], (npad, E)) == iota_n
             ).astype(jnp.float32)

    def sel(oh_t, x):  # (Rr @ x) as oh_t^T-contraction: (E, x.shape[1])
        return jax.lax.dot_general(
            oh_t, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # relation encoder layer 1, node-side projections
    nr = dot(attrs, _f32(w1r_attr_r[:])) + dot(st, _f32(w1r_dist[:]))
    ns = dot(attrs, _f32(w1r_attr_s[:])) - dot(st, _f32(w1r_dist[:]))
    gdiff = jnp.abs(sel(ohr_t, g) - sel(ohs_t, g))  # (E, 1)
    h = jnp.maximum(
        sel(ohr_t, nr) + sel(ohs_t, ns) + gdiff * _f32(w1r_g[0])[None, :]
        + b[0:1], 0.0)
    h = jnp.maximum(dot(h, _f32(w2r[:])) + b[1:2], 0.0)
    enc_r = jnp.maximum(dot(h, _f32(w3r[:])) + b[2:3], 0.0)
    rel_pre = dot(enc_r, _f32(wr0[:])) + b[3:4]  # (E, F)

    # particle encoder (w1p_st folds state_z + motion features; zero for rope)
    hp = jnp.maximum(
        dot(attrs, _f32(w1p_attr[:])) + dot(st, w1p_st[:])
        + dot(act, _f32(w1p_act[:])) + b[4:5], 0.0)
    hp = jnp.maximum(dot(hp, _f32(w2p[:])) + b[5:6], 0.0)
    enc_p = jnp.maximum(dot(hp, _f32(w3p[:])) + b[6:7], 0.0)
    node_pre = dot(enc_p, _f32(wp0[:])) + b[7:8]  # (N_PAD, F)

    effect = enc_p
    for _ in range(pstep):
        ewr = dot(effect, _f32(wr1[:]))  # (N_PAD, F)
        ews = dot(effect, _f32(wr2[:]))
        erel = jnp.maximum(rel_pre + sel(ohr_t, ewr) + sel(ohs_t, ews), 0.0)
        agg = dot(ohr_t, erel)  # Rr^T @ erel, (N_PAD, F)
        effect = jnp.maximum(node_pre + dot(agg, _f32(wp1[:])) + effect, 0.0)

    hh = jnp.maximum(dot(effect, _f32(wh1[:])) + b[8:9], 0.0)
    hh = jnp.maximum(dot(hh, _f32(wh2[:])) + b[9:10], 0.0)
    out_ref[0] = dot(hh, _f32(wh3[:])) + b[10:11, :8]


@functools.partial(jax.jit, static_argnames=("pstep", "interpret"))
def fused_gnn_forward(packed: PackedGNN, attrs, action, state_t, g,
                      recv_idx, send_idx, pstep: int = 3,
                      interpret: bool = False):
    """Batched fused forward.

    Args:
      packed: PackedGNN weights.
      attrs: (B, n_pad, 2) f32 with n_pad in {128, 256} (256 for the
        cloth/sloth 150-object configs); action: (B, n_pad, 3); state_t:
        (B, n_pad, 3*n_his) history-major node positions; g: (B, n_pad, 1)
        instance column (0 on tool/pad slots).
      recv_idx/send_idx: (B, E) int32 node indices, -1 for unused slots
        (E a multiple of 8; 504 for the production max_nR=500 budget).
    Returns (B, n_pad, 8) f32 raw motion (columns 0:3 meaningful).
    """
    B, n_pad, _ = attrs.shape
    assert n_pad in (N_PAD, 2 * N_PAD), f"pad nodes to 128/256, got {n_pad}"
    E = recv_idx.shape[1]
    recv_idx = recv_idx.reshape(B, 1, E)  # lane-major for the kernel
    send_idx = send_idx.reshape(B, 1, E)

    def per_sample(i):  # noqa: ANN001 — BlockSpec index map
        return (i, 0, 0)

    sample_spec = lambda w: pl.BlockSpec((1,) + w, per_sample)  # noqa: E731
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd)
        for w in packed
    ]
    kernel = functools.partial(_gnn_kernel, pstep=pstep)

    def wrapped(*refs):
        *ins, out_ref = refs
        kernel(*ins, out_ref=out_ref)

    # The cloth/sloth family (n_pad=256, E=1200) sits 28 KB above Mosaic's
    # default 16 MB scoped-VMEM limit; raise the limit for the double-pad
    # shape (measured peak ~16.03 MB — still a fraction of physical VMEM).
    params = (pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024)
              if n_pad > N_PAD else None)
    return pl.pallas_call(
        wrapped,
        grid=(B,),
        in_specs=[
            sample_spec((n_pad, attrs.shape[2])),
            sample_spec((n_pad, action.shape[2])),
            sample_spec((n_pad, state_t.shape[2])),
            sample_spec((n_pad, 1)),
            pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0)),
            *weight_specs,
        ],
        out_specs=sample_spec((n_pad, 8)),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, 8), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(attrs, action, state_t, g, recv_idx, send_idx, *packed)


def gnn_forward_xla_twin(packed: PackedGNN, attrs, action, state_t, g,
                         recv_idx, send_idx, pstep: int = 3):
    """Plain-XLA twin of the fused kernel (same math, any backend)."""

    def one(attrs, act, st, g, recv, send):
        iota_n = jnp.arange(attrs.shape[0], dtype=jnp.int32)
        ohr = (recv[:, None] == iota_n[None, :]).astype(jnp.float32)
        ohs = (send[:, None] == iota_n[None, :]).astype(jnp.float32)
        b = packed.biases

        def dot(a, w):
            return jnp.dot(a, w.astype(jnp.float32),
                           preferred_element_type=jnp.float32)

        nr = dot(attrs, packed.w1r_attr_r) + dot(st, packed.w1r_dist)
        ns = dot(attrs, packed.w1r_attr_s) - dot(st, packed.w1r_dist)
        gdiff = jnp.abs(ohr @ g - ohs @ g)
        h = jax.nn.relu(ohr @ nr + ohs @ ns
                        + gdiff * packed.w1r_g.astype(jnp.float32)[0][None]
                        + b[0][None])
        h = jax.nn.relu(dot(h, packed.w2r) + b[1][None])
        enc_r = jax.nn.relu(dot(h, packed.w3r) + b[2][None])
        rel_pre = dot(enc_r, packed.wr0) + b[3][None]
        hp = jax.nn.relu(dot(attrs, packed.w1p_attr)
                         + dot(st, packed.w1p_st)
                         + dot(act, packed.w1p_act) + b[4][None])
        hp = jax.nn.relu(dot(hp, packed.w2p) + b[5][None])
        enc_p = jax.nn.relu(dot(hp, packed.w3p) + b[6][None])
        node_pre = dot(enc_p, packed.wp0) + b[7][None]
        effect = enc_p
        for _ in range(pstep):
            ewr = dot(effect, packed.wr1)
            ews = dot(effect, packed.wr2)
            erel = jax.nn.relu(rel_pre + ohr @ ewr + ohs @ ews)
            agg = ohr.T @ erel
            effect = jax.nn.relu(node_pre + dot(agg, packed.wp1) + effect)
        hh = jax.nn.relu(dot(effect, packed.wh1) + b[8][None])
        hh = jax.nn.relu(dot(hh, packed.wh2) + b[9][None])
        return dot(hh, packed.wh3) + b[10][None, :8]

    return jax.vmap(one)(attrs, action, state_t, g, recv_idx, send_idx)
