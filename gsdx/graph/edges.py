"""Radius-graph edge construction (reference `src/data/dataset.py:88-216`).

Produces the dense one-hot relation matrices Rr, Rs in (max_nR, N) form the
GNN consumes via matmuls. The reference enumerates edges with a dynamic
`nonzero` and allocates (n_rels, N); here the adjacency matrix is packed into
a fixed max_nR edge budget SORT-FREE — row-major edge order (matching torch
nonzero ordering) makes each receiver row's slots a consecutive range, so
the packing is range compares + one-hot matmuls over the row-prefix counts.
Fully jit/vmap-safe.

Semantics preserved:
  * squared-distance threshold adj_thresh^2;
  * no invalid-particle edges, no tool-tool edges;
  * top-k nearest constraint applied only among object-object pairs
    (the object block is states[:n_obj]);
  * connect_all adds all object<->tool edges (cloth/sloth configs).

Self-edges: the reference keeps them (distance 0 always passes the threshold
and is its own nearest neighbor) and the GNN tolerates them; we match. (Its
`plan.py:91,126` passes a nonexistent `no_self_edge` kwarg — a latent
TypeError we do not reproduce, see SURVEY.md §7.5.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10


@functools.partial(jax.jit, static_argnames=("n_obj", "topk", "max_nR", "connect_all"))
def construct_edges(
    states: jnp.ndarray,  # (N, 3)
    adj_thresh: jnp.ndarray,  # scalar
    mask: jnp.ndarray,  # (N,) bool: valid particles
    tool_mask: jnp.ndarray,  # (N,) bool: valid tool particles
    n_obj: int,  # static object-slot count (tools occupy slots >= n_obj)
    topk: int = 10,
    max_nR: int = 500,
    connect_all: bool = False,
):
    """Returns (Rr, Rs) with shape (max_nR, N), float32 one-hot rows."""
    N = states.shape[0]
    diff = states[:, None, :] - states[None, :, :]
    dis = jnp.sum(diff * diff, axis=-1)  # (N, N)

    mask12 = mask[:, None] & mask[None, :]
    dis = jnp.where(mask12, dis, _BIG)
    tool12 = tool_mask[:, None] & tool_mask[None, :]
    dis = jnp.where(tool12, _BIG, dis)

    adj = dis < adj_thresh * adj_thresh

    # top-k constraint among object-object (`dataset.py:117-132`)
    k = min(topk, n_obj)
    dis_obj = dis[:n_obj, :n_obj]
    _, topk_idx = jax.lax.top_k(-dis_obj, k)
    topk_mask = jnp.zeros((n_obj, n_obj), bool)
    rows = jnp.broadcast_to(jnp.arange(n_obj)[:, None], (n_obj, k))
    topk_mask = topk_mask.at[rows, topk_idx].set(True)
    adj = adj.at[:n_obj, :n_obj].set(adj[:n_obj, :n_obj] & topk_mask)

    if connect_all:
        obj_tool_1 = tool_mask[:, None] & mask[None, :]  # tool receiver
        obj_tool_2 = tool_mask[None, :] & mask[:, None]  # tool sender
        adj = adj | obj_tool_1 | obj_tool_2
        adj = jnp.where(tool12, False, adj)
        adj = adj & mask12

    # Pack set bits (row-major) into max_nR slots — SORT-FREE. In row-major
    # order the edges of receiver row i occupy the CONSECUTIVE slot range
    # [rowstart[i], rowstart[i] + rowcount[i]), so Rr^T is a pure range
    # compare, and Rs selects each slot's sender as the (rank)-th set bit of
    # its receiver row via one-hot matmuls. Replaces a (N*N,) stable argsort
    # that cost 8.9 ms per 1000-sample batch in the MPPI rollout loop.
    # Exactness: all matmuls contract a 0/1 one-hot against integers
    # < 2^24 with f32 accumulation — every output is a single exact term.
    adjf = adj.astype(jnp.float32)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    tri_le = (row_i <= col_j).astype(jnp.float32)  # lower-tri ones, (j' <= j)
    inc = jnp.dot(adjf, tri_le, preferred_element_type=jnp.float32)  # (N, N)
    rowcount = inc[:, -1]  # (N,)
    rowstart = jnp.cumsum(rowcount) - rowcount  # exclusive prefix (N,)

    e = jnp.arange(max_nR, dtype=jnp.float32)
    rr_t = ((e[None, :] >= rowstart[:, None])
            & (e[None, :] < rowstart[:, None] + rowcount[:, None]))  # (N, E)
    rr_tf = rr_t.astype(jnp.float32)
    # per-slot receiver-row selections (each rr_t column has <= 1 set bit)
    inc_sel = jnp.dot(rr_tf.T, inc, preferred_element_type=jnp.float32)
    adj_sel = jnp.dot(rr_tf.T, adjf, preferred_element_type=jnp.float32)
    start_sel = jnp.dot(rr_tf.T, rowstart[:, None],
                        preferred_element_type=jnp.float32)[:, 0]  # (E,)
    rank = e - start_sel  # within-row rank of each slot
    Rs = adj_sel * (inc_sel == rank[:, None] + 1.0)  # (E, N) exact one-hot
    return rr_tf.T, Rs


@functools.partial(jax.jit, static_argnames=("n_obj", "topk", "max_nR", "connect_all"))
def construct_edge_indices(
    states, adj_thresh, mask, tool_mask, n_obj, topk=10, max_nR=500,
    connect_all=False,
):
    """Index form of `construct_edges`: (recv_idx, send_idx) int32 (max_nR,),
    -1 on unused slots. Same packing (row-major, consecutive receiver slot
    ranges); `one_hot(recv_idx) == Rr` and `one_hot(send_idx) == Rs` exactly.
    Used by the fused-rollout GNN kernel, which rebuilds the one-hots in
    VMEM — the (max_nR, N) HBM matrices never exist."""
    Rr, Rs = construct_edges(states, adj_thresh, mask, tool_mask, n_obj=n_obj,
                             topk=topk, max_nR=max_nR, connect_all=connect_all)
    nodes = jnp.arange(states.shape[0], dtype=jnp.float32)
    valid = jnp.sum(Rr, axis=1) > 0.0  # zero rows = unused slots
    # each row has exactly one set bit -> a single product term per output,
    # but TPU dot_general defaults to one-pass bf16 (integers > 256 are
    # unrepresentable) — force full precision so the recovered indices are
    # exact for any N
    recv = jnp.dot(Rr, nodes, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    send = jnp.dot(Rs, nodes, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    recv = jnp.where(valid, recv, -1.0).astype(jnp.int32)
    send = jnp.where(valid, send, -1.0).astype(jnp.int32)
    return recv, send


def construct_edge_indices_batch(states, adj_thresh, mask, tool_mask, n_obj,
                                 topk=10, max_nR=500, connect_all=False):
    """vmapped batch variant of `construct_edge_indices`."""
    B = states.shape[0]
    adj_thresh = jnp.broadcast_to(jnp.asarray(adj_thresh, jnp.float32), (B,))
    fn = functools.partial(
        construct_edge_indices, n_obj=n_obj, topk=topk, max_nR=max_nR,
        connect_all=connect_all,
    )
    return jax.vmap(fn)(states, adj_thresh, mask, tool_mask)


def construct_edges_batch(states, adj_thresh, mask, tool_mask, n_obj, topk=10,
                          max_nR=500, connect_all=False):
    """vmapped batch variant (`construct_edges_from_states_batch`,
    `src/data/dataset.py:149-216`). adj_thresh may be scalar or (B,)."""
    B = states.shape[0]
    adj_thresh = jnp.broadcast_to(jnp.asarray(adj_thresh, jnp.float32), (B,))
    fn = functools.partial(
        construct_edges, n_obj=n_obj, topk=topk, max_nR=max_nR,
        connect_all=connect_all,
    )
    return jax.vmap(fn)(states, adj_thresh, mask, tool_mask)
