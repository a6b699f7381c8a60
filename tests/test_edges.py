"""Edge construction vs a straight numpy transcription of the reference
semantics (`construct_edges_from_states`, `src/data/dataset.py:88-147`)."""

import jax.numpy as jnp
import numpy as np

from gsdx.graph.edges import construct_edges, construct_edges_batch


def reference_edges_np(states, adj_thresh, mask, tool_mask, topk, connect_all):
    N = states.shape[0]
    dis = ((states[:, None] - states[None]) ** 2).sum(-1)
    mask12 = mask[:, None] & mask[None]
    dis[~mask12] = 1e10
    tool12 = tool_mask[:, None] & tool_mask[None]
    dis[tool12] = 1e10
    adj = (dis < adj_thresh**2).astype(float)

    n_tool = int(tool_mask.sum())
    dis_obj = dis[:-n_tool, :-n_tool] if n_tool else dis
    k = min(dis_obj.shape[-1], topk)
    topk_idx = np.argsort(dis_obj, axis=-1, kind="stable")[:, :k]
    topk_matrix = np.zeros_like(dis_obj)
    np.put_along_axis(topk_matrix, topk_idx, 1, axis=-1)
    if n_tool:
        adj[:-n_tool, :-n_tool] *= topk_matrix
    else:
        adj = adj * topk_matrix

    if connect_all:
        adj[tool_mask[:, None] & mask[None]] = 1.0
        adj[tool_mask[None] & mask[:, None]] = 1.0
        adj[tool12] = 0.0

    rels = np.argwhere(adj > 0)  # row-major like torch nonzero
    return adj, rels


def run_case(rng, n_obj=20, n_tool=1, topk=5, connect_all=False, thresh=0.5,
             n_valid=None):
    N = n_obj + n_tool
    states = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    mask = np.zeros(N, bool)
    n_valid = n_valid if n_valid is not None else n_obj
    mask[:n_valid] = True
    mask[n_obj:] = True
    tool_mask = np.zeros(N, bool)
    tool_mask[n_obj:] = True
    states[~mask] = 0.0

    max_nR = 400
    Rr, Rs = construct_edges(
        jnp.asarray(states), thresh, jnp.asarray(mask), jnp.asarray(tool_mask),
        n_obj=n_obj, topk=topk, max_nR=max_nR, connect_all=connect_all,
    )
    Rr, Rs = np.asarray(Rr), np.asarray(Rs)
    adj_ref, rels_ref = reference_edges_np(
        states.copy(), thresh, mask, tool_mask, topk, connect_all
    )
    n_rels = len(rels_ref)
    assert n_rels <= max_nR
    # our one-hot rows, decoded
    got = [(int(Rr[e].argmax()), int(Rs[e].argmax()))
           for e in range(n_rels) if Rr[e].sum() > 0]
    assert len(got) == n_rels
    np.testing.assert_array_equal(np.array(got), rels_ref)
    # padding rows must be all-zero
    assert Rr[n_rels:].sum() == 0 and Rs[n_rels:].sum() == 0


def test_edges_basic(rng):
    run_case(rng)


def test_edges_topk_tightens(rng):
    run_case(rng, topk=2, thresh=2.0)


def test_edges_connect_all(rng):
    run_case(rng, connect_all=True, thresh=0.3)


def test_edges_invalid_particles(rng):
    run_case(rng, n_valid=12)


def test_edges_batch_matches_single(rng):
    n_obj, n_tool = 15, 1
    N = n_obj + n_tool
    states = rng.uniform(-1, 1, size=(3, N, 3)).astype(np.float32)
    mask = np.ones((3, N), bool)
    tool_mask = np.zeros((3, N), bool)
    tool_mask[:, n_obj:] = True
    Rr_b, Rs_b = construct_edges_batch(
        jnp.asarray(states), 0.5, jnp.asarray(mask), jnp.asarray(tool_mask),
        n_obj=n_obj, topk=4, max_nR=200,
    )
    for b in range(3):
        Rr, Rs = construct_edges(
            jnp.asarray(states[b]), 0.5, jnp.asarray(mask[b]),
            jnp.asarray(tool_mask[b]), n_obj=n_obj, topk=4, max_nR=200,
        )
        np.testing.assert_array_equal(np.asarray(Rr_b[b]), np.asarray(Rr))
        np.testing.assert_array_equal(np.asarray(Rs_b[b]), np.asarray(Rs))


def test_edges_overflow_truncates_row_major(rng):
    """n_rels > max_nR keeps exactly the FIRST max_nR row-major edges
    (the range-packing truncation path)."""
    n_obj, n_tool, topk, thresh = 20, 1, 8, 2.0  # dense graph
    N = n_obj + n_tool
    states = rng.uniform(-0.2, 0.2, size=(N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    tool_mask = np.zeros(N, bool)
    tool_mask[n_obj:] = True

    adj_ref, rels_ref = reference_edges_np(
        states.copy(), thresh, mask, tool_mask, topk, False)
    max_nR = len(rels_ref) // 2
    assert max_nR >= 8, "scene not dense enough for the overflow case"
    Rr, Rs = construct_edges(
        jnp.asarray(states), thresh, jnp.asarray(mask), jnp.asarray(tool_mask),
        n_obj=n_obj, topk=topk, max_nR=max_nR,
    )
    Rr, Rs = np.asarray(Rr), np.asarray(Rs)
    got = [(int(Rr[e].argmax()), int(Rs[e].argmax())) for e in range(max_nR)]
    np.testing.assert_array_equal(np.array(got), rels_ref[:max_nR])
    assert (Rr.sum(1) == 1).all() and (Rs.sum(1) == 1).all()
