"""MPPI trajectory optimization (reference `src/real_world/utils/planner.py:38-326`).

One MPPI update iteration (sample -> rollout -> reward -> softmax update,
tracking the best sample) is a single jitted function; chunked evaluation
(`plan.py:367-373`: 10 chunks x 1000 samples) maps to either a python loop
of jit calls or, with `gsdx.dist`, a mesh-sharded batch axis.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.plan.actions import optimize_action_mppi, sample_action_seq


class MPPIConfig(NamedTuple):
    n_sample: int = 1000
    n_look_ahead: int = 1
    n_update_iter: int = 10
    reward_weight: float = 500.0  # `plan.py:301`
    noise_level: float = 0.3
    push_length: float = 0.01
    action_lower_lim: tuple = (-0.5, -0.5, -np.pi, 5.0)
    action_upper_lim: tuple = (0.5, 0.5, np.pi, 20.0)
    planner_type: str = "MPPI"  # "MPPI" | "GD" (`planner.py:84-90`)
    lr: float = 1e-3  # GD learning rate (`planner.py:117`)
    # GD memory control: differentiate through the rollout in chunks of this
    # many samples (0 = whole batch). GD grads decouple per sample (the
    # objective is a mean over samples), so chunking is exact up to batched-
    # gemm accumulation order. At rope scale, 1000-sample x ~19-push BPTT
    # needs ~40 GB of activations — 4x v5e HBM; 128-sample chunks fit.
    gd_sample_chunk: int = 0


class Planner:
    """MPPI planner over a batched model-rollout function.

    model_rollout_fn(state_cur, act_seqs) -> {"state_seqs", "action_seqs"}
    evaluate_traj_fn(state_seqs, act_seqs_decoded, state_cur) ->
        {"reward_seqs"}
    """

    def __init__(
        self,
        cfg: MPPIConfig,
        model_rollout_fn: Callable,
        evaluate_traj_fn: Callable,
        mesh=None,
        mesh_axis: str = "data",
    ):
        """``mesh``: optional jax.sharding.Mesh — the sample batch shards
        over ``mesh_axis`` (the reference's 1000-sample chunks are
        embarrassingly parallel, SURVEY.md §2.8), with GSPMD partitioning
        the rollout and reward and all-reducing the softmax/argmax inputs."""
        self.cfg = cfg
        self.lower = jnp.asarray(cfg.action_lower_lim, jnp.float32)
        self.upper = jnp.asarray(cfg.action_upper_lim, jnp.float32)
        self._model_rollout = model_rollout_fn
        # GD planning differentiates through the rollout; rollouts that take
        # a `needs_grad` kwarg (make_batched_rollout does) are told so, which
        # disables non-differentiable fast paths (the fused Pallas forward).
        import inspect
        try:
            sig = inspect.signature(model_rollout_fn).parameters
            self._rollout_takes_needs_grad = "needs_grad" in sig or any(
                p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.values()
            )
        except (TypeError, ValueError):
            self._rollout_takes_needs_grad = False
        self._evaluate = evaluate_traj_fn
        self._mesh = mesh
        self._mesh_axis = mesh_axis
        self._iter = jax.jit(self._make_iter(model_rollout_fn, evaluate_traj_fn))

    def _make_iter(self, model_rollout_fn, evaluate_traj_fn):
        cfg = self.cfg

        def one_iter(key, state_cur, act_seq, iter_index, best_act, best_reward):
            act_seqs = sample_action_seq(
                key, act_seq, self.lower, self.upper, cfg.n_sample,
                iter_index=iter_index, noise_level=cfg.noise_level,
                push_length=cfg.push_length,
            )
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                act_seqs = jax.lax.with_sharding_constraint(
                    act_seqs,
                    NamedSharding(self._mesh, PartitionSpec(self._mesh_axis)),
                )
            out = model_rollout_fn(state_cur, act_seqs)
            eval_out = evaluate_traj_fn(
                out["state_seqs"], out["action_seqs"], state_cur
            )
            rewards = eval_out["reward_seqs"]
            new_act_seq = optimize_action_mppi(
                act_seqs, rewards, self.lower, self.upper,
                reward_weight=cfg.reward_weight, push_length=cfg.push_length,
            )
            idx = jnp.argmax(rewards)
            better = rewards[idx] > best_reward
            best_act = jnp.where(better, act_seqs[idx], best_act)
            best_reward = jnp.where(better, rewards[idx], best_reward)
            return new_act_seq, best_act, best_reward

        return one_iter

    def trajectory_optimization(self, key, state_cur, act_seq):
        """Returns {"act_seq": best (L, 4), "best_reward": scalar}
        (`planner.py:236-275` MPPI / `planner.py:278-310` GD)."""
        if self.cfg.planner_type == "GD":
            return self._trajectory_optimization_gd(key, state_cur, act_seq)
        cfg = self.cfg
        best_act = act_seq
        best_reward = jnp.asarray(-jnp.inf)
        for i in range(cfg.n_update_iter):
            key, sub = jax.random.split(key)
            act_seq, best_act, best_reward = self._iter(
                sub, state_cur, act_seq, jnp.asarray(i), best_act, best_reward
            )
        return {"act_seq": best_act, "best_reward": best_reward}

    def _trajectory_optimization_gd(self, key, state_cur, act_seq):
        """Gradient-descent planning (`trajectory_optimization_gd`,
        `planner.py:278-310`): Adam on the sampled action batch, maximizing
        mean reward with gradients through the differentiable rollout
        (edge structure is piecewise-constant w.r.t. actions, as in the
        reference). Finishes with the argmax sample."""
        import optax

        cfg = self.cfg
        if not hasattr(self, "_gd_step"):
            tx = optax.adam(cfg.lr)

            def neg_reward(act_seqs, state_cur):
                if self._rollout_takes_needs_grad:
                    out = self._model_rollout(
                        state_cur, act_seqs, needs_grad=True)
                else:
                    out = self._model_rollout(state_cur, act_seqs)
                rewards = self._evaluate(
                    out["state_seqs"], out["action_seqs"], state_cur
                )["reward_seqs"]
                return -jnp.mean(rewards), rewards

            @jax.jit
            def gd_step(act_seqs, opt_state, state_cur):
                (_, rewards), grads = jax.value_and_grad(
                    neg_reward, has_aux=True)(act_seqs, state_cur)
                updates, opt_state = tx.update(grads, opt_state, act_seqs)
                act_seqs = optax.apply_updates(act_seqs, updates)
                act_seqs = jnp.clip(act_seqs, self.lower, self.upper)
                return act_seqs, opt_state, rewards

            self._gd_tx = tx
            self._gd_step = gd_step

        act_seqs = sample_action_seq(
            key, act_seq, self.lower, self.upper, cfg.n_sample,
            iter_index=0, noise_level=cfg.noise_level,
            push_length=cfg.push_length,
        )
        chunk = cfg.gd_sample_chunk or cfg.n_sample
        assert cfg.n_sample % chunk == 0, (cfg.n_sample, chunk)
        out_acts, out_rewards = [], []
        for c0 in range(0, cfg.n_sample, chunk):
            acts_c = act_seqs[c0:c0 + chunk]
            opt_state = self._gd_tx.init(acts_c)
            rewards = None
            for _ in range(cfg.n_update_iter):
                acts_c, opt_state, rewards = self._gd_step(
                    acts_c, opt_state, state_cur
                )
            out_acts.append(acts_c)
            out_rewards.append(rewards)
        act_seqs = jnp.concatenate(out_acts, axis=0)
        rewards = jnp.concatenate(out_rewards, axis=0)
        idx = jnp.argmax(rewards)
        return {"act_seq": act_seqs[idx], "best_reward": rewards[idx]}

    def plan_chunked(self, key, state_cur, init_act_seq, n_chunks: int = 10):
        """Best-of-chunks planning (`plan.py:367-373` + `merge_res`)."""
        results = []
        for c in range(n_chunks):
            key, sub = jax.random.split(key)
            results.append(
                self.trajectory_optimization(sub, state_cur, init_act_seq)
            )
        rewards = [float(r["best_reward"]) for r in results]
        return results[int(np.argmax(rewards))]
