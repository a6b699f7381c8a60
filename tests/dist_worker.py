"""Worker process for the 2-process `jax.distributed` validation test.

Launched by `tests/test_dist_multiprocess.py` (not collected by pytest).
Each process owns 2 virtual CPU devices; the pair forms a 4-device global
mesh over gloo collectives — the same code path (`initialize_distributed`
-> global mesh -> DP train step with sharding constraints) a real multi-host
TPU pod would run over DCN (SURVEY.md §2.8).
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gsdx.dist.mesh import get_mesh, initialize_distributed

    initialize_distributed(coordinator=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gsdx.dist.train_dp import make_dp_train_step
    from gsdx.dynamics.model import DynamicsPredictor
    from gsdx.dynamics.train import init_params
    from gsdx.graph.dataset import GraphSampler

    from test_dynamics import DATA_CFG, MODEL_CFG, TRAIN_CFG, synth_episodes

    mesh = get_mesh()  # all 4 global devices on the 'data' axis

    # Deterministic model/batch — identical in every process.
    rng = np.random.default_rng(0)
    store = synth_episodes(rng)
    sampler = GraphSampler(store, DATA_CFG, phase="train")
    model = DynamicsPredictor(MODEL_CFG)
    params = init_params(model, TRAIN_CFG, DATA_CFG, jax.random.PRNGKey(0))
    batch = sampler.sample(jax.random.PRNGKey(2), 8)

    # Each process contributes its process-local shard of the global batch.
    sh = NamedSharding(mesh, P("data"))

    def to_global(x):
        lx = np.asarray(x)
        per = lx.shape[0] // nproc
        return jax.make_array_from_process_local_data(
            sh, lx[pid * per:(pid + 1) * per]
        )

    gbatch = jax.tree.map(to_global, batch)

    step_dp, tx = make_dp_train_step(model, TRAIN_CFG, mesh)
    p, o, loss, _ = step_dp(params, tx.init(params), gbatch)

    if pid == 0:
        leaves = [np.asarray(x) for x in jax.tree.leaves(p)]
        np.savez(out_path, loss=float(loss),
                 **{f"p{i}": a for i, a in enumerate(leaves)})
    print(f"worker {pid} done loss={float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main()
