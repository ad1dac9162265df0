"""Multi-process (multi-host) distributed execution test.

Spawns two OS processes that jax.distributed.initialize against a local
coordinator, form one global 8-device mesh (4 virtual CPU devices each),
and run the sharded Gibbs sweep — the actual multi-host code path
(SURVEY.md §5 distributed backend; parallel/mesh.py::initialize_distributed
wraps the same call).  Both ranks must produce identical global results.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    rank = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=rank)
    import jax.numpy as jnp, numpy as np
    from bayesfmmm_tpu.config import ModelConfig, Priors
    from bayesfmmm_tpu.models.state import init_state
    from bayesfmmm_tpu.ops import gibbs
    from bayesfmmm_tpu.parallel import mesh as pmesh
    from bayesfmmm_tpu.utils.simulate import simulate_functional

    data, _ = simulate_functional(seed=31, N=8, K=2, P=5, M=2,
                                  n_time=(10, 12))
    cfg = ModelConfig(K=2, P=5, M=2)
    hp = Priors(); c = jnp.full((2,), 10.0)
    mesh = pmesh.make_mesh(n_chain_shards=4, n_data_shards=2)
    data = pmesh.shard_data(data, mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = jax.jit(jax.vmap(lambda k: init_state(k, cfg, data)))(keys)
    states = pmesh.shard_chain_states(states, mesh)
    keys = jax.device_put(keys, pmesh.key_sharding(mesh))

    @jax.jit
    def step(keys, states):
        return jax.vmap(
            lambda k, s: gibbs.sweep_full(k, s, data, hp, c))(keys, states)

    out = step(keys, states)
    jax.block_until_ready(out)
    from jax.experimental import multihost_utils
    sig = np.asarray(multihost_utils.process_allgather(out.sigma2,
                                                       tiled=True))
    print("RESULT", len(jax.devices()), " ".join(f"{v:.6f}" for v in
                                                 sig.ravel()), flush=True)
""")


@pytest.mark.skipif(os.environ.get("BFMMM_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_distributed_sweep(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = "19841"
    env = {**os.environ, "PYTHONPATH": os.getcwd()}
    procs = [subprocess.Popen([sys.executable, str(worker), str(r), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-2000:]
        parts = line[0].split()
        assert parts[1] == "8"          # 8 global devices across 2 procs
        results.append(np.array([float(x) for x in parts[2:]]))
    # both ranks see the same global draw
    np.testing.assert_allclose(results[0], results[1], atol=0)
    assert np.isfinite(results[0]).all() and (results[0] > 0).all()
