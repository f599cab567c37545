"""Multi-device numerics equivalence tests (8 virtual CPU devices).

The placement tests in test_mcmc.py prove *where* arrays live; these prove
the sharded programs compute the *same numbers* as their single-device
counterparts — the correctness contract for SURVEY.md §2.10 rows 2-3
(reference analogue: ``examples/utils/multi_gpu.py`` gradient averaging,
which had no such test).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import zhusuan_tpu as zs
from zhusuan_tpu.parallel import (
    chain_mesh,
    data_parallel_grad,
    replicated,
    shard_chains,
    shard_params_tp,
    tp_last_axis_rule,
)


N_DEV = len(jax.devices())
pytestmark = pytest.mark.skipif(
    N_DEV < 8, reason="needs 8 virtual devices (tests/conftest.py)"
)


def _dp_mesh():
    return Mesh(np.array(jax.devices()[:8]), ("dp",))


class TestDataParallelGradEquivalence:
    def test_deterministic_loss_matches_single_device(self):
        """DP-sharded gradients == single-device gradients on the same
        global batch (deterministic loss, so no key-folding asymmetry)."""
        mesh = _dp_mesh()
        params = {
            "w": jnp.asarray(np.random.RandomState(0).randn(5, 3)),
            "b": jnp.zeros(3),
        }
        batch = jnp.asarray(np.random.RandomState(1).randn(64, 5))

        def loss_fn(p, b, key):
            del key
            pred = b @ p["w"] + p["b"]
            return jnp.mean(pred ** 2)

        dp_fn = data_parallel_grad(loss_fn, mesh)
        loss_dp, grads_dp = dp_fn(params, batch, jax.random.PRNGKey(0))

        loss_1, grads_1 = jax.value_and_grad(loss_fn)(
            params, batch, jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-12)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(grads_dp[k]), np.asarray(grads_1[k]), rtol=1e-10
            )

    def test_stochastic_loss_matches_manual_shard_fold(self):
        """With a key-consuming loss, the DP result equals manually
        computing each shard's loss with the folded per-shard key and
        averaging — i.e. the key-folding contract is exactly as
        documented."""
        mesh = _dp_mesh()
        n_dev = 8
        params = {"mu": jnp.asarray(1.5)}
        batch = jnp.asarray(np.random.RandomState(2).randn(32, 4))
        key = jax.random.PRNGKey(7)

        def loss_fn(p, b, k):
            noise = jax.random.normal(k, b.shape)
            return jnp.mean((b + noise - p["mu"]) ** 2)

        dp_fn = data_parallel_grad(loss_fn, mesh)
        loss_dp, grads_dp = dp_fn(params, batch, key)

        shards = batch.reshape(n_dev, -1, batch.shape[-1])
        manual = [
            loss_fn(params, shards[i], jax.random.fold_in(key, i))
            for i in range(n_dev)
        ]
        manual_loss = float(np.mean([float(m) for m in manual]))
        np.testing.assert_allclose(float(loss_dp), manual_loss, rtol=1e-10)
        # Gradient of the mean-of-shards loss.
        manual_grad = jax.grad(
            lambda p: sum(
                loss_fn(p, shards[i], jax.random.fold_in(key, i))
                for i in range(n_dev)
            )
            / n_dev
        )(params)
        np.testing.assert_allclose(
            float(grads_dp["mu"]), float(manual_grad["mu"]), rtol=1e-10
        )


class TestTensorParallelEquivalence:
    def test_tp_vae_step_loss_matches_replicated(self):
        """TP-sharded VAE forward/backward == replicated, same batch+key."""
        from examples.variational_autoencoders.vae import (
            elbo_loss, init_params,
        )

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
        z_dim, x_dim, hidden, batch = 8, 64, 32, 16
        key = jax.random.PRNGKey(0)
        params = init_params(key, x_dim=x_dim, z_dim=z_dim, hidden=hidden)
        x = (jax.random.uniform(key, (batch, x_dim)) < 0.5).astype(
            jnp.float32
        )

        loss_fn = jax.jit(
            lambda p, xx, k: jax.value_and_grad(elbo_loss)(p, xx, k, z_dim)
        )
        loss_repl, grads_repl = loss_fn(params, x, key)

        params_tp = shard_params_tp(
            mesh, params, rule=tp_last_axis_rule(mesh, "tp")
        )
        x_dp = jax.device_put(x, NamedSharding(mesh, P("dp")))
        loss_tp, grads_tp = loss_fn(params_tp, x_dp, key)

        np.testing.assert_allclose(
            float(loss_tp), float(loss_repl), rtol=1e-5
        )
        flat_r = jax.tree.leaves(grads_repl)
        flat_t = jax.tree.leaves(grads_tp)
        for a, b in zip(flat_r, flat_t):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4
            )

    def test_explicit_rule_overrides_heuristic(self):
        """A path-based rule replicates an 'incidentally divisible' array the
        heuristic would shard."""
        mesh = Mesh(np.array(jax.devices()[:8]), ("tp",))
        params = {"w": jnp.ones((4, 16)), "stats": jnp.ones((3, 16))}

        def rule(path, leaf):
            if "stats" in path:
                return P()
            return tp_last_axis_rule(mesh, "tp")(path, leaf)

        placed = shard_params_tp(mesh, params, rule=rule)
        assert placed["w"].sharding.spec == P(None, "tp")
        assert placed["stats"].sharding.spec == P()


class TestShardedHMCEquivalence:
    def test_sharded_chain_run_matches_unsharded(self):
        """8-device chain-sharded HMC == unsharded HMC: with partitionable
        threefry the two runs are the same program modulo layout, so the
        draws match to float tolerance."""
        dim, n_chains = 8, 64
        std = jnp.linspace(0.5, 2.0, dim, dtype=jnp.float64)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        hmc = zs.HMC(step_size=0.4, n_leapfrogs=5, adapt_step_size=True)
        state0 = hmc.init(
            {"x": jnp.zeros((n_chains, dim), jnp.float64)}, log_joint=lj
        )
        run = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 200, n_adapt=100)
        )

        key = jax.random.PRNGKey(3)
        final_u, out_u = run(state0, key)

        mesh = chain_mesh(8)
        state_s = shard_chains(mesh, state0)
        final_s, out_s = run(state_s, key)

        xs_u = np.asarray(out_u["samples"]["x"])
        xs_s = np.asarray(out_s["samples"]["x"])
        np.testing.assert_allclose(xs_s, xs_u, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(out_s["acceptance_rate"]),
            np.asarray(out_u["acceptance_rate"]),
            rtol=1e-8,
        )

    def test_nuts_sharded_chains_match_unsharded(self):
        """Chain-sharded NUTS == unsharded NUTS: the vmapped while-loop
        trees are per-chain local (no cross-chain collectives), so
        sharding the chain axis is layout-only."""
        dim, n_chains = 4, 64
        std = jnp.linspace(0.5, 2.0, dim, dtype=jnp.float64)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        nuts = zs.NUTS(step_size=0.4, max_tree_depth=5,
                       adapt_step_size=True)
        state0 = nuts.init(
            {"x": jnp.zeros((n_chains, dim), jnp.float64)}, log_joint=lj
        )
        run = jax.jit(
            lambda s, k: nuts.run(lj, {}, s, k, 60, n_adapt=30)
        )
        key = jax.random.PRNGKey(5)
        final_u, out_u = run(state0, key)
        mesh = chain_mesh(8)
        final_s, out_s = run(shard_chains(mesh, state0), key)
        np.testing.assert_allclose(
            np.asarray(out_s["samples"]["x"]),
            np.asarray(out_u["samples"]["x"]),
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_array_equal(
            np.asarray(out_s["depth"]), np.asarray(out_u["depth"])
        )

    def test_particle_filter_sharded_particles_match_unsharded(self):
        """Particle filter with the particle axis laid out over the
        8-device mesh == unsharded run, bit-for-bit: the resampling
        gather and logsumexp normalizations become cross-device
        collectives but the program is deterministic given the key."""
        mesh = Mesh(np.array(jax.devices()[:8]), ("particles",))
        sharding = NamedSharding(mesh, P("particles"))
        ys = jnp.asarray(
            np.random.RandomState(2).randn(20, 1), jnp.float64
        )

        def make(shard):
            def init_fn(key, n):
                x = jax.random.normal(key, (n, 1), jnp.float64)
                return jax.device_put(x, sharding) if shard else x

            return zs.ParticleFilter(
                init_fn,
                lambda k, x, t: 0.9 * x
                + 0.3 * jax.random.normal(k, x.shape, x.dtype),
                lambda x, y, t: jnp.sum(-0.5 * (y - x) ** 2, -1),
                n_particles=128,
            )

        key = jax.random.PRNGKey(6)
        run = lambda pf: jax.jit(lambda k, y: pf.run(k, y))(key, ys)
        res_u = run(make(False))
        res_s = run(make(True))
        np.testing.assert_allclose(float(res_s.log_z),
                                   float(res_u.log_z), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(res_s.filter_means),
            np.asarray(res_u.filter_means), rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_array_equal(np.asarray(res_s.ess),
                                      np.asarray(res_u.ess))

    def test_remc_rungs_sharded_over_devices(self):
        """Replica exchange with the TEMPERATURE ladder sharded across the
        8-device mesh: per-rung transitions are embarrassingly parallel
        and the swap `jnp.roll` over the rung axis compiles to a
        cross-device permute (ICI collective) — results must match the
        unsharded run exactly."""
        MU = 3.0

        def lj(obs):
            z = obs["z"]
            return jnp.logaddexp(
                -0.5 * jnp.sum((z - MU) ** 2, -1),
                -0.5 * jnp.sum((z + MU) ** 2, -1),
            )

        re = zs.ReplicaExchangeHMC(
            step_size=0.2, n_leapfrogs=5, n_temps=8, min_beta=0.05
        )
        state0 = re.init({"z": jnp.full((16, 2), MU, jnp.float64)}, lj)
        key = jax.random.PRNGKey(11)

        mesh = Mesh(np.array(jax.devices()[:8]), ("temps",))
        temp_sharded = jax.tree.map(
            lambda x: jax.device_put(
                x,
                NamedSharding(
                    mesh,
                    P(*(("temps",) + (None,) * (x.ndim - 1)))
                    if x.ndim >= 1 and x.shape[0] == 8
                    else P(),
                ),
            ),
            state0,
        )

        # One step is exact vs unsharded (cross-shard layout changes cost
        # <=1 ulp in the density; long trajectories then diverge
        # chaotically, so the full-run check is statistical below).
        s_u, _ = re.sample(lj, {}, state0, key)
        s_s, _ = jax.jit(lambda s, k: re.sample(lj, {}, s, k))(
            temp_sharded, key
        )
        np.testing.assert_array_equal(
            np.asarray(s_u.q["z"]), np.asarray(s_s.q["z"])
        )
        np.testing.assert_allclose(
            np.asarray(s_u.base_lp), np.asarray(s_s.base_lp), atol=1e-13
        )

        # Full sharded run: mode mixing survives sharding (the rolled
        # swaps — cross-device permutes — actually happened) and the
        # cold-rung statistics are right.
        run = jax.jit(lambda s, k: re.run(lj, {}, s, k, 800, n_adapt=200))
        final_s, out_s = run(temp_sharded, key)
        xs = np.asarray(out_s["samples"]["z"][200:]).reshape(-1, 2)
        frac = (xs[:, 0] < 0).mean()
        assert abs(frac - 0.5) < 0.15, frac
        pos = xs[xs[:, 0] > 0]
        np.testing.assert_allclose(pos.mean(0), [MU, MU], atol=0.2)

    def test_sharded_statistics_recover_target(self):
        """Sharded sampling statistics hit the analytic moments (the weaker
        but configuration-independent check)."""
        dim, n_chains = 4, 512
        std = jnp.linspace(0.5, 2.0, dim, dtype=jnp.float64)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        hmc = zs.HMC(step_size=0.4, n_leapfrogs=5, adapt_step_size=True)
        mesh = chain_mesh(8)
        state = shard_chains(
            mesh,
            hmc.init(
                {"x": jnp.zeros((n_chains, dim), jnp.float64)}, log_joint=lj
            ),
        )
        final, out = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 400, n_adapt=200)
        )(state, jax.random.PRNGKey(0))
        xs = np.asarray(out["samples"]["x"][200:]).reshape(-1, dim)
        np.testing.assert_allclose(xs.std(0), np.asarray(std), rtol=0.1)
        np.testing.assert_allclose(
            xs.mean(0), np.zeros(dim), atol=3 * xs.std(0).max() / np.sqrt(len(xs))
        )


class TestReplicated:
    def test_replicated_placement(self):
        mesh = _dp_mesh()
        tree = {"a": jnp.ones((3, 3)), "b": jnp.zeros(())}
        placed = replicated(mesh, tree)
        assert placed["a"].sharding.spec == P()
        assert placed["b"].sharding.spec == P()


class TestSGMCMCDataParallel:
    def test_sgld_with_dp_sharded_minibatch_matches_replicated(self):
        """SGMCMC with the minibatch sharded over the mesh computes the
        same chain as unsharded: the latent is replicated, the observed
        batch is dp-sharded, and XLA inserts the gradient all-reduce
        (BASELINE.json north-star phrase 'SGMCMC samplers shard minibatch
        gradients over ICI')."""
        mesh = _dp_mesh()
        n_data, dim = 64, 4
        rng = np.random.RandomState(0)
        x_data = jnp.asarray(rng.randn(n_data, dim))

        def log_joint(obs):
            w = obs["w"]  # [dim]
            prior = jnp.sum(-0.5 * w ** 2)
            resid = obs["x"] @ w  # [n_data]
            lik = jnp.sum(-0.5 * resid ** 2)
            return prior + lik

        sampler = zs.SGLD(learning_rate=1e-3)
        state0 = sampler.init({"w": jnp.zeros(dim)},
                              key=jax.random.PRNGKey(0))

        run = jax.jit(
            lambda s, x, k: sampler.run(
                log_joint, {"x": x}, s, k, n_iters=50
            )
        )
        key = jax.random.PRNGKey(1)
        final_u, qs_u = run(state0, x_data, key)

        x_sharded = jax.device_put(
            x_data, NamedSharding(mesh, P("dp"))
        )
        state_r = jax.device_put(
            state0, jax.tree.map(
                lambda _: NamedSharding(mesh, P()), state0
            )
        )
        final_s, qs_s = run(state_r, x_sharded, key)

        np.testing.assert_allclose(
            np.asarray(qs_s["w"]), np.asarray(qs_u["w"]),
            rtol=1e-8, atol=1e-10,
        )


class TestNewSamplersSharded:
    def test_svgd_sharded_particles_match_unsharded(self):
        """SVGD's [n, n] kernel couples every particle pair, so sharding
        the particle axis makes XLA insert collectives — results must
        match the single-placement run (deterministic updates; only
        reduction order differs)."""
        from zhusuan_tpu.variational import SVGD

        def lj(obs):
            z = obs["z"]
            return -0.5 * jnp.sum((z - 1.0) ** 2, axis=-1)

        svgd = SVGD(learning_rate=0.2)
        state0 = svgd.init(
            {"z": jax.random.normal(jax.random.PRNGKey(0), (64, 3),
                                    jnp.float64)}
        )
        run = jax.jit(lambda s: svgd.run(lj, {}, s, n_iters=50))

        final_u, _ = run(state0)
        mesh = chain_mesh(8)
        final_s, _ = run(shard_chains(mesh, state0))

        np.testing.assert_allclose(
            np.asarray(final_s.particles["z"]),
            np.asarray(final_u.particles["z"]),
            rtol=1e-9, atol=1e-11,
        )

    def test_mala_sharded_chains_match_unsharded(self):
        """Chain-sharded MALA == unsharded MALA (partitionable threefry;
        chains independent except the shared adapted step size, which is a
        cross-device mean)."""
        from zhusuan_tpu.mcmc import MALA

        std = jnp.linspace(0.5, 2.0, 4, dtype=jnp.float64)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        mala = MALA(step_size=0.3, adapt_step_size=True)
        state0 = mala.init(
            {"x": jnp.zeros((64, 4), jnp.float64)}, n_chain_dims=1
        )
        run = jax.jit(
            lambda s, k: mala.run(lj, {}, s, k, n_iters=150, n_adapt=75)
        )
        key = jax.random.PRNGKey(5)
        final_u, out_u = run(state0, key)

        mesh = chain_mesh(8)
        final_s, out_s = run(shard_chains(mesh, state0), key)

        np.testing.assert_allclose(
            np.asarray(out_s["samples"]["x"]),
            np.asarray(out_u["samples"]["x"]),
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(out_s["step_size"]),
            np.asarray(out_u["step_size"]), rtol=1e-8,
        )
