"""Smoke tests: every example's training loop runs a few steps and
improves/stays finite on tiny configurations. These mirror the reference's
examples as acceptance workloads (SURVEY.md §2.12)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


KEY = jax.random.PRNGKey(0)


def _fake_binary(n, d, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, d) < 0.4).astype(np.float32)


class TestToyExamples:
    def test_gaussian_hmc(self):
        from examples.toy_examples import gaussian

        rel_err = gaussian.main()
        assert np.all(rel_err < 0.2)

    def test_gaussian_chees(self):
        import sys

        from examples.toy_examples import gaussian_chees

        old = sys.argv
        sys.argv = ["gaussian_chees", "--n_chains", "128",
                    "--n_iters", "800", "--n_adapt", "400"]
        try:
            rel_err = gaussian_chees.main()
        finally:
            sys.argv = old
        assert rel_err < 0.15

    def test_toy2d_intractable(self):
        from examples.toy_examples import toy2d_intractable

        params = toy2d_intractable.main(n_iters=300, n_particles=200)
        # The funnel pulls z2 down; check the optimizer moved params from
        # the (-2, -5) init and produced finite values.
        assert np.isfinite(float(params["z1_mean"]))
        assert float(params["z2_logstd"]) > -5.0

    def test_evidence_sandwich(self):
        from examples.toy_examples import evidence_sandwich

        out = evidence_sandwich.main(
            n_iters=400, n_particles=128, n_eval=50_000
        )
        # The fitted bracket must contain the analytic log Z tightly
        # (family contains the posterior, so both bounds approach log Z).
        assert out["lower"] <= out["log_z"] <= out["upper"], out
        assert out["gap"] < 0.05, out

    def test_mixture_sgnht(self):
        from examples.toy_examples import mixture_sgnht

        samples = mixture_sgnht.main(n_chains=100, n_iters=3000)
        frac_right = float(np.mean(samples > 1.0))
        assert 0.2 < frac_right < 0.8

    def test_neal_funnel_neutra(self):
        from examples.toy_examples import neal_funnel_neutra

        # Round-5 thin config: measured plain 2.53 / NeuTra 2.83 vs true
        # 3.0 — gap 0.30 vs the 0.2 bound at half the chains/iters.
        std_plain, std_neutra = neal_funnel_neutra.main(
            n_fit_iters=1000, n_chains=256, n_iters=600, n_adapt=300)
        # NeuTra explores the funnel neck plain HMC cannot reach.
        assert std_neutra > std_plain + 0.2
        assert abs(std_neutra - 3.0) < 0.45


class TestVAEFamily:
    def _train(self, step_fn, params, opt_state, x, n_steps=30):
        key = KEY
        first = None
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            out = step_fn(params, opt_state, x, sub)
            params, opt_state, lb = out[0], out[1], out[-1]
            if first is None:
                first = float(lb)
        return params, float(lb), first

    def test_vae(self):
        from examples.variational_autoencoders import vae

        params = vae.init_params(KEY, 64, 8, hidden=32)
        opt = optax.adam(1e-3)
        step = vae.make_train_step(opt, 8)
        x = jnp.asarray(_fake_binary(16, 64))
        params, last, first = self._train(
            step, params, opt.init(params), x
        )
        assert last > first  # ELBO improves

    def test_vae_bf16_compute(self):
        """Mixed-precision opt-in: bf16 encoder/decoder matmuls, f32
        master params / log-probs. The loss must stay f32, track the f32
        path, and training must still improve the ELBO."""
        from examples.variational_autoencoders import vae

        params = vae.init_params(KEY, 64, 8, hidden=32)
        x = jnp.asarray(_fake_binary(16, 64))
        l32 = vae.elbo_loss(params, x, KEY, 8)
        l16 = vae.elbo_loss(params, x, KEY, 8, compute_dtype=jnp.bfloat16)
        assert l16.dtype == l32.dtype  # output precision preserved
        # same key => same latent draw up to matmul rounding; bf16 has
        # ~3 decimal digits, so a few percent on a ~40-nat loss.
        assert abs(float(l16) - float(l32)) < 0.05 * abs(float(l32)) + 1.0
        g = jax.grad(vae.elbo_loss)(
            params, x, KEY, 8, 1, jnp.bfloat16)
        for gl, pl in zip(jax.tree_util.tree_leaves(g),
                          jax.tree_util.tree_leaves(params)):
            # grads upcast through the cast VJP back to the master dtype
            assert gl.dtype == pl.dtype and bool(jnp.all(jnp.isfinite(gl)))

        opt = optax.adam(1e-3)

        @jax.jit
        def step(p, o, xb, k):
            loss, grads = jax.value_and_grad(vae.elbo_loss)(
                p, xb, k, 8, 1, jnp.bfloat16)
            updates, o = opt.update(grads, o)
            return optax.apply_updates(p, updates), o, -loss

        params, last, first = self._train(step, params, opt.init(params), x)
        assert last > first

    def test_iwae(self):
        from examples.variational_autoencoders import iwae, vae

        params = vae.init_params(KEY, 64, 8, hidden=32)
        opt = optax.adam(1e-3)
        step = iwae.make_train_step(opt, 8, n_particles=5)
        x = jnp.asarray(_fake_binary(16, 64))
        params, last, first = self._train(
            step, params, opt.init(params), x
        )
        assert last > first

    def test_bernoulli_latent_vae(self):
        from examples.variational_autoencoders import bernoulli_latent_vae as blv

        params = blv.init_params(KEY, 64, 8, hidden=32)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        mm = jnp.asarray(0.0)

        @jax.jit
        def step(params, opt_state, mm, x, key):
            (loss, (lb, new_mm)), grads = jax.value_and_grad(
                blv.loss_fn, has_aux=True
            )(params, mm, x, key, 8)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, new_mm, lb

        x = jnp.asarray(_fake_binary(16, 64))
        key, first = KEY, None
        for i in range(30):
            key, sub = jax.random.split(key)
            params, opt_state, mm, lb = step(params, opt_state, mm, x, sub)
            if first is None:
                first = float(lb)
        assert float(lb) > first

    def test_vae_nf(self):
        from examples.normalizing_flows import vae_nf
        from examples.variational_autoencoders import vae
        from zhusuan_tpu.transform import init_planar_flow

        params = vae.init_params(KEY, 64, 8, hidden=32)
        params["flow"] = init_planar_flow(KEY, 4, 8)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, x, key):
            loss, grads = jax.value_and_grad(vae_nf.nf_elbo_loss)(
                params, x, key, 8
            )
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, -loss

        x = jnp.asarray(_fake_binary(16, 64))
        params, last, first = self._train(step, params, opt_state, x)
        assert last > first

    def test_gumbel_softmax_vae(self):
        # Categorical-latent VAE via the ExpConcrete relaxation: fully
        # reparameterized SGVB (contrast with the REINFORCE path above).
        from examples.variational_autoencoders import gumbel_softmax_vae as gs

        params = gs.init_params(KEY, 64, n_vars=4, n_classes=5, hidden=64)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        tau = jnp.asarray(1.0, jnp.float32)

        @jax.jit
        def step(params, opt_state, x, key):
            (loss, lb), grads = jax.value_and_grad(
                gs.loss_fn, has_aux=True
            )(params, x, key, 4, 5, tau)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, lb

        x = jnp.asarray(_fake_binary(16, 64))
        params, last, first = self._train(step, params, opt_state, x)
        assert last > first

    def test_toy2d_flow_elbo_near_log_z(self):
        # Coupling-flow VI on the funnel: the flow ELBO must approach the
        # true log Z = 0 — a gap mean-field q cannot close (its optimum on
        # this target sits far below; see the toy2d example).
        from examples.normalizing_flows import toy2d_flow

        flow_lb, _ = toy2d_flow.main(n_iters=500, n_particles=256)
        assert flow_lb > -0.15, flow_lb


class TestBNN:
    def test_bnn_vi(self):
        from examples.bayesian_neural_nets import bnn_vi

        layer_sizes = [5, 8, 1]
        params = bnn_vi.init_params(layer_sizes)
        loss_fn = bnn_vi.make_loss(layer_sizes, n_train=64, n_particles=5)
        opt = optax.adam(0.01)
        opt_state = opt.init(params)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(64, 5).astype(np.float32))
        y = jnp.asarray(rng.randn(64).astype(np.float32))

        @jax.jit
        def step(params, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y, key)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, -loss

        key, first, last = KEY, None, None
        for i in range(50):
            key, sub = jax.random.split(key)
            params, opt_state, lb = step(params, opt_state, sub)
            if first is None:
                first = float(lb)
            last = float(lb)
        assert last > first

        rmse, ll = bnn_vi.predict(
            params, x, y, layer_sizes, 50, KEY, 1.0
        )
        assert np.isfinite(float(rmse)) and np.isfinite(float(ll))

    def test_bnn_sgmcmc_steps(self):
        from examples.bayesian_neural_nets.bnn_sgmcmc import build_bnn
        import zhusuan_tpu as zs

        layer_sizes = [5, 8, 1]
        n_particles = 4
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(32, 5).astype(np.float32))
        y = jnp.asarray(rng.randn(32).astype(np.float32))
        logstds = [jnp.zeros([8, 6]), jnp.zeros([1, 9])]
        w_init = {
            "w0": jnp.asarray(rng.rand(n_particles, 8, 6).astype(np.float32)),
            "w1": jnp.asarray(rng.rand(n_particles, 1, 9).astype(np.float32)),
        }
        sgmcmc = zs.SGHMC(learning_rate=1e-5, friction=0.2,
                          second_order=True)
        state = sgmcmc.init(w_init, key=KEY)
        model = build_bnn(x, layer_sizes, logstds, n_particles)
        model.log_joint = lambda bn: (
            sum(bn.cond_log_prob(["w0", "w1"]))
            + jnp.mean(bn.cond_log_prob("y"), 1) * 32
        )
        state, info = jax.jit(
            lambda s, k: sgmcmc.sample(model, {"y": y}, s, k)
        )(state, KEY)
        assert np.all(np.isfinite(np.asarray(state.q["w0"])))
        assert info.mean_k is not None

    def test_variational_dropout_smoke(self):
        from examples.bayesian_neural_nets import variational_dropout as vd

        net_size = [10, 16, 3]
        params = vd.init_params(KEY, net_size)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 10).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 3, 8).astype(np.int32))
        model = vd.var_dropout(params, x, 8, net_size, 4)
        q = vd.build_q(params, 8, net_size, 4, KEY)
        import zhusuan_tpu as zs

        lb = zs.variational.elbo(
            model,
            {"y": jnp.tile(y[None], (4, 1))},
            variational=q, axis=0,
        )
        assert np.all(np.isfinite(np.asarray(lb.sgvb())))


class TestSBN:
    def test_vimco_training(self):
        from examples.sigmoid_belief_nets import sbn_vimco
        from examples.sigmoid_belief_nets.sbn import init_sbn_params

        params = init_sbn_params(KEY, 32, 16)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        x = jnp.asarray(_fake_binary(12, 32))

        @jax.jit
        def step(params, opt_state, key):
            (cost, lb), grads = jax.value_and_grad(
                sbn_vimco.vimco_loss, has_aux=True
            )(params, x, key, 16, 5)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, lb

        key, first, last = KEY, None, None
        for i in range(40):
            key, sub = jax.random.split(key)
            params, opt_state, lb = step(params, opt_state, sub)
            if first is None:
                first = float(lb)
            last = float(lb)
        assert last > first

    def test_adaptive_is(self):
        from examples.sigmoid_belief_nets import sbn_adaptive_is as sais
        from examples.sigmoid_belief_nets.sbn import init_sbn_params

        params = init_sbn_params(KEY, 32, 16)
        x = jnp.asarray(_fake_binary(12, 32))
        (cost, lb), grads = jax.value_and_grad(
            sais.combined_cost, has_aux=True
        )(params, x, KEY, 16, 5)
        flat = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # Both parameter groups receive gradients.
        assert float(jnp.sum(jnp.abs(grads["g_h1_x"]["w"]))) > 0
        assert float(jnp.sum(jnp.abs(grads["q_x_h1"]["w"]))) > 0


class TestSVGP:
    def test_svgp_elbo_improves(self):
        import argparse
        from examples.gaussian_process import svgp

        rng = np.random.RandomState(0)
        x = rng.randn(40, 3).astype(np.float32)
        y = np.sin(x.sum(-1)).astype(np.float32)
        hps_n_z, n_particles = 10, 5

        params = svgp.init_params(KEY, hps_n_z, 3, x)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        def loss_fn(params, key):
            model = svgp.build_model(params, jnp.asarray(x), hps_n_z,
                                     n_particles)

            def log_joint(bn):
                prior, log_py = bn.cond_log_prob(["fz", "y"])
                return prior + log_py

            model.log_joint = log_joint
            latent = svgp.build_variational_samples(
                params, jnp.asarray(x), hps_n_z, n_particles, key
            )
            import zhusuan_tpu as zs

            lb = zs.variational.elbo(
                model, observed={"y": jnp.asarray(y)}, latent=latent, axis=0
            )
            return jnp.mean(lb.sgvb()), jnp.mean(lb.tensor)

        @jax.jit
        def step(params, opt_state, key):
            (loss, lb), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, key)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, lb

        key, first, last = KEY, None, None
        for i in range(60):
            key, sub = jax.random.split(key)
            params, opt_state, lb = step(params, opt_state, sub)
            if first is None:
                first = float(lb)
            last = float(lb)
        assert last > first


class TestSSL:
    def test_ssl_cost_and_grads(self):
        from examples.semi_supervised_vae import vae_ssl

        n_class, z_dim, x_dim = 3, 6, 20
        params = vae_ssl.init_params(KEY, x_dim, n_class, z_dim, hidden=16)
        x_l = jnp.asarray(_fake_binary(6, x_dim))
        y_l = jnp.asarray(np.eye(n_class, dtype=np.float32)[[0, 1, 2, 0, 1, 2]])
        x_u = jnp.asarray(_fake_binary(8, x_dim, seed=1))
        (cost, (lb_l, lb_u, acc)), grads = jax.value_and_grad(
            vae_ssl.ssl_cost, has_aux=True
        )(params, x_l, y_l, x_u, KEY, n_class, z_dim, 4, 10.0)
        assert np.isfinite(float(cost))
        assert all(
            np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads)
        )

    def test_ssl_adaptive_is_cost(self):
        from examples.semi_supervised_vae import vae_ssl, vae_ssl_adaptive_is

        n_class, z_dim, x_dim = 3, 6, 20
        params = vae_ssl.init_params(KEY, x_dim, n_class, z_dim, hidden=16)
        x_l = jnp.asarray(_fake_binary(6, x_dim))
        y_l = jnp.asarray(np.eye(n_class, dtype=np.float32)[[0, 1, 2, 0, 1, 2]])
        x_u = jnp.asarray(_fake_binary(8, x_dim, seed=1))
        (cost, aux), grads = jax.value_and_grad(
            vae_ssl_adaptive_is.adaptive_is_cost, has_aux=True
        )(params, x_l, y_l, x_u, KEY, n_class, z_dim, 4, 10.0)
        assert np.isfinite(float(cost))
        assert all(
            np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads)
        )


class TestConvVAE:
    def test_conv_vae_improves(self):
        from examples.variational_autoencoders import vae_conv

        params = vae_conv.init_params(KEY, z_dim=8)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        x = jnp.asarray(_fake_binary(8, 784))

        @jax.jit
        def step(params, opt_state, x, key):
            loss, grads = jax.value_and_grad(vae_conv.elbo_loss)(
                params, x, key, 8
            )
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, -loss

        key, first, last = KEY, None, None
        for i in range(15):
            key, sub = jax.random.split(key)
            params, opt_state, lb = step(params, opt_state, x, sub)
            if first is None:
                first = float(lb)
            last = float(lb)
        assert last > first


class TestTopicModel:
    def test_lntm_steps(self):
        from examples.topic_models import lntm_mcem

        beta, eta_mean, eta_logstd = lntm_mcem.main(
            epochs=2, batch_size=50, n_topics=5, ais_temperatures=40
        )
        assert np.all(np.isfinite(np.asarray(beta)))


class TestPMF:
    def test_pmf_sweeps(self):
        from examples.probabilistic_matrix_factorization import pmf_hmc

        state_u, state_v = pmf_hmc.main(n_epochs=5, D=4, K=2, n_leapfrogs=3)
        assert np.all(np.isfinite(np.asarray(state_u.q["u"])))


class TestGANs:
    def test_dcgan_losses(self):
        from examples.generative_adversarial_nets import dcgan

        key = KEY
        gen_params = dcgan.init_gen_params(key, 8, ngf=8)
        disc_params = dcgan.init_disc_params(key, ndf=4)
        x = jnp.asarray(
            np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32)
        )
        gl, dl = dcgan.gan_losses(gen_params, disc_params, x, key, 8)
        assert np.isfinite(float(gl)) and np.isfinite(float(dl))
        g = jax.grad(
            lambda gp: dcgan.gan_losses(gp, disc_params, x, key, 8)[0]
        )(gen_params)
        assert all(
            np.all(np.isfinite(np.asarray(leaf)))
            for leaf in jax.tree.leaves(g)
        )

    def test_wgan_steps(self):
        from examples.generative_adversarial_nets import dcgan, wasserstein_gan

        key = KEY
        gen_params = dcgan.init_gen_params(key, 8, ngf=8)
        disc_params = dcgan.init_disc_params(key, ndf=4)
        x = jnp.asarray(
            np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32)
        )
        closs = wasserstein_gan.critic_loss(disc_params, gen_params, x, key, 8)
        gloss = wasserstein_gan.gen_loss(gen_params, disc_params, x, key, 8)
        assert np.isfinite(float(closs)) and np.isfinite(float(gloss))

    @staticmethod
    def _bright_data(n=512):
        """Synthetic CIFAR-shaped data with pixel mean 0.75, far from the
        init generator's sigmoid-mean ~0.5 — makes moment convergence a
        measurable training-dynamics signal."""
        rng = np.random.RandomState(0)
        return (0.6 + 0.3 * rng.rand(n, 32, 32, 3)).astype(np.float32)

    @staticmethod
    def _gen_mean(dcgan, params, z_dim, seed):
        x = dcgan.generator(params, 256, z_dim, jax.random.PRNGKey(seed))
        return float(jnp.mean(x["x_gen"]))

    def test_dcgan_training_dynamics(self):
        """Adversarial training actually trains (VERDICT r3 item 4): the
        generator's moment gap to the data shrinks and the trained
        discriminator is pushed toward chance on trained fakes while
        still separating init-generator fakes easily (reference
        dcgan.py:99-138 is a full training script)."""
        from examples.generative_adversarial_nets import dcgan

        data = self._bright_data()
        data_mean = float(data.mean())
        z_dim = 16
        # Same init path as main() so the init gap is the run's true start.
        _, kg, _ = jax.random.split(jax.random.PRNGKey(1234), 3)
        init_gen = dcgan.init_gen_params(kg, z_dim, ngf=8)
        gap0 = abs(self._gen_mean(dcgan, init_gen, z_dim, 5) - data_mean)

        # 8 epochs (round-5 thin): measured gap ratio 0.752 and trained-D
        # accuracy 0.209 vs bounds 0.85 / 0.8 (0.692 / 0.562 at 10).
        gen_p, disc_p, hist = dcgan.main(
            epochs=8, batch_size=32, z_dim=z_dim, ngf=8, ndf=4, lr=1e-3,
            x_train=data, iters_per_epoch=16, save_samples=False)
        gap1 = abs(self._gen_mean(dcgan, gen_p, z_dim, 6) - data_mean)
        assert len(hist["gen_loss"]) == 8
        # 128 steps: the generator's brightness moves decisively toward
        # the data (0.25 -> ~0.19 in the pinned test config).
        assert gap1 < 0.85 * gap0, (gap1, gap0)

        x_real = jnp.asarray(data[:256])
        key = jax.random.PRNGKey(9)
        fakes = dcgan.generator(gen_p, 256, z_dim, key)["x_gen"]
        r = np.asarray(dcgan.discriminator(disc_p, x_real)) > 0
        f = np.asarray(dcgan.discriminator(disc_p, fakes)) < 0
        acc_trained = 0.5 * (r.mean() + f.mean())
        # The D that trained against this G cannot confidently separate
        # it from the data (falls toward/below chance, ~0.21 in the
        # pinned config) — an untrained G is trivially separable (>0.9),
        # so this only passes if G genuinely chased D's decision boundary.
        assert acc_trained < 0.8, acc_trained

    def test_wgan_training_dynamics(self):
        """WGAN training moment-matches the data (reference
        wasserstein_gan.py:72-117): generator pixel mean converges to the
        data mean through the clipped-critic adversarial game."""
        from examples.generative_adversarial_nets import dcgan, wasserstein_gan

        data = self._bright_data()
        data_mean = float(data.mean())
        z_dim = 16
        _, kg, _ = jax.random.split(jax.random.PRNGKey(1234), 3)
        init_gen = dcgan.init_gen_params(kg, z_dim, ngf=8)
        gap0 = abs(self._gen_mean(dcgan, init_gen, z_dim, 7) - data_mean)

        gen_p, _, hist = wasserstein_gan.main(
            epochs=5, batch_size=32, z_dim=z_dim, n_critic=2, ngf=8,
            ndf=4, lr=1e-3, x_train=data, iters_per_epoch=12)
        gap1 = abs(self._gen_mean(dcgan, gen_p, z_dim, 7) - data_mean)
        assert gap1 < 0.15 * gap0, (gap1, gap0)
        assert np.all(np.isfinite(hist["w_dist"]))


class TestParallel:
    def test_data_parallel_grad(self):
        # Deterministic loss (no per-shard sampling) so the sharded result
        # must bitwise-match the single-device computation.
        from zhusuan_tpu.parallel import chain_mesh, data_parallel_grad
        import zhusuan_tpu as zs

        mesh = chain_mesh(axis_name="dp")
        params = {"w": jnp.ones((32,)) * 0.1, "logstd": jnp.zeros(())}
        x = jnp.asarray(np.random.RandomState(0).randn(16, 32))

        def loss_fn(params, batch, key):
            pred = batch @ params["w"]
            dist = zs.distributions.Normal(pred, logstd=params["logstd"])
            return -jnp.mean(dist.log_prob(jnp.ones(batch.shape[0])))

        f = data_parallel_grad(loss_fn, mesh, axis_name="dp")
        with mesh:
            loss, grads = f(params, x, KEY)
        loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, x, KEY)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(grads_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8
            )

    def test_shard_chains_hmc(self):
        from zhusuan_tpu.parallel import chain_mesh, shard_chains
        import zhusuan_tpu as zs

        mesh = chain_mesh(axis_name="chains")
        n_dev = len(jax.devices())
        n_chains = 8 * n_dev

        def log_joint(obs):
            return jnp.sum(-0.5 * obs["x"] ** 2, -1)

        hmc = zs.HMC(step_size=0.3, n_leapfrogs=3)
        state = hmc.init(
            {"x": jnp.zeros((n_chains, 4))}, log_joint=log_joint
        )
        state = shard_chains(mesh, state)
        step = jax.jit(lambda s, k: hmc.sample(log_joint, {}, s, k))
        new_state, info = step(state, KEY)
        assert new_state.q["x"].shape == (n_chains, 4)
        assert np.all(np.isfinite(np.asarray(info.acceptance_rate)))


class TestImageUtils:
    def test_save_image_collections(self, tmp_path):
        from examples.utils.utils import save_image_collections

        rng = np.random.RandomState(0)
        imgs = rng.rand(25, 28, 28, 1).astype(np.float32)
        out = str(tmp_path / "grid.png")
        save_image_collections(imgs, out, shape=(5, 5))
        import os
        assert os.path.exists(out)
        from PIL import Image

        with Image.open(out) as im:
            assert im.size == (5 * 28, 5 * 28)


class TestMultiChipStatistics:
    def test_sharded_hmc_run_moments(self):
        # Full adaptive HMC run with the chain axis sharded over all 8
        # virtual devices; the sharded program must recover the target
        # moments (end-to-end multi-chip correctness, not just one step).
        from zhusuan_tpu.parallel import chain_mesh, shard_chains
        import zhusuan_tpu as zs

        n_dev = len(jax.devices())
        n_chains, dim = 64 * n_dev, 8
        mean = jnp.arange(dim, dtype=jnp.float64)
        std = jnp.linspace(0.5, 1.5, dim, dtype=jnp.float64)

        def lj(obs):
            return jnp.sum(-0.5 * ((obs["x"] - mean) / std) ** 2, -1)

        hmc = zs.HMC(step_size=0.5, n_leapfrogs=8, adapt_step_size=True)
        state = hmc.init(
            {"x": jnp.zeros((n_chains, dim), jnp.float64)}, log_joint=lj
        )
        mesh = chain_mesh(axis_name="chains")
        state = shard_chains(mesh, state)
        state, _ = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 400, n_adapt=300,
                                 collect=False)
        )(state, KEY)
        _, out = jax.jit(lambda s, k: hmc.run(lj, {}, s, k, 300))(
            state, jax.random.PRNGKey(1)
        )
        x = np.asarray(out["samples"]["x"]).reshape(-1, dim)
        np.testing.assert_allclose(x.mean(0), np.asarray(mean), atol=0.2)
        np.testing.assert_allclose(x.std(0), np.asarray(std), rtol=0.15)


class TestSVGPDiabetes:
    def test_svgp_improves_on_real_data(self):
        """SVGP on the bundled REAL diabetes data (RESULTS.md): a short
        training run must beat the predict-the-mean baseline on held-out
        RMSE and improve its bound."""
        import optax

        from examples.gaussian_process import svgp
        from examples.utils import dataset

        (x_train, y_train, xv, yv, x_test, y_test,
         synthetic) = dataset.load_uci_diabetes()
        assert not synthetic
        x_train = np.vstack([x_train, xv])
        y_train = np.hstack([y_train, yv])
        n_train, n_cov = x_train.shape
        x_train, x_test, _, _ = dataset.standardize(x_train, x_test)
        y_train, y_test, mean_y, std_y = dataset.standardize(
            y_train, y_test
        )
        n_z, n_particles = 20, 5
        params = svgp.init_params(KEY, n_z, n_cov, x_train)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        x = jnp.asarray(x_train, jnp.float64)
        y = jnp.asarray(y_train, jnp.float64)

        def loss_fn(p, key):
            model = svgp.build_model(p, x, n_z, n_particles)

            def log_joint(bn):
                prior, lik = bn.cond_log_prob(["fz", "y"])
                return prior + lik

            model.log_joint = log_joint
            latent = svgp.build_variational_samples(
                p, x, n_z, n_particles, key
            )
            import zhusuan_tpu as zs

            lb = zs.variational.elbo(model, observed={"y": y},
                                     latent=latent, axis=0)
            return jnp.mean(lb.sgvb()), jnp.mean(lb.tensor)

        @jax.jit
        def step(p, o, key):
            (l, lb), g = jax.value_and_grad(loss_fn, has_aux=True)(p, key)
            updates, o = opt.update(g, o)
            return optax.apply_updates(p, updates), o, lb

        key = KEY
        first_lb = None
        for i in range(300):  # round-5 thin; improvement margin is wide
            key, sub = jax.random.split(key)
            params, opt_state, lb = step(params, opt_state, sub)
            if first_lb is None:
                first_lb = float(lb)
        assert float(lb) > first_lb  # bound improves on real data

        # Posterior-predictive mean (variational q(fz) -> fx, the
        # example's predict path) beats predict-the-mean on RMSE.
        xt = jnp.asarray(x_test, jnp.float64)
        latent = svgp.build_variational_samples(
            params, xt, n_z, 50, jax.random.PRNGKey(0)
        )
        fx = jnp.mean(jnp.asarray(latent["fx"][0]), axis=0)
        pred = np.asarray(fx) * std_y + mean_y
        y_orig = np.asarray(y_test) * std_y + mean_y
        rmse = float(np.sqrt(np.mean((pred - y_orig) ** 2)))
        base = float(np.sqrt(np.mean((mean_y - y_orig) ** 2)))
        assert rmse < base, (rmse, base)


class TestSteinVariational:
    def test_blr_svgd_beats_baseline(self):
        # SVGD Bayesian logistic regression (Liu & Wang 2016 benchmark):
        # the posterior-predictive ensemble must clearly beat the
        # majority-class baseline on held-out data.
        from examples.stein_variational import blr_svgd

        acc, base = blr_svgd.main(n_particles=50, n_iters=800,
                                  learning_rate=0.05)
        assert acc > base + 0.2, (acc, base)


class TestGPClassification:
    def test_gp_ess_beats_baseline(self):
        # Elliptical-slice GP classification: posterior-mean predictions
        # must clearly beat the majority class on the noisy two-band data.
        from examples.gaussian_process import gp_classification_ess

        acc, base = gp_classification_ess.main(
            n_chains=32, n_iters=1200, burn_in=500
        )
        assert acc > base + 0.2, (acc, base)


class TestModelComparison:
    def test_bayes_factor_smc_matches_closed_form(self):
        # Both candidate evidences are closed-form Gaussian-linear-model
        # marginals: the SMC estimates must track them. (The ordering on
        # this small dataset is a thin ~0.2-nat margin — accuracy against
        # truth is the robust property to pin.)
        from examples.model_comparison import bayes_factor_smc as bf

        # Round-5 thin: measured errs 0.069 / 0.038 vs the 0.3 bound at
        # 1500 particles (4000 buys nothing here).
        results = bf.main(n_particles=1500)
        for degree, (est, truth) in results.items():
            assert abs(est - truth) < 0.3, (degree, est, truth)


    def test_loo_compare_selects_correctly(self):
        # Misspecified degree-0 must lose by many standard errors; the
        # nested degree-2 must tie degree 1 within error; every Pareto k
        # must certify the weights (< 0.7); p_loo must track the true
        # parameter counts for the well-specified models.
        import numpy as np

        from examples.model_comparison import loo_compare

        # Round-5 thin: at 300/150 measured gap01/2se = 2.41, gap12/se =
        # 0.05, max k = 0.37 — all the pinned relations hold with room.
        results = loo_compare.main(n_iters=300, n_adapt=150)
        gap01 = float(results[1].elpd_loo - results[0].elpd_loo)
        se01 = float(np.hypot(results[0].se, results[1].se))
        assert gap01 > 2.0 * se01, (gap01, se01)
        gap12 = abs(float(results[1].elpd_loo - results[2].elpd_loo))
        se12 = float(np.hypot(results[1].se, results[2].se))
        assert gap12 < se12, (gap12, se12)
        for deg, loo in results.items():
            assert float(np.max(loo.pareto_k)) < 0.7, (deg, loo.pareto_k)
        assert 1.0 < float(results[1].p_loo) < 3.0
        assert 2.0 < float(results[2].p_loo) < 4.5


class TestRobustModels:
    def test_robust_regression_beats_ols(self):
        # StudentT likelihood + HalfCauchy scale via bijectors: the
        # posterior slope must be closer to the truth than OLS on the
        # outlier-contaminated data.
        from examples.robust_models import robust_regression

        slope, ols = robust_regression.main(
            n_chains=32, n_iters=1200, n_adapt=600
        )
        assert abs(slope - 2.0) < abs(ols - 2.0), (slope, ols)
        assert abs(slope - 2.0) < 0.3


class TestHierarchical:
    def test_eight_schools_matches_quadrature(self):
        # The (mu, tau) marginal posterior is exactly computable by 2-D
        # quadrature after integrating theta out analytically — HMC on
        # the full non-centered model must reproduce it.
        from examples.hierarchical import eight_schools as es

        stats, theta = es.main(n_chains=32, n_iters=2500, n_adapt=1200,
                               verbose=False)
        mus = np.linspace(-20, 35, 400)
        taus = np.linspace(0.01, 40, 800)
        M, T = np.meshgrid(mus, taus, indexing="ij")
        lp = -0.5 * (M / 100.0) ** 2 + np.log(1 / (1 + (T / 5.0) ** 2))
        for y, s in zip(es.Y, es.SIGMA):
            v = s**2 + T**2
            lp += -0.5 * np.log(v) - 0.5 * (y - M) ** 2 / v
        w = np.exp(lp - lp.max())
        w /= w.sum()
        mu_q, tau_q = float((M * w).sum()), float((T * w).sum())

        assert abs(float(stats["mu"]["mean"]) - mu_q) < 0.3
        assert abs(float(stats["tau"]["mean"]) - tau_q) < 0.4
        assert np.all(stats["mu"]["r_hat"] < 1.05)
        # Partial pooling: every posterior effect lies between its raw
        # estimate and the population mean (shrinkage).
        post = theta.reshape(-1, 8).mean(0)
        assert np.all(np.abs(post - mu_q) <= np.abs(es.Y - mu_q) + 0.5)

    def test_eight_schools_funnel_diagnosis(self):
        # The canonical NUTS workflow: the centered parameterization's
        # funnel produces divergences clustered at small tau; the
        # non-centered fix removes (nearly) all of them.
        from examples.hierarchical import eight_schools as es

        # Round-5 thin: measured c=0.013 / nc=0.0004 / small_frac=1.0 at
        # 500/250 — same diagnosis at 60% of the draws.
        c_rate, nc_rate, small_frac = es.funnel_diagnosis(
            n_chains=32, n_iters=500, n_adapt=250, verbose=False
        )
        assert c_rate > 0.01, c_rate  # the funnel bites
        assert nc_rate < c_rate / 3, (c_rate, nc_rate)
        # Divergences are informative: they live in the neck.
        assert small_frac > 0.8, small_frac


class TestDirichletVAE:
    def test_pathwise_dirichlet_training_recovers_topics(self):
        """The implicit-reparameterization showcase (VERDICT r2 item 7):
        SGVB through a Dirichlet(is_reparameterized=True) posterior must
        beat chance at recovering the generating topics — impossible in
        the reference (non-reparameterized Gamma family)."""
        from examples.topic_models import dirichlet_vae as dv
        from zhusuan_tpu import fit_scan

        bows, true_topics = dv.synthetic_corpus(n_docs=256, doc_len=64,
                                                seed=1)
        key = jax.random.PRNGKey(0)
        key, k_init = jax.random.split(key)
        params = dv.init_params(k_init)

        phi0 = np.asarray(jax.nn.softmax(params["log_phi"], axis=-1))
        tv0 = (0.5 * np.abs(true_topics[:, None] - phi0[None]).sum(-1)
               ).min(1).mean()

        # Round-5 thin: measured dloss 32.6 / dtv 0.072 at 60 epochs vs
        # bounds 20 / 0.05 (33.6 / 0.076 at 100).
        params, _, hist = fit_scan(
            dv.elbo_loss, params, optax.adam(1e-2), bows,
            key=key, epochs=60, batch_size=64,
        )
        phi = np.asarray(jax.nn.softmax(params["log_phi"], axis=-1))
        tv = (0.5 * np.abs(true_topics[:, None] - phi[None]).sum(-1)
              ).min(1).mean()
        # Calibrated on this seed: -ELBO 338.9 -> ~305 and tv 0.756 ->
        # ~0.68 (final TV is key-stream-sensitive — local optima — so the
        # bound is a clear-improvement margin, not the plateau value;
        # the 512-doc example config reaches tv ~ 0.26).
        assert hist[-1].mean() < hist[0].mean() - 20.0
        assert tv < tv0 - 0.05


class TestStochasticVolatility:
    def test_pf_filtering_and_pmmh_recovery(self):
        """SV model (Kim-Shephard-Chib): particle filtering tracks the
        true log-volatility path, and PMMH recovers (mu, phi, sigma)
        from synthetic returns within calibrated bounds (CPU test scale:
        T=100, 128 particles, 4 chains x 400 iters; recovers
        mu=-1.40/phi=0.971/sigma=0.240 vs truth -1/0.95/0.25)."""
        from examples.state_space import stochastic_volatility as sv

        hs_true, ys, synthetic = sv.simulate(100)
        assert synthetic  # zero-egress: data are generated, flagged

        theta_true = {
            "mu": jnp.asarray(sv.TRUE["mu"]),
            "phi_u": jnp.arctanh(jnp.asarray(sv.TRUE["phi"])),
            "log_sigma": jnp.log(jnp.asarray(sv.TRUE["sigma"])),
        }
        pf = sv.make_filter(theta_true, jnp.asarray(ys), 256)
        res = pf.run(jax.random.PRNGKey(1), jnp.asarray(ys))
        rmse = float(jnp.sqrt(jnp.mean(
            (res.filter_means - jnp.asarray(hs_true)) ** 2)))
        assert np.isfinite(float(res.log_z))
        assert rmse < 0.9  # tracks the latent path (h sd ~ 0.8 here)

        _, out = sv.run_pmmh(ys, n_particles=128, n_chains=4,
                             n_iters=400, seed=0)
        draws = {k: np.asarray(v)[100:]
                 for k, v in out["samples"].items()}
        acc = float(np.asarray(out["acceptance_rate"]).mean())
        assert 0.1 < acc < 0.95
        assert -2.2 < draws["mu"].mean() < 0.2
        assert 0.85 < np.tanh(draws["phi_u"]).mean() < 0.995
        assert 0.12 < np.exp(draws["log_sigma"]).mean() < 0.45


class TestMixtureModels:
    def test_gmm_recovers_components(self):
        # Full Bayesian GMM by HMC on the marginalized Mixture density:
        # sorted posterior component parameters must recover the truth,
        # and posterior-mean responsibilities must cluster the data.
        from examples.mixture_models import gmm

        # Round-5 thin: errs 0.081/0.033/0.086 vs atol 0.3/0.07/0.25 at
        # 550/400, acc 0.983.
        (w, mu, sd), acc, stats = gmm.main(
            n_chains=8, n_iters=550, n_adapt=400, verbose=False
        )
        np.testing.assert_allclose(mu, gmm.TRUE_MU, atol=0.3)
        np.testing.assert_allclose(w, gmm.TRUE_W, atol=0.07)
        np.testing.assert_allclose(sd, gmm.TRUE_SD, atol=0.25)
        assert acc > 0.95


class TestChangepoint:
    def test_gibbs_recovers_changepoint(self):
        """Poisson change-point by Gibbs (DiscreteGibbs tau + HMC rates):
        the posterior mode of tau must hit the true change point and the
        rate ordering must be recovered (CPU scale: T=60, 64 chains x
        700 sweeps)."""
        from examples.state_space import changepoint as cp

        # Round-5 thin: mode exact, mean err 0.59, conc frac 0.89 at
        # 700/250 (bounds 3.0 / 0.6).
        res = cp.run(t=60, n_chains=64, n_iters=700, burnin=250, seed=0)
        assert res["synthetic"]
        assert res["tau_mode"] == cp.TRUE["tau"]
        assert abs(res["tau_mean"] - cp.TRUE["tau"]) < 3.0
        lam = res["lam_mean"]
        assert lam[0] > 2.0 * lam[1]  # the drop is detected
        # Posterior mass concentrates: >60% of draws within +-2 of truth.
        tau = res["tau_draws"]
        frac = float(np.mean(np.abs(tau - cp.TRUE["tau"]) <= 2))
        assert frac > 0.6, frac


class TestOrdinalRegression:
    def test_nuts_recovers_cutpoints_and_weights(self):
        """Cumulative-logit ordinal regression: NUTS over Ordered
        cutpoints + weights recovers the generating parameters within
        posterior uncertainty (CPU scale: n=400, 16 chains x 500)."""
        from examples.robust_models import ordinal_regression as orx

        # Round-5 thin: max |err|/bound 0.37 at 500/200 (4sd bounds).
        res = orx.run(n=400, n_chains=16, n_iters=500, burnin=200, seed=1)
        assert res["synthetic"]
        # Every draw respects the ordering constraint.
        assert (np.diff(res["cuts_draws"], axis=-1) > 0).all()
        np.testing.assert_allclose(
            res["beta_mean"], orx.TRUE_BETA, atol=4 * res["beta_sd"].max()
        )
        np.testing.assert_allclose(
            res["cuts_mean"], orx.TRUE_CUTS, atol=4 * res["cuts_sd"].max()
        )


class TestCovarianceEstimation:
    def test_nuts_recovers_covariance(self):
        """Sigma = diag(s) L L' diag(s) with an LKJ prior: the posterior
        mean covariance must track the sample covariance (the large-n
        concentration point) entrywise within posterior sd."""
        from examples.hierarchical import covariance_estimation as ce

        # Round-5 thin: max |err|/bound 0.33 at 500/200.
        res = ce.run(n=300, n_chains=8, n_iters=500, burnin=200, seed=2)
        assert res["synthetic"]
        err = np.abs(res["cov_mean"] - res["sample_cov"])
        assert (err < 4.0 * res["cov_sd"] + 0.05).all(), err
        # And the truth is recovered to sampling accuracy of n=300.
        np.testing.assert_allclose(
            res["scale_mean"], ce.TRUE_SCALES, rtol=0.15
        )
        np.testing.assert_allclose(
            res["corr_mean"], ce.TRUE_CORR, atol=0.15
        )


class TestSurvivalRegression:
    def test_nuts_recovers_aft_parameters(self):
        """Weibull AFT with ~40% right-censoring: NUTS over (k, beta)
        recovers the generating parameters within posterior uncertainty
        — censoring correctly handled through RightCensored."""
        from examples.robust_models import survival_regression as sr

        # Round-5 thin: max |err|/bound 0.53 at 500/200.
        res = sr.run(n=500, n_chains=8, n_iters=500, burnin=200, seed=4)
        assert res["synthetic"]
        assert 0.2 < res["frac_censored"] < 0.6
        assert abs(res["k_mean"] - sr.TRUE_K) < 4 * res["k_sd"]
        np.testing.assert_allclose(
            res["beta_mean"], sr.TRUE_BETA,
            atol=4 * res["beta_sd"].max(),
        )
