"""State-space module tests: particle filter/smoother vs exact Kalman.

The linear-Gaussian SSM gives CLOSED-FORM filtering/smoothing/evidence, so
every particle estimate here is checked against an exact value (and
``zhusuan_tpu.ssm.kalman_filter`` itself is checked against an
independently hand-rolled NumPy implementation) — the strongest test the
sequential family admits. Beyond-reference module: upstream ZhuSuan has no
sequential inference (its closest tool is AIS, evaluation.py:57-172).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs

# -- fixed LGSSM ----------------------------------------------------------

A = np.array([[0.9, 0.1], [0.0, 0.8]])
Q_SCALE = 0.1  # Q = Q_SCALE * I
Q = Q_SCALE * np.eye(2)
H = np.array([[1.0, 0.5]])
R_SCALE = 0.5  # R = [[R_SCALE]]
R = np.array([[R_SCALE]])
M0 = np.zeros(2)
P0 = np.eye(2)
T = 50
D = 2


def simulate(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.multivariate_normal(M0, P0)
    ys = np.empty((T, 1))
    for t in range(T):
        if t > 0:
            x = A @ x + rng.multivariate_normal(np.zeros(D), Q)
        ys[t] = H @ x + rng.multivariate_normal(np.zeros(1), R)
    return ys


YS = simulate()


def numpy_kalman(ys):
    """Independent hand-rolled reference filter + RTS smoother."""
    m, P, ll = M0.copy(), P0.copy(), 0.0
    ms_f, Ps_f, ms_p, Ps_p = [], [], [], []
    for t in range(T):
        if t > 0:
            m, P = A @ m, A @ P @ A.T + Q
        ms_p.append(m.copy())
        Ps_p.append(P.copy())
        S = H @ P @ H.T + R
        innov = ys[t] - H @ m
        ll += float(
            -0.5 * innov @ np.linalg.solve(S, innov)
            - 0.5 * np.log(np.linalg.det(S))
            - 0.5 * len(innov) * np.log(2 * np.pi)
        )
        K = P @ H.T @ np.linalg.inv(S)
        m = m + K @ innov
        P = P - K @ S @ K.T
        ms_f.append(m.copy())
        Ps_f.append(P.copy())
    # RTS backward.
    ms_s, Ps_s = [ms_f[-1]], [Ps_f[-1]]
    for t in range(T - 2, -1, -1):
        G = Ps_f[t] @ A.T @ np.linalg.inv(Ps_p[t + 1])
        ms_s.insert(0, ms_f[t] + G @ (ms_s[0] - ms_p[t + 1]))
        Ps_s.insert(0, Ps_f[t] + G @ (Ps_s[0] - Ps_p[t + 1]) @ G.T)
    return (np.array(ms_f), np.array(Ps_f), ll,
            np.array(ms_s), np.array(Ps_s))


MS_F, PS_F, LL_EXACT, MS_S, PS_S = numpy_kalman(YS)


# -- model callables for the particle filter ------------------------------

Aj = jnp.asarray(A)
Hj = jnp.asarray(H)
CHOL_Q = jnp.asarray(np.linalg.cholesky(Q))


def init_fn(key, n):
    return jax.random.normal(key, (n, D), jnp.float64)  # P0 = I, m0 = 0


def transition_fn(key, x, t):
    eps = jax.random.normal(key, x.shape, x.dtype)
    return x @ Aj.T + eps @ CHOL_Q.T


def emission_log_prob(x, y, t):
    mu = x @ Hj.T  # [n, 1]
    return jnp.sum(
        -0.5 * (y - mu) ** 2 / R_SCALE
        - 0.5 * jnp.log(2.0 * jnp.pi * R_SCALE),
        axis=-1,
    )


def transition_log_prob(x_new, x_old, t):
    diff = x_new - x_old @ Aj.T
    return (-0.5 * jnp.sum(diff ** 2, -1) / Q_SCALE
            - 0.5 * D * jnp.log(2.0 * jnp.pi * Q_SCALE))


def make_pf(n=4000, **kw):
    return zs.ParticleFilter(
        init_fn, transition_fn, emission_log_prob, n_particles=n, **kw
    )


class TestKalman:
    def test_filter_matches_numpy(self):
        res = zs.kalman_filter(YS, A, Q, H, R, M0, P0)
        np.testing.assert_allclose(res.means, MS_F, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(res.covs, PS_F, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(float(res.log_likelihood), LL_EXACT,
                                   rtol=1e-8)

    def test_smoother_matches_numpy_rts(self):
        res = zs.kalman_smoother(YS, A, Q, H, R, M0, P0)
        np.testing.assert_allclose(res.means, MS_S, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(res.covs, PS_S, rtol=1e-8, atol=1e-10)
        # Smoothing can only sharpen: diag covs <= filtering diag covs.
        assert np.all(np.diagonal(res.covs, axis1=1, axis2=2)
                      <= np.diagonal(PS_F, axis1=1, axis2=2) + 1e-12)


class TestParticleFilter:
    def test_bootstrap_log_z_and_means_match_kalman(self):
        pf = make_pf()
        res = pf.run(jax.random.PRNGKey(0), jnp.asarray(YS))
        assert abs(float(res.log_z) - LL_EXACT) < 1.0
        np.testing.assert_allclose(res.filter_means, MS_F, atol=0.15)
        # Adaptive resampling fired at least once over 50 steps but not
        # every step, and ESS stays within (1, n].
        assert 0 < int(res.n_resamples) < T
        assert float(jnp.min(res.ess)) > 1.0
        assert float(jnp.max(res.ess)) <= pf._n + 1e-6

    def test_jit_matches_eager(self):
        pf = make_pf(n=512)
        key = jax.random.PRNGKey(3)
        eager = pf.run(key, jnp.asarray(YS))
        jitted = jax.jit(lambda k, y: pf.run(k, y))(key, jnp.asarray(YS))
        np.testing.assert_allclose(float(jitted.log_z),
                                   float(eager.log_z), rtol=1e-12)

    def test_guided_identity_proposal_is_bitwise_bootstrap(self):
        """proposal == transition must reduce EXACTLY to the bootstrap
        filter (the weight correction telescopes to zero) — a sharp test
        of the guided-weight plumbing."""
        key = jax.random.PRNGKey(1)
        boot = make_pf(n=1024).run(key, jnp.asarray(YS))
        guided = make_pf(
            n=1024,
            proposal_fn=lambda key, x, y, t: transition_fn(key, x, t),
            proposal_log_prob=lambda xn, xo, y, t: transition_log_prob(
                xn, xo, t),
            transition_log_prob=transition_log_prob,
        ).run(key, jnp.asarray(YS))
        np.testing.assert_allclose(float(guided.log_z),
                                   float(boot.log_z), rtol=1e-12)
        np.testing.assert_allclose(guided.filter_means, boot.filter_means,
                                   rtol=1e-10, atol=1e-12)

    def test_optimal_proposal_tightens_log_z(self):
        """Locally-optimal Gaussian proposal p(x_t | x_{t-1}, y_t): the
        guided filter's evidence estimate should sit close to exact."""
        # Sigma = (Q^-1 + H' R^-1 H)^-1, shared across particles.
        Sig = np.linalg.inv(np.linalg.inv(Q) + H.T @ H / R_SCALE)
        chol_sig = jnp.asarray(np.linalg.cholesky(Sig))
        Sigj = jnp.asarray(Sig)

        def prop_mean(x_old, y):
            m_pr = x_old @ Aj.T
            return (m_pr / Q_SCALE + y * Hj / R_SCALE) @ Sigj.T

        def proposal_fn(key, x, y, t):
            eps = jax.random.normal(key, x.shape, x.dtype)
            return prop_mean(x, y) + eps @ chol_sig.T

        def proposal_log_prob(x_new, x_old, y, t):
            diff = x_new - prop_mean(x_old, y)
            z = jax.scipy.linalg.solve_triangular(
                chol_sig, diff.T, lower=True).T
            half_logdet = jnp.sum(jnp.log(jnp.diagonal(chol_sig)))
            return (-0.5 * jnp.sum(z ** 2, -1) - half_logdet
                    - 0.5 * D * jnp.log(2.0 * jnp.pi))

        pf = make_pf(
            n=4000,
            proposal_fn=proposal_fn,
            proposal_log_prob=proposal_log_prob,
            transition_log_prob=transition_log_prob,
        )
        res = pf.run(jax.random.PRNGKey(2), jnp.asarray(YS))
        assert abs(float(res.log_z) - LL_EXACT) < 0.5
        # The informed proposal keeps the cloud healthy: fewer collapses
        # than steps and a higher mean ESS than bootstrap.
        boot = make_pf(n=4000).run(jax.random.PRNGKey(2),
                                   jnp.asarray(YS))
        assert float(jnp.mean(res.ess)) > float(jnp.mean(boot.ess))

    def test_ffbs_smoother_matches_rts(self):
        pf = make_pf(n=4000, transition_log_prob=transition_log_prob)
        res = pf.run(jax.random.PRNGKey(4), jnp.asarray(YS),
                     store_history=True)
        paths = pf.smooth(jax.random.PRNGKey(5), res, n_paths=512)
        assert paths.shape == (512, T, D)
        np.testing.assert_allclose(np.mean(np.asarray(paths), 0), MS_S,
                                   atol=0.15)
        # Per-time marginal sds agree with the RTS smoothing covariances.
        sd = np.std(np.asarray(paths), axis=0)
        sd_exact = np.sqrt(np.diagonal(PS_S, axis1=1, axis2=2))
        np.testing.assert_allclose(sd, sd_exact, rtol=0.35, atol=0.03)

    def test_no_history_on_plain_run(self):
        res = make_pf(n=256).run(jax.random.PRNGKey(0), jnp.asarray(YS))
        assert res.history is None and res.log_w_history is None


class TestConditionalSMC:
    """cSMC + particle Gibbs against exact smoothing/posterior values."""

    def test_csmc_sweeps_target_smoothing_distribution(self):
        """Iterated conditional-SMC trajectories (ancestor sampling, 256
        particles) leave p(x_{0:T-1} | y) invariant: sweep means/sds
        match the exact RTS smoother."""
        pf = make_pf(n=256, transition_log_prob=transition_log_prob)
        pg = zs.ParticleGibbs(lambda theta: pf)

        ref0 = jnp.zeros((T, D), jnp.float64)
        # 200 sweeps (round-5 thin): measured max|mean err| 0.106 vs the
        # 0.15 bound (0.071 at 400 sweeps) — margin intact at half cost.
        run = jax.jit(lambda k: pg.run(
            k, jnp.asarray(YS), {}, ref0, 200,
            collect_fields=("trajectory", "ancestor_moves")))
        _, _, out = run(jax.random.PRNGKey(0))
        trajs = np.asarray(out["trajectory"])[40:]  # [sweeps, T, D]
        np.testing.assert_allclose(trajs.mean(0), MS_S, atol=0.15)
        sd = trajs.std(0)
        sd_exact = np.sqrt(np.diagonal(PS_S, axis1=1, axis2=2))
        np.testing.assert_allclose(sd, sd_exact, rtol=0.4, atol=0.03)
        # Ancestor sampling actually moves the reference's ancestry.
        assert float(np.asarray(out["ancestor_moves"]).mean()) > 0.3 * T

    def test_plain_csmc_runs_and_moves(self):
        pf = make_pf(n=128)
        ref0 = jnp.zeros((T, D), jnp.float64)
        res = pf.conditional_run(jax.random.PRNGKey(1), jnp.asarray(YS),
                                 ref0, ancestor_sampling=False)
        assert res.trajectory.shape == (T, D)
        assert np.isfinite(float(res.log_z))
        assert int(res.ancestor_moves) == 0  # pinned without AS
        res2 = pf.conditional_run(jax.random.PRNGKey(2),
                                  jnp.asarray(YS), res.trajectory,
                                  ancestor_sampling=False)
        assert np.any(np.asarray(res2.trajectory)
                      != np.asarray(res.trajectory))

    def test_particle_gibbs_conjugate_param_posterior(self):
        """Scalar LGSSM with unknown transition coefficient ``a`` and a
        CONJUGATE Gibbs update given the trajectory: the PG posterior
        matches grid quadrature of the exact Kalman likelihood (the same
        ground truth as the PMMH test — the two exact methods must
        agree)."""
        c = TestPMMH
        ys = c._data()
        mean_ex, sd_ex = c._exact_posterior(ys)
        prior_mu, prior_sd, q1 = c.PRIOR_MU, c.PRIOR_SD, c.Q1

        def make_filter(theta):
            a = theta["a"]
            return zs.ParticleFilter(
                init_fn=lambda k, n: jax.random.normal(
                    k, (n,), jnp.float64),
                transition_fn=lambda k, x, t: a * x + jnp.sqrt(q1)
                * jax.random.normal(k, x.shape, x.dtype),
                emission_log_prob=lambda x, y, t:
                    -0.5 * (y[0] - x) ** 2 / c.R1
                    - 0.5 * jnp.log(2 * jnp.pi * c.R1),
                transition_log_prob=lambda xn, xo, t:
                    -0.5 * (xn - a * xo) ** 2 / q1
                    - 0.5 * jnp.log(2 * jnp.pi * q1),
                n_particles=256,
            )

        def update_a(key, theta, traj):
            # a | x_{0:T-1} ~ N: precision/mean from the AR(1) sufficient
            # statistics (conjugate normal regression through origin).
            xp, xn = traj[:-1], traj[1:]
            prec = 1.0 / prior_sd ** 2 + jnp.sum(xp ** 2) / q1
            mean = (prior_mu / prior_sd ** 2
                    + jnp.sum(xp * xn) / q1) / prec
            a_new = mean + jax.random.normal(key, (), traj.dtype) \
                / jnp.sqrt(prec)
            return {"a": a_new}

        pg = zs.ParticleGibbs(make_filter, update_a)
        # 300 sweeps (round-5 thin): measured |mean err| 0.0009 and sd
        # ratio 1.02 vs bounds 0.05 / (0.6, 1.6) — 13s saved vs 600.
        run = jax.jit(lambda k: pg.run(
            k, ys, {"a": jnp.asarray(0.3, jnp.float64)},
            jnp.zeros((c.T1,), jnp.float64), 300,
            collect_fields=("params",)))
        _, _, out = run(jax.random.PRNGKey(3))
        draws = np.asarray(out["params"]["a"])[60:]
        assert abs(draws.mean() - mean_ex) < 0.05
        assert 0.6 * sd_ex < draws.std() < 1.6 * sd_ex

    def test_validation(self):
        pf = make_pf(n=64)  # no transition_log_prob
        ref0 = jnp.zeros((T, D), jnp.float64)
        with pytest.raises(ValueError, match="transition_log_prob"):
            pf.conditional_run(jax.random.PRNGKey(0), jnp.asarray(YS),
                               ref0)
        pg = zs.ParticleGibbs(lambda th: pf, ancestor_sampling=False)
        with pytest.raises(ValueError, match="collect field"):
            pg.run(jax.random.PRNGKey(0), jnp.asarray(YS), {}, ref0, 3,
                   collect_fields=("bogus",))


class TestPMMH:
    """Pseudo-marginal MH on a scalar LGSSM with unknown transition
    coefficient ``a`` — the exact parameter posterior is computable by
    grid quadrature of the Kalman log-likelihood, so the PMMH chain is
    checked against closed form."""

    A_TRUE = 0.8
    Q1 = 0.09
    R1 = 0.16
    T1 = 30
    PRIOR_MU, PRIOR_SD = 0.5, 0.5

    @classmethod
    def _data(cls):
        rng = np.random.default_rng(11)
        x, ys = rng.standard_normal(), []
        for t in range(cls.T1):
            if t > 0:
                x = cls.A_TRUE * x + np.sqrt(cls.Q1) * rng.standard_normal()
            ys.append(x + np.sqrt(cls.R1) * rng.standard_normal())
        return jnp.asarray(np.array(ys)[:, None])

    @classmethod
    def _exact_posterior(cls, ys):
        def ll(a):
            return zs.kalman_filter(
                ys, a.reshape(1, 1), np.array([[cls.Q1]]),
                np.array([[1.0]]), np.array([[cls.R1]]),
                np.zeros(1), np.eye(1),
            ).log_likelihood

        grid = jnp.linspace(-0.2, 1.5, 401)
        log_p = jax.vmap(ll)(grid) - 0.5 * (
            (grid - cls.PRIOR_MU) / cls.PRIOR_SD) ** 2
        w = np.exp(np.asarray(log_p) - np.max(np.asarray(log_p)))
        w /= w.sum()
        g = np.asarray(grid)
        mean = float((w * g).sum())
        sd = float(np.sqrt((w * (g - mean) ** 2).sum()))
        return mean, sd

    @classmethod
    def _make_kernel(cls, ys, n_particles=256, **kw):
        def log_z_fn(theta, key):
            a = theta["a"]
            pf = zs.ParticleFilter(
                init_fn=lambda k, n: jax.random.normal(
                    k, (n, 1), jnp.float64),
                transition_fn=lambda k, x, t: a * x + jnp.sqrt(cls.Q1)
                * jax.random.normal(k, x.shape, x.dtype),
                emission_log_prob=lambda x, y, t: jnp.sum(
                    -0.5 * (y - x) ** 2 / cls.R1
                    - 0.5 * jnp.log(2 * jnp.pi * cls.R1), -1),
                n_particles=n_particles,
            )
            return pf.run(key, ys).log_z

        def log_prior(theta):
            return -0.5 * ((theta["a"] - cls.PRIOR_MU)
                           / cls.PRIOR_SD) ** 2

        return zs.PseudoMarginalMH(log_z_fn, log_prior, **kw)

    def test_posterior_matches_grid_quadrature(self):
        ys = self._data()
        mean_ex, sd_ex = self._exact_posterior(ys)
        kern = self._make_kernel(ys, step_size=0.15)
        state = kern.init(
            {"a": jnp.linspace(0.4, 1.1, 8, dtype=jnp.float64)}
        )
        # 600 iters (round-5 thin): measured |mean err| 0.0038, sd ratio
        # 1.05 — both far inside the bounds (0.0068/1.00 at 1200).
        run = jax.jit(lambda s, k: kern.run(s, k, 600))
        final, out = run(state, jax.random.PRNGKey(0))
        draws = np.asarray(out["samples"]["a"])[150:]  # burn-in off
        assert abs(draws.mean() - mean_ex) < 0.05
        assert 0.5 * sd_ex < draws.std() < 1.8 * sd_ex
        # The chain actually moves, at a sane pseudo-marginal rate.
        acc = float(np.asarray(out["acceptance_rate"]).mean())
        assert 0.05 < acc < 0.9

    def test_deterministic_and_retained_refill(self):
        ys = self._data()
        kern = self._make_kernel(ys, n_particles=64)
        state = kern.init({"a": jnp.full((4,), 0.7, jnp.float64)})
        key = jax.random.PRNGKey(1)
        _, out1 = kern.run(state, key, 20)
        _, out2 = kern.run(state, key, 20)
        np.testing.assert_array_equal(np.asarray(out1["samples"]["a"]),
                                      np.asarray(out2["samples"]["a"]))
        # invalidate_cache marks the retained estimate; sample refills it
        # to a finite value.
        st2, _ = kern.sample(state, key)
        st3 = st2.invalidate_cache()
        assert np.all(np.isnan(np.asarray(st3.log_post)))
        st4, _ = kern.sample(st3, jax.random.PRNGKey(2))
        assert np.all(np.isfinite(np.asarray(st4.log_post)))

    def test_adaptation_moves_step_size(self):
        ys = self._data()
        kern = self._make_kernel(ys, n_particles=64, step_size=2.0,
                                 adapt_step_size=True,
                                 target_acceptance_rate=0.2)
        state = kern.init({"a": jnp.full((4,), 0.7, jnp.float64)})
        final, out = kern.run(state, jax.random.PRNGKey(3), 150,
                              n_adapt=150)
        # A wildly-too-large proposal scale gets pulled down.
        assert float(final.step_size) < 2.0

    def test_validation(self):
        ys = self._data()
        with pytest.raises(ValueError, match="step_size"):
            self._make_kernel(ys, step_size=0.0)
        kern = self._make_kernel(ys, n_particles=64)
        state = kern.init({"a": jnp.full((2,), 0.7, jnp.float64)})
        with pytest.raises(ValueError, match="collect field"):
            kern.run(state, jax.random.PRNGKey(0), 5,
                     collect_fields=("samples", "bogus"))


class TestValidation:
    def test_proposal_requires_density(self):
        with pytest.raises(ValueError, match="proposal_log_prob"):
            make_pf(proposal_fn=lambda k, x, y, t: x)

    def test_guided_requires_transition_density(self):
        with pytest.raises(ValueError, match="transition_log_prob"):
            make_pf(proposal_fn=lambda k, x, y, t: x,
                    proposal_log_prob=lambda xn, xo, y, t: xn[..., 0])

    def test_smooth_needs_history_and_density(self):
        pf = make_pf(n=64, transition_log_prob=transition_log_prob)
        res = pf.run(jax.random.PRNGKey(0), jnp.asarray(YS))
        with pytest.raises(ValueError, match="store_history"):
            pf.smooth(jax.random.PRNGKey(1), res, 4)
        pf2 = make_pf(n=64)
        res2 = pf2.run(jax.random.PRNGKey(0), jnp.asarray(YS),
                       store_history=True)
        with pytest.raises(ValueError, match="transition_log_prob"):
            pf2.smooth(jax.random.PRNGKey(1), res2, 4)

    def test_emission_shape_contract(self):
        pf = zs.ParticleFilter(
            init_fn, transition_fn,
            lambda x, y, t: jnp.zeros(()),  # wrong: scalar, not [n]
            n_particles=64,
        )
        with pytest.raises(ValueError, match="n_particles"):
            pf.run(jax.random.PRNGKey(0), jnp.asarray(YS))

    def test_threshold_and_size_validation(self):
        with pytest.raises(ValueError, match="n_particles"):
            make_pf(n=1)
        with pytest.raises(ValueError, match="resample_threshold"):
            make_pf(resample_threshold=1.5)


class TestHMM:
    """Discrete-state HMM algorithms vs brute-force path enumeration
    (K=3, T=6: 729 paths — an independent exact ground truth, not a
    second copy of the forward recursion)."""

    K, T6 = 3, 6

    @classmethod
    def _model(cls):
        rng = np.random.default_rng(7)
        pi0 = rng.dirichlet(np.ones(cls.K))
        trans = rng.dirichlet(np.ones(cls.K), size=cls.K)
        log_obs = rng.normal(size=(cls.T6, cls.K))
        return np.log(pi0), np.log(trans), log_obs

    @classmethod
    def _enumerate(cls, log_pi0, log_trans, log_obs, upto=None):
        """Joint log p(x_{0:t}, y_{0:t}) for every path, by enumeration."""
        import itertools
        T = cls.T6 if upto is None else upto
        paths = list(itertools.product(range(cls.K), repeat=T))
        joints = []
        for p in paths:
            lp = log_pi0[p[0]] + log_obs[0, p[0]]
            for t in range(1, T):
                lp += log_trans[p[t - 1], p[t]] + log_obs[t, p[t]]
            joints.append(lp)
        return np.array(paths), np.array(joints)

    def test_filter_and_log_z_vs_enumeration(self):
        log_pi0, log_trans, log_obs = self._model()
        log_alpha, log_z = zs.hmm_filter(log_pi0, log_trans, log_obs)
        _, joints = self._enumerate(log_pi0, log_trans, log_obs)
        from scipy.special import logsumexp
        np.testing.assert_allclose(float(log_z), logsumexp(joints),
                                   rtol=1e-10)
        # Filtering marginal at each t from partial-path enumeration.
        for t in range(self.T6):
            paths, j = self._enumerate(log_pi0, log_trans, log_obs,
                                       upto=t + 1)
            w = np.exp(j - logsumexp(j))
            marg = np.array([w[paths[:, t] == k].sum()
                             for k in range(self.K)])
            np.testing.assert_allclose(np.exp(np.asarray(log_alpha[t])),
                                       marg, atol=1e-10)

    def test_smoother_vs_enumeration(self):
        log_pi0, log_trans, log_obs = self._model()
        log_gamma, log_z = zs.hmm_smoother(log_pi0, log_trans, log_obs)
        paths, joints = self._enumerate(log_pi0, log_trans, log_obs)
        from scipy.special import logsumexp
        w = np.exp(joints - logsumexp(joints))
        for t in range(self.T6):
            marg = np.array([w[paths[:, t] == k].sum()
                             for k in range(self.K)])
            np.testing.assert_allclose(np.exp(np.asarray(log_gamma[t])),
                                       marg, atol=1e-10)

    def test_viterbi_vs_enumeration(self):
        log_pi0, log_trans, log_obs = self._model()
        path, score = zs.hmm_viterbi(log_pi0, log_trans, log_obs)
        paths, joints = self._enumerate(log_pi0, log_trans, log_obs)
        best = paths[np.argmax(joints)]
        np.testing.assert_array_equal(np.asarray(path), best)
        np.testing.assert_allclose(float(score), joints.max(), rtol=1e-12)

    def test_posterior_sample_frequencies(self):
        log_pi0, log_trans, log_obs = self._model()
        log_gamma, _ = zs.hmm_smoother(log_pi0, log_trans, log_obs)
        samples = zs.hmm_posterior_sample(
            jax.random.PRNGKey(0), log_pi0, log_trans, log_obs, 8000)
        assert samples.shape == (8000, self.T6)
        freq = np.stack([(np.asarray(samples) == k).mean(0)
                         for k in range(self.K)], axis=1)
        np.testing.assert_allclose(freq, np.exp(np.asarray(log_gamma)),
                                   atol=0.02)

    def test_jit_and_large_k_smoke(self):
        rng = np.random.default_rng(1)
        K, T = 64, 50
        log_pi0 = np.log(rng.dirichlet(np.ones(K)))
        log_trans = np.log(rng.dirichlet(np.ones(K), size=K))
        log_obs = rng.normal(size=(T, K))
        f = jax.jit(zs.hmm_filter)
        log_alpha, log_z = f(log_pi0, log_trans, log_obs)
        assert np.isfinite(float(log_z))
        # Normalized filtering rows.
        np.testing.assert_allclose(
            np.exp(np.asarray(log_alpha)).sum(1), np.ones(T), atol=1e-8)
        path, _ = zs.hmm_viterbi(log_pi0, log_trans, log_obs)
        assert path.shape == (T,) and 0 <= int(path.min())

    def test_shape_validation(self):
        log_pi0, log_trans, log_obs = self._model()
        with pytest.raises(ValueError, match="log_trans"):
            zs.hmm_filter(log_pi0, log_trans[:2], log_obs)
        with pytest.raises(ValueError, match="log_obs"):
            zs.hmm_filter(log_pi0, log_trans, log_obs[:, :2])


class TestParallelScans:
    """parallel=True (log-depth associative scans) must reproduce the
    sequential recursions to float tolerance — filter, smoother, HMM,
    gradients, and edge lengths."""

    # Round-5 thin: the parallel==sequential property is length-
    # independent (edge lengths 1-3 covered below), and associative-scan
    # compile time grows superlinearly in T on this 1-vCPU box (T=50
    # compile 15.4s vs T=12 2.0s measured) — so the equality checks run
    # on a 12-step slice against the sequential recursion directly.
    def test_parallel_kalman_filter_matches_sequential(self):
        seq = zs.kalman_filter(YS[:12], A, Q, H, R, M0, P0)
        res = zs.kalman_filter(YS[:12], A, Q, H, R, M0, P0, parallel=True)
        np.testing.assert_allclose(res.means, seq.means,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(res.covs, seq.covs,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(float(res.log_likelihood),
                                   float(seq.log_likelihood), rtol=1e-8)

    def test_parallel_kalman_smoother_matches_sequential(self):
        seq = zs.kalman_smoother(YS[:12], A, Q, H, R, M0, P0)
        res = zs.kalman_smoother(YS[:12], A, Q, H, R, M0, P0,
                                 parallel=True)
        np.testing.assert_allclose(res.means, seq.means,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(res.covs, seq.covs,
                                   rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("t_len", [1, 2, 3])
    def test_parallel_kalman_short_series(self, t_len):
        for fn in (zs.kalman_filter, zs.kalman_smoother):
            seq = fn(YS[:t_len], A, Q, H, R, M0, P0)
            par = fn(YS[:t_len], A, Q, H, R, M0, P0, parallel=True)
            np.testing.assert_allclose(par.means, seq.means, atol=1e-10)
            np.testing.assert_allclose(par.covs, seq.covs, atol=1e-10)
            np.testing.assert_allclose(float(par.log_likelihood),
                                       float(seq.log_likelihood),
                                       rtol=1e-10)

    def test_parallel_kalman_gradients_match(self):
        """d log_z / d(A, Q_scale) identical through both code paths —
        the parallel filter is usable for ML parameter estimation."""
        ys = jnp.asarray(YS[:8])  # round-5 thin: grad-of-assoc-scan
        # compile is 20s at T=20 vs 9s at T=8; property is T-independent.

        def ll(a_mat, q_scale, parallel):
            return zs.kalman_filter(
                ys, a_mat, q_scale * jnp.eye(2), H, R, M0, P0,
                parallel=parallel).log_likelihood

        ga_s, gq_s = jax.grad(ll, argnums=(0, 1))(
            jnp.asarray(A), jnp.asarray(Q_SCALE), False)
        ga_p, gq_p = jax.grad(ll, argnums=(0, 1))(
            jnp.asarray(A), jnp.asarray(Q_SCALE), True)
        np.testing.assert_allclose(ga_p, ga_s, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(float(gq_p), float(gq_s), rtol=1e-7)

    def test_parallel_hmm_filter_smoother_match_sequential(self):
        rng = np.random.default_rng(3)
        K, T_len = 5, 16  # round-5 thin; property is T-independent
        log_pi0 = np.log(rng.dirichlet(np.ones(K)))
        log_trans = np.log(rng.dirichlet(np.ones(K), size=K))
        log_obs = rng.normal(size=(T_len, K))
        la_s, lz_s = zs.hmm_filter(log_pi0, log_trans, log_obs)
        la_p, lz_p = zs.hmm_filter(log_pi0, log_trans, log_obs,
                                   parallel=True)
        np.testing.assert_allclose(la_p, la_s, atol=1e-10)
        np.testing.assert_allclose(float(lz_p), float(lz_s), rtol=1e-12)
        lg_s, _ = zs.hmm_smoother(log_pi0, log_trans, log_obs)
        lg_p, _ = zs.hmm_smoother(log_pi0, log_trans, log_obs,
                                  parallel=True)
        np.testing.assert_allclose(lg_p, lg_s, atol=1e-10)

    def test_parallel_hmm_impossible_states_no_nan(self):
        """-inf entries (structural zeros) must not produce NaNs in the
        max-shifted log-matmul."""
        K = 3
        with np.errstate(divide="ignore"):
            log_pi0 = np.log(np.array([0.5, 0.5, 0.0]))
            trans = np.array([[0.9, 0.1, 0.0],
                              [0.0, 0.9, 0.1],
                              [0.1, 0.0, 0.9]])
            log_trans = np.log(trans)
        rng = np.random.default_rng(0)
        log_obs = rng.normal(size=(12, K))
        la_s, lz_s = zs.hmm_filter(log_pi0, log_trans, log_obs)
        la_p, lz_p = zs.hmm_filter(log_pi0, log_trans, log_obs,
                                   parallel=True)
        assert np.all(np.isfinite(np.asarray(lz_p)))
        np.testing.assert_allclose(float(lz_p), float(lz_s), rtol=1e-10)
        mask = np.isfinite(np.asarray(la_s))
        np.testing.assert_allclose(np.asarray(la_p)[mask],
                                   np.asarray(la_s)[mask], atol=1e-10)

    @pytest.mark.parametrize("t_len", [1, 2])
    def test_parallel_hmm_short_series(self, t_len):
        rng = np.random.default_rng(5)
        K = 3
        log_pi0 = np.log(rng.dirichlet(np.ones(K)))
        log_trans = np.log(rng.dirichlet(np.ones(K), size=K))
        log_obs = rng.normal(size=(t_len, K))
        for fn in (zs.hmm_filter, zs.hmm_smoother):
            a_s, z_s = fn(log_pi0, log_trans, log_obs)
            a_p, z_p = fn(log_pi0, log_trans, log_obs, parallel=True)
            np.testing.assert_allclose(a_p, a_s, atol=1e-12)
            np.testing.assert_allclose(float(z_p), float(z_s), rtol=1e-12)

    def test_parallel_jit_static_flag(self):
        f = jax.jit(zs.kalman_filter, static_argnames=("parallel",))
        res = f(YS, A, Q, H, R, M0, P0, parallel=True)
        np.testing.assert_allclose(res.means, MS_F, rtol=1e-8, atol=1e-10)


class TestBaumWelch:
    def test_pairwise_marginals_vs_enumeration(self):
        log_pi0, log_trans, log_obs = TestHMM._model()
        stats = zs.hmm_expected_stats(log_pi0, log_trans, log_obs)
        paths, joints = TestHMM._enumerate(log_pi0, log_trans, log_obs)
        from scipy.special import logsumexp
        w = np.exp(joints - logsumexp(joints))
        K, T6 = TestHMM.K, TestHMM.T6
        for t in range(T6 - 1):
            pair = np.zeros((K, K))
            for i in range(K):
                for j in range(K):
                    pair[i, j] = w[(paths[:, t] == i)
                                   & (paths[:, t + 1] == j)].sum()
            np.testing.assert_allclose(
                np.exp(np.asarray(stats.log_xi[t])), pair, atol=1e-10)
        # gamma must match the smoother's.
        lg, _ = zs.hmm_smoother(log_pi0, log_trans, log_obs)
        np.testing.assert_allclose(stats.log_gamma, lg, atol=1e-12)

    def test_parallel_stats_match(self):
        log_pi0, log_trans, log_obs = TestHMM._model()
        s = zs.hmm_expected_stats(log_pi0, log_trans, log_obs)
        p = zs.hmm_expected_stats(log_pi0, log_trans, log_obs,
                                  parallel=True)
        np.testing.assert_allclose(p.log_xi, s.log_xi, atol=1e-10)
        np.testing.assert_allclose(p.log_gamma, s.log_gamma, atol=1e-10)

    def test_baum_welch_em_monotone_and_recovers(self):
        """Full EM (chain params via hmm_mstep + Gaussian emissions via
        gamma-weighted MLE): monotone log-likelihood, recovers the
        sticky transition structure."""
        rng = np.random.default_rng(11)
        K, T_len = 2, 2000
        true_trans = np.array([[0.95, 0.05], [0.10, 0.90]])
        true_means = np.array([-1.5, 1.5])
        states = [0]
        for _ in range(T_len - 1):
            states.append(rng.choice(K, p=true_trans[states[-1]]))
        states = np.array(states)
        ys = rng.normal(true_means[states], 1.0)

        def emission_table(means):
            return -0.5 * (ys[:, None] - means[None, :]) ** 2 \
                - 0.5 * np.log(2 * np.pi)

        log_pi0 = np.log(np.ones(K) / K)
        log_trans = np.log(np.full((K, K), 1.0 / K))
        means = np.array([-0.1, 0.1])
        lls = []
        for _ in range(30):
            stats = zs.hmm_expected_stats(log_pi0, log_trans,
                                          emission_table(means))
            lls.append(float(stats.log_z))
            log_pi0, log_trans = zs.hmm_mstep(stats)
            gamma = np.exp(np.asarray(stats.log_gamma))  # [T, K]
            means = (gamma * ys[:, None]).sum(0) / gamma.sum(0)
        lls = np.array(lls)
        assert np.all(np.diff(lls) > -1e-8), "EM log-lik must be monotone"
        order = np.argsort(means)
        np.testing.assert_allclose(means[order], true_means, atol=0.15)
        trans = np.exp(np.asarray(log_trans))[order][:, order]
        np.testing.assert_allclose(trans, true_trans, atol=0.05)

    def test_requires_two_steps(self):
        log_pi0, log_trans, log_obs = TestHMM._model()
        with pytest.raises(ValueError, match="T >= 2"):
            zs.hmm_expected_stats(log_pi0, log_trans, log_obs[:1])
