"""North-star benchmark: HMC effective samples per second on a 100-dim
Gaussian (BASELINE.md / BASELINE.json).

TPU phase: fully on-device HMC (adaptive step size + diagonal mass, 5
leapfrogs — ESS/sec-optimal for this target, PERF.md) with 32768
vectorized chains, the fully fused Pallas transition (momentum draw via
the hardware PRNG + trajectory + MH select in one VMEM-resident kernel —
since round 3 this is the DEFAULT path via ``experimental_fused_step=
"auto"``), and a bfloat16 samples-only trajectory recording (the chain
advances in f32; only the stacked diagnostic copy is bf16). The timed
phase runs THREE trials with distinct PRNG keys (axon timings drift and
identical-input replays can look memoized — CLAUDE.md); the headline is
the median per-trial ESS/sec, all trials reported.

``vs_baseline`` divides by the MEASURED real reference: TF1 ZhuSuan run
via tf.compat.v1 on this host's CPU with the reference's own
sess.run-per-iteration loop on the identical target
(baseline_ref/measure_hmc_ref.py; recorded in baseline_ref/ref_hmc.json).
Fallbacks, in order, if that record is absent: the JAX host-loop proxy
measured here (reference execution pattern, SURVEY.md §3.3).

Also emitted:
- ``ess_bias_check``: f32-vs-bf16-collect A/B at 8192 chains with
  identical keys — bounds the bf16 quantization bias on measured ESS
  (bf16 noise is uncorrelated across draws and can only inflate ESS).
- ``selfcheck``: on-TPU pass/fail for the TPU-only code paths — fused-step
  vs scan statistical equivalence at small scale + hardware-PRNG moment
  checks (the content the CPU suite must skip).
- ``scan_path_ess_per_sec``: the non-fused lax.scan path at the same
  chain count, so the fused-vs-scan gap stays visible round over round.
- ``mixing_bench``: SECOND headline (round 4) — ESS/sec on a rho=0.95
  equicorrelated 100-dim Gaussian where the estimator is genuinely
  mixing-sensitive, for fixed-L HMC vs ChEES vs dense-preconditioned HMC.
- ``nuts_bench``: NUTS fused whole-tree Pallas kernel vs the vmapped
  while-loop scan path at 4096 chains (chain-iters/sec + statistical
  selfcheck; round 4).
- ``configs_matrix``: the BASELINE.json acceptance-config perf matrix
  (toy2d/bnn_sgvb/bnn_sghmc/sbn_vimco/svgp), reference-vs-ours steps/sec
  from the recorded baseline_ref/{ref,ours}_configs.json artifacts.

Prints TWO JSON lines — the full record (headline keys + ``detail``)
first, then a compact tail-safe headline as the FINAL line:
{"metric": ..., "value": N, "unit": "eff_samples/sec", "vs_baseline": N,
 "selfcheck_pass": true}
(The driver records a bounded tail of stdout; round 4's single-line
emission lost its own headline when the detail blob outgrew the window.)
"""

import json
import os
import sys
import time

import numpy as np


DIM = 100
N_ITERS = 500
N_ADAPT = 200
HOSTLOOP_CHAINS = 1000  # reference toy config #1 scale (gaussian.py:33)
V5E_HBM_PEAK_GBPS = 819.0
N_TRIALS = 3
REF_HMC_JSON = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "baseline_ref",
    "ref_hmc.json",
)


def build(jax, jnp, zs, n_chains, dtype, fused, collect_kw):
    target_std = jnp.asarray(np.linspace(0.1, 1.0, DIM).astype(dtype))

    def log_joint(obs):
        x = obs["x"]
        return jnp.sum(-0.5 * (x / target_std) ** 2, -1)

    hmc = zs.HMC(
        step_size=0.1,
        n_leapfrogs=5,
        adapt_step_size=True,
        adapt_mass=True,
        mass_collect_iters=50,
        experimental_fused_step=fused,
    )
    state = hmc.init(
        {"x": jnp.zeros((n_chains, DIM), dtype)}, log_joint=log_joint
    )
    burn = jax.jit(
        lambda s, k: hmc.run(
            log_joint, {}, s, k, N_ADAPT, n_adapt=N_ADAPT, collect=False
        )
    )
    sample = jax.jit(
        lambda s, k: hmc.run(
            log_joint, {}, s, k, N_ITERS, n_adapt=0, **collect_kw
        )
    )
    return state, burn, sample, hmc, log_joint


def total_ess(jax, samples_f32, dt):
    """Reference-exact per-chain ESS (min over dims, summed over chains),
    chunked on-device."""
    from zhusuan_tpu.diagnostics import ess_batch_device

    T, C, D = samples_f32.shape
    ess = ess_batch_device(samples_f32.reshape(T, C * D)).reshape(C, D)
    return float(np.minimum.reduce(ess, axis=1).sum()) / dt


def measure_tpu(jax, jnp, zs, device, n_chains, fused=True):
    """Timed phase, N_TRIALS trials with distinct keys; returns
    (per-trial eps list, per-trial dt list, gbps of best trial)."""
    with jax.default_device(device):
        state, burn, sample, _, _ = build(
            jax, jnp, zs, n_chains, np.float32, fused=fused,
            collect_kw=dict(
                collect_fields=("samples",), collect_dtype=jnp.bfloat16
            ),
        )
        key = jax.random.PRNGKey(0)
        state, _ = burn(state, key)
        jax.block_until_ready(state.q["x"])
        out_w = sample(state, jax.random.PRNGKey(1))  # compile
        jax.block_until_ready(out_w[0].q["x"])
        del out_w

        eps_trials, dt_trials = [], []
        for trial in range(N_TRIALS):
            t0 = time.perf_counter()
            final, out = sample(state, jax.random.PRNGKey(2 + trial))
            jax.block_until_ready(out["samples"]["x"])
            dt = time.perf_counter() - t0
            # bf16 trajectory goes straight to the chunked device ESS (it
            # upcasts per chunk; a full f32 copy would not fit at 32768
            # chains).
            eps_trials.append(total_ess(jax, out["samples"]["x"], dt))
            dt_trials.append(dt)
            del out
    # Bytes model of one fused-step iteration (S = chain-state bytes):
    # the kernel reads q, writes accepted q + init momentum, and emits
    # five per-chain vectors (~0); the bf16 collect writes 0.5S. The
    # iteration is VPU-bound (Box-Muller + 6 in-VMEM grad evals), not
    # HBM-bound — the GB/s figure documents that HBM is no longer the
    # constraint (see PERF.md round-2 notes).
    S = n_chains * DIM * 4
    bytes_per_iter = 3.5 * S
    gbps = bytes_per_iter * N_ITERS / min(dt_trials) / 1e9
    return eps_trials, dt_trials, gbps


def measure_ess_bias(jax, jnp, zs, device, n_chains=8192):
    """f32 vs bf16 trajectory recording, SAME keys: the ESS ratio bounds
    the bf16-quantization inflation of the headline (VERDICT r2 weak 1).

    Measured on a deliberately AUTOCORRELATED chain (1 leapfrog, small
    step): the headline's own near-iid chains saturate the
    reference-exact estimator at its cutoff-1 fixed point ESS = n/(3 -
    2/(n-1)) — a data-INDEPENDENT value (the recurrence includes the
    lag-0 term, so rho_0 = 1 - 1/(n-1) regardless of the samples; the
    reference's iid test expecting ~n/3, tests/test_diagnostics.py:22,
    pins the same semantics). Quantization noise therefore cannot move
    the headline at all; this check quantifies the bias in the regime
    where the estimator IS data-dependent (cutoff > 1)."""
    from zhusuan_tpu.diagnostics import ess_batch_device

    target_std = jnp.asarray(np.linspace(0.1, 1.0, DIM), jnp.float32)

    def log_joint(obs):
        return jnp.sum(-0.5 * (obs["x"] / target_std) ** 2, -1)

    hmc = zs.HMC(step_size=0.05, n_leapfrogs=1,
                 experimental_fused_step=True)
    out = {}
    with jax.default_device(device):
        for label, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
            state = hmc.init(
                {"x": jnp.zeros((n_chains, DIM), jnp.float32)},
                log_joint=log_joint,
            )
            kw = {"collect_dtype": dtype} if dtype else {}
            run = jax.jit(
                lambda s, k: hmc.run(
                    log_joint, {}, s, k, N_ITERS,
                    collect_fields=("samples",), **kw
                )
            )
            state, _ = run(state, jax.random.PRNGKey(0))  # warm the chain
            _, o = run(state, jax.random.PRNGKey(100))
            traj = o["samples"]["x"]
            T, C, D = traj.shape
            ess = ess_batch_device(traj.reshape(T, C * D)).reshape(C, D)
            out[label] = float(np.minimum.reduce(ess, axis=1).sum())
            del o, traj
    out["bf16_over_f32"] = round(out["bf16"] / out["f32"], 5)
    out["f32"] = round(out["f32"], 1)
    out["bf16"] = round(out["bf16"], 1)
    out["note"] = (
        "autocorrelated 1-leapfrog chain (cutoff > 1); the headline's "
        "near-iid chains sit at the estimator's data-independent "
        "cutoff-1 fixed point (= n iters / ~3 per chain-dim), where "
        "collect dtype provably cannot bias ESS"
    )
    return out


def run_selfcheck(jax, jnp, zs, device):
    """On-TPU self-check of TPU-only code paths (VERDICT r2 missing 5):
    (a) hardware-PRNG moment checks, (b) fused-step vs scan statistical
    equivalence at small scale. Returns dict of pass/fail + stats."""
    res = {}
    with jax.default_device(device):
        # (a) hardware PRNG moments (content of tests/test_ops_random.py,
        # which the CPU suite must skip).
        try:
            from zhusuan_tpu.ops.random import tpu_normal, tpu_uniform

            n = jax.jit(
                lambda k: tpu_normal(k, (1024, 1024))
            )(jax.random.PRNGKey(7))
            u = jax.jit(
                lambda k: tpu_uniform(k, (1024, 1024))
            )(jax.random.PRNGKey(8))
            n = np.asarray(n)
            u = np.asarray(u)
            prng_ok = (
                abs(float(n.mean())) < 0.005
                and abs(float(n.std()) - 1.0) < 0.005
                and abs(float(u.mean()) - 0.5) < 0.002
                and float(u.min()) >= 0.0
                and float(u.max()) < 1.0
            )
            res["hw_prng"] = {
                "pass": bool(prng_ok),
                "normal_mean": round(float(n.mean()), 5),
                "normal_std": round(float(n.std()), 5),
                "uniform_mean": round(float(u.mean()), 5),
            }
        except Exception as e:
            res["hw_prng"] = {"pass": False, "error": str(e)[:120]}

        # (b) fused kernel vs scan path: same target, same #draws; the
        # pooled moments must agree with each other and the truth.
        try:
            target_std = np.linspace(0.1, 1.0, DIM).astype(np.float32)
            moments = {}
            for label, fused in (("fused", True), ("scan", False)):
                state, burn, sample, _, _ = build(
                    jax, jnp, zs, 1024, np.float32, fused=fused,
                    collect_kw=dict(collect_fields=("samples",)),
                )
                state, _ = burn(state, jax.random.PRNGKey(3))
                _, o = sample(state, jax.random.PRNGKey(4))
                x = np.asarray(
                    o["samples"]["x"][::5], np.float64
                ).reshape(-1, DIM)
                moments[label] = (x.mean(0), x.std(0))
                del o
            mean_gap = float(
                np.max(np.abs(moments["fused"][0] - moments["scan"][0])
                       / target_std))
            std_ratio = float(
                np.max(np.abs(moments["fused"][1] / moments["scan"][1]
                              - 1.0)))
            truth_gap = float(
                np.max(np.abs(moments["fused"][1] / target_std - 1.0)))
            ok = mean_gap < 0.1 and std_ratio < 0.1 and truth_gap < 0.1
            res["fused_vs_scan"] = {
                "pass": bool(ok),
                "max_mean_gap_sigma": round(mean_gap, 4),
                "max_std_ratio_err": round(std_ratio, 4),
                "max_std_vs_truth_err": round(truth_gap, 4),
            }
        except Exception as e:
            res["fused_vs_scan"] = {"pass": False, "error": str(e)[:120]}
    res["pass"] = all(
        v.get("pass", False) for v in res.values() if isinstance(v, dict)
    )
    return res


def measure_mixing(jax, jnp, zs, device, n_chains=4096, dim=100,
                   rho=0.95, n_iters=300, n_adapt=300):
    """Mixing-sensitive benchmark (VERDICT r3 item 2): a strongly
    equicorrelated Gaussian (rho=0.95, unit variances; top eigen-std
    ~9.7 vs ~0.22 for the other 99 directions) where the reference-exact
    ESS estimator is genuinely data-DEPENDENT (autocorrelated chains,
    cutoff > 1) — unlike the headline target whose adapted chains are
    near-iid. Reports ESS/sec for (a) fixed-L HMC (adaptive step + diag
    mass — diag mass cannot help here: all marginal variances equal),
    (b) ChEES-HMC (adaptive trajectory length), (c) dense-preconditioned
    HMC (pilot -> fit_dense_preconditioner -> whiten, the
    tests/test_precondition.py pipeline). ESS moves when mixing does.
    """
    from zhusuan_tpu.diagnostics import ess_batch_device
    from zhusuan_tpu.mcmc import fit_dense_preconditioner, whiten_log_joint

    # Equicorrelated precision has a closed form:
    #   inv(rho*11^T + (1-rho)*I) = a*I - b*11^T,
    #   a = 1/(1-rho), b = rho / ((1-rho) * (1 + (dim-1)*rho)).
    # The earlier `z @ prec` matmul formulation ran at the TPU's DEFAULT
    # f32 matmul precision (bf16 MXU passes), injecting up to ~35 nats of
    # noise into every log-density (measured round 5) — an
    # eps-independent MH energy-error floor that collapsed every
    # sampler's dual-averaged step size toward 0 and made rounds 3-4 of
    # this sub-bench measure noise, not mixing. The analytic form is
    # exact elementwise f32 (max err ~2e-3 nats vs f64).
    a_c = float(1.0 / (1.0 - rho))
    b_c = float(rho / ((1.0 - rho) * (1.0 + (dim - 1) * rho)))

    def log_joint(obs):
        z = obs["z"]
        return -0.5 * (a_c * jnp.sum(z * z, -1)
                       - b_c * jnp.sum(z, -1) ** 2)

    # std of sum(z) under the target — normalizes the slow projection.
    slow_sd = float(np.sqrt(dim * (1.0 + (dim - 1) * rho)))

    def ess_measures(traj, dt):
        """(min-coordinate ESS, slow-projection ESS) totals + rates.

        Per-coordinate min-ESS alone is PROJECTION-BLIND here: every
        coordinate is 95% slow-eigendirection + 5% fast, so a frozen
        slow direction still scores ~0.026 ESS/draw of fast-direction
        wiggle per coordinate. The slow-projection ESS (of sum(z)) is
        the actual mixing bottleneck (PERF.md round 5)."""
        traj = jnp.asarray(traj, jnp.float32)
        T, C, D = traj.shape
        ess = ess_batch_device(traj.reshape(T, C * D)).reshape(C, D)
        coord = float(np.minimum.reduce(np.asarray(ess), axis=1).sum())
        s = jnp.sum(traj, axis=-1) / slow_sd  # [T, C]
        ess_s = float(np.asarray(ess_batch_device(s)).sum())
        return coord, ess_s

    last_traj = [None]

    def timed_trials(samp, st, key_base, postmap=None):
        """N_TRIALS timed sampling runs with distinct keys (identical
        inputs can replay memoized through the tunnel — CLAUDE.md);
        median-by-slow-projection trial reported, all trials recorded."""
        o = samp(st, jax.random.PRNGKey(key_base))  # compile
        jax.block_until_ready(o[1]["samples"]["z"])
        del o
        eps_l, ess_l, dt_l = [], [], []
        for trial in range(N_TRIALS):
            t0 = time.perf_counter()
            _, o = samp(st, jax.random.PRNGKey(key_base + 1 + trial))
            jax.block_until_ready(o["samples"]["z"])
            dt = time.perf_counter() - t0
            traj = o["samples"]["z"]
            if postmap is not None:
                traj = postmap(traj)
            coord, ess_s = ess_measures(traj, dt)
            eps_l.append(ess_s / dt)
            ess_l.append((coord, ess_s))
            dt_l.append(dt)
            last_traj[0] = traj
            del o
        mid = int(np.argsort(eps_l)[len(eps_l) // 2])
        return {"total_min_ess": round(ess_l[mid][0], 1),
                "ess_per_sec": round(ess_l[mid][0] / dt_l[mid], 1),
                "slow_proj_ess": round(ess_l[mid][1], 1),
                "slow_proj_ess_per_sec": round(eps_l[mid], 1),
                "sample_sec": round(dt_l[mid], 3),
                "trials_slow_proj_ess_per_sec": [
                    round(e, 1) for e in eps_l]}

    out = {"target": "equicorrelated Gaussian rho={} dim={}".format(
        rho, dim), "n_chains": n_chains, "n_iters": n_iters}
    with jax.default_device(device):
        # -- (a) fixed-L HMC, the headline sampler's configuration ------ #
        hmc = zs.HMC(step_size=0.1, n_leapfrogs=5, adapt_step_size=True,
                     adapt_mass=True, mass_collect_iters=50)
        st = hmc.init({"z": jnp.zeros((n_chains, dim))},
                      log_joint=log_joint)
        burn = jax.jit(lambda s, k: hmc.run(
            log_joint, {}, s, k, n_adapt, n_adapt=n_adapt, collect=False))
        samp = jax.jit(lambda s, k: hmc.run(
            log_joint, {}, s, k, n_iters, n_adapt=0,
            collect_fields=("samples",)))
        st, _ = burn(st, jax.random.PRNGKey(11))
        jax.block_until_ready(st.q["z"])
        out["hmc_fixed_L"] = timed_trials(samp, st, 12)
        pilot_traj = last_traj[0]  # reused for the preconditioner

        # -- (b) ChEES-HMC: cross-chain adaptive trajectory length ------ #
        ch = zs.ChEESHMC(step_size=0.05, trajectory_length=1.0)
        cst = ch.init({"z": jnp.zeros((n_chains, dim))})
        cburn = jax.jit(lambda s, k: ch.run(
            log_joint, {}, s, k, n_adapt, n_adapt=n_adapt, collect=False))
        csamp = jax.jit(lambda s, k: ch.run(
            log_joint, {}, s, k, n_iters, n_adapt=0))
        cst, _ = cburn(cst, jax.random.PRNGKey(21))
        jax.block_until_ready(cst.q["z"])
        out["chees"] = timed_trials(csamp, cst, 22)

        # -- (c) dense-preconditioned HMC: pilot-whitened space --------- #
        # Fit L from the fixed-L pilot (pooled across chains+time), run
        # HMC on the whitened joint, and compute ESS on the ORIGINAL
        # coordinates (from_w mapped trajectory). The fit is jitted ONCE
        # and timed separately from trace/compile (VERDICT r4 item 6:
        # the un-jitted 11s figure was trace overhead, not the O(n d^2)
        # math), and an amortized ESS/sec at a stated draw budget is
        # reported so the pilot cost is priced honestly.
        pilot = jnp.asarray(pilot_traj[::4]).reshape(-1, dim)
        fit = jax.jit(fit_dense_preconditioner)
        chol = jax.block_until_ready(fit(pilot))  # compile
        t_fit0 = time.perf_counter()
        chol = jax.block_until_ready(fit(pilot))
        fit_sec = time.perf_counter() - t_fit0
        wlj, to_w, from_w = whiten_log_joint(log_joint, "z", chol)

        phmc = zs.HMC(step_size=0.5, n_leapfrogs=5, adapt_step_size=True)
        pst = phmc.init({"z": to_w(st.q["z"])}, log_joint=wlj)
        pburn = jax.jit(lambda s, k: phmc.run(
            wlj, {}, s, k, n_adapt, n_adapt=n_adapt, collect=False))
        psamp = jax.jit(lambda s, k: phmc.run(
            wlj, {}, s, k, n_iters, n_adapt=0,
            collect_fields=("samples",)))
        pst, _ = pburn(pst, jax.random.PRNGKey(31))
        jax.block_until_ready(pst.q["z"])
        pc = timed_trials(psamp, pst, 32, postmap=from_w)
        pc["pilot_fit_math_sec"] = round(fit_sec, 4)
        pc["pilot"] = "fixed-L trajectory (already measured above)"
        # Amortized rate at a stated budget (ESS is ~linear in draws for
        # a stationary chain): budget = fit math + 3000/n_iters sample
        # phases; the pilot's own sampling time is already counted in
        # hmc_fixed_L above (it is a measurement both variants share).
        budget_iters = 3000
        scale = budget_iters / float(n_iters)
        pc["ess_per_sec_amortized_3k_iters"] = round(
            pc["total_min_ess"] * scale
            / (fit_sec + pc["sample_sec"] * scale), 1)
        out["hmc_dense_precond"] = pc
    return out


def measure_nuts(jax, jnp, zs, device, n_chains=4096, n_iters=200,
                 n_adapt=200):
    """NUTS throughput + fused-kernel selfcheck (VERDICT r3 item 3): the
    bench geometry at 4096 chains, max_tree_depth=6, adapted step size.
    Reports chain-iters/sec for the fused whole-tree Pallas kernel
    (ops/nuts_step.py, the TPU default) and the vmapped while-loop scan
    path, plus a statistical-equivalence check between them (both must
    recover the target scales within 10%; hardware-PRNG stream differs
    by design)."""
    target_std = jnp.asarray(np.linspace(0.1, 1.0, DIM), jnp.float32)

    def log_joint(obs):
        return jnp.sum(-0.5 * (obs["x"] / target_std) ** 2, -1)

    out = {"n_chains": n_chains, "n_iters": n_iters, "max_tree_depth": 6}
    with jax.default_device(device):
        for label, fused in (("fused", True), ("scan", False)):
            nuts = zs.NUTS(step_size=0.1, max_tree_depth=6,
                           adapt_step_size=True,
                           experimental_fused_step=fused)
            st = nuts.init({"x": jnp.zeros((n_chains, DIM), jnp.float32)},
                           log_joint=log_joint)
            burn = jax.jit(lambda s, k, n=nuts: n.run(
                log_joint, {}, s, k, n_adapt, n_adapt=n_adapt,
                collect=False))
            samp = jax.jit(lambda s, k, n=nuts: n.run(
                log_joint, {}, s, k, n_iters, n_adapt=0,
                collect_fields=("samples", "n_leapfrogs")))
            st, _ = burn(st, jax.random.PRNGKey(41))
            jax.block_until_ready(st.q["x"])
            o = samp(st, jax.random.PRNGKey(42))  # compile
            jax.block_until_ready(o[1]["samples"]["x"])
            del o
            dts = []
            for trial in range(N_TRIALS):
                t0 = time.perf_counter()
                _, o = samp(st, jax.random.PRNGKey(43 + trial))
                jax.block_until_ready(o["samples"]["x"])
                dts.append(time.perf_counter() - t0)
            dt = min(dts)
            leaps = float(np.mean(np.asarray(o["n_leapfrogs"])))
            std = np.asarray(o["samples"]["x"]).reshape(-1, DIM).std(0)
            rel = float(np.abs(std / np.asarray(target_std) - 1.0).max())
            ci = n_chains * n_iters / dt
            out[label] = {
                "chain_iters_per_sec_M": round(ci / 1e6, 2),
                "leapfrog_chain_steps_per_sec_M": round(ci * leaps / 1e6,
                                                        1),
                "mean_leapfrogs": round(leaps, 1),
                "sample_sec_trials": [round(d, 3) for d in dts],
                "max_rel_std_err": round(rel, 4),
                "stats_ok": rel < 0.1,
            }
            del o
    out["fused_speedup"] = round(
        out["fused"]["chain_iters_per_sec_M"]
        / out["scan"]["chain_iters_per_sec_M"], 2)

    # --- deep-tree sweep (VERDICT r4 item 2): the class DEFAULT is
    # max_tree_depth=10; on a hard geometry (stds 0.1..30 — trees
    # genuinely deepen toward the cap) measure the looped fused kernel
    # at depths {6, 8, 10} plus the scan path at 10, so the default
    # config's fused story is a recorded number, not a silent fallback.
    hard_std = jnp.asarray(np.linspace(0.1, 30.0, DIM), jnp.float32)

    def hard_log_joint(obs):
        return jnp.sum(-0.5 * (obs["x"] / hard_std) ** 2, -1)

    def run_depth(depth, fused, n_iters=50, n_adapt=150, trials=2):
        nuts = zs.NUTS(step_size=0.1, max_tree_depth=depth,
                       adapt_step_size=True,
                       experimental_fused_step=fused)
        st = nuts.init({"x": jnp.zeros((n_chains, DIM), jnp.float32)},
                       log_joint=hard_log_joint)
        burn = jax.jit(lambda s, k, n=nuts: n.run(
            hard_log_joint, {}, s, k, n_adapt, n_adapt=n_adapt,
            collect=False))
        samp = jax.jit(lambda s, k, n=nuts: n.run(
            hard_log_joint, {}, s, k, n_iters, n_adapt=0,
            collect_fields=("samples", "n_leapfrogs", "depth")))
        st, _ = burn(st, jax.random.PRNGKey(61))
        jax.block_until_ready(st.q["x"])
        o = samp(st, jax.random.PRNGKey(62))  # compile
        jax.block_until_ready(o[1]["samples"]["x"])
        del o
        dts = []
        for t in range(trials):
            t0 = time.perf_counter()
            _, o = samp(st, jax.random.PRNGKey(63 + t))
            jax.block_until_ready(o["samples"]["x"])
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
        leaps = float(np.mean(np.asarray(o["n_leapfrogs"])))
        mdep = float(np.mean(np.asarray(o["depth"])))
        std = np.asarray(o["samples"]["x"]).reshape(-1, DIM).std(0)
        rel = float(np.abs(std / np.asarray(hard_std) - 1.0).max())
        ci = n_chains * n_iters / dt
        del o
        return {"chain_iters_per_sec_M": round(ci / 1e6, 3),
                "leapfrog_chain_steps_per_sec_M": round(
                    ci * leaps / 1e6, 1),
                "mean_leapfrogs": round(leaps, 1),
                "mean_depth": round(mdep, 2),
                "max_rel_std_err": round(rel, 4),
                "sample_sec_trials": [round(x, 3) for x in dts]}

    deep = {"target": "diag Gaussian stds 0.1..30 (trees reach the cap)"}
    for depth in (6, 8, 10):
        deep["fused_depth%d" % depth] = run_depth(depth, True)
    deep["scan_depth10"] = run_depth(10, False)
    deep["fused_speedup_depth10"] = round(
        deep["fused_depth10"]["chain_iters_per_sec_M"]
        / deep["scan_depth10"]["chain_iters_per_sec_M"], 2)
    out["deep_tree"] = deep
    return out


def load_configs_matrix():
    """BASELINE.json acceptance-config matrix (VERDICT r3 item 1): the
    recorded reference-vs-ours steps/sec artifacts for configs #2/#4/#5
    (baseline_ref/measure_configs_{ref,ours}.py; identical protocol via
    baseline_ref/configs_protocol.py)."""
    base = os.path.dirname(REF_HMC_JSON)
    out = {}
    try:
        with open(os.path.join(base, "ref_configs.json")) as f:
            ref = json.load(f)
        with open(os.path.join(base, "ours_configs.json")) as f:
            ours = json.load(f)
    except OSError as e:
        return "unavailable: " + str(e)[:60]
    for name in sorted(set(ref) & set(ours)):
        r, o = ref[name]["steps_per_sec"], ours[name]["steps_per_sec"]
        out[name] = {
            "reference_steps_per_sec": r,
            "ours_steps_per_sec": o,
            "speedup": round(o / r, 1),
        }
    return out


def measure_host_loop(jax, jnp, zs, cpu, n_chains):
    """The sess.run-per-iteration emulation (reference SURVEY.md §3.3):
    jitted single transition + Python loop + host fetch every iteration.
    Kept as the fallback denominator + a recorded proxy datapoint."""
    from zhusuan_tpu.diagnostics import ess_batch

    with jax.default_device(cpu):
        state, _, _, hmc, log_joint = build(
            jax, jnp, zs, n_chains, np.float32, fused=False,
            collect_kw={},
        )
        step_adapt = jax.jit(
            lambda s, k: hmc.sample(
                log_joint, {}, s, k, adapt_step_size=True, adapt_mass=True
            )
        )
        step = jax.jit(
            lambda s, k: hmc.sample(
                log_joint, {}, s, k, adapt_step_size=False, adapt_mass=False
            )
        )
        key = jax.random.PRNGKey(0)
        for _ in range(N_ADAPT):
            key, sub = jax.random.split(key)
            state, _ = step_adapt(state, sub)
        jax.block_until_ready(state.q["x"])
        st2, _ = step(state, key)  # compile sample step
        jax.block_until_ready(st2.q["x"])

        samples = []
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            key, sub = jax.random.split(key)
            state, info = step(state, sub)
            samples.append(np.asarray(info.samples["x"]))  # host fetch
        dt = time.perf_counter() - t0
    traj = np.stack(samples)
    T, C, D = traj.shape
    ess = ess_batch(traj.reshape(T, C * D)).reshape(C, D)
    return float(np.minimum.reduce(ess, axis=1).sum()) / dt, dt


def measure_fused_cpu(jax, jnp, zs, cpu, n_chains, n_iters):
    """Strongest-possible CPU JAX execution (fully fused lax.scan) — the
    'even a perfect CPU port would lose' datapoint (README table)."""
    with jax.default_device(cpu):
        state, burn, _, hmc, log_joint = build(
            jax, jnp, zs, n_chains, np.float32, fused=False, collect_kw={}
        )
        sample = jax.jit(
            lambda s, k: hmc.run(
                log_joint, {}, s, k, n_iters, n_adapt=0,
                collect_fields=("samples",),
            )
        )
        state, _ = burn(state, jax.random.PRNGKey(0))
        jax.block_until_ready(state.q["x"])
        out_w = sample(state, jax.random.PRNGKey(1))
        jax.block_until_ready(out_w[0].q["x"])
        del out_w
        t0 = time.perf_counter()
        final, out = sample(state, jax.random.PRNGKey(2))
        jax.block_until_ready(out["samples"]["x"])
        dt = time.perf_counter() - t0
        eps = total_ess(jax, out["samples"]["x"], dt)
    return eps, dt


def measure_vae_steps(jax, jnp, n_steps=100, batch=128, z_dim=40):
    """Secondary metric (BASELINE.md north-star part 2): VAE MNIST-shape
    SGVB train steps/sec — host-loop stepping AND the packaged scanned
    epoch (zhusuan_tpu.fit_scan pattern)."""
    import optax

    from examples.variational_autoencoders.vae import (
        elbo_loss, init_params, make_train_step,
    )

    key = jax.random.PRNGKey(0)
    params = init_params(key)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(optimizer, z_dim)
    x = (jax.random.uniform(key, (batch, 784)) < 0.5).astype(jnp.float32)

    params, opt_state, lb = step(params, opt_state, x, key)  # compile
    jax.block_until_ready(lb)
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, lb = step(params, opt_state, x, sub)
    jax.block_until_ready(lb)
    per_step = n_steps / (time.perf_counter() - t0)

    # Scanned variant: the whole loop is ONE on-device program (the
    # library's intended usage — per-step dispatch over the axon tunnel
    # dominates the loop above on this runtime).
    @jax.jit
    def epoch(params, opt_state, x, key):
        def body(carry, k):
            p, o = carry
            loss, grads = jax.value_and_grad(elbo_loss)(p, x, k, z_dim)
            updates, o = optimizer.update(grads, o)
            return (optax.apply_updates(p, updates), o), -loss

        keys = jax.random.split(key, n_steps)
        (p, o), lbs = jax.lax.scan(body, (params, opt_state), keys)
        return p, o, lbs[-1]

    p, o, lb = epoch(params, opt_state, x, key)  # compile
    jax.block_until_ready(lb)
    t0 = time.perf_counter()
    p, o, lb = epoch(params, opt_state, x, jax.random.PRNGKey(5))
    jax.block_until_ready(lb)
    scanned = n_steps / (time.perf_counter() - t0)
    return per_step, scanned


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import zhusuan_tpu as zs

    default = jax.devices()[0]
    on_tpu = default.platform != "cpu"
    n_chains = 32768 if on_tpu else 2048

    eps_trials = dt_trials = gbps = None
    last_err = None
    while n_chains >= 2048:
        try:
            eps_trials, dt_trials, gbps = measure_tpu(
                jax, jnp, zs, default, n_chains
            )
            break
        except Exception as e:
            last_err = e
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise  # only retry on HBM pressure, not real bugs
            n_chains //= 2  # HBM headroom varies by runtime
    if eps_trials is None:
        raise RuntimeError(
            "TPU phase failed at all chain counts"
        ) from last_err
    value = float(np.median(eps_trials))

    detail = {
        "device": str(default),
        "n_chains": n_chains,
        "n_iters": N_ITERS,
        "n_trials": N_TRIALS,
        "ess_per_sec_trials": [round(v, 2) for v in eps_trials],
        "sample_phase_sec_trials": [round(v, 3) for v in dt_trials],
        "achieved_hbm_gbps_modeled": round(gbps, 1),
        "hbm_utilization_vs_819gbps": round(gbps / V5E_HBM_PEAK_GBPS, 3),
        "bound_by": "VPU (fused kernel: PRNG transcendentals + 6 in-VMEM "
                    "grad evals); HBM is not the constraint",
    }
    # MFU-style accounting (VERDICT r4 item 5): modeled VPU op rates of
    # the fused HMC kernel (op model in baseline_ref/measure_mfu.py;
    # denominators = measured dependent-chain Pallas ceilings recorded
    # in baseline_ref/mfu.json, not a datasheet number — none exists for
    # the VPU).
    iters_per_sec = n_chains * N_ITERS / float(np.median(dt_trials))
    flops_per_iter = DIM * (6 * 5 + 16)  # L=5 leapfrogs; see measure_mfu
    trans_per_iter = 2 * DIM + 1
    detail["roofline"] = {
        "modeled_vpu_tflops": round(
            iters_per_sec * flops_per_iter / 1e12, 3),
        "modeled_transcendentals_G_per_sec": round(
            iters_per_sec * trans_per_iter / 1e9, 2),
    }
    mfu_json = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "baseline_ref", "mfu.json")
    if os.path.exists(mfu_json):
        with open(mfu_json) as f:
            ceil = json.load(f).get("vpu_ceiling", {})
        if ceil:
            detail["roofline"]["vpu_frac_vs_measured_fma_ceiling"] = round(
                detail["roofline"]["modeled_vpu_tflops"]
                / ceil["fma_flops_per_sec_T"], 3)
            detail["roofline"][
                "transcendental_frac_vs_measured_exp_ceiling"] = round(
                detail["roofline"]["modeled_transcendentals_G_per_sec"]
                / ceil["exp_per_sec_G"], 3)

    # Baseline denominator: the MEASURED real reference when recorded.
    base_value = None
    if os.path.exists(REF_HMC_JSON):
        with open(REF_HMC_JSON) as f:
            ref = json.load(f)
        base_value = float(ref["ess_per_sec"])
        detail["baseline"] = {
            "what": "MEASURED real reference ZhuSuan (TF1 via "
                    "tf.compat.v1, sess.run/iteration, same 100-dim "
                    "target; baseline_ref/measure_hmc_ref.py)",
            "n_chains": ref["n_chains"],
            "ess_per_sec": round(base_value, 2),
            "sample_phase_sec": ref["sample_phase_sec"],
            "mean_acceptance": ref.get("mean_acceptance"),
        }

    cpu = jax.devices("cpu")[0]
    try:
        proxy_value, proxy_dt = measure_host_loop(
            jax, jnp, zs, cpu, HOSTLOOP_CHAINS
        )
        detail["baseline_host_loop_proxy"] = {
            "what": "jitted JAX HMC transition per Python iteration + "
                    "host fetch (reference sess.run pattern, "
                    "SURVEY.md 3.3)",
            "n_chains": HOSTLOOP_CHAINS,
            "ess_per_sec": round(proxy_value, 2),
            "sample_phase_sec": round(proxy_dt, 2),
        }
        if base_value is None:
            base_value = proxy_value
    except Exception as e:
        detail["baseline_host_loop_proxy"] = "error: " + str(e)[:80]
        if base_value is None:
            raise

    try:
        eps_2k, dt_2k = measure_fused_cpu(jax, jnp, zs, cpu, 2048, 200)
        detail["baseline_fused_scan_cpu"] = {
            "n_chains": 2048, "n_iters": 200,
            "ess_per_sec": round(eps_2k, 2),
            "sample_phase_sec": round(dt_2k, 2),
        }
    except Exception as e:
        detail["baseline_fused_scan_cpu"] = "error: " + str(e)[:80]

    if on_tpu:
        # Scan-path number at the same scale: keeps the fused-vs-scan gap
        # visible (the default now auto-selects fused when eligible).
        try:
            scan_eps, scan_dt, _ = measure_tpu(
                jax, jnp, zs, default, n_chains, fused=False
            )
            detail["scan_path_ess_per_sec"] = round(
                float(np.median(scan_eps)), 2
            )
        except Exception as e:
            detail["scan_path_ess_per_sec"] = "error: " + str(e)[:80]

        try:
            detail["ess_bias_check"] = measure_ess_bias(
                jax, jnp, zs, default
            )
        except Exception as e:
            detail["ess_bias_check"] = "error: " + str(e)[:80]

        try:
            detail["selfcheck"] = run_selfcheck(jax, jnp, zs, default)
        except Exception as e:
            detail["selfcheck"] = {"pass": False, "error": str(e)[:120]}

        # Second headline: mixing-sensitive target (ESS is data-dependent
        # here; VERDICT r3 item 2).
        try:
            detail["mixing_bench"] = measure_mixing(jax, jnp, zs, default)
        except Exception as e:
            detail["mixing_bench"] = "error: " + str(e)[:100]

        # NUTS: fused whole-tree kernel vs scan path (VERDICT r3 item 3).
        try:
            detail["nuts_bench"] = measure_nuts(jax, jnp, zs, default)
        except Exception as e:
            detail["nuts_bench"] = "error: " + str(e)[:100]

    # BASELINE.json acceptance-config matrix (recorded artifacts).
    detail["configs_matrix"] = load_configs_matrix()

    try:
        per_step, scanned = measure_vae_steps(jax, jnp)
        detail["vae_sgvb_steps_per_sec"] = round(per_step, 2)
        detail["vae_sgvb_steps_per_sec_scanned"] = round(scanned, 2)
        ref_vae = os.path.join(
            os.path.dirname(REF_HMC_JSON), "ref_vae.json"
        )
        if os.path.exists(ref_vae):
            with open(ref_vae) as f:
                rv = json.load(f)
            detail["vae_vs_reference"] = {
                "reference_steps_per_sec_measured": rv["steps_per_sec"],
                "speedup_scanned": round(
                    scanned / float(rv["steps_per_sec"]), 2
                ),
                "elbo_curve_match": "see RESULTS.md (baseline_ref/"
                                    "ref_vae.json vs ours_vae.json)",
            }
    except Exception as e:  # secondary metric must not sink the primary
        detail["vae_sgvb_steps_per_sec"] = "error: " + str(e)[:80]

    headline = {
        "metric": "hmc_ess_per_sec_100d_gaussian",
        "value": round(value, 2),
        "unit": "eff_samples/sec",
        "vs_baseline": round(value / base_value, 2),
    }
    sc = detail.get("selfcheck")
    if isinstance(sc, dict):
        headline["selfcheck_pass"] = bool(sc.get("pass", False))
    # Emission order matters (VERDICT r4 weak 1): the driver records only
    # a bounded TAIL of stdout, and the round-4 artifact lost its headline
    # when the detail blob (leading keys first) outgrew that window. Print
    # the big detail line FIRST, then the compact headline as the FINAL
    # line so the tail capture always contains a complete, parseable
    # headline object no matter how large the detail grows.
    print(json.dumps({**headline, "detail": detail}))
    sys.stdout.flush()
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
