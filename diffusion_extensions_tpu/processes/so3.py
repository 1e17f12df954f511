"""DDPM on the rotation manifold SO(3) (reference ``SO3Diffusion`` /
``ProjectedSO3Diffusion``, ``diffusion.py:280-429``), TPU-first.

Structural changes vs the reference:

* The IGSO(3) noise tables for **every** timestep (forward eps_t =
  sqrt(1 - acp_t), reverse sigma_t = posterior stdev, and the eps = 1 prior)
  are precomputed once at construction as ``IGSO3Table`` rows — the
  reference rebuilds a 1000-point float64 trapezoid table inside every
  ``p_losses``/``q_sample``/``p_sample`` call (``diffusion.py:350,404,325``).
* The 1000-step reverse chain is one ``lax.scan`` (``p_sample_loop``).
* ``p_sample`` draws per-element noise at each element's own sigma_t
  instead of sharing ``model_stdev[0]`` across the batch
  (``diffusion.py:325``) — identical when t is batch-constant (always true
  inside the sampling loop), correct otherwise.
* Fused tangent-vector forms: the skewvec loss target
  ``skew2vec(log_rmat(noise)) / eps`` (``diffusion.py:355``) uses
  ``log_rmat_vec`` with no 3x3 round-trip, and all rotation products run at
  float32 MXU precision (``so3.rmul``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.igso3 import IGSO3Table
from ..ops.metrics import rmat_dist
from ..ops.so3 import (
    exp_skewvec,
    haar_rotations,
    log_rmat_vec,
    orthogonalise,
    rmul,
    so3_lerp,
    so3_scale,
)
from .schedule import Schedule, extract

__all__ = ["SO3Diffusion", "ProjectedSO3Diffusion", "pf_time_grid"]


def pf_time_grid(schedule: Schedule, num_steps: int, grid: str = "karras",
                 rho: float = 7.0) -> jnp.ndarray:
    """Timestep grid (num_steps+1 indices, descending to 0) for the
    probability-flow samplers.

    ``"uniform"``: evenly spaced timestep INDICES.

    ``"karras"`` (default): indices chosen so the noise levels
    eps_t = sqrt(1-acp_t) follow the EDM rho-spacing
    (sigma_max^(1/rho) -> sigma_min^(1/rho), rho = 7) — concentrating
    model evals (and anchor re-estimates) at low noise.  Built host-side
    from the concrete schedule buffers (all production call sites close
    over the process, so the buffers are trace-time constants).

    Measured honestly: grid choice alone does NOT rescue the euler/heun
    score-ODE discretizations on concentrated targets (both grids fail
    the small-covariance Bingham A/B identically,
    results/bingham_sampler_ab_*.json) — the fix is the exact "flow"
    integrator (``IGSO3Table.transport_angles``), for which the grid only
    sets where the denoiser is re-evaluated.
    """
    T = schedule.num_timesteps
    if grid == "uniform":
        return jnp.linspace(T - 1, 0, num_steps + 1).round().astype(jnp.int32)
    if grid != "karras":
        raise ValueError(f"Unexpected pf grid: {grid}")
    eps = np.asarray(schedule.sqrt_one_minus_alphas_cumprod, dtype=np.float64)
    smax, smin = float(eps[T - 1]), float(eps[0])
    u = np.linspace(0.0, 1.0, num_steps + 1)
    sig = (smax ** (1 / rho) + u * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    idx = np.clip(np.searchsorted(eps, sig), 0, T - 1)
    # strictly decreasing where possible (duplicates would trigger the
    # hold-at-clean-estimate branch mid-chain); clamp the tail at 0
    for i in range(1, len(idx)):
        idx[i] = min(idx[i], idx[i - 1] - 1)
    idx = np.maximum(idx, 0)
    idx[-1] = 0
    return jnp.asarray(idx, dtype=jnp.int32)


@struct.dataclass
class SO3Diffusion:
    """State = rotation matrices (B, 3, 3).  ``denoise_fn(x_in, t) -> (B, 3)``
    skew-vec prediction (loss_type "skewvec") or (B, 3, 3) rotation
    ("prevstep")."""

    schedule: Schedule
    q_table: IGSO3Table  # rows: eps_t = sqrt(1 - alphas_cumprod_t)
    p_table: IGSO3Table  # rows: sigma_t = posterior stdev_t
    prior_table: IGSO3Table  # single row: eps = 1 (~ Haar init)
    loss_type: str = struct.field(pytree_node=False, default="skewvec")
    projected: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        loss_type: str = "skewvec",
        betas=None,
        projected: bool = False,
    ) -> "SO3Diffusion":
        if loss_type not in ("skewvec", "prevstep"):
            # the reference constructs-but-never-raises here
            # (diffusion.py:366-367); we raise for real.
            raise ValueError(f"Unexpected loss_type: {loss_type}")
        schedule = Schedule.create(timesteps, betas)
        q_eps = np.asarray(schedule.sqrt_one_minus_alphas_cumprod)
        p_sigma = np.asarray(schedule.posterior_stdev)
        return cls(
            schedule=schedule,
            q_table=IGSO3Table.from_eps(q_eps),
            p_table=IGSO3Table.from_eps(np.maximum(p_sigma, 1e-10)),
            prior_table=IGSO3Table.from_eps(np.ones((1,), np.float32)),
            loss_type=loss_type,
            projected=projected,
        )

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    # -- forward process -------------------------------------------------
    def q_mean_variance(self, x_start, t):
        """Geodesic shrink toward identity (reference: ``diffusion.py:285-289``)."""
        s = self.schedule
        eye = jnp.eye(3, dtype=x_start.dtype)
        mean = so3_lerp(eye, x_start, extract(s.sqrt_alphas_cumprod, t, 1))
        variance = extract(1.0 - s.alphas_cumprod, t)
        log_variance = extract(s.log_one_minus_alphas_cumprod, t)
        return mean, variance, log_variance

    def sample_noise(self, key, t):
        """IGSO3(eps_t) rotation noise via the precomputed table
        (replaces the per-step table rebuild at ``diffusion.py:350,404``)."""
        return self.q_table.sample(key, t)

    def q_sample(self, x_start, t, noise):
        """so3_scale(x0, sqrt(acp)) @ noise (reference: ``diffusion.py:339-346``)."""
        scale = extract(self.schedule.sqrt_alphas_cumprod, t)
        return rmul(so3_scale(x_start, scale), noise)

    def predict_start_from_noise(self, x_t, t, noise_vec):
        """(reference: ``diffusion.py:291-297``); ``noise_vec`` is the model's
        skew-vec prediction."""
        s = self.schedule
        x_t_term = so3_scale(x_t, extract(s.sqrt_recip_alphas_cumprod, t))
        scaled = noise_vec * extract(s.sqrt_recipm1_alphas_cumprod, t, 1)
        noise_term = exp_skewvec(scaled)
        return rmul(x_t_term, jnp.swapaxes(noise_term, -1, -2))

    def q_posterior(self, x_start, x_t, t):
        """(reference: ``diffusion.py:299-306``)"""
        s = self.schedule
        c1 = so3_scale(x_start, extract(s.posterior_mean_coef1, t))
        c2 = so3_scale(x_t, extract(s.posterior_mean_coef2, t))
        posterior_mean = rmul(c1, c2)
        return (
            posterior_mean,
            extract(s.posterior_variance, t),
            extract(s.posterior_log_variance_clipped, t),
        )

    # -- reverse process -------------------------------------------------
    def p_mean_variance(self, denoise_fn, x, t, projection=None):
        """(reference: ``diffusion.py:308-313`` / projected ``:382-388``)"""
        x_in = projection(x) if projection is not None else x
        predict = denoise_fn(x_in, t)
        x_recon = self.predict_start_from_noise(x, t, predict)
        return self.q_posterior(x_recon, x, t)

    def p_sample(self, denoise_fn, key, x, t, projection=None):
        """Mean then right-multiply IGSO3(sigma_t) noise; identity noise at
        t == 0 (reference: ``diffusion.py:315-326``).  Branch-free: the
        t == 0 case ``where``-selects the mean, so this is scan-safe."""
        mean, _, _ = self.p_mean_variance(denoise_fn, x, t, projection)
        noise = self.p_table.sample(key, t)
        eye = jnp.eye(3, dtype=x.dtype)
        noise = jnp.where((t == 0)[..., None, None], eye, noise)
        return rmul(mean, noise)

    def p_sample_loop(
        self,
        denoise_fn,
        key,
        shape,
        projection=None,
        init=None,
        return_trajectory: bool = False,
    ):
        """Reverse chain as ``lax.scan``.  ``init``: "igso3" (base-class
        eps=1 init, ``diffusion.py:329-337``) or "qr" (projected-class
        Haar-QR init, ``diffusion.py:390-400``); default follows
        ``projected``.  ``return_trajectory=True`` additionally returns the
        (T, B, 3, 3) chain states indexed by timestep (the reference's
        ``so3_test.py:26-31`` trace collection)."""
        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        if init is None:
            init = "qr" if self.projected else "igso3"
        key, init_key = jax.random.split(key)
        if init == "qr":
            x0 = haar_rotations(init_key, (b,))
        else:
            x0 = self.prior_table.sample(
                init_key, jnp.zeros(shape, dtype=jnp.int32)
            )

        def step(x, i):
            t = jnp.full((b,), i, dtype=jnp.int32)
            k = jax.random.fold_in(key, i)
            x_new = self.p_sample(denoise_fn, k, x, t, projection)
            return x_new, (x if return_trajectory else None)

        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        x, traj = jax.lax.scan(step, x0, steps)
        if return_trajectory:
            # traj[j] is the state before processing timestep steps[j];
            # flip so index = timestep (reference res[i] layout)
            return x, jnp.flip(traj, axis=0)
        return x

    def ddim_sample_loop(
        self,
        denoise_fn,
        key,
        shape,
        num_steps: int = 50,
        projection=None,
        init=None,
    ):
        """Accelerated deterministic sampling (DDIM generalised to SO(3)) —
        a capability beyond the reference's 1000-step ancestral chain
        (``diffusion.py:328-337``).

        The forward process is x_t = so3_scale(x0, sqrt(acp_t)) @ N_t with
        N_t = exp(v * eps_t); DDIM keeps the predicted unit noise direction
        v and jumps:  x_{t'} = so3_scale(x0_pred, sqrt(acp_t')) @
        exp(v * eps_t').  ``num_steps`` model evaluations instead of T.
        """
        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        if init is None:
            init = "qr" if self.projected else "igso3"
        key, init_key = jax.random.split(key)
        if init == "qr":
            x0 = haar_rotations(init_key, (b,))
        else:
            x0 = self.prior_table.sample(
                init_key, jnp.zeros(shape, dtype=jnp.int32)
            )

        T = self.num_timesteps
        ts = jnp.linspace(T - 1, 0, num_steps + 1).round().astype(jnp.int32)

        def step(x, i):
            t = jnp.full((b,), ts[i], dtype=jnp.int32)
            t_prev = jnp.full((b,), ts[i + 1], dtype=jnp.int32)
            return self._ddim_map(denoise_fn, x, t, t_prev, projection), None

        x, _ = jax.lax.scan(step, x0, jnp.arange(num_steps))
        # final step: map to the clean x0 prediction (acp_{-1} = 1)
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        return self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))

    def _ddim_map(self, denoise_fn, x, t, t_prev, projection=None):
        """One deterministic DDIM step x_t -> x_{t_prev} (batched over any
        leading dims).  Shared by the sequential loop and the Picard
        parallel-in-time sampler."""
        s = self.schedule
        x_in = projection(x) if projection is not None else x
        v = denoise_fn(x_in, t)  # descaled noise direction (..., 3)
        x_recon = self.predict_start_from_noise(x, t, v)
        eps_prev = extract(s.sqrt_one_minus_alphas_cumprod, t_prev, 1)
        noise_prev = exp_skewvec(v * eps_prev)
        x_prev = rmul(
            so3_scale(x_recon, extract(s.sqrt_alphas_cumprod, t_prev)),
            noise_prev,
        )
        # duplicated grid points (num_steps ~ T): hold the clean estimate
        return jnp.where((t_prev == t)[..., None, None], x_recon, x_prev)

    def _flow_map(self, denoise_fn, x, t, t_prev, projection=None):
        """One exact-transport PF step x_t -> x_{t_prev} (see
        ``pf_sample_loop`` method="flow"); batched over any leading dims."""
        s = self.schedule
        x_in = projection(x) if projection is not None else x
        v = denoise_fn(x_in, t)
        x_recon = self.predict_start_from_noise(x, t, v)
        anchor = so3_scale(x_recon, extract(s.sqrt_alphas_cumprod, t))
        vrel = log_rmat_vec(rmul(jnp.swapaxes(anchor, -1, -2), x))
        theta = jnp.linalg.norm(vrel, axis=-1)
        axis = vrel / jnp.maximum(theta, 1e-12)[..., None]
        theta_p = self.q_table.transport_angles(theta, t, t_prev)
        rel_p = exp_skewvec(axis * theta_p[..., None])
        x_new = rmul(
            so3_scale(x_recon, extract(s.sqrt_alphas_cumprod, t_prev)),
            rel_p,
        )
        return jnp.where((t_prev == t)[..., None, None], x_recon, x_new)

    def pf_sample_loop(
        self,
        denoise_fn,
        key,
        shape,
        num_steps: int = 50,
        projection=None,
        init=None,
        method: str = "flow",
        grid: str = "karras",
    ):
        """Probability-flow (ODE) sampler on SO(3) (the reference instead
        autodiffs its ``log_prob`` for the score, ``distributions.py:190``).

        View the forward chain as x_t = M_t N_t with mean anchor
        M_t = so3_scale(x0, sqrt(acp_t)) and noise N_t ~ IGSO3(eps_t),
        eps_t = sqrt(1 - acp_t).  Conditioned on the model's x0-hat, the
        relative rotation Rel = M_t^T x_t carries the density IGSO3(eps_t)
        and evolves by the VE-form probability-flow ODE in the noise
        coordinate,

            dRel/d(sigma) = -sigma * score(Rel; sigma),

        integrated over the eps_t grid of the selected timesteps while the
        anchor follows the x0-hat prediction — the deterministic analogue
        of the ancestral chain with the *non-Gaussian* IGSO(3) geometry
        entering through the heat-kernel score (unlike
        ``ddim_sample_loop``, which holds the unit noise direction fixed
        and rebuilds the residual from the prediction each step).

        ``method``:

        * "flow" (default, 1 NFE/step): EXACT integration.  The score
          field is radial (isotropy), so the ODE's transport between two
          noise levels is the CDF/quantile map of the angle marginal —
          ``IGSO3Table.transport_angles`` — with zero discretization
          error; the denoiser only re-anchors at each grid point.
          Measured: passes the full Bingham acceptance matrix down to 10
          model evals, including the concentrated presets where the
          first-order discretizations diverge (BENCHMARKS.md "Chains").
        * "euler" (1 NFE/step) / "heun" (2 NFE/step, EDM-style): explicit
          discretizations of the same ODE using the pointwise analytic
          score ``igso3_score_vec`` evaluated at the model's predicted
          noise rotation.  KNOWN LIMITATION (measured, oracle-confirmed):
          the score saturates near zero at large eps (the wrapped density
          flattens), so for targets with continuous spread the residual
          under-transports and the chain fails concentrated targets (MMD
          0.25-0.55 vs the 0.034 acceptance on the s* Bingham presets,
          for the exact posterior oracle as well as trained models) —
          kept for A/B evidence and as pointwise-score consumers; use
          "flow" in production.

        ``grid``: timestep spacing — see ``pf_time_grid``.
        """
        if method not in ("flow", "euler", "heun"):
            raise ValueError(f"Unexpected pf method: {method}")
        from ..ops.igso3 import igso3_score_vec

        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        if init is None:
            init = "qr" if self.projected else "igso3"
        key, init_key = jax.random.split(key)
        if init == "qr":
            x0 = haar_rotations(init_key, (b,))
        else:
            x0 = self.prior_table.sample(
                init_key, jnp.zeros(shape, dtype=jnp.int32)
            )

        ts = pf_time_grid(self.schedule, num_steps, grid)
        s = self.schedule

        def eval_drift(x, t):
            """Model eval -> (x0_hat, Rel, right-tangent score at x).

            The score is the analytic IGSO(3) score evaluated at the
            MODEL'S predicted noise rotation N_hat = exp(eps_t * v_hat),
            not at the raw relative rotation: v_hat is a posterior MEAN,
            and evaluating at N_hat is the marginal-consistent
            generalisation of the Euclidean eps-parameterised PF-ODE
            (score = -v_hat/eps in the Gaussian limit) — evaluating the
            conditional score at the posterior-mean anchor instead is
            biased whenever p(x0 | x_t) is broad (measured: it fails the
            Bingham acceptance A/B that this form passes,
            results/bingham_sampler_ab_*.json)."""
            x_in = projection(x) if projection is not None else x
            v = denoise_fn(x_in, t)
            x_recon = self.predict_start_from_noise(x, t, v)
            anchor = so3_scale(x_recon, extract(s.sqrt_alphas_cumprod, t))
            rel = rmul(jnp.swapaxes(anchor, -1, -2), x)
            eps_t = extract(s.sqrt_one_minus_alphas_cumprod, t)
            n_hat = exp_skewvec(v * eps_t[..., None])
            score = igso3_score_vec(n_hat, eps_t)
            return x_recon, rel, score, eps_t

        def flow_step(x, i):
            """Exact transport: re-anchor at the model's x0-hat, quantile-
            map the actual residual angle eps_t -> eps_prev along its own
            axis (``IGSO3Table.transport_angles``); see ``_flow_map``."""
            t = jnp.full((b,), ts[i], dtype=jnp.int32)
            t_prev = jnp.full((b,), ts[i + 1], dtype=jnp.int32)
            return self._flow_map(denoise_fn, x, t, t_prev, projection), None

        def step(x, i):
            t = jnp.full((b,), ts[i], dtype=jnp.int32)
            t_prev = jnp.full((b,), ts[i + 1], dtype=jnp.int32)
            x_recon, rel, s1, eps_t = eval_drift(x, t)
            eps_p = extract(s.sqrt_one_minus_alphas_cumprod, t_prev)
            dsig = (eps_p - eps_t)[..., None]  # negative: noise shrinks
            u1 = -eps_t[..., None] * s1 * dsig
            acp_prev = extract(s.sqrt_alphas_cumprod, t_prev)
            x_euler = rmul(
                so3_scale(x_recon, acp_prev), rmul(rel, exp_skewvec(u1))
            )
            if method == "heun":
                x_recon2, _, s2, _ = eval_drift(x_euler, t_prev)
                u2 = -eps_p[..., None] * s2 * dsig
                x_new = rmul(
                    so3_scale(x_recon2, acp_prev),
                    rmul(rel, exp_skewvec(0.5 * (u1 + u2))),
                )
            else:
                x_new = x_euler
            # duplicated grid points (num_steps ~ T): hold the estimate
            x_new = jnp.where((t_prev == t)[..., None, None], x_recon, x_new)
            return x_new, None

        if method == "flow":
            step = flow_step

        x, _ = jax.lax.scan(step, x0, jnp.arange(num_steps))
        # final step: map to the clean x0 prediction
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        return self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))

    def parallel_sample_loop(
        self,
        denoise_fn,
        key,
        shape,
        num_steps: int = 50,
        method: str = "ddim",
        tol: float = 1e-4,
        max_sweeps: int | None = None,
        projection=None,
        init=None,
        grid: str = "karras",
        return_sweeps: bool = False,
    ):
        """Parallel-in-time (Picard) sampling of the deterministic reverse
        chain — ParaDiGMS (arXiv:2305.16317) adapted to SO(3) (cf.
        arXiv:2507.10347), TPU-first.

        The sequential DDIM / exact-transport-PF chain is a recurrence
        ``x_{i+1} = G(x_i, t_i)``.  Instead of S sequential model evals,
        iterate on the WHOLE trajectory:

        * evaluate ``G`` at every grid point of the current trajectory
          guess in ONE batched model call (S x B samples — large MXU
          batches instead of S tiny latency-bound dispatches);
        * express each step as a *relative* rotation increment
          ``D_i = x_i^T G(x_i, t_i)`` and rebuild the trajectory by prefix
          composition ``x_j = x_0 D_0 D_1 ... D_{j-1}`` with
          ``lax.associative_scan`` over 3x3 matmuls (O(log S) depth);
        * stop when the sweep's max Frobenius update < ``tol``.

        The fixed point IS the sequential chain (sweep k makes the first
        k+1 states exact, so ``max_sweeps = num_steps`` guarantees
        bit-level convergence); parity asserted in
        ``tests/test_parallel_sampler.py``.

        MEASURED VERDICT (TPU v5e, trained Bingham RotPredict, 512
        chains, 50 steps): the iteration needs the full S sweeps — a
        trained denoiser is not a contraction, so information propagates
        one grid point per sweep — and the sequential chain inside ONE
        jitted ``lax.scan`` has no dispatch overhead to recover (46 ms),
        so this is 5.5 s vs 0.046 s: a ~120x LOSS on this hardware
        (bench.py row ddim_50_picard).  Kept as a correctness-preserving
        capability and a recorded negative result; see DESIGN.md §11 for
        when the literature's wins (eager per-step dispatch, sliding
        windows + sample-quality tolerances) do and don't transfer.

        ``method``: "ddim" (``_ddim_map``) or "flow" (exact-transport PF,
        ``_flow_map``).  Returns the clean sample; with
        ``return_sweeps=True`` also the number of sweeps used.
        """
        if method not in ("ddim", "flow"):
            raise ValueError(f"Unexpected parallel method: {method}")
        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        if init is None:
            init = "qr" if self.projected else "igso3"
        key, init_key = jax.random.split(key)
        if init == "qr":
            x0 = haar_rotations(init_key, (b,))
        else:
            x0 = self.prior_table.sample(
                init_key, jnp.zeros(shape, dtype=jnp.int32)
            )

        T = self.num_timesteps
        if method == "flow":
            ts = pf_time_grid(self.schedule, num_steps, grid)
        else:
            ts = jnp.linspace(T - 1, 0, num_steps + 1).round().astype(jnp.int32)
        step_map = self._flow_map if method == "flow" else self._ddim_map
        S = num_steps
        if max_sweeps is None:
            max_sweeps = S
        # grid timesteps broadcast over the batch: (S, B)
        t_cur = jnp.broadcast_to(ts[:-1, None], (S, b))
        t_prev = jnp.broadcast_to(ts[1:, None], (S, b))

        def sweep(X):
            """One Picard sweep over the trajectory guess X: (S+1, B, 3, 3)."""
            xn = step_map(
                denoise_fn,
                X[:-1].reshape(S * b, 3, 3),
                t_cur.reshape(S * b),
                t_prev.reshape(S * b),
                projection,
            ).reshape(S, b, 3, 3)
            # relative increments D_i = x_i^T G(x_i)
            deltas = rmul(jnp.swapaxes(X[:-1], -1, -2), xn)
            # prefix composition on the MXU, O(log S) depth (f32 precision:
            # bf16 accumulation of 3x3 rotation products drifts off SO(3));
            # re-orthogonalise so f32 drift through the prefix products
            # never feeds the steep transport map (1e-6 parity vs 2e-4
            # without — the SVD is negligible next to the model eval)
            cum = jax.lax.associative_scan(rmul, deltas)
            Xnew = jnp.concatenate(
                [x0[None], orthogonalise(rmul(x0[None], cum))], axis=0
            )
            diff = jnp.max(jnp.abs(Xnew - X))
            return Xnew, diff

        X0 = jnp.broadcast_to(x0[None], (S + 1, b, 3, 3))

        def cond(carry):
            _, diff, k = carry
            return jnp.logical_and(diff > tol, k < max_sweeps)

        def body(carry):
            X, _, k = carry
            Xnew, diff = sweep(X)
            return Xnew, diff, k + 1

        X, _, k = jax.lax.while_loop(
            cond, body, (X0, jnp.asarray(jnp.inf, jnp.float32), 0)
        )
        # final step: map to the clean x0 prediction (acp_{-1} = 1)
        x = X[-1]
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        out = self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))
        return (out, k) if return_sweeps else out

    # -- training --------------------------------------------------------
    def p_losses(self, denoise_fn, key, x_start, t, projection=None):
        """(reference: ``diffusion.py:348-369`` / projected ``:402-423``)"""
        eps = extract(self.schedule.sqrt_one_minus_alphas_cumprod, t)
        noise = jax.lax.stop_gradient(self.sample_noise(key, t))
        x_noisy = self.q_sample(x_start, t, noise)
        x_in = projection(x_noisy) if projection is not None else x_noisy
        x_recon = denoise_fn(x_in, t)

        if self.loss_type == "skewvec":
            descaled_noise = log_rmat_vec(noise) / eps[..., None]
            return jnp.mean((x_recon - descaled_noise) ** 2)
        elif self.loss_type == "prevstep":
            posterior_mean, _, _ = self.q_posterior(x_start, x_noisy, t)
            step = rmul(jnp.swapaxes(x_noisy, -1, -2), posterior_mean)
            return jnp.mean(rmat_dist(x_recon, step) ** 2)
        raise ValueError(f"Unexpected loss_type: {self.loss_type}")

    def loss(self, denoise_fn, key, x_start, projection=None):
        """Uniform-random t + p_losses (reference ``forward``,
        ``diffusion.py:371-374``)."""
        b = x_start.shape[0]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.num_timesteps)
        return self.p_losses(denoise_fn, k_n, x_start, t, projection)


def ProjectedSO3Diffusion(
    timesteps: int = 1000, loss_type: str = "skewvec", betas=None
) -> SO3Diffusion:
    """Factory matching ``diffusion.py:377-380``: same process with the
    projection hook and Haar-QR sampler init."""
    return SO3Diffusion.create(timesteps, loss_type, betas, projected=True)
