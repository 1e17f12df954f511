"""Tests for the SO(3) probability-flow (ODE) sampler — the production
consumer of the analytic IGSO(3) score (``igso3_score_vec`` / the fused
Pallas kernel on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_extensions_tpu.ops import so3 as so3_ops
from diffusion_extensions_tpu.processes import SO3Diffusion
from diffusion_extensions_tpu.processes.schedule import extract


def _oracle(schedule):
    """Oracle denoiser for a delta distribution at the identity."""

    def oracle(x, t):
        eps = extract(schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        return so3_ops.log_rmat_vec(x) / eps

    return oracle


@pytest.mark.parametrize("method", ["flow", "euler", "heun"])
def test_pf_shapes_and_orthogonality(method):
    proc = SO3Diffusion.create(1000)

    def denoise(x, t):
        return jnp.zeros((x.shape[0], 3))

    out = jax.jit(
        lambda k: proc.pf_sample_loop(denoise, k, (16,), num_steps=10,
                                      method=method)
    )(jax.random.PRNGKey(0))
    assert out.shape == (16, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), out.shape)
    ortho = jnp.matmul(out, jnp.swapaxes(out, -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(ortho, eye, atol=1e-4)


@pytest.mark.parametrize("method,steps,tol", [
    ("euler", 50, 0.15),
    ("heun", 25, 0.05),
    ("heun", 50, 0.05),
    ("flow", 10, 0.05),
    ("flow", 25, 0.05),
])
def test_pf_oracle_converges_to_delta(method, steps, tol):
    """With the oracle denoiser for a delta at the identity, the PF chain
    must contract to the identity from a Haar init — the score term
    transports the residual noise to zero as sigma -> 0."""
    proc = SO3Diffusion.create(1000)
    out = jax.jit(
        lambda k: proc.pf_sample_loop(_oracle(proc.schedule), k, (64,),
                                      num_steps=steps, method=method)
    )(jax.random.PRNGKey(1))
    angles = np.asarray(so3_ops.rotation_angle(out))
    assert np.isfinite(angles).all()
    assert np.median(angles) < tol, np.median(angles)


def test_pf_deterministic_given_key_split():
    """The ODE chain is deterministic after the init draw: same key ->
    identical output; different keys -> different (init-dependent) output."""
    proc = SO3Diffusion.create(100)
    f = jax.jit(
        lambda k: proc.pf_sample_loop(_oracle(proc.schedule), k, (8,),
                                      num_steps=10)
    )
    a = f(jax.random.PRNGKey(5))
    b = f(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pf_invalid_method_raises():
    proc = SO3Diffusion.create(10)
    with pytest.raises(ValueError):
        proc.pf_sample_loop(
            lambda x, t: jnp.zeros((x.shape[0], 3)),
            jax.random.PRNGKey(0), (4,), method="rk4")


@pytest.mark.parametrize("method", ["flow", "euler", "heun"])
def test_se3_pf_oracle_converges_to_delta(method):
    """SE(3) PF chain with the oracle denoiser for a delta at (I, 0):
    both blocks must contract (rotation via the analytic IGSO(3) score,
    shift via the Gaussian conditional score)."""
    from diffusion_extensions_tpu.ops.se3 import AffineGrad
    from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion

    proc = ProjectedSE3Diffusion(timesteps=1000, clip_shift=75.0)
    s = proc.schedule

    def oracle(x, t):
        recip = extract(s.sqrt_recipm1_alphas_cumprod, t, 1)
        rot_g = so3_ops.log_rmat_vec(x.rot) / jnp.maximum(recip, 1e-8)
        shift_g = x.shift / jnp.maximum(recip * proc.shift_scale, 1e-8)
        return AffineGrad(rot_g, shift_g)

    out = jax.jit(
        lambda k: proc.pf_sample_loop(oracle, k, (64,), num_steps=25,
                                      method=method)
    )(jax.random.PRNGKey(3))
    angles = np.asarray(so3_ops.rotation_angle(out.rot))
    shifts = np.linalg.norm(np.asarray(out.shift), axis=-1)
    assert np.isfinite(angles).all() and np.isfinite(shifts).all()
    assert np.median(angles) < 0.1, np.median(angles)
    assert np.median(shifts) < 0.1, np.median(shifts)


def test_se3_pf_flow_matches_flow_state_for_self_consistent_model():
    """The round-4 fix changes where ``"flow"`` reads the transported
    noise block: from the state (log(anchor^-1 x), round-3 "flow-state")
    to the model's prediction.  For a self-consistent denoiser —
    prediction exactly inverts q_sample, no shift clipping active — the
    two are the SAME map, so their chains must agree; they only diverge
    when x0-hat re-anchoring drifts (the measured tail blowup on the
    trained docking checkpoint, BENCHMARKS.md 240k table)."""
    from diffusion_extensions_tpu.ops.se3 import AffineGrad
    from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion

    proc = ProjectedSE3Diffusion(timesteps=1000, clip_shift=75.0)
    s = proc.schedule

    def oracle(x, t):
        recip = extract(s.sqrt_recipm1_alphas_cumprod, t, 1)
        rot_g = so3_ops.log_rmat_vec(x.rot) / jnp.maximum(recip, 1e-8)
        shift_g = x.shift / jnp.maximum(recip * proc.shift_scale, 1e-8)
        return AffineGrad(rot_g, shift_g)

    outs = {}
    for method in ("flow", "flow-state"):
        outs[method] = jax.jit(
            lambda k, m=method: proc.pf_sample_loop(
                oracle, k, (32,), num_steps=12, method=m
            )
        )(jax.random.PRNGKey(11))
    d_rot = np.asarray(
        so3_ops.rotation_angle(
            so3_ops.rmul(
                jnp.swapaxes(outs["flow"].rot, -1, -2),
                outs["flow-state"].rot,
            )
        )
    )
    d_shift = np.linalg.norm(
        np.asarray(outs["flow"].shift - outs["flow-state"].shift), axis=-1
    )
    assert d_rot.max() < 5e-3, d_rot.max()
    assert d_shift.max() < 5e-3, d_shift.max()


def test_se3_pf_flow_state_converges_to_delta():
    """The legacy read-back variant stays available for A/B and still
    contracts on a well-posed oracle."""
    from diffusion_extensions_tpu.ops.se3 import AffineGrad
    from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion

    proc = ProjectedSE3Diffusion(timesteps=1000, clip_shift=75.0)
    s = proc.schedule

    def oracle(x, t):
        recip = extract(s.sqrt_recipm1_alphas_cumprod, t, 1)
        rot_g = so3_ops.log_rmat_vec(x.rot) / jnp.maximum(recip, 1e-8)
        shift_g = x.shift / jnp.maximum(recip * proc.shift_scale, 1e-8)
        return AffineGrad(rot_g, shift_g)

    out = jax.jit(
        lambda k: proc.pf_sample_loop(
            oracle, k, (64,), num_steps=25, method="flow-state"
        )
    )(jax.random.PRNGKey(3))
    angles = np.asarray(so3_ops.rotation_angle(out.rot))
    shifts = np.linalg.norm(np.asarray(out.shift), axis=-1)
    assert np.median(angles) < 0.1 and np.median(shifts) < 0.1


def test_protein_cli_warns_on_research_pf_methods():
    """--sampler pf with a measured-bad variant must not be a silent
    option (VERDICT r3 weak #3)."""
    import warnings

    from diffusion_extensions_tpu.experiments.protein import parse_args

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        args = parse_args(
            ["--se3", "--test", "--sampler", "pf", "--pf-method", "euler"]
        )
    assert args.pf_method == "euler"
    assert any("MEASURED quality defect" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        parse_args(["--se3", "--test", "--sampler", "pf"])
    assert not caught


def test_se3_pf_invalid_method_raises():
    from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion

    proc = ProjectedSE3Diffusion(timesteps=10)
    with pytest.raises(ValueError):
        proc.pf_sample_loop(lambda x, t: None, jax.random.PRNGKey(0), (4,),
                            method="rk4")


def _bingham_mixture_oracle(schedule, modes):
    """Exact posterior-mean denoiser for a dense delta-mixture target —
    a CONTINUOUS-spread stand-in (Bingham "sur" samples as modes) that the
    first-order score-ODE discretizations measurably fail: the IGSO(3)
    score saturates near zero at large eps, so the euler/heun residual
    under-transports (MMD 0.25-0.55 vs the 0.034 acceptance on the real
    20k protocol, oracle and trained models alike)."""
    from diffusion_extensions_tpu.ops.igso3 import igso3_log_density

    def oracle(x, t):
        eps = extract(schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        acp = extract(schedule.sqrt_alphas_cumprod, t)
        anchors = so3_ops.so3_scale(modes[:, None], acp)
        N = so3_ops.rmul(jnp.swapaxes(anchors, -1, -2), x)
        v = so3_ops.log_rmat_vec(N) / eps
        logw = igso3_log_density(so3_ops.rotation_angle(N), eps[..., 0])
        w = jax.nn.softmax(logw, axis=0)[..., None]
        return (w * v).sum(0)

    return oracle


def test_pf_flow_matches_continuous_concentrated_target():
    """The exact quantile-transport integrator ("flow") reproduces a
    continuous concentrated target with the exact posterior oracle —
    the regression test for the failure mode that broke euler/heun on
    the s* Bingham presets (the delta-oracle tests above cannot see it:
    there the posterior never moves the anchor)."""
    from diffusion_extensions_tpu.data.synthetic import bingham_dist
    from diffusion_extensions_tpu.ops.metrics import (
        gaussian_kernel_matrix, mmd,
    )
    from diffusion_extensions_tpu.ops.so3 import quat_to_rmat

    proc = SO3Diffusion.create(1000)
    dist = bingham_dist("sur")
    modes = quat_to_rmat(dist.sample(jax.random.PRNGKey(42), (64,)))
    oracle = _bingham_mixture_oracle(proc.schedule, modes)

    B = 512
    out = jax.jit(
        lambda k: proc.pf_sample_loop(oracle, k, (B,), num_steps=25,
                                      method="flow")
    )(jax.random.PRNGKey(0))
    ref = quat_to_rmat(dist.sample(jax.random.PRNGKey(7), (B,)))
    val = float(mmd(ref, out, gaussian_kernel_matrix))
    assert val < 0.05, val
    # and the angle spread matches the target's, not the under-transported
    # euler/heun one (which sits ~10x above the target median)
    p50 = float(np.median(np.asarray(so3_ops.rotation_angle(out))))
    tgt = float(np.median(np.asarray(so3_ops.rotation_angle(modes))))
    assert 0.5 * tgt < p50 < 2.5 * tgt, (p50, tgt)


def test_igso3_transport_angles_properties():
    """Quantile transport: identity at equal noise levels, monotone in
    theta, and equal to the DDIM linear rescale in the Gaussian
    (small-eps) limit."""
    from diffusion_extensions_tpu.ops.igso3 import IGSO3Table

    tab = IGSO3Table.from_eps(np.array([0.02, 0.05, 0.3, 0.8], np.float32))
    theta = jnp.asarray(np.linspace(0.01, 0.5, 40, dtype=np.float32))
    i2 = jnp.full(theta.shape, 2, jnp.int32)
    # same-level transport == identity (within table resolution)
    same = tab.transport_angles(theta, i2, i2)
    np.testing.assert_allclose(np.asarray(same), np.asarray(theta),
                               atol=2e-3, rtol=1e-2)
    # monotone in theta
    down = np.asarray(tab.transport_angles(theta, i2,
                                           jnp.full(theta.shape, 1,
                                                    jnp.int32)))
    assert (np.diff(down) > -1e-6).all()
    # Gaussian limit: eps 0.05 -> 0.02 is the linear rescale theta*0.4
    small = jnp.asarray(np.linspace(0.005, 0.15, 30, dtype=np.float32))
    i1 = jnp.full(small.shape, 1, jnp.int32)
    i0 = jnp.full(small.shape, 0, jnp.int32)
    got = np.asarray(tab.transport_angles(small, i1, i0))
    np.testing.assert_allclose(got, np.asarray(small) * (0.02 / 0.05),
                               rtol=0.05, atol=1e-3)


def test_pf_time_grid_properties():
    """karras grid: descending, in-range, ends at 0, concentrated at low
    noise relative to uniform; uniform matches the legacy linspace."""
    from diffusion_extensions_tpu.processes.schedule import Schedule
    from diffusion_extensions_tpu.processes.so3 import pf_time_grid

    sched = Schedule.create(1000)
    for n in (10, 25, 50):
        k = np.asarray(pf_time_grid(sched, n, "karras"))
        assert k[0] == 999 and k[-1] == 0
        assert (np.diff(k) <= 0).all()
        assert (k >= 0).all() and (k <= 999).all()
        u = np.asarray(pf_time_grid(sched, n, "uniform"))
        legacy = np.asarray(
            jnp.linspace(999, 0, n + 1).round().astype(jnp.int32))
        assert (u == legacy).all()
        # low-noise concentration: karras spends at least twice as many
        # grid points in the bottom decile of timesteps as uniform does
        assert (k < 100).sum() >= 2 * (u < 100).sum()

    with pytest.raises(ValueError):
        pf_time_grid(sched, 10, "cosine")
