"""Parallel-in-time (Picard) sampling must converge to the exact
sequential deterministic chain, in fewer sweeps than steps.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_extensions_tpu.ops.so3 import log_rmat_vec
from diffusion_extensions_tpu.processes.so3 import SO3Diffusion

B, STEPS = 8, 10


@pytest.fixture(scope="module")
def process():
    return SO3Diffusion.create(timesteps=50)


def denoise_fn(x, t):
    """Deterministic smooth stand-in for a trained model: a shrunk tangent
    vector of the state, mildly time-dependent."""
    v = log_rmat_vec(x)
    return v * (0.5 + 0.1 / (1.0 + t[..., None].astype(jnp.float32)))


@pytest.mark.parametrize("method", ["ddim", "flow"])
def test_parallel_matches_sequential(process, method):
    key = jax.random.PRNGKey(0)
    if method == "ddim":
        want = process.ddim_sample_loop(denoise_fn, key, (B,), num_steps=STEPS)
    else:
        want = process.pf_sample_loop(
            denoise_fn, key, (B,), num_steps=STEPS, method="flow"
        )
    got, k = process.parallel_sample_loop(
        denoise_fn, key, (B,), num_steps=STEPS, method=method, tol=0.0,
        return_sweeps=True,
    )
    # tol=0 runs the full max_sweeps=S sweeps -> exact fixed point
    assert int(k) == STEPS
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_parallel_converges_in_fewer_sweeps(process):
    key = jax.random.PRNGKey(1)
    want = process.ddim_sample_loop(denoise_fn, key, (B,), num_steps=STEPS)
    got, k = process.parallel_sample_loop(
        denoise_fn, key, (B,), num_steps=STEPS, method="ddim", tol=1e-4,
        return_sweeps=True,
    )
    assert int(k) < STEPS, f"no parallel speedup: {int(k)} sweeps for {STEPS}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_parallel_jits(process):
    f = jax.jit(
        lambda key: process.parallel_sample_loop(
            denoise_fn, key, (B,), num_steps=STEPS, tol=1e-4
        )
    )
    out = f(jax.random.PRNGKey(2))
    assert out.shape == (B, 3, 3)
    assert np.isfinite(np.asarray(out)).all()
    # outputs are rotations
    rtr = np.einsum("bij,bik->bjk", np.asarray(out), np.asarray(out))
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (B, 3, 3)),
                               atol=1e-4)


def test_se3_parallel_matches_sequential():
    from diffusion_extensions_tpu.ops.se3 import AffineGrad
    from diffusion_extensions_tpu.processes.se3 import SE3Diffusion

    proc = SE3Diffusion.create(timesteps=50)

    def se3_denoise(x, t):
        v = log_rmat_vec(x.rot)
        tt = (0.5 + 0.1 / (1.0 + t[..., None].astype(jnp.float32)))
        # tanh keeps the synthetic shift dynamics bounded (a real model
        # predicts unit-scale noise; unbounded feedback explodes the chain)
        return AffineGrad(v * tt, 0.3 * jnp.tanh(x.shift) * tt)

    key = jax.random.PRNGKey(4)
    want = proc.ddim_sample_loop(se3_denoise, key, (B,), num_steps=STEPS)
    got, k = proc.parallel_sample_loop(
        se3_denoise, key, (B,), num_steps=STEPS, tol=0.0, return_sweeps=True
    )
    assert int(k) == STEPS
    np.testing.assert_allclose(np.asarray(got.rot), np.asarray(want.rot),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.shift), np.asarray(want.shift),
                               rtol=1e-4, atol=1e-4)
    # and with an early-exit tolerance it converges in fewer sweeps
    got2, k2 = proc.parallel_sample_loop(
        se3_denoise, key, (B,), num_steps=STEPS, tol=1e-4, return_sweeps=True
    )
    assert int(k2) < STEPS
    np.testing.assert_allclose(np.asarray(got2.shift), np.asarray(want.shift),
                               rtol=1e-3, atol=1e-3)


def test_r3_parallel_matches_sequential():
    from diffusion_extensions_tpu.processes.r3 import GaussianDiffusion

    proc = GaussianDiffusion.create(timesteps=50)

    def r3_denoise(x, t):
        return 0.5 * jnp.tanh(x) / (1.0 + t[:, None].astype(jnp.float32) / 50)

    key = jax.random.PRNGKey(5)
    want = proc.ddim_sample_loop(r3_denoise, key, (B, 3), num_steps=STEPS)
    got, k = proc.parallel_sample_loop(
        r3_denoise, key, (B, 3), num_steps=STEPS, tol=0.0, return_sweeps=True
    )
    assert int(k) == STEPS
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    got2, k2 = proc.parallel_sample_loop(
        r3_denoise, key, (B, 3), num_steps=STEPS, tol=1e-4, return_sweeps=True
    )
    assert int(k2) < STEPS
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
