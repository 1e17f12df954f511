"""Switch-style MoE FFN: routing math, capacity semantics, expert-parallel
sharding, and mesh-invariance of the GSPMD train step with an "ep" axis.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from diffusion_extensions_tpu.models.layers import TransformerEncoder
from diffusion_extensions_tpu.models.moe import MoEFFN, shard_moe_params
from diffusion_extensions_tpu.parallel.mesh import make_mesh

B, N, D, E = 4, 16, 32, 4


from conftest import spec_str as _spec_str



@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))


def test_single_expert_is_a_dense_ffn(x):
    """E=1 with capacity >= T routes every token (gate=1 after softmax over
    one logit) through the single expert: output == manual FFN on the same
    weights."""
    moe = MoEFFN(D, 1, dim_feedforward=64, capacity_factor=2.0)
    params = {"params": moe.init(jax.random.PRNGKey(0), x)["params"]}
    out, _ = moe.apply(params, x, mutable=["losses"])
    p = params["params"]
    tokens = x.reshape(-1, D)
    h = jax.nn.relu(tokens @ p["w1"][0] + p["b1"][0])
    want = (h @ p["w2"][0] + p["b2"][0]).reshape(B, N, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_load_balance_loss_sown(x):
    moe = MoEFFN(D, E, dim_feedforward=64)
    params = {"params": moe.init(jax.random.PRNGKey(0), x)["params"]}
    _, state = moe.apply(params, x, mutable=["losses"])
    (aux,) = jax.tree_util.tree_leaves(state["losses"])
    # Switch aux loss is >= 1 with equality at a perfectly balanced router
    assert float(aux) >= 1.0 - 1e-5
    assert np.isfinite(float(aux))


def test_capacity_drops_tokens(x):
    """With capacity_factor pushing C below T/E the over-capacity tokens
    contribute exactly zero (the residual at the layer level carries them)."""
    moe_tight = MoEFFN(D, 1, dim_feedforward=64, capacity_factor=0.25)
    params = {"params": moe_tight.init(jax.random.PRNGKey(0), x)["params"]}
    out, _ = moe_tight.apply(params, x, mutable=["losses"])
    flat = np.asarray(out).reshape(-1, D)
    n_zero = int((np.abs(flat).max(axis=1) == 0.0).sum())
    t = B * N
    cap = int(np.ceil(t * 0.25))
    assert n_zero == t - cap


def test_moe_encoder_forward_finite(x):
    enc = TransformerEncoder(D, heads=4, layers=2, dim_feedforward=64,
                             moe_experts=E)
    params = {"params": enc.init(jax.random.PRNGKey(0), x)["params"]}
    out, _ = enc.apply(params, x, mutable=["losses"])
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_moe_ep_sharded_train_step_matches_replicated(x, devices):
    """Expert parallelism is a LAYOUT: one train step with expert params
    sharded over ep reproduces the replicated-layout step."""
    enc = TransformerEncoder(D, heads=4, layers=1, dim_feedforward=64,
                             moe_experts=E)
    params = {"params": enc.init(jax.random.PRNGKey(0), x)["params"]}
    tx = optax.sgd(1e-2)

    def loss_fn(p):
        out, state = enc.apply(p, x, mutable=["losses"])
        (aux,) = jax.tree_util.tree_leaves(state["losses"])
        return jnp.mean(out**2) + 0.01 * aux

    @jax.jit
    def step(p, opt):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(p, updates), opt, l

    p_ref, _, l_ref = step(params, tx.init(params))

    mesh = make_mesh([("dp", 4), ("ep", 2)], devices=devices)
    params_ep = shard_moe_params(params, mesh)
    ep_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(params_ep)
        if "ep" in _spec_str(leaf)
    ]
    assert len(ep_leaves) == 4, "w1/b1/w2/b2 should be ep-sharded"
    p_ep, _, l_ep = step(params_ep, tx.init(params_ep))
    np.testing.assert_allclose(float(l_ep), float(l_ref), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_ep), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_aircraft_loss_includes_moe_aux():
    """make_loss_fn must pull the sown load-balance loss for MoE models
    (a plain apply() silently drops it and the router never balances)."""
    from diffusion_extensions_tpu.experiments.aircraft import make_loss_fn
    from diffusion_extensions_tpu.models.planenet import PlaneNet
    from diffusion_extensions_tpu.processes.so3 import ProjectedSO3Diffusion

    model = PlaneNet(dim=32, heads=2, layers=1, moe_experts=4)
    proc = ProjectedSO3Diffusion(timesteps=10)
    truepos = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    batch = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 3)).astype(np.float32)
    )
    params = {
        "params": model.init(
            jax.random.PRNGKey(0), batch, jnp.zeros((2,), jnp.int32)
        )["params"]
    }
    key = jax.random.PRNGKey(1)
    with_aux = make_loss_fn(model, proc, truepos, so3=True)(params, key, batch)
    no_aux = make_loss_fn(model, proc, truepos, so3=True, aux_weight=0.0)(
        params, key, batch
    )
    assert np.isfinite(float(with_aux)) and np.isfinite(float(no_aux))
    assert float(with_aux) != float(no_aux), "aux loss not included"


def test_scatter_dispatch_matches_onehot(x):
    """dispatch_impl="scatter" (O(T*D) slot scatter/gather) is numerically
    equivalent to the reference "onehot" (T,E,C) einsum dispatch: same
    params, same routing, same outputs and gradients — including dropped
    over-capacity tokens (tight capacity arm)."""
    for cf in (1.25, 0.25):
        mo = MoEFFN(D, E, dim_feedforward=64, capacity_factor=cf)
        ms = MoEFFN(D, E, dim_feedforward=64, capacity_factor=cf,
                    dispatch_impl="scatter")
        params = {"params": mo.init(jax.random.PRNGKey(0), x)["params"]}
        out_o, _ = mo.apply(params, x, mutable=["losses"])
        out_s, _ = ms.apply(params, x, mutable=["losses"])
        np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-6)

        def loss(p, mod):
            out, _ = mod.apply(p, x, mutable=["losses"])
            return jnp.sum(out ** 2)

        g_o = jax.grad(loss)(params, mo)
        g_s = jax.grad(loss)(params, ms)
        for lo, ls in zip(jax.tree_util.tree_leaves(g_o),
                          jax.tree_util.tree_leaves(g_s)):
            np.testing.assert_allclose(np.asarray(lo), np.asarray(ls),
                                       rtol=1e-4, atol=1e-5)
