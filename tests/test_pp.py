"""Pipeline parallelism: the GPipe microbatch pipeline must be a pure
re-schedule — same outputs and same gradients as the sequential stack.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_extensions_tpu.parallel.mesh import make_mesh
from diffusion_extensions_tpu.parallel.pp import (
    pipeline_apply,
    shard_stacked_params,
    stack_layer_params,
)

L, D, B = 8, 16, 16


from conftest import spec_str as _spec_str



def layer_fn(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def sequential_apply(stacked, x):
    def body(h, p_l):
        return layer_fn(p_l, h), None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


@pytest.fixture(scope="module")
def stacked():
    rng = np.random.default_rng(0)
    per_layer = [
        {
            "w": jnp.asarray(
                rng.standard_normal((D, D)).astype(np.float32) / np.sqrt(D)
            ),
            "b": jnp.asarray(rng.standard_normal(D).astype(np.float32) * 0.1),
        }
        for _ in range(L)
    ]
    return stack_layer_params(per_layer)


@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))


def test_stack_layer_params_shapes(stacked):
    assert stacked["w"].shape == (L, D, D)
    assert stacked["b"].shape == (L, D)


@pytest.mark.parametrize("pp,m", [(2, 4), (4, 4), (4, 8), (8, 16)])
def test_pipeline_matches_sequential(stacked, x, devices, pp, m):
    mesh = make_mesh([("pp", pp)], devices=devices[:pp])
    want = sequential_apply(stacked, x)
    got = pipeline_apply(layer_fn, stacked, x, mesh, n_microbatches=m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("dp,pp", [(2, 4), (4, 2)])
def test_pipeline_composes_with_dp(stacked, x, devices, dp, pp):
    """On a dp x pp mesh the microbatch dim is dp-sharded; outputs and
    gradients still match the sequential stack."""
    mesh = make_mesh([("dp", dp), ("pp", pp)], devices=devices)
    want = sequential_apply(stacked, x)
    got = pipeline_apply(layer_fn, stacked, x, mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    def loss_pp(p):
        return jnp.mean(
            pipeline_apply(layer_fn, p, x, mesh, n_microbatches=4) ** 2
        )

    def loss_seq(p):
        return jnp.mean(sequential_apply(p, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_seq)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_gradients_match_sequential(stacked, x, devices):
    mesh = make_mesh([("pp", 4)], devices=devices[:4])

    def loss_seq(p):
        return jnp.mean(sequential_apply(p, x) ** 2)

    def loss_pp(p):
        return jnp.mean(
            pipeline_apply(layer_fn, p, x, mesh, n_microbatches=4) ** 2
        )

    l_seq, g_seq = jax.value_and_grad(loss_seq)(stacked)
    l_pp, g_pp = jax.value_and_grad(loss_pp)(stacked)
    np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_seq)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_trains_sharded(stacked, x, devices):
    """One SGD step with the stage params left pp-sharded at rest: grads
    come back on the pp layout and the update stays sharded."""
    import optax

    mesh = make_mesh([("pp", 4)], devices=devices[:4])
    params = shard_stacked_params(stacked, mesh)
    assert all(
        "pp" in _spec_str(leaf)
        for leaf in jax.tree_util.tree_leaves(params)
    )
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            return jnp.mean(
                pipeline_apply(layer_fn, p, x, mesh, n_microbatches=4) ** 2
            )

        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    p1, opt_state, l1 = step(params, opt_state)
    p2, _, l2 = step(p1, opt_state)
    assert float(l2) < float(l1)
    assert all(
        "pp" in _spec_str(leaf) for leaf in jax.tree_util.tree_leaves(p2)
    )


def test_pipelined_planenet_matches_model(devices):
    """The flagship consumer: PlaneNet's encoder stack run through the
    pipeline reproduces model.apply bit-for-bit-ish on the same params."""
    from diffusion_extensions_tpu.models.planenet import (
        PlaneNet,
        planenet_pp_apply,
        planenet_pp_params,
    )

    model = PlaneNet(dim=64, heads=4, layers=4)
    rng = np.random.default_rng(3)
    xb = jnp.asarray(rng.standard_normal((8, 32, 3)).astype(np.float32))
    tb = jnp.asarray(rng.integers(0, 50, size=(8,)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), xb, tb)
    want = model.apply(params, xb, tb)

    mesh = make_mesh([("dp", 2), ("pp", 4)], devices=devices)
    pp_params = planenet_pp_params(params, mesh)
    assert all(
        "pp" in _spec_str(leaf)
        for leaf in jax.tree_util.tree_leaves(pp_params["layers"])
    ), "encoder layers not pp-sharded at rest"
    got = planenet_pp_apply(model, pp_params, xb, tb, mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_planenet_moe(devices):
    """MoE x pp composition (VERDICT r4 item 7): the pipelined MoE encoder
    must match the dense apply run per-microbatch (routing capacity is a
    function of the token count, so the exact reference is the microbatched
    model, not the full-batch apply), and the aux load-balance loss must be
    the microbatch mean of the sown per-layer sums."""
    from diffusion_extensions_tpu.models.planenet import (
        PlaneNet,
        planenet_pp_apply,
        planenet_pp_params,
    )

    M = 4
    model = PlaneNet(dim=64, heads=4, layers=4, moe_experts=4)
    rng = np.random.default_rng(4)
    xb = jnp.asarray(rng.standard_normal((8, 32, 3)).astype(np.float32))
    tb = jnp.asarray(rng.integers(0, 50, size=(8,)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), xb, tb)
    params = {"params": params["params"]}  # drop init-time sown losses

    mb = xb.shape[0] // M
    outs, auxs = [], []
    for i in range(M):
        o, st = model.apply(
            params, xb[i * mb:(i + 1) * mb], tb[i * mb:(i + 1) * mb],
            mutable=["losses"],
        )
        outs.append(o)
        auxs.append(sum(jax.tree_util.tree_leaves(st["losses"])))
    want = jnp.concatenate(outs)
    want_aux = float(jnp.mean(jnp.stack(auxs)))

    # pp-only mesh for exactness: adding dp would also dp-shard each
    # microbatch, changing the per-shard token count and thus the MoE
    # capacity (a different — still valid — routing regime)
    mesh = make_mesh([("pp", 4)], devices=devices[:4])
    pp_params = planenet_pp_params(params, mesh)
    got, aux = planenet_pp_apply(
        model, pp_params, xb, tb, mesh, n_microbatches=M
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(aux), want_aux, rtol=1e-5)

    # gradients flow through both the prediction and the aux term
    def loss(p):
        pred, a = planenet_pp_apply(model, p, xb, tb, mesh, n_microbatches=M)
        return jnp.mean(pred ** 2) + 0.01 * a

    g = jax.grad(loss)(pp_params)
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0.0

    # dp x pp composition still runs and returns finite values (routing
    # capacity differs per dp shard by design — see note above)
    mesh2 = make_mesh([("dp", 2), ("pp", 4)], devices=devices)
    got2, aux2 = planenet_pp_apply(
        model, planenet_pp_params(params, mesh2), xb, tb, mesh2,
        n_microbatches=M,
    )
    assert got2.shape == want.shape
    assert np.all(np.isfinite(np.asarray(got2)))
    assert np.isfinite(float(aux2))
