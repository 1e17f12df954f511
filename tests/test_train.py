"""Tests for the training runtime and shard_map data parallelism."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from diffusion_extensions_tpu.data.synthetic import (
    sample_lock_batch,
    sample_two_mode_batch,
)
from diffusion_extensions_tpu.models.rot_predict import RotPredict
from diffusion_extensions_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from diffusion_extensions_tpu.processes import SO3Diffusion
from diffusion_extensions_tpu.train import (
    TrainState,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture()
def toy_setup():
    model = RotPredict(d_model=65, out_type="skewvec")
    process = SO3Diffusion.create(100)
    key = jax.random.PRNGKey(0)
    params = model.init(
        key, jnp.zeros((1, 3, 3)), jnp.zeros((1,), jnp.int32)
    )
    tx = optax.adam(1e-3)
    return model, process, params, tx


def test_dp_train_step_runs_and_learns(toy_setup, devices):
    model, process, params, tx = toy_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8

    def loss_fn(p, key, batch):
        return process.loss(lambda x, t: model.apply(p, x, t), key, batch)

    step_fn = make_dp_train_step(loss_fn, tx, mesh)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    data_key = jax.random.PRNGKey(2)
    losses = []
    for i in range(60):
        data_key, k = jax.random.split(data_key)
        batch = shard_batch(sample_two_mode_batch(k, 64), mesh)
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 60
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_dp_matches_single_device(toy_setup):
    """DP over 8 shards must equal a single-device step on the full batch
    (same key tree): gradients are pmean'd, data split is the only diff —
    so compare against a manual single-shard run with per-shard keys."""
    model, process, params, tx = toy_setup
    mesh = make_mesh()

    def loss_fn(p, key, batch):
        return process.loss(lambda x, t: model.apply(p, x, t), key, batch)

    step_fn = make_dp_train_step(loss_fn, tx, mesh, donate=False)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    batch = sample_two_mode_batch(jax.random.PRNGKey(3), 64)
    new_state, metrics = step_fn(state, shard_batch(batch, mesh))

    # manual replica: same key derivation as dp.py
    key = jax.random.fold_in(state.key, state.step)
    step_key, _ = jax.random.split(key)
    shard_losses, shard_grads = [], []
    for idx in range(8):
        local_key = jax.random.fold_in(step_key, idx)
        shard = jax.tree_util.tree_map(lambda x: x[idx * 8 : (idx + 1) * 8], batch)
        l, g = jax.value_and_grad(loss_fn)(state.params, local_key, shard)
        shard_losses.append(l)
        shard_grads.append(g)
    mean_loss = np.mean([float(l) for l in shard_losses])
    np.testing.assert_allclose(float(metrics["loss"]), mean_loss, rtol=1e-5)


def test_dp_steps_per_call(toy_setup):
    """K-fused steps must advance the step counter by K and match the
    sequential K=1 trajectory (same per-step key derivation)."""
    model, process, params, tx = toy_setup
    mesh = make_mesh()

    def loss_fn(p, key, batch):
        return process.loss(lambda x, t: model.apply(p, x, t), key, batch)

    step1 = make_dp_train_step(loss_fn, tx, mesh, donate=False)
    stepK = make_dp_train_step(
        loss_fn, tx, mesh, donate=False, steps_per_call=4
    )
    state_a = TrainState.create(params, tx, jax.random.PRNGKey(1))
    state_b = TrainState.create(params, tx, jax.random.PRNGKey(1))
    batches = [
        sample_two_mode_batch(jax.random.PRNGKey(10 + i), 32) for i in range(4)
    ]
    for b in batches:
        state_a, m_a = step1(state_a, shard_batch(b, mesh))
    state_b, m_b = stepK(state_b, jnp.stack(batches))
    assert int(state_b.step) == 4 == int(state_a.step)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_checkpoint_roundtrip(toy_setup, tmp_path):
    model, process, params, tx = toy_setup
    state = TrainState.create(params, tx, jax.random.PRNGKey(7))
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    ckpt = os.path.join(str(tmp_path), "ck")
    save_checkpoint(ckpt, state)
    fresh = TrainState.create(params, tx, jax.random.PRNGKey(0))
    restored = restore_checkpoint(ckpt, fresh)
    assert int(restored.step) == 42
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_adam_matches_optax_chain():
    """fused_adam must be bit-for-bit Adam: same trajectory as
    optax.chain(clip_by_global_norm, adam) over steps where the clip both
    does and does not trigger, and under a cosine schedule."""
    from diffusion_extensions_tpu.train.optim import make_optimizer

    key = jax.random.PRNGKey(0)
    params = {
        "w": jax.random.normal(key, (37, 19)),
        "b": {"x": jax.random.normal(jax.random.fold_in(key, 1), (19,))},
    }
    for kw in (
        dict(clip=0.0),
        dict(clip=0.05),  # triggers on large grads below
        dict(clip=0.05, schedule="cosine", total_steps=10),
    ):
        tx_ref = make_optimizer(1e-2, impl="optax", **kw)
        tx_fus = make_optimizer(1e-2, impl="fused", **kw)
        s_ref, s_fus = tx_ref.init(params), tx_fus.init(params)
        p_ref = p_fus = params
        for i in range(10):
            g = jax.tree_util.tree_map(
                lambda p, i=i: (0.1 + 10.0 * (i % 2)) * jnp.ones_like(p),
                params,
            )
            u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
            import optax as _optax

            p_ref = _optax.apply_updates(p_ref, u_ref)
            u_fus, s_fus = tx_fus.update(g, s_fus, p_fus)
            p_fus = _optax.apply_updates(p_fus, u_fus)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fus)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7
            )


def test_bf16_state_adam_tracks_f32_and_roundtrips(toy_setup, tmp_path):
    """--opt-state-dtype bf16: moments stored compressed (HBM-bandwidth
    lever, BENCHMARKS.md roofline), math in f32.  The trajectory must
    track the f32-state fused Adam within bf16 quantization tolerance,
    the stored moments must actually BE bf16, and the state must survive
    an orbax save/restore (resume path) with dtypes intact."""
    import optax as _optax

    from diffusion_extensions_tpu.train.optim import make_optimizer

    key = jax.random.PRNGKey(2)
    params = {
        "w": jax.random.normal(key, (23, 11)),
        "b": jax.random.normal(jax.random.fold_in(key, 1), (11,)),
    }
    tx32 = make_optimizer(1e-2, impl="fused")
    tx16 = make_optimizer(1e-2, impl="fused", state_dtype="bf16")
    s32, s16 = tx32.init(params), tx16.init(params)
    for leaf in (*jax.tree_util.tree_leaves(s16.mu),
                 *jax.tree_util.tree_leaves(s16.nu)):
        assert leaf.dtype == jnp.bfloat16
    p32 = p16 = params
    for i in range(20):
        g = jax.tree_util.tree_map(
            lambda p, i=i: jnp.cos(0.3 * i) * 0.5 * jnp.ones_like(p), params
        )
        u32, s32 = tx32.update(g, s32, p32)
        p32 = _optax.apply_updates(p32, u32)
        u16, s16 = tx16.update(g, s16, p16)
        p16 = _optax.apply_updates(p16, u16)
    for a, b in zip(
        jax.tree_util.tree_leaves(p32), jax.tree_util.tree_leaves(p16)
    ):
        # bf16 has ~2^-8 relative resolution on the moments; after 20
        # steps the param trajectories must agree to well under 1%
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=5e-3
        )
    # resume round-trip keeps the compressed dtypes and the trajectory
    model, process, mparams, _ = toy_setup
    state = TrainState.create(mparams, tx16, jax.random.PRNGKey(3))
    g = jax.tree_util.tree_map(
        lambda p: 0.1 * jnp.ones_like(p), mparams
    )
    state = state.apply_gradients(tx16, g, jax.random.PRNGKey(4))
    ckpt = os.path.join(str(tmp_path), "ck_bf16state")
    save_checkpoint(ckpt, state)
    fresh = TrainState.create(mparams, tx16, jax.random.PRNGKey(0))
    restored = restore_checkpoint(ckpt, fresh)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # misuse is rejected: bf16 state needs the fused impl
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_optimizer(1e-2, impl="optax", state_dtype="bf16")


def test_checkpoint_params_only_across_opt_structures(toy_setup, tmp_path):
    """A checkpoint written with a --clip chained optimizer must restore
    into a bare-Adam eval target via params_only (the eval side never
    rebuilds the training stabilizer flags — round-4 queue regression)."""
    from diffusion_extensions_tpu.train.optim import make_optimizer

    model, process, params, _ = toy_setup
    tx_train = make_optimizer(1e-3, clip=1.0)
    state = TrainState.create(params, tx_train, jax.random.PRNGKey(7))
    state = state.replace(step=jnp.asarray(200, jnp.int32))
    ckpt = os.path.join(str(tmp_path), "ck_clip")
    save_checkpoint(ckpt, state)
    eval_target = TrainState.create(
        params, make_optimizer(1e-3), jax.random.PRNGKey(0)
    )
    restored = restore_checkpoint(ckpt, eval_target, params_only=True)
    assert int(restored.step) == 200
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_adam_checkpoint_roundtrip(toy_setup, tmp_path):
    """--opt-impl fused must resume: FusedAdamState (NamedTuple of
    pytrees) survives an orbax save/restore cycle structurally intact."""
    from diffusion_extensions_tpu.train.optim import make_optimizer

    model, process, params, _ = toy_setup
    tx = make_optimizer(1e-3, clip=1.0, impl="fused")
    state = TrainState.create(params, tx, jax.random.PRNGKey(3))
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    state = state.apply_gradients(tx, g, jax.random.PRNGKey(4))
    ckpt = os.path.join(str(tmp_path), "ck_fused")
    save_checkpoint(ckpt, state)
    fresh = TrainState.create(params, tx, jax.random.PRNGKey(0))
    restored = restore_checkpoint(ckpt, fresh)
    assert int(restored.opt_state.count) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and one more step continues identically from the restored state
    s2a = state.apply_gradients(tx, g, jax.random.PRNGKey(5))
    s2b = restored.apply_gradients(tx, g, jax.random.PRNGKey(5))
    for a, b in zip(
        jax.tree_util.tree_leaves(s2a.params),
        jax.tree_util.tree_leaves(s2b.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lock_batch_on_geodesic():
    from diffusion_extensions_tpu.ops.so3 import rotation_angle, rmat_to_euler

    batch = sample_lock_batch(jax.random.PRNGKey(0), 128)
    x, y, z = rmat_to_euler(batch)
    # all rotations are about the y axis: per-element x euler is 0 or +-pi
    # (the xyz decomposition flips x,z by pi when |y| > pi/2)
    ax = np.abs(np.asarray(x))
    assert np.all((ax < 1e-4) | (np.abs(ax - np.pi) < 1e-4))
    ang = np.asarray(rotation_angle(batch))
    assert ang.min() > np.pi / 3 - 1e-4
    assert ang.max() < 2 * np.pi / 3 + 1e-4


def test_dp_skip_nonfinite(devices):
    """skip_nonfinite holds params/optimizer through a NaN step (the
    reference lock trainer's resilience, so3_lock_train.py:83-84) while
    still advancing step/PRNG, and applies finite steps normally."""
    import flax.linen as nn

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(x)

    model = Lin()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    tx = optax.sgd(1e-2)
    mesh = make_mesh()

    def loss_fn(p, key, batch):
        x, poison = batch
        base = jnp.mean(model.apply(p, x) ** 2)
        # poison=1 divides by zero: inf loss, non-finite grads; poison=0
        # leaves the loss untouched (no NaN contamination of the clean path)
        return base / (1.0 - poison[0])

    step_fn = make_dp_train_step(loss_fn, tx, mesh, donate=False,
                                 skip_nonfinite=True)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    x = jnp.ones((8, 4))
    clean = (x, jnp.zeros((8,)))
    poisoned = (x, jnp.ones((8,)))

    s1, m1 = step_fn(state, shard_batch(clean, mesh))
    assert np.isfinite(float(m1["loss"]))
    leaves_before = jax.tree_util.tree_leaves(s1.params)

    s2, m2 = step_fn(s1, shard_batch(poisoned, mesh))
    assert not np.isfinite(float(m2["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(s2.params), leaves_before):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s2.step) == 2  # step/PRNG still advance

    s3, _ = step_fn(s2, shard_batch(clean, mesh))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(s3.params), leaves_before
        )
    )
    assert changed, "finite step after a skipped one must update params"


def test_make_optimizer_default_is_plain_adam(toy_setup, tmp_path):
    """clip=0 + const schedule must keep the exact optax.adam opt-state
    structure so pre-round-4 checkpoints keep restoring."""
    from diffusion_extensions_tpu.train.optim import make_optimizer

    model, process, params, _ = toy_setup
    tx_old = optax.adam(1e-3)
    tx_new = make_optimizer(1e-3)
    s_old = tx_old.init(params)
    s_new = tx_new.init(params)
    assert (
        jax.tree_util.tree_structure(s_old)
        == jax.tree_util.tree_structure(s_new)
    )
    # and a clipped/cosine optimizer still round-trips its own checkpoint
    tx = make_optimizer(1e-3, clip=1.0, schedule="cosine", total_steps=100)
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = state.apply_gradients(tx, grads, jax.random.PRNGKey(1))
    save_checkpoint(str(tmp_path / "ck"), state)
    restored = restore_checkpoint(
        str(tmp_path / "ck"), TrainState.create(params, tx, jax.random.PRNGKey(0))
    )
    assert int(restored.step) == 1
    chex_close = lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6)
    jax.tree_util.tree_map(chex_close, restored.params, state.params)


def test_make_optimizer_clip_and_decay_behave():
    from diffusion_extensions_tpu.train.optim import make_optimizer

    params = {"w": jnp.ones((4,))}
    # clip>0 wraps adam in a chain (observable in the opt-state structure);
    # adam itself is scale-invariant so the clip is only visible upstream
    tx = make_optimizer(1.0, clip=1e-3)
    st = tx.init(params)
    assert len(st) == 2  # (ClipByGlobalNorm EmptyState, adam state)
    upd, _ = tx.update({"w": jnp.full((4,), 1e6)}, st, params)
    assert all(np.isfinite(np.asarray(v)).all() for v in upd.values())
    # cosine schedule: late update is ~final_frac of the early one
    tx = make_optimizer(1.0, schedule="cosine", total_steps=10, final_frac=0.1)
    st = tx.init(params)
    g = {"w": jnp.ones((4,))}
    first = None
    for i in range(10):
        upd, st = tx.update(g, st, params)
        if i == 0:
            first = float(jnp.abs(upd["w"]).max())
    last = float(jnp.abs(upd["w"]).max())
    assert last < 0.2 * first


def test_dp_fused_log_norms_final_substep(toy_setup):
    """With steps_per_call>1 and log_norms, the reported norms must be the
    FINAL fused sub-step's real norms (earlier sub-steps skip the HBM sweep
    via lax.cond), matching the sequential K=1 trajectory's last step."""
    model, process, params, tx = toy_setup
    mesh = make_mesh()

    def loss_fn(p, key, batch):
        return process.loss(lambda x, t: model.apply(p, x, t), key, batch)

    step1 = make_dp_train_step(loss_fn, tx, mesh, donate=False, log_norms=True)
    stepK = make_dp_train_step(
        loss_fn, tx, mesh, donate=False, log_norms=True, steps_per_call=4
    )
    state_a = TrainState.create(params, tx, jax.random.PRNGKey(1))
    state_b = TrainState.create(params, tx, jax.random.PRNGKey(1))
    batches = [
        sample_two_mode_batch(jax.random.PRNGKey(10 + i), 32) for i in range(4)
    ]
    for b in batches:
        state_a, m_a = step1(state_a, shard_batch(b, mesh))
    state_b, m_b = stepK(state_b, jnp.stack(batches))
    assert float(m_b["grad_norm"]) > 0
    assert float(m_b["param_norm"]) > 0
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_a["param_norm"]), float(m_b["param_norm"]), rtol=1e-5
    )


def test_dp_per_layer_norms(toy_setup):
    """per_layer_norms=True segments the grad-norm sweep by top-level
    module: grad_norm/<module> keys exist and their squares sum to the
    global grad_norm squared (same tree, same single sweep)."""
    model, process, params, tx = toy_setup
    mesh = make_mesh()

    def loss_fn(p, key, batch):
        return process.loss(lambda x, t: model.apply(p, x, t), key, batch)

    step_fn = make_dp_train_step(
        loss_fn, tx, mesh, donate=False, log_norms=True, per_layer_norms=True
    )
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    batch = sample_two_mode_batch(jax.random.PRNGKey(3), 32)
    _, metrics = step_fn(state, shard_batch(batch, mesh))
    layer_keys = [k for k in metrics if k.startswith("grad_norm/")]
    assert layer_keys, "expected per-module grad_norm/<module> keys"
    total_sq = sum(float(metrics[k]) ** 2 for k in layer_keys)
    np.testing.assert_allclose(
        total_sq, float(metrics["grad_norm"]) ** 2, rtol=1e-5
    )
