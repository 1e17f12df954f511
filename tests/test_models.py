"""Shape/behavior tests for the denoiser models."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_extensions_tpu.models import (
    CoordConv,
    EulerRotPredict,
    PlaneNet,
    PointCloudProj,
    ProtBatch,
    ProtNet,
    ProtProjection,
    RES_COUNT,
    RotPredict,
    move_prot_batch,
)
from diffusion_extensions_tpu.ops.se3 import AffineGrad, AffineT, ProtData
from diffusion_extensions_tpu.ops.so3 import exp_skewvec, euler_to_rmat


def test_rot_predict_shapes():
    m = RotPredict(out_type="skewvec")
    x = jnp.zeros((8, 3, 3))
    t = jnp.zeros((8,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (8, 3)
    m2 = RotPredict(out_type="rotmat")
    p2 = m2.init(jax.random.PRNGKey(0), x, t)
    out2 = m2.apply(p2, x, t)
    assert out2.shape == (8, 3, 3)
    # rotmat output is a valid rotation (Gram-Schmidt)
    eye = jnp.broadcast_to(jnp.eye(3), out2.shape)
    np.testing.assert_allclose(
        jnp.matmul(out2, jnp.swapaxes(out2, -1, -2),
                   precision=jax.lax.Precision.HIGHEST),
        eye, atol=1e-5,
    )


def test_rot_predict_resnet_variant():
    m = RotPredict(d_model=255, out_type="skewvec", variant="resnet")
    x = jnp.zeros((4, 3, 3))
    t = jnp.zeros((4,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t)
    assert m.apply(params, x, t).shape == (4, 3)


def test_euler_rot_predict():
    m = EulerRotPredict()
    x = jnp.zeros((4, 3))
    t = jnp.zeros((4,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t)
    assert m.apply(params, x, t).shape == (4, 3)


@pytest.mark.slow
def test_planenet_forward_and_grad():
    m = PlaneNet(dim=64, heads=2, layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
    t = jnp.asarray([3, 500], dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(1), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 3)

    def loss(p):
        return jnp.sum(m.apply(p, x, t) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_planenet_bf16_path():
    m = PlaneNet(dim=64, heads=2, layers=2, bf16=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(1), x, t)
    out = m.apply(params, x, t)
    assert out.dtype == jnp.float32  # head stays f32
    assert np.isfinite(np.asarray(out)).all()


def test_point_cloud_proj():
    data = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 3))
    proj = PointCloudProj(data, so3=True)
    r = exp_skewvec(jax.random.normal(jax.random.PRNGKey(1), (4, 3)))
    out = proj(r)
    assert out.shape == (4, 16, 3)
    # rotating by R then un-rotating returns the data
    back = PointCloudProj(out, so3=True)(jnp.swapaxes(r, -1, -2))
    np.testing.assert_allclose(back, data, atol=1e-5)
    # euler variant consistency
    eul = jax.random.uniform(jax.random.PRNGKey(2), (4, 3), minval=-1, maxval=1)
    out_e = PointCloudProj(data, so3=False)(eul)
    r_e = euler_to_rmat(eul[..., 0], eul[..., 1], eul[..., 2])
    np.testing.assert_allclose(out_e, PointCloudProj(data, so3=True)(r_e), atol=1e-5)


def _fake_prot_batch(key, b=2, lr=24, ll=16):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    def mk(k, l):
        res = jax.nn.one_hot(
            jax.random.randint(k, (b, l), 0, RES_COUNT - 1), RES_COUNT
        )
        pos = jax.random.normal(jax.random.fold_in(k, 1), (b, l, 3)) * 10
        ang = exp_skewvec(jax.random.normal(jax.random.fold_in(k, 2), (b, l, 3)))
        return ProtData(res, pos, ang)
    rec, lig = mk(k1, lr), mk(k2, ll)
    r_mask = jnp.arange(lr)[None, :] < jnp.asarray([[lr], [lr - 5]])
    l_mask = jnp.arange(ll)[None, :] < jnp.asarray([[ll], [ll - 3]])
    return ProtBatch(rec, lig, r_mask, l_mask)


def test_protnet_forward():
    batch = _fake_prot_batch(jax.random.PRNGKey(0))
    m = ProtNet(dim=32, heads=2, t_depth=2, c_depth=3, se3=True)
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(1), batch, t)
    out = m.apply(params, batch, t)
    assert isinstance(out, AffineGrad)
    assert out.rot_g.shape == (2, 3)
    assert out.shift_g.shape == (2, 3)
    # euler variant returns raw 6-vector
    m2 = ProtNet(dim=32, heads=2, t_depth=2, c_depth=3, se3=False)
    p2 = m2.init(jax.random.PRNGKey(1), batch, t)
    assert m2.apply(p2, batch, t).shape == (2, 6)


def test_protnet_mask_invariance():
    """Padding content must not affect the output."""
    batch = _fake_prot_batch(jax.random.PRNGKey(0))
    m = ProtNet(dim=32, heads=2, t_depth=2, c_depth=3)
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(1), batch, t)
    out1 = m.apply(params, batch, t)

    # scramble padded ligand positions only (mask False region)
    lig = batch.ligand
    pad = ~batch.ligand_mask
    noised_pos = lig.positions + pad[..., None] * 100.0
    batch2 = ProtBatch(
        batch.receptor,
        ProtData(lig.residues, noised_pos, lig.angles),
        batch.receptor_mask,
        batch.ligand_mask,
    )
    out2 = m.apply(params, batch2, t)
    # NOTE: conv over residues leaks 2 tokens across the mask boundary
    # (kernel 3, two conv stacks) like the reference's Conv1d on padded
    # sequences; positions/angles paths must be exactly masked.
    np.testing.assert_allclose(out1.rot_g, out2.rot_g, atol=1e-4)
    np.testing.assert_allclose(out1.shift_g, out2.shift_g, atol=1e-4)


def test_protnet_fused_chain_pass_matches_two_pass():
    """The round-4 fused receptor+ligand encoder pass (one call, block-
    diagonal attention mask) is the SAME function as the two separate
    calls when the encoders share weights: identical param tree, outputs
    equal up to reduction order."""
    batch = _fake_prot_batch(jax.random.PRNGKey(0))
    t = jnp.zeros((2,), dtype=jnp.int32)
    kw = dict(dim=32, heads=2, t_depth=2, c_depth=3, se3=True,
              share_encoders=True)
    m_fused = ProtNet(fuse_chains=True, **kw)
    m_two = ProtNet(fuse_chains=False, **kw)
    params = m_fused.init(jax.random.PRNGKey(1), batch, t)
    # same param tree: the two-pass model must accept the fused one's params
    out_f = m_fused.apply(params, batch, t)
    out_t = m_two.apply(params, batch, t)
    np.testing.assert_allclose(out_f.rot_g, out_t.rot_g, atol=2e-5)
    np.testing.assert_allclose(out_f.shift_g, out_t.shift_g, atol=2e-5)


def test_protnet_fused_chain_pass_no_cross_leakage():
    """With the block-diagonal mask, receptor ENCODER tokens must be
    independent of ligand content (the chains only meet at the pooled
    readout).  Compare rot/shift heads on a batch whose ligand VALID
    tokens are replaced: outputs must differ (ligand pools see it) while
    a receptor-only readout probe stays fixed — probed indirectly by
    checking the fused pass on (rec, ligA) vs (rec, ligB) equals the
    two-pass encoder's behavior on the same inputs."""
    batch_a = _fake_prot_batch(jax.random.PRNGKey(0))
    batch_b_src = _fake_prot_batch(jax.random.PRNGKey(7))
    batch_b = ProtBatch(
        batch_a.receptor, batch_b_src.ligand,
        batch_a.receptor_mask, batch_a.ligand_mask,
    )
    t = jnp.zeros((2,), dtype=jnp.int32)
    kw = dict(dim=32, heads=2, t_depth=2, c_depth=3, se3=True)
    m_fused = ProtNet(fuse_chains=True, **kw)
    m_two = ProtNet(fuse_chains=False, **kw)
    params = m_fused.init(jax.random.PRNGKey(1), batch_a, t)
    # the fused pass must track the two-pass function on BOTH inputs —
    # if ligand tokens leaked into receptor attention, outputs would
    # diverge on batch_b where only the ligand changed
    for b in (batch_a, batch_b):
        f, s = m_fused.apply(params, b, t), m_two.apply(params, b, t)
        np.testing.assert_allclose(f.rot_g, s.rot_g, atol=2e-5)
        np.testing.assert_allclose(f.shift_g, s.shift_g, atol=2e-5)


@pytest.mark.slow
def test_protnet_fused_qkv_and_bf16_conv_paths_run():
    """Smoke: the fused-QKV attention variant and the bf16 conv stack
    compile and produce finite outputs/grads."""
    batch = _fake_prot_batch(jax.random.PRNGKey(2))
    t = jnp.zeros((2,), dtype=jnp.int32)
    m = ProtNet(dim=32, heads=2, t_depth=2, c_depth=3, se3=True,
                bf16=True, fused_qkv=True)
    params = m.init(jax.random.PRNGKey(1), batch, t)

    def loss(p):
        out = m.apply(p, batch, t)
        return (out.rot_g ** 2).mean() + (out.shift_g ** 2).mean()

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(
        bool(jnp.isfinite(g).all())
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_move_prot_batch_roundtrip():
    batch = _fake_prot_batch(jax.random.PRNGKey(3))
    rot = exp_skewvec(jax.random.normal(jax.random.PRNGKey(4), (2, 3)))
    shift = jax.random.normal(jax.random.PRNGKey(5), (2, 3))
    tf = AffineT(rot, shift)
    moved = move_prot_batch(tf, batch.ligand, batch.ligand_mask)
    inv = AffineT(jnp.swapaxes(rot, -1, -2), -shift)
    # moving back about the *moved* centroid is not the exact inverse, so
    # verify algebraically instead: distances to centroid are preserved.
    m = batch.ligand_mask[..., None].astype(jnp.float32)
    def centroid(p):
        return jnp.sum(p * m, axis=-2, keepdims=True) / jnp.sum(m, axis=-2, keepdims=True)
    d0 = jnp.linalg.norm(batch.ligand.positions - centroid(batch.ligand.positions), axis=-1)
    d1 = jnp.linalg.norm(moved.positions - centroid(moved.positions), axis=-1)
    np.testing.assert_allclose(
        jnp.where(batch.ligand_mask, d0, 0.0),
        jnp.where(batch.ligand_mask, d1, 0.0),
        atol=1e-3,
    )
    # frames rotate: angles @ R^T
    np.testing.assert_allclose(
        moved.angles,
        jnp.matmul(batch.ligand.angles, jnp.swapaxes(rot, -1, -2)[:, None],
                   precision=jax.lax.Precision.HIGHEST),
        atol=1e-5,
    )


def test_prot_projection_se3_and_euler():
    batch = _fake_prot_batch(jax.random.PRNGKey(6))
    proj = ProtProjection(batch, se3=True)
    rot = exp_skewvec(jax.random.normal(jax.random.PRNGKey(7), (2, 3)))
    tf = AffineT(rot, jnp.zeros((2, 3)))
    out = proj(tf)
    assert isinstance(out, ProtBatch)
    # receptor untouched
    np.testing.assert_array_equal(out.receptor.positions, batch.receptor.positions)
    proj_e = ProtProjection(batch, se3=False)
    out_e = proj_e(jnp.zeros((2, 6)))
    # identity transform: ligand unchanged
    np.testing.assert_allclose(out_e.ligand.positions, batch.ligand.positions, atol=1e-5)


def test_coordconv():
    m = CoordConv(size=128)
    x = jnp.zeros((2, 128, 128, 3))
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 2)


def test_protnet_frame_pool_orientation_sensitivity():
    """PoolFrame readout: rotating the ligand about its centroid must change
    the rotation head's output (with the reference readout the weighted mean
    position is invariant to centroid rotations, which is why the parity
    model never learns the rotation block — see PoolFrame docstring)."""
    from diffusion_extensions_tpu.models.projections import move_prot_batch
    from diffusion_extensions_tpu.ops.se3 import AffineT

    batch = _fake_prot_batch(jax.random.PRNGKey(0))
    m = ProtNet(dim=32, heads=2, t_depth=2, c_depth=3, se3=True,
                frame_pool=True)
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(1), batch, t)
    out0 = m.apply(params, batch, t)

    rot = exp_skewvec(jnp.broadcast_to(jnp.asarray([0.0, 1.2, 0.0]), (2, 3)))
    moved = move_prot_batch(
        AffineT(rot, jnp.zeros((2, 3))), batch.ligand, batch.ligand_mask
    )
    batch_rot = ProtBatch(
        batch.receptor, moved, batch.receptor_mask, batch.ligand_mask
    )
    out1 = m.apply(params, batch_rot, t)
    assert float(jnp.max(jnp.abs(out0.rot_g - out1.rot_g))) > 1e-4


def test_pool_frame_uniform_weights_is_masked_mean():
    from diffusion_extensions_tpu.models.layers import PoolFrame

    x = jnp.zeros((2, 7, 8))  # zero features -> all sigmoid gates = 0.5
    frames = exp_skewvec(jax.random.normal(jax.random.PRNGKey(3), (2, 7, 3)))
    mask = jnp.arange(7)[None, :] < jnp.asarray([[7], [4]])
    pf = PoolFrame(heads=2)
    params = pf.init(jax.random.PRNGKey(4), x, frames, mask)
    out = pf.apply(params, x, frames, mask)
    assert out.shape == (2, 18)
    m = mask[..., None].astype(jnp.float32)
    want = (frames.reshape(2, 7, 9) * m).sum(1) / m.sum(1)
    # both heads gate uniformly (zero features), so each equals the mean
    assert jnp.allclose(out[:, :9], want, atol=1e-5)
    assert jnp.allclose(out[:, 9:], want, atol=1e-5)


def test_protnet_cross_attention_forward_and_mask():
    """cross_depth > 0: forward works and padded tokens of the *other* chain
    cannot leak through the cross-attention (ctx mask correctness)."""
    batch = _fake_prot_batch(jax.random.PRNGKey(0))
    m = ProtNet(dim=32, heads=2, t_depth=1, c_depth=3, se3=True,
                cross_depth=2, frame_pool=True, rel_frame=True)
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(1), batch, t)
    out1 = m.apply(params, batch, t)
    assert out1.rot_g.shape == (2, 3)

    # scramble padded ligand positions AND angles (mask False region); the
    # receptor tokens cross-attend to ligand tokens, so a mask bug in the
    # cross layer would change the output
    lig = batch.ligand
    pad = (~batch.ligand_mask)[..., None]
    batch2 = ProtBatch(
        batch.receptor,
        ProtData(
            lig.residues,
            lig.positions + pad * 100.0,
            lig.angles + pad[..., None] * 3.0,
        ),
        batch.receptor_mask,
        batch.ligand_mask,
    )
    out2 = m.apply(params, batch2, t)
    # conv-over-residues leaks 2 tokens across the boundary (see
    # test_protnet_mask_invariance); positions/angles paths must be masked
    np.testing.assert_allclose(out1.rot_g, out2.rot_g, atol=1e-4)
    np.testing.assert_allclose(out1.shift_g, out2.shift_g, atol=1e-4)


def test_protnet_rel_frame_rotation_sensitivity():
    """The bilinear relative-frame readout must react to a centroid rotation
    of the ligand (the observable the augmented rotation target needs)."""
    from diffusion_extensions_tpu.models.projections import move_prot_batch
    from diffusion_extensions_tpu.ops.se3 import AffineT

    batch = _fake_prot_batch(jax.random.PRNGKey(0))
    m = ProtNet(dim=32, heads=2, t_depth=1, c_depth=3, se3=True,
                cross_depth=1, rel_frame=True)
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(1), batch, t)
    out0 = m.apply(params, batch, t)

    rot = exp_skewvec(jnp.broadcast_to(jnp.asarray([0.0, 1.2, 0.0]), (2, 3)))
    moved = move_prot_batch(
        AffineT(rot, jnp.zeros((2, 3))), batch.ligand, batch.ligand_mask
    )
    out1 = m.apply(
        params,
        ProtBatch(batch.receptor, moved, batch.receptor_mask,
                  batch.ligand_mask),
        t,
    )
    assert float(jnp.max(jnp.abs(out0.rot_g - out1.rot_g))) > 1e-4


def test_equiv_head_frame_algebra():
    """The Gram-Schmidt receptor-frame estimate transforms correctly:
    rows of P are R_aug-rotated canonical vectors (frames transform as
    F @ R^T, projections.py:74), so rhat(P @ Rg^T) == rhat(P) @ Rg^T and
    rhat^T u picks up the rotation on the left — the property that makes
    the equivariant head's learnable map augmentation-independent."""
    from diffusion_extensions_tpu.ops.so3 import (
        exp_skewvec as exps, rmat2six, six2rmat,
    )

    key = jax.random.PRNGKey(0)
    P = jax.random.normal(key, (5, 3, 3))
    Rg = exps(jax.random.normal(jax.random.PRNGKey(1), (5, 3)))
    rhat = six2rmat(rmat2six(P))
    rhat_rot = six2rmat(rmat2six(jnp.matmul(P, jnp.swapaxes(Rg, -1, -2))))
    np.testing.assert_allclose(
        np.asarray(rhat_rot),
        np.asarray(jnp.matmul(rhat, jnp.swapaxes(Rg, -1, -2))),
        atol=1e-5,
    )
    # head output: rhat^T u -> (rhat Rg^T)^T u = Rg rhat^T u
    u = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    out = jnp.einsum("...ji,...j->...i", rhat, u)
    out_rot = jnp.einsum("...ji,...j->...i", rhat_rot, u)
    np.testing.assert_allclose(
        np.asarray(out_rot),
        np.asarray(jnp.einsum("...ij,...j->...i", Rg, out)),
        atol=1e-5,
    )


@pytest.mark.slow
def test_protnet_equiv_head_forward():
    batch = _fake_prot_batch(jax.random.PRNGKey(0))
    m = ProtNet(dim=32, heads=2, t_depth=1, c_depth=3, se3=True,
                cross_depth=1, rel_frame=True, equiv_head=True)
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(1), batch, t)
    out = m.apply(params, batch, t)
    assert out.rot_g.shape == (2, 3) and out.shift_g.shape == (2, 3)
    assert np.isfinite(np.asarray(out.rot_g)).all()
    # gradients flow through the Gram-Schmidt head without NaNs
    def loss(p):
        o = m.apply(p, batch, t)
        return jnp.sum(o.rot_g**2) + jnp.sum(o.shift_g**2)
    g = jax.grad(loss)(params)
    flat = jnp.concatenate([jnp.ravel(x) for x in jax.tree_util.tree_leaves(g)])
    assert np.isfinite(np.asarray(flat)).all()


def test_receptor_moment_frame_equivariance_and_conditioning():
    """The position-moment frame is (a) well-conditioned with uniform
    gates (the degenerate case that broke the frame-matrix and plain
    gated-moment variants), (b) equivariant under a global rotation +
    translation of the positions: rhat' = rhat @ Rg^T."""
    from diffusion_extensions_tpu.models.protnet import receptor_moment_frame

    key = jax.random.PRNGKey(7)
    pos = jax.random.normal(key, (3, 30, 3)) * 8.0
    mask = jnp.arange(30)[None, :] < jnp.asarray([[30], [25], [18]])
    w = jnp.full((3, 30, 2), 0.5)  # uniform gates: worst case

    rhat = receptor_moment_frame(w, pos, mask)
    eye = jnp.broadcast_to(jnp.eye(3), rhat.shape)
    ortho = jnp.matmul(rhat, jnp.swapaxes(rhat, -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(ortho), np.asarray(eye), atol=2e-2)

    Rg = exp_skewvec(jax.random.normal(jax.random.PRNGKey(8), (3, 3)))
    pos_rot = jnp.matmul(pos, jnp.swapaxes(Rg, -1, -2)) + jnp.asarray(
        [5.0, -3.0, 2.0]
    )
    rhat_rot = receptor_moment_frame(w, pos_rot, mask)
    np.testing.assert_allclose(
        np.asarray(rhat_rot),
        np.asarray(jnp.matmul(rhat, jnp.swapaxes(Rg, -1, -2))),
        atol=1e-4,
    )


def test_receptor_moment_frame_degenerate_grads_finite():
    """Perfectly symmetric positions (all moments ~0): the soft
    normalisation must keep gradients finite (the hard-GS variant NaN'd
    within 500 training steps, measured)."""
    from diffusion_extensions_tpu.models.protnet import receptor_moment_frame

    pos = jnp.concatenate([jnp.eye(3), -jnp.eye(3)], axis=0)[None]  # (1,6,3)
    mask = jnp.ones((1, 6), dtype=bool)

    def f(w):
        return jnp.sum(receptor_moment_frame(w, pos, mask) ** 2)

    g = jax.grad(f)(jnp.full((1, 6, 2), 0.5))
    assert np.isfinite(np.asarray(g)).all()


def test_resconv_matmul_matches_xla_conv():
    """_Conv3 (shift-stack matmul lowering) must be numerically the same
    conv as nn.Conv(kernel=3, SAME) — same param tree, same outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_extensions_tpu.models.protnet import _ResConv

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 21))
    mm = _ResConv(32, 8, 4, impl="matmul")
    xc = _ResConv(32, 8, 4, impl="xla_conv")
    params = mm.init(jax.random.PRNGKey(1), x)
    # identical param tree: the xla_conv path must accept the matmul params
    y_mm = mm.apply(params, x)
    y_xc = xc.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_mm), np.asarray(y_xc), rtol=2e-5, atol=2e-5
    )
    # and init from the conv path is interchangeable too
    params_x = xc.init(jax.random.PRNGKey(1), x)
    assert (
        jax.tree_util.tree_structure(params)
        == jax.tree_util.tree_structure(params_x)
    )
    # the sum3 lowering (three K=Cin dots, no concat) is the same conv too
    s3 = _ResConv(32, 8, 4, impl="sum3")
    y_s3 = s3.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_mm), np.asarray(y_s3), rtol=2e-5, atol=2e-5
    )
