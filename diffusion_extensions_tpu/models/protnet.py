"""Protein docking denoiser (reference ``ProtNet``, ``models.py:213-319``).

Operates on the padded/masked ``ProtBatch`` (static shapes — TPU-friendly
replacement for the reference's per-forward ``pad_sequence`` of ragged
tensors, ``models.py:277-308``).

Reference quirks handled explicitly:
* the reference instantiates ``lig_tf`` but encodes the ligand through
  ``rec_tf`` (``models.py:258,308``) — reproduce with
  ``share_encoders=True`` (default, matching observed behavior); set False
  for the presumably-intended separate encoders.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.se3 import AffineGrad, ProtData
from .layers import (
    PoolFrame,
    PoolPos,
    PoolRN,
    Siren,
    SinusoidalPosEmb,
    TransformerCrossLayer,
    TransformerEncoder,
)
from .projections import ProtBatch

__all__ = ["ProtNet", "RES_COUNT", "UNIQUE_RESIDUES", "receptor_moment_frame"]

# reference: prot_util.py:11-40
UNIQUE_RESIDUES = [
    "ALA", "CYS", "ASP", "GLU", "PHE", "GLY", "HIS", "ILE", "LYS", "LEU",
    "MET", "ASN", "PRO", "GLN", "ARG", "SER", "THR", "VAL", "TRP", "TYR",
    "---",  # unknown / padding
]
RES_COUNT = len(UNIQUE_RESIDUES)


class _Conv3(nn.Module):
    """Width-3 SAME 1-D convolution expressed as one MXU matmul.

    ``y[l] = concat(x[l-1], x[l], x[l+1]) @ W + b`` with zero edge padding
    — bit-for-bit the same math as ``nn.Conv(kernel_size=(3,), "SAME")``
    with the kernel reshaped ``(3, Cin, Cout) -> (3*Cin, Cout)``, but
    lowered by XLA as a single ``(B*L, 3*Cin) x (3*Cin, Cout)`` dot
    instead of a convolution primitive.  Measured on the protein train
    step (v5e, reference config): XLA's conv lowering for these short
    sequences runs at ~49 TFLOP/s bf16 while the equivalent dot runs at
    encoder speed (~130) — see BENCHMARKS.md round-4 protein roofline.

    Param shape stays ``kernel (3, Cin, Cout)`` so nn.Conv checkpoints
    load unchanged."""

    features: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "matmul"  # "matmul" (one 3*Cin dot) | "sum3" (3 dots summed)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, L, Cin)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if self.impl == "sum3":
            # y[l] = x[l-1]@k0 + x[l]@k1 + x[l+1]@k2: no (B, L, 3*Cin)
            # concat materialized; XLA emits three K=Cin dots over the
            # same activation buffer and fuses the adds
            y = x @ k[1]
            y = y.at[..., 1:, :].add(x[..., :-1, :] @ k[0])
            y = y.at[..., :-1, :].add(x[..., 1:, :] @ k[2])
            return y + bias.astype(self.dtype)
        zeros = jnp.zeros_like(x[..., :1, :])
        shifted = jnp.concatenate(
            [
                jnp.concatenate([zeros, x[..., :-1, :]], axis=-2),
                x,
                jnp.concatenate([x[..., 1:, :], zeros], axis=-2),
            ],
            axis=-1,
        )  # (B, L, 3*Cin)
        w = kernel.reshape(3 * cin, self.features).astype(self.dtype)
        return shifted @ w + bias.astype(self.dtype)


class _ResConv(nn.Module):
    """1-D conv residue embedding block (reference: ``models.py:227-257``):
    res_count -> dim, (c_depth-2) residual conv+SiLU blocks, dim -> res_dim.

    ``dtype``: activation dtype for the convs.  At the reference config
    (c_depth 8, dim 1024) this stack is ~16% of the train step's FLOPs;
    running it f32 while the encoders run bf16 costs ~2x on those FLOPs
    on the MXU (measured round-4 MFU work, BENCHMARKS.md protein roofline).
    Params stay f32; the output is cast back to f32 for the concat.

    ``impl``: "matmul" (default) lowers each width-3 conv as one MXU dot
    via ``_Conv3``; "xla_conv" keeps the ``nn.Conv`` lowering for A/B.
    Both share the same param tree (names and shapes)."""

    dim: int
    res_dim: int
    c_depth: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "matmul"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, L, RES_COUNT)
        names = iter(f"Conv_{i}" for i in range(self.c_depth))
        if self.impl in ("matmul", "sum3"):
            # explicit names keep the param tree identical to the nn.Conv
            # path ("Conv_i/kernel|bias", kernel (3, Cin, Cout))
            conv = lambda feats: _Conv3(feats, dtype=self.dtype,
                                        impl=self.impl, name=next(names))
        else:
            conv = lambda feats: nn.Conv(
                feats, kernel_size=(3,), padding="SAME", dtype=self.dtype,
                name=next(names),
            )
        h = nn.silu(conv(self.dim)(x))
        for _ in range(self.c_depth - 2):
            h = h + nn.silu(conv(self.dim)(h))
        out = conv(self.res_dim)(h)
        return out.astype(jnp.float32)


def receptor_moment_frame(w: jax.Array, positions: jax.Array,
                          mask: jax.Array, delta: float = 1e-3) -> jax.Array:
    """Equivariant receptor frame from position moments.

    ``w``: (B, L, 2) non-negative gate weights (already masked or not —
    masking is applied here); ``positions``: (B, L, 3); ``mask``: (B, L).
    Returns (B, 3, 3) with rows forming a right-handed orthonormal-ish
    frame C @ R^T that co-rotates with any global rotation of the
    positions and ignores global translation.

    Robustness (measured failure modes):
    * gated means of CENTRED positions vanish for near-uniform gates (the
      centroid is subtracted), so each vector is anchored by a gate-free
      odd moment that is O(1) after radius normalisation — the third
      moment sum(d * |d|^2) and the sequence cross-moment
      sum(d_l x d_{l+1}) (both equivariant; the cross moment needs
      det R = +1, true for rotations) — with the learnable gated moments
      added on top;
    * hard Gram-Schmidt normalisation has 1/|v| gradients at small |v|
      (NaN at bf16 scale within 500 steps, measured), so normalisation is
      softened with ``delta``.
    """
    rm = mask[..., None].astype(positions.dtype)  # (B, L, 1)
    denom = jnp.maximum(jnp.sum(rm, axis=-2), 1.0)  # (B, 1)
    cen = jnp.sum(positions * rm, axis=-2) / denom
    d = (positions - cen[..., None, :]) * rm
    msq = jnp.sum(jnp.sum(d * d, axis=-1), axis=-1) / denom[..., 0]
    radius = jnp.sqrt(jnp.maximum(msq, 1e-12))  # (B,)
    dn = d / radius[..., None, None]

    sq = jnp.sum(dn * dn, axis=-1, keepdims=True)
    m3 = jnp.sum(dn * sq, axis=-2) / denom  # (B, 3) third moment
    pair = (rm[..., :-1, :] * rm[..., 1:, :])
    cross = jnp.sum(
        jnp.cross(dn[..., :-1, :], dn[..., 1:, :]) * pair, axis=-2
    ) / denom  # (B, 3) sequence cross moment

    w = w * rm  # (B, L, 2)
    w_sum = jnp.maximum(jnp.sum(w, axis=-2), 1e-6)  # (B, 2)
    g = jnp.einsum("...lh,...ld->...hd", w, dn) / w_sum[..., None]
    v1 = m3 + g[..., 0, :]
    v2 = cross + g[..., 1, :]

    def soft_norm(v):
        return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + delta**2)

    b1 = soft_norm(v1)
    b2 = soft_norm(v2 - jnp.sum(b1 * v2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


class ProtNet(nn.Module):
    """(ProtBatch, t) -> AffineGrad (se3=True) or raw 6-vector."""

    dim: int = 64
    heads: int = 4
    t_depth: int = 4
    c_depth: int = 3
    se3: bool = True
    share_encoders: bool = True
    dropout: float = 0.0
    bf16: bool = False
    # add gated frame-matrix pooling to the readout (PoolFrame): gives the
    # head a direct orientation observable — without it the rotation block
    # is unlearnable in practice (see PoolFrame docstring); off by default
    # for reference parity
    frame_pool: bool = False
    # receptor<->ligand cross-attention rounds after the self-attention
    # encoders (TransformerCrossLayer): lets tokens of each chain compare
    # against the other chain before the pooling bottleneck — required for
    # the bilinear rotation comparison under Haar augmentation (measured:
    # BENCHMARKS.md protein probe table); 0 = off, reference parity
    cross_depth: int = 0
    # append the bilinear relative-frame readout P_lig @ P_rec^T of the
    # gated-pooled frame matrices.  Frames transform as F @ R^T
    # (projections.py:74), so for pooled frames P = C R_a^T (receptor) and
    # P = C' R_a^T R_n^T (ligand, R_n = diffusion noise about the
    # centroid), the product C' R_a^T R_n^T R_a C^T exposes the noise
    # rotation conjugated by the (observable) augmentation — the exact
    # R_rec^T R_lig observable the rotation target needs; off by default
    rel_frame: bool = False
    # receptor-frame-EQUIVARIANT output head: estimate the augmentation
    # rotation from two gated position-moment vectors of the receptor
    # (gated means of centroid-centred positions — equivariant row vectors
    # v_i' = v_i R_aug^T under a global rotation, and large/well-
    # conditioned for any non-spherical receptor, unlike pooled FRAME
    # matrices whose mean over randomly-oriented residues collapses
    # toward zero — measured: the frame-matrix variant trained at the
    # zero-predictor).  Gram-Schmidt of (v1, v2) gives
    # Rhat = C @ R_aug^T for a fixed C; the head emits
    # out_world = Rhat^T @ out_local.  The world-frame targets are
    # log(R_noise)/eps and shift/(eps*scale); in this parameterisation the
    # learnable map (features -> out_local) is the SAME function for every
    # augmentation R_aug — i.e. the Haar-augmented task reduces to the
    # canonical-pose task the round-2 frame-pool arm already solved
    # (BENCHMARKS.md protein section).  Off by default
    equiv_head: bool = False
    # run receptor+ligand through ONE encoder call with a block-diagonal
    # attention mask instead of two calls (only meaningful with
    # share_encoders, where it is the same function: per-token FFN/LN are
    # position-independent and the block mask reproduces the two separate
    # attentions exactly — parity-tested).  One (B*(Lr+Ll), dim) matmul
    # batch feeds the MXU better than (B*Lr)+(B*Ll) halves and halves the
    # number of encoder dispatches; the extra masked cross-chain attention
    # scores are noise-level FLOPs at these lengths.  On by default
    fuse_chains: bool = True
    # fused single-(dim, 3*dim) QKV projection in the self-attention
    # (FusedSelfAttention); measured per-config — see
    # TransformerEncoderLayer docstring
    fused_qkv: bool = False
    # residue-conv lowering: "xla_conv" (default) keeps the nn.Conv
    # lowering — measured +4% end-to-end over the "matmul" _Conv3 dot at
    # batch 16 (BENCHMARKS.md protein roofline A/B, r4c).  Same param
    # tree either way — see _ResConv
    conv_impl: str = "xla_conv"

    @nn.compact
    def __call__(self, x: ProtBatch, t: jax.Array, deterministic: bool = True):
        dim = self.dim
        pos_dim = dim // 2
        ang_dim = dim // 4
        res_dim = dim - (pos_dim + ang_dim)
        act_dtype = jnp.bfloat16 if self.bf16 else jnp.float32

        time_embed = SinusoidalPosEmb(dim)(t)  # (B, dim)
        pos_emb = Siren(pos_dim, scale=0.1)
        ang_emb = Siren(ang_dim)
        res_conv = _ResConv(dim, res_dim, self.c_depth, dtype=act_dtype,
                            impl=self.conv_impl)
        rec_tf = TransformerEncoder(
            dim, self.heads, self.t_depth, dropout=self.dropout,
            final_norm=True, dtype=act_dtype, fused_qkv=self.fused_qkv,
        )
        lig_tf = rec_tf if self.share_encoders else TransformerEncoder(
            dim, self.heads, self.t_depth, dropout=self.dropout,
            final_norm=True, dtype=act_dtype, fused_qkv=self.fused_qkv,
        )

        def embed(prot: ProtData) -> jax.Array:
            # per-chain token embedding; the residue conv is k=3 over the
            # sequence, so chains must NOT be concatenated before it
            ang_flat = prot.angles.reshape(*prot.angles.shape[:-2], 9)
            return jnp.concatenate(
                (
                    res_conv(prot.residues),
                    pos_emb(prot.positions),
                    ang_emb(ang_flat),
                ),
                axis=-1,
            )  # (B, L, dim)

        r_feats = embed(x.receptor)
        l_feats = embed(x.ligand)
        if self.share_encoders and self.fuse_chains:
            # one encoder pass over both chains, block-diagonal attention
            lr, ll = r_feats.shape[1], l_feats.shape[1]
            feats = jnp.concatenate((r_feats, l_feats), axis=1)
            valid = jnp.concatenate(
                (x.receptor_mask, x.ligand_mask), axis=1
            )  # (B, Lr+Ll)
            seg = jnp.concatenate(
                (jnp.zeros((lr,), jnp.int32), jnp.ones((ll,), jnp.int32))
            )
            block = seg[None, :] == seg[:, None]  # (L, L) static
            attn_mask = block[None, None] & valid[:, None, None, :]
            out = rec_tf(
                feats, deterministic=deterministic, attn_mask=attn_mask
            ).astype(jnp.float32)
            r_out, l_out = out[:, :lr], out[:, lr:]
        else:
            r_out = rec_tf(
                r_feats, key_padding_mask=x.receptor_mask,
                deterministic=deterministic,
            ).astype(jnp.float32)
            l_out = lig_tf(
                l_feats, key_padding_mask=x.ligand_mask,
                deterministic=deterministic,
            ).astype(jnp.float32)

        # bidirectional co-attention: both updates read the PRE-round
        # tensors, then swap in together
        for _ in range(self.cross_depth):
            r_new = TransformerCrossLayer(
                dim, self.heads, dropout=self.dropout, dtype=act_dtype
            )(r_out, l_out, x.ligand_mask, deterministic=deterministic)
            l_new = TransformerCrossLayer(
                dim, self.heads, dropout=self.dropout, dtype=act_dtype
            )(l_out, r_out, x.receptor_mask, deterministic=deterministic)
            r_out, l_out = r_new, l_new

        r_pool = PoolRN(dim)(r_out, x.receptor_mask)
        r_pos = PoolPos()(r_out, x.receptor.positions, x.receptor_mask)
        l_pool = PoolRN(dim)(l_out, x.ligand_mask)
        l_pos = PoolPos()(l_out, x.ligand.positions, x.ligand_mask)

        rhat = None
        if self.equiv_head:
            wg = nn.sigmoid(nn.Dense(2)(r_out))  # (B, L, 2) moment gates
            rhat = receptor_moment_frame(
                wg, x.receptor.positions, x.receptor_mask
            )  # = C @ R_aug^T (see receptor_moment_frame docstring)

        pieces = [time_embed, r_pool, r_pos, l_pool, l_pos]
        if rhat is not None:
            # localized observables: rotate the pooled positions (relative
            # to the receptor centroid) and pooled frames into the
            # estimated frame — these are (approximately) invariant to the
            # Haar augmentation, so the head MLP's feature -> out_local
            # map is the same function the canonical-pose task needs
            rmsk = x.receptor_mask[..., None].astype(jnp.float32)
            cen = jnp.sum(x.receptor.positions * rmsk, axis=-2) / jnp.maximum(
                jnp.sum(rmsk, axis=-2), 1.0
            )
            loc = lambda p: jnp.einsum("...ij,...j->...i", rhat, p - cen)
            pieces.append(loc(r_pos))
            pieces.append(loc(l_pos))
        if self.frame_pool or self.rel_frame or rhat is not None:
            rf = PoolFrame()(r_out, x.receptor.angles, x.receptor_mask)
            lf = PoolFrame()(l_out, x.ligand.angles, x.ligand_mask)
            if self.frame_pool:
                pieces.append(rf)
                pieces.append(lf)
            if self.rel_frame:
                h = rf.shape[-1] // 9
                rm = rf.reshape(*rf.shape[:-1], h, 3, 3)
                lm = lf.reshape(*lf.shape[:-1], h, 3, 3)
                rel = jnp.einsum("...hij,...hkj->...hik", lm, rm)
                pieces.append(rel.reshape(*rel.shape[:-3], h * 9))
            if rhat is not None:
                # pooled frames rotated into the estimated frame:
                # lf @ rhat^T = C_l (R_a^T R_n^T R_a) C^T exposes the
                # conjugated noise rotation as an invariant observable
                h = rf.shape[-1] // 9
                rm = rf.reshape(*rf.shape[:-1], h, 3, 3)
                lm = lf.reshape(*lf.shape[:-1], h, 3, 3)
                rt = jnp.swapaxes(rhat, -1, -2)[..., None, :, :]
                lf_loc = jnp.matmul(lm, rt)
                rf_loc = jnp.matmul(rm, rt)
                pieces.append(lf_loc.reshape(*lf_loc.shape[:-3], h * 9))
                pieces.append(rf_loc.reshape(*rf_loc.shape[:-3], h * 9))
        pool = jnp.concatenate(pieces, axis=-1)  # (B, 3*dim + 6 [+ 72])
        h = nn.silu(nn.Dense(dim)(pool))
        for _ in range(3):
            h = h + nn.silu(nn.Dense(dim)(h))
        out = nn.Dense(6)(h)
        if rhat is not None:
            rot = jnp.einsum("...ji,...j->...i", rhat, out[..., :3])
            shf = jnp.einsum("...ji,...j->...i", rhat, out[..., 3:])
            out = jnp.concatenate([rot, shf], axis=-1)
        if self.se3:
            return AffineGrad(rot_g=out[..., :3], shift_g=out[..., 3:])
        return out
