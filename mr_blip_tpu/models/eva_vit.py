"""EVA ViT-g/14 frame encoder (flax linen, TPU-native).

Architecture matches the reference ``lavis/models/eva_vit.py:246-442``
(``create_eva_vit_g``): 39 pre-norm blocks, d=1408, 16 heads (head dim 88),
MLP ratio 4.3637 -> hidden 6144, patch 14, absolute position embeddings,
fused QKV with q/v bias only (k bias fixed at zero), GELU MLP, **no** final
norm — all 257 tokens (cls + 256 patches) are returned for the Q-Former.

TPU-first details: frames are batched as (B*T, H, W, C) NHWC so the patch
conv lowers to one big MXU matmul; compute is bf16 with fp32 LayerNorms;
gradient checkpointing wraps whole blocks via ``nn.remat`` when enabled
(the encoder is frozen in Mr. BLIP finetuning, so remat is off by default).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_blip_tpu.models.layers import Dense, DropPath, LayerNormFP32, Mlp
from mr_blip_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 14
    in_chans: int = 3
    embed_dim: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_hidden_dim: int = 6144
    qkv_bias: bool = True
    drop_rate: float = 0.0
    # Stochastic depth: linear per-block ramp 0 -> drop_path_rate
    # (reference eva_vit.py:290-292 torch.linspace; create_eva_vit_g
    # defaults 0.4, eva_vit.py:415). Training-only (needs a "drop_path"
    # rng and deterministic=False); eval is identity, so parity holds.
    drop_path_rate: float = 0.0
    use_checkpoint: bool = False
    # perf opt-in: tanh-GELU instead of exact erf (breaks bit-parity)
    fast_gelu: bool = False
    # Return the sublane-padded (B, 264, C) token tensor instead of
    # slicing back to 257: consumers that can mask the pad tokens (the
    # Q-Former cross-attention) avoid both the slice copy here and their
    # own 257-row relayouts (6 x 0.84 ms of reshape copies profiled in the
    # Q-Former cross K/V path). int8_matmul mode only.
    keep_padded_tokens: bool = False
    # perf opt-in: W8A8 int8 MXU matmuls (qkv/proj/fc1/fc2) with per-token
    # activation quantization — ~2x the bf16 MLP throughput on v5e
    # (ops/int8_matmul.py). Params use the quantized layout; convert float
    # trees with models/quantize.quantize_vit_params. Inference only.
    int8_matmul: bool = False
    # Run the depth-39 block stack under nn.scan (one compiled block body
    # instead of a program linear in depth — cold compiles drop ~an order
    # of magnitude). Params store per-layer leaves STACKED on a leading
    # axis under "blocks" instead of "blocks_{i}" subtrees; convert with
    # models/scan_utils.{stack,unstack}_vit_blocks.
    scan_layers: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


def eva_vit_g_config(img_size: int = 224, use_checkpoint: bool = False,
                     fast_gelu: bool = False, int8_matmul: bool = False,
                     drop_path_rate: float = 0.0,
                     scan_layers: bool = False) -> ViTConfig:
    """EVA ViT-g/14: mlp_hidden = int(1408 * 4.3637) = 6144 (eva_vit.py:422-428)."""
    return ViTConfig(img_size=img_size, use_checkpoint=use_checkpoint,
                     fast_gelu=fast_gelu, int8_matmul=int8_matmul,
                     drop_path_rate=drop_path_rate, scan_layers=scan_layers)


from mr_blip_tpu.models.layers import QDenseParams as _QDenseParams  # noqa: E402 (moved to layers for T5 reuse)


class Int8Mlp(nn.Module):
    """Fused W8A8 GELU MLP (single Pallas kernel on TPU); optional fused
    pre-LayerNorm (the norm2 pass folds into the kernel's quant step)."""

    hidden_features: int

    @nn.compact
    def __call__(self, x, norm=None, residual=None):
        from mr_blip_tpu.ops.int8_matmul import w8a8_mlp

        d = x.shape[-1]
        w1q, s1, b1 = _QDenseParams(self.hidden_features, d, name="fc1")()
        w2q, s2, b2 = _QDenseParams(d, self.hidden_features, name="fc2")()
        shp = x.shape
        if residual is not None:
            residual = residual.reshape(-1, d)
        y = w8a8_mlp(x.reshape(-1, d), w1q, s1, b1, w2q, s2, b2, norm=norm,
                     residual=residual)
        return y.reshape(shp)


def vit_tiny_config(img_size: int = 28) -> ViTConfig:
    """Tiny config for tests: 2 blocks, d=32."""
    return ViTConfig(
        img_size=img_size, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        mlp_hidden_dim=64,
    )


class ViTAttention(nn.Module):
    """Self-attention; int8 mode takes 2D ``(B*N, C)`` tokens + ``bn``.

    The int8 path keeps activations rank-2 between kernels: 3D<->2D
    reshapes are NOT free on TPU (the tiled (B, 257, C) layout pads the
    257 axis, so every reshape is a relayout copy — profiled at 151 ms/run
    across the 39 blocks before this). Only the attention kernel itself
    sees a 3D view.
    """

    config: ViTConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, bn=None, norm=None, residual=None, n_valid=None):
        cfg = self.config
        if cfg.int8_matmul:
            b, n = bn
            c = x.shape[-1]
        else:
            b, n, c = x.shape
        head_dim = cfg.embed_dim // cfg.num_heads

        if cfg.qkv_bias:
            # EVA quirk: bias on q and v only; k bias is identically zero
            # (eva_vit.py:77-81,124-127).
            q_bias = self.param(
                "q_bias", nn.initializers.zeros, (cfg.embed_dim,), jnp.float32
            )
            v_bias = self.param(
                "v_bias", nn.initializers.zeros, (cfg.embed_dim,), jnp.float32
            )
            qkv_bias = jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias]
            )
        else:
            qkv_bias = None

        if cfg.int8_matmul:
            from mr_blip_tpu.ops.int8_matmul import (
                w8a8_attn_block,
                w8a8_linear,
            )

            wq, sw, _ = _QDenseParams(
                3 * cfg.embed_dim, c, use_bias=False, name="qkv"
            )()
            wqp, swp, pbias = _QDenseParams(cfg.embed_dim, cfg.embed_dim,
                                            name="proj")()
            if (
                jax.default_backend() == "tpu"
                and norm is not None and norm[0] == "ln"
                and residual is not None
                and c == cfg.embed_dim
                and n * 3 * cfg.embed_dim * 2 <= 4 * 1024 * 1024
            ):
                # Fully fused block: LN -> int8 qkv -> attention -> int8
                # proj -> +residual in one Pallas program per image pair —
                # the qkv/attention intermediates never touch HBM
                # (ops/int8_matmul.py::w8a8_attn_block).
                out3 = w8a8_attn_block(
                    x.reshape(b, n, c), wq, sw, qkv_bias, wqp, swp, pbias,
                    norm=norm, num_heads=cfg.num_heads,
                    n_valid=0 if n_valid is None else n_valid,
                )
                return out3.reshape(b * n, cfg.embed_dim)
            qkv = w8a8_linear(x, wq, sw, qkv_bias, norm=norm).reshape(
                b, n, 3 * cfg.embed_dim
            )
        else:
            qkv = Dense(
                3 * cfg.embed_dim,
                use_bias=False,
                compute_dtype=self.compute_dtype,
                name="qkv",
            )(x)
            if qkv_bias is not None:
                qkv = qkv + qkv_bias.astype(qkv.dtype)

        if (
            jax.default_backend() == "tpu"
            and qkv.dtype == jnp.bfloat16
            and n * 3 * cfg.embed_dim * 2 <= 4 * 1024 * 1024
        ):
            # Packed-QKV Pallas path: attention runs straight off the QKV
            # projection output — neither the q/k/v split nor the
            # (B, N, H, D) head transposes (head_dim 88 is not lane-aligned,
            # so those relayout copies cost more than the attention math).
            from mr_blip_tpu.ops.flash_attention import flash_attention_qkv_packed

            out = flash_attention_qkv_packed(qkv, cfg.num_heads,
                                             n_valid=n_valid)
        else:
            qkv = qkv.reshape(b, n, 3, cfg.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            mask = None
            if n_valid is not None and n_valid != n:
                mask = (jnp.arange(n) < n_valid)[None, None, None, :]
            out = dot_product_attention(q, k, v, mask=mask)
            out = out.reshape(b, n, cfg.embed_dim)
        if cfg.int8_matmul:
            if residual is not None:
                residual = residual.reshape(b * n, cfg.embed_dim)
            return w8a8_linear(
                out.reshape(b * n, cfg.embed_dim), wqp, swp, pbias,
                residual=residual,
            )  # stays 2D (B*N, C)
        return Dense(cfg.embed_dim, compute_dtype=self.compute_dtype, name="proj")(out)


class ViTBlock(nn.Module):
    config: ViTConfig
    compute_dtype: Any = jnp.bfloat16
    drop_path: float = 0.0

    bn: tuple | None = None  # (B, N) when int8 mode runs on 2D tokens
    n_valid: int | None = None  # real token count when N is sublane-padded
    # nn.scan body form: return (x, None) so one block definition serves
    # both the unrolled loop and the scan-over-layers path.
    as_scan_body: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, drop_path_rate=None):
        # drop_path_rate: optional traced per-layer override (the scan path
        # feeds the stochastic-depth ramp as a scanned input; the unrolled
        # path bakes it into the static ``drop_path`` attribute).
        out = self._body(x, deterministic, drop_path_rate)
        return (out, None) if self.as_scan_body else out

    def _body(self, x, deterministic, drop_path_rate):
        cfg = self.config
        if cfg.int8_matmul:
            # 2D token flow. The int8 ViT may run inside a train step when
            # frozen (grads are stop-gradient-blocked at the params —
            # BLIP2_MR._loss_fn), but stochastic depth has no int8 path:
            # drop_path requires the float ViT.
            assert deterministic or (self.drop_path == 0.0
                                     and drop_path_rate is None), (
                "int8_matmul has no drop_path; train an unfrozen ViT with "
                "float params"
            )
            # pre-norms fold into the int8 kernels' quant step (the
            # standalone LN pass is a full HBM round-trip of x per call);
            # params stay at the float tree's norm1/norm2 paths
            from mr_blip_tpu.models.layers import LNParamsScope

            # the skip adds ride the int8 kernels' epilogue (``residual=``):
            # a standalone x + y pass is 2 extra HBM round-trips per block
            s1, b1 = LNParamsScope(cfg.embed_dim, name="norm1")()
            x = ViTAttention(cfg, self.compute_dtype, name="attn")(
                x, bn=self.bn, norm=("ln", s1, b1, 1e-6), residual=x,
                n_valid=self.n_valid,
            )
            s2, b2 = LNParamsScope(cfg.embed_dim, name="norm2")()
            x = Int8Mlp(cfg.mlp_hidden_dim, name="mlp")(
                x, norm=("ln", s2, b2, 1e-6), residual=x
            )
            return x
        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(
            ViTAttention(cfg, self.compute_dtype, name="attn")(
                LayerNormFP32(name="norm1")(x)
            ),
            deterministic=deterministic, rate=drop_path_rate,
        )
        mlp = Mlp(
            cfg.mlp_hidden_dim, compute_dtype=self.compute_dtype,
            approximate_gelu=cfg.fast_gelu, name="mlp",
        )
        x = x + dp(mlp(LayerNormFP32(name="norm2")(x)),
                   deterministic=deterministic, rate=drop_path_rate)
        return x


class EvaViT(nn.Module):
    """Returns all (1 + num_patches) token embeddings; no final norm."""

    config: ViTConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        """images: (B, H, W, C) NHWC float in the processor's normalized range."""
        cfg = self.config
        b = images.shape[0]

        x = nn.Conv(
            features=cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(images.astype(self.compute_dtype))
        x = x.reshape(b, -1, cfg.embed_dim)  # (B, P, D)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim)).astype(x.dtype), x],
            axis=1,
        )

        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.num_patches + 1, cfg.embed_dim),
            jnp.float32,
        )
        x = x + pos_embed.astype(x.dtype)

        block_cls = ViTBlock
        if cfg.use_checkpoint:
            block_cls = nn.remat(ViTBlock, static_argnums=(2,))
        n_tok = x.shape[1]
        n_pad = n_tok
        if cfg.int8_matmul:
            # Pad the token axis to a sublane multiple (257 -> 264): the
            # TPU tiled (B, N, C) layout pads N to 8 anyway, so at N=264
            # every (B*N, C) <-> (B, N, C) reshape around the kernels is a
            # free bitcast instead of a relayout COPY (profiled at 109
            # ms/forward — ~20% of the int8 ViT stage — at N=257). Pad
            # tokens are masked out of attention (n_valid) and their rows
            # carry garbage that never mixes into real tokens (attention
            # is the only cross-token op); they are sliced off below.
            n_pad = -(-n_tok // 8) * 8
            if n_pad != n_tok:
                x = jnp.pad(x, ((0, 0), (0, n_pad - n_tok), (0, 0)))
            # one flatten for the whole stack (see ViTAttention docstring)
            x = x.reshape(b * n_pad, cfg.embed_dim)
        bn = (b, n_pad) if cfg.int8_matmul else None
        nv = n_tok if cfg.int8_matmul else None
        if cfg.scan_layers:
            # One compiled block body for the whole depth-39 stack; params
            # live stacked under "blocks" (leading axis = depth). The
            # stochastic-depth ramp rides along as a scanned input.
            if cfg.int8_matmul:
                # The W8A8 kernels emit bf16 whatever the input dtype; the
                # scan carry must be type-invariant, so convert up front
                # (the unrolled loop converts inside block 0 — the bf16
                # rounding difference is below int8 quantization noise).
                x = x.astype(jnp.bfloat16)
            scan_in_axes = (nn.broadcast,)
            args = (deterministic,)
            if cfg.drop_path_rate:
                rates = jnp.asarray(
                    [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
                     for i in range(cfg.depth)], jnp.float32)
                scan_in_axes = (nn.broadcast, 0)
                args = (deterministic, rates)
            scanned = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True,
                            "drop_path": True},
                in_axes=scan_in_axes,
                length=cfg.depth,
            )(cfg, self.compute_dtype, cfg.drop_path_rate,
              bn=bn, n_valid=nv, as_scan_body=True, name="blocks")
            x, _ = scanned(x, *args)
        else:
            for i in range(cfg.depth):
                rate = (
                    cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
                    if cfg.drop_path_rate else 0.0
                )
                x = block_cls(
                    cfg, self.compute_dtype, rate,
                    bn=bn, n_valid=nv,
                    name=f"blocks_{i}",
                )(x, deterministic)
        if cfg.int8_matmul:
            x = x.reshape(b, n_pad, cfg.embed_dim)
            if n_pad != n_tok and not cfg.keep_padded_tokens:
                x = x[:, :n_tok]
        return x
