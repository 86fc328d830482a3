"""CLIP ViT-B/16 in JAX/flax — the zero-shot classifier backbone.

From-scratch implementation of the architecture the reference vendors
(`/root/reference/third_party/CLIP/clip/model.py`: VisionTransformer at
:206-240, text transformer + EOT pooling at :343-356, build shapes at
:399-436), TPU-first:

- one jitted graph for the image tower (the pipeline's hot path — the
  reference runs fp16 CUDA; we run bf16 on the MXU);
- weights live as a flax param pytree so the tower shards trivially under
  pjit (heads/MLP dims are partitionable);
- a converter maps the OpenAI ``ViT-B-16.pt`` state_dict onto the tree, so
  reference users can bring their checkpoint unchanged.

QuickGELU (x * sigmoid(1.702 x)) matches OpenAI CLIP, not standard GELU.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax

_FAST = jax.lax.Precision.DEFAULT
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    dtype: Any = jnp.float32


def clip_vit_b16(dtype=jnp.float32) -> "CLIPConfig":
    return CLIPConfig(dtype=dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, ln=None):
        """ln: optional {"scale", "bias"} LayerNorm params. When given,
        computes the full attention half of a residual block —
        ``x + out(attn(qkv(LN(x))))`` — which the bf16 TPU path runs as
        ONE pallas kernel; without it, plain attention over ``x``
        (the torch-parity tests drive this mode directly)."""
        d = self.width // self.heads
        # raw dict params instead of Dense submodules (identical param
        # tree: attn/qkv/{kernel,bias}, attn/out/{kernel,bias}) so the
        # projections can run inside the fused pallas kernel
        qkv_p = self.param("qkv", _dense_params(self.width, 3 * self.width))
        out_p = self.param("out", _dense_params(self.width, self.width))
        from .vit_kernels import fused_attention_proj, use_fused_attention
        if (ln is not None and attn_mask is None
                and use_fused_attention(self.dtype, self.width, self.heads)):
            return fused_attention_proj(
                x.astype(self.dtype),
                ln["scale"], ln["bias"],
                qkv_p["kernel"].astype(self.dtype),
                qkv_p["bias"].astype(self.dtype),
                out_p["kernel"].astype(self.dtype),
                out_p["bias"].astype(self.dtype), self.heads)
        residual = x if ln is not None else None
        if ln is not None:
            x = layer_norm(x, ln, self.dtype)
        xx = x.astype(self.dtype)
        qkv = jax.lax.dot_general(
            xx, qkv_p["kernel"].astype(self.dtype),
            (((xx.ndim - 1,), (0,)), ((), ())), precision=_FAST
        ) + qkv_p["bias"].astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(t.shape[:-1] + (self.heads, d)).swapaxes(-3, -2)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / np.sqrt(d)
        logits = jnp.einsum("...hqd,...hkd->...hqk", q, k, precision=_FAST) * scale
        if attn_mask is not None:
            logits = logits + attn_mask
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("...hqk,...hkd->...hqd", weights, v, precision=_FAST)
        out = out.swapaxes(-3, -2).reshape(x.shape)
        out = jax.lax.dot_general(
            out, out_p["kernel"].astype(self.dtype),
            (((out.ndim - 1,), (0,)), ((), ())), precision=_FAST
        ) + out_p["bias"].astype(self.dtype)
        return out if residual is None else residual + out


def _ln_params(width: int):
    """{scale, bias} init matching ``nn.LayerNorm`` (ones/zeros)."""
    def init(_key):
        return {"scale": jnp.ones((width,), jnp.float32),
                "bias": jnp.zeros((width,), jnp.float32)}
    return init


def layer_norm(x, p, dtype, eps: float = 1e-5):
    """flax ``nn.LayerNorm`` semantics: f32 statistics, fast variance
    E[x^2] - E[x]^2 clipped at zero, output cast to ``dtype``."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def _dense_params(d_in: int, d_out: int):
    """{kernel, bias} init matching ``nn.Dense`` (lecun_normal/zeros) —
    raw params instead of a Dense submodule so the MLP can route through
    the fused pallas kernel while the checkpoint tree stays identical
    (convert_openai_checkpoint writes mlp_fc/{kernel,bias})."""
    kinit = nn.initializers.lecun_normal()

    def init(key):
        return {"kernel": kinit(key, (d_in, d_out), jnp.float32),
                "bias": jnp.zeros((d_out,), jnp.float32)}

    return init


class ResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        # ln_1 as raw {scale, bias} params (tree identical to the former
        # nn.LayerNorm) so the attention half — LN + qkv + heads + out +
        # residual — can run as one pallas kernel on the bf16 TPU path
        ln1 = self.param("ln_1", _ln_params(self.width))
        x = MultiHeadAttention(self.width, self.heads, self.dtype,
                               name="attn")(x, attn_mask, ln=ln1)
        ln2 = self.param("ln_2", _ln_params(self.width))
        fc = self.param("mlp_fc", _dense_params(self.width, 4 * self.width))
        pr = self.param("mlp_proj", _dense_params(4 * self.width, self.width))
        from .vit_kernels import (fused_mlp_block, use_fused_mlp,
                                  use_fused_mlp_block)
        if use_fused_mlp_block(self.dtype, self.width):
            lead = x.shape[:-1]
            return fused_mlp_block(
                x.astype(self.dtype).reshape(-1, self.width),
                ln2["scale"], ln2["bias"],
                fc["kernel"].astype(self.dtype),
                fc["bias"].astype(self.dtype),
                pr["kernel"].astype(self.dtype),
                pr["bias"].astype(self.dtype)).reshape(*lead, self.width)
        h = layer_norm(x, ln2, self.dtype)
        from .vit_kernels import fused_mlp
        if use_fused_mlp(self.dtype, self.width):
            lead = h.shape[:-1]
            y = fused_mlp(h.reshape(-1, self.width),
                          fc["kernel"].astype(self.dtype),
                          fc["bias"].astype(self.dtype),
                          pr["kernel"].astype(self.dtype),
                          pr["bias"].astype(self.dtype))
            return x + y.reshape(*lead, self.width)
        h = h.astype(self.dtype)
        h = jax.lax.dot_general(
            h, fc["kernel"].astype(self.dtype),
            (((h.ndim - 1,), (0,)), ((), ())), precision=_FAST
        ) + fc["bias"].astype(self.dtype)
        h = quick_gelu(h)
        x = x + (jax.lax.dot_general(
            h, pr["kernel"].astype(self.dtype),
            (((h.ndim - 1,), (0,)), ((), ())), precision=_FAST
        ) + pr["bias"].astype(self.dtype))
        return x


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        for i in range(self.layers):
            x = ResidualBlock(self.width, self.heads, self.dtype, name=f"block_{i}")(x, attn_mask)
        return x


class VisionTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalized floats -> (B, embed_dim)."""
        c = self.cfg
        x = nn.Conv(
            c.vision_width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            dtype=c.dtype, precision=_FAST, name="patch_embed",
        )(images.astype(c.dtype))  # (B, H/p, W/p, width)
        b = x.shape[0]
        x = x.reshape(b, -1, c.vision_width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.vision_width,), jnp.float32).astype(c.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.vision_width)), x], axis=1)
        n_tok = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (n_tok, c.vision_width), jnp.float32).astype(c.dtype)
        x = x + pos
        x = nn.LayerNorm(dtype=c.dtype, name="ln_pre")(x)
        x = Transformer(c.vision_width, c.vision_layers, c.vision_heads,
                        c.dtype, name="transformer")(x)
        x = nn.LayerNorm(dtype=c.dtype, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.vision_width, c.embed_dim), jnp.float32).astype(c.dtype)
        return jax.lax.dot(x, proj, precision=_FAST)


class TextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, context_length) int32 -> (B, embed_dim); EOT pooling
        by argmax token id (model.py:343-356)."""
        c = self.cfg
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.text_width), jnp.float32)
        x = emb[tokens].astype(c.dtype)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (c.context_length, c.text_width), jnp.float32).astype(c.dtype)
        x = x + pos
        mask = jnp.triu(jnp.full((c.context_length, c.context_length), -jnp.inf), k=1)
        x = Transformer(c.text_width, c.text_layers, c.text_heads,
                        c.dtype, name="transformer")(x, mask.astype(c.dtype))
        x = nn.LayerNorm(dtype=c.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (c.text_width, c.embed_dim), jnp.float32).astype(c.dtype)
        return pooled @ proj


class CLIPModel(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.visual = VisionTower(self.cfg)
        self.text = TextTower(self.cfg)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32))

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T


def init_clip_params(cfg: CLIPConfig, seed: int = 0):
    model = CLIPModel(cfg)
    images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    tokens = jnp.zeros((1, cfg.context_length), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), images, tokens)["params"]


# CLIP image normalization constants (clip.py preprocess, :79-86)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def normalize_images(images_rgb01: jax.Array) -> jax.Array:
    """(..., H, W, 3) in [0, 1] -> CLIP-normalized."""
    return (images_rgb01 - IMAGE_MEAN) / IMAGE_STD


# ---------------------------------------------------------------------------
# OpenAI checkpoint conversion
# ---------------------------------------------------------------------------

def convert_openai_checkpoint(path: str, cfg: CLIPConfig | None = None):
    """Map an OpenAI CLIP ``ViT-B-16.pt`` state_dict onto our param tree.

    Shape contract follows third_party/CLIP/clip/model.py:399-422. Works
    with both TorchScript archives and plain state_dict pickles.
    """
    import torch

    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj

    cfg = cfg or clip_vit_b16()
    g = lambda k: np.asarray(sd[k].float().numpy())

    def attn_block(prefix):
        return {
            "ln_1": {"scale": g(f"{prefix}.ln_1.weight"), "bias": g(f"{prefix}.ln_1.bias")},
            "ln_2": {"scale": g(f"{prefix}.ln_2.weight"), "bias": g(f"{prefix}.ln_2.bias")},
            "attn": {
                "qkv": {
                    "kernel": g(f"{prefix}.attn.in_proj_weight").T,
                    "bias": g(f"{prefix}.attn.in_proj_bias"),
                },
                "out": {
                    "kernel": g(f"{prefix}.attn.out_proj.weight").T,
                    "bias": g(f"{prefix}.attn.out_proj.bias"),
                },
            },
            "mlp_fc": {"kernel": g(f"{prefix}.mlp.c_fc.weight").T,
                       "bias": g(f"{prefix}.mlp.c_fc.bias")},
            "mlp_proj": {"kernel": g(f"{prefix}.mlp.c_proj.weight").T,
                         "bias": g(f"{prefix}.mlp.c_proj.bias")},
        }

    visual = {
        # torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)
        "patch_embed": {"kernel": g("visual.conv1.weight").transpose(2, 3, 1, 0)},
        "class_embedding": g("visual.class_embedding"),
        "positional_embedding": g("visual.positional_embedding"),
        "ln_pre": {"scale": g("visual.ln_pre.weight"), "bias": g("visual.ln_pre.bias")},
        "ln_post": {"scale": g("visual.ln_post.weight"), "bias": g("visual.ln_post.bias")},
        "proj": g("visual.proj"),
        "transformer": {
            f"block_{i}": attn_block(f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision_layers)
        },
    }
    text = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
        "transformer": {
            f"block_{i}": attn_block(f"transformer.resblocks.{i}")
            for i in range(cfg.text_layers)
        },
    }
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": g("logit_scale"),
    }
    return jax.tree.map(jnp.asarray, params)
