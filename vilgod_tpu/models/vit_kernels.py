"""Pallas TPU kernels for the CLIP transformer hot path.

The classification stage is the ViT (`clip_wrapper.py`), and on the
target chip the ViT is **HBM-bound, not FLOP-bound**: the per-layer MLP
materializes a (B*T, 4*width) bf16 intermediate (~620 MB at the bench
batch) that XLA writes and re-reads between the two matmuls, while the
measured streaming bandwidth is a small fraction of the matmul
throughput (big-K matmul chains sustain ~138 TFLOP/s, yet the
transformer's matmul mix sustains only ~34 — the gap is intermediate
traffic). Fusing fc -> quickGELU -> proj into one kernel keeps the
hidden activation in VMEM and cuts the MLP's HBM traffic from
~1.55 GB/layer to ~0.31 GB/layer at bench batch.

The reference runs this as three separate torch ops on CUDA
(third_party/CLIP/clip/model.py:210-216 — c_fc, gelu, c_proj); the
fusion is semantics-preserving (same fp32 MXU accumulation, bf16
rounding at the same points flax's Dense rounds).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# row-block: 256 rows keeps w_fc + w_proj (2 x 4.7 MB at vision width
# 768) + the (256, 3072) hidden tile comfortably inside the ~16 MB
# scoped-VMEM budget with double-buffered x/out blocks
BM = 256


def _mlp_block_kernel(x_ref, lns_ref, lnb_ref, wfc_ref, bfc_ref, wpr_ref,
                      bpr_ref, out_ref):
    """LN + fc + quickGELU + proj + residual for a row block, hidden
    activation resident in VMEM."""
    P = jax.lax.Precision.DEFAULT
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    h32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h32 = (h32 * lns_ref[...].astype(jnp.float32)
           + lnb_ref[...].astype(jnp.float32))
    h = h32.astype(x.dtype)
    f = jnp.dot(h, wfc_ref[...], preferred_element_type=jnp.float32,
                precision=P)
    f = (f + bfc_ref[...].astype(jnp.float32)).astype(x.dtype)
    f32 = f.astype(jnp.float32)
    g = (f32 * jax.nn.sigmoid(1.702 * f32)).astype(x.dtype)
    o = jnp.dot(g, wpr_ref[...], preferred_element_type=jnp.float32,
                precision=P)
    o = o + bpr_ref[...].astype(jnp.float32) + x32  # residual
    out_ref[...] = o.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_mlp_block(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                    w_fc: jax.Array, b_fc: jax.Array, w_proj: jax.Array,
                    b_proj: jax.Array, block_rows: int = BM,
                    interpret: bool = False) -> jax.Array:
    """``x + proj(gelu(fc(LN(x))))`` — the MLP half of a ViT residual
    block in one kernel. x (M, K); K and H must be lane-aligned."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    h_dim = w_fc.shape[1]
    pad = -m % block_rows
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    mp = xp.shape[0]
    out = pl.pallas_call(
        _mlp_block_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, k), x.dtype),
        grid=(mp // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, h_dim), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h_dim, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, ln_scale.reshape(1, k), ln_bias.reshape(1, k), w_fc,
      b_fc.reshape(1, h_dim), w_proj, b_proj.reshape(1, k))
    return out[:m] if pad else out


def _mlp_kernel(x_ref, wfc_ref, bfc_ref, wpr_ref, bpr_ref, out_ref):
    # precision must be DEFAULT explicitly: the package-global
    # jax_default_matmul_precision=highest would make Mosaic emit an
    # fp32-contract matmul it cannot lower for bf16 operands ("Bad lhs
    # type"); single-pass bf16 with f32 accumulation is the intent here
    x = x_ref[...]
    h = jnp.dot(x, wfc_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
    h = (h + bfc_ref[...].astype(jnp.float32)).astype(x.dtype)
    # quickGELU (clip.py:quick_gelu): x * sigmoid(1.702 x)
    h32 = h.astype(jnp.float32)
    g = (h32 * jax.nn.sigmoid(1.702 * h32)).astype(x.dtype)
    o = jnp.dot(g, wpr_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
    out_ref[...] = (o + bpr_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_mlp(x: jax.Array, w_fc: jax.Array, b_fc: jax.Array,
              w_proj: jax.Array, b_proj: jax.Array,
              block_rows: int = BM, interpret: bool = False) -> jax.Array:
    """quickGELU MLP ``proj(gelu(fc(x)))`` with the hidden activation
    resident in VMEM. x (M, K); w_fc (K, H); w_proj (H, K). Returns
    (M, K) in x.dtype. K and H must be lane-aligned (mult of 128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    h_dim = w_fc.shape[1]
    pad = -m % block_rows
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    mp = xp.shape[0]
    out = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, k), x.dtype),
        grid=(mp // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, h_dim), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h_dim, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w_fc, b_fc.reshape(1, h_dim), w_proj, b_proj.reshape(1, k))
    return out[:m] if pad else out


def _attn_proj_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                      wout_ref, bout_ref, out_ref, *, heads: int,
                      width: int, scale: float):
    """LayerNorm + qkv projection + all-head attention + output
    projection + residual for one batch element, entirely in VMEM: the
    normalized activations, the (T, 3W) qkv tensor and the attention
    output never round-trip through HBM (XLA's path writes/reads each
    per layer)."""
    P = jax.lax.Precision.DEFAULT
    x = x_ref[0]
    # flax LayerNorm semantics: f32 stats, fast variance, eps 1e-5
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    h32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h32 = h32 * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    h = h32.astype(x.dtype)
    qkv = jnp.dot(h, wqkv_ref[...], preferred_element_type=jnp.float32,
                  precision=P)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(h.dtype)
    d = width // heads
    outs = []
    for hd in range(heads):
        q = qkv[:, hd * d:(hd + 1) * d]
        k = qkv[:, width + hd * d:width + (hd + 1) * d]
        v = qkv[:, 2 * width + hd * d:2 * width + (hd + 1) * d]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=P) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        outs.append(jnp.dot(w, v, preferred_element_type=jnp.float32,
                            precision=P).astype(h.dtype))
    att = jnp.concatenate(outs, axis=-1)
    o = jnp.dot(att, wout_ref[...], preferred_element_type=jnp.float32,
                precision=P)
    o = o + bout_ref[...].astype(jnp.float32) + x32  # residual
    out_ref[0] = o.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_attention_proj(x: jax.Array, ln_scale: jax.Array,
                         ln_bias: jax.Array, w_qkv: jax.Array,
                         b_qkv: jax.Array, w_out: jax.Array,
                         b_out: jax.Array, heads: int,
                         interpret: bool = False) -> jax.Array:
    """``x + out_proj(attention(qkv_proj(LN(x))))`` over (B, T, W)
    pre-LN activations — the whole attention half of a ViT residual
    block in one kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, width = x.shape
    scale = 1.0 / float(np.sqrt(width // heads))
    return pl.pallas_call(
        partial(_attn_proj_kernel, heads=heads, width=width, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, t, width), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, width), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((width, 3 * width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((width, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, width), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, ln_scale.reshape(1, width), ln_bias.reshape(1, width),
      w_qkv, b_qkv.reshape(1, 3 * width), w_out, b_out.reshape(1, width))


def use_fused_attention(dtype, width: int, heads: int) -> bool:
    """bf16 TPU inference path only; lane-aligned head dim. The fp32
    CPU path keeps the reference XLA attention that the torch-parity
    tests pin."""
    import os
    if os.environ.get("VILGOD_FUSED_ATTN") == "0":
        return False
    if dtype != jnp.bfloat16 or (width // heads) % 64 or width % 128:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_fused_mlp_block(dtype, width: int) -> bool:
    """Full MLP-half fusion (LN + fc + gelu + proj + residual). Opt-in
    via VILGOD_FUSED_MLP_BLOCK=1 until measured on the target chip: the
    projection-only fused MLP lost to XLA's epilogue fusion, but with
    the LN and residual folded in the traffic balance changes."""
    import os
    if os.environ.get("VILGOD_FUSED_MLP_BLOCK") != "1":
        return False
    if dtype != jnp.bfloat16 or width % 128 or (4 * width) % 128:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_fused_mlp(dtype, width: int) -> bool:
    """Opt-in only (VILGOD_FUSED_MLP=1): measured on the v5e, XLA's
    unfused fc->gelu->proj already sustains ~117 TFLOP/s (it fuses the
    elementwise tail into the matmuls), and the pallas version is
    neutral in isolation but ~20% slower inside the full tower (XLA
    loses cross-op fusion freedom around the opaque kernel). Kept as a
    reference kernel + for future chips where the tradeoff flips."""
    import os
    if os.environ.get("VILGOD_FUSED_MLP") != "1":
        return False
    if dtype != jnp.bfloat16 or width % 128 or (4 * width) % 128:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
