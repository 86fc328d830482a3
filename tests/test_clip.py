import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vilgod_tpu.models.clip import (
    CLIPConfig, CLIPModel, MultiHeadAttention, init_clip_params,
    convert_openai_checkpoint, normalize_images,
)
from vilgod_tpu.models.tokenizer import HashTokenizer

TINY = CLIPConfig(
    image_size=32, patch_size=16, vision_width=64, vision_layers=2,
    vision_heads=4, embed_dim=32, context_length=16, vocab_size=128,
    text_width=48, text_heads=4, text_layers=2,
)


def test_attention_matches_torch(rng):
    """Our fused qkv attention must match torch.nn.MultiheadAttention."""
    import torch

    width, heads, seq = 32, 4, 7
    x = rng.normal(size=(1, seq, width)).astype(np.float32)

    mod = MultiHeadAttention(width, heads)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    t = torch.nn.MultiheadAttention(width, heads, batch_first=True)
    with torch.no_grad():
        t.in_proj_weight.copy_(torch.from_numpy(np.asarray(params["qkv"]["kernel"]).T))
        t.in_proj_bias.copy_(torch.from_numpy(np.asarray(params["qkv"]["bias"])))
        t.out_proj.weight.copy_(torch.from_numpy(np.asarray(params["out"]["kernel"]).T))
        t.out_proj.bias.copy_(torch.from_numpy(np.asarray(params["out"]["bias"])))
        expected = t(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))[0].numpy()

    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_attention_causal_mask_matches_torch(rng):
    import torch

    width, heads, seq = 32, 4, 9
    x = rng.normal(size=(1, seq, width)).astype(np.float32)
    mask = np.triu(np.full((seq, seq), -np.inf, np.float32), k=1)

    mod = MultiHeadAttention(width, heads)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    t = torch.nn.MultiheadAttention(width, heads, batch_first=True)
    with torch.no_grad():
        t.in_proj_weight.copy_(torch.from_numpy(np.asarray(params["qkv"]["kernel"]).T))
        t.in_proj_bias.copy_(torch.from_numpy(np.asarray(params["qkv"]["bias"])))
        t.out_proj.weight.copy_(torch.from_numpy(np.asarray(params["out"]["kernel"]).T))
        t.out_proj.bias.copy_(torch.from_numpy(np.asarray(params["out"]["bias"])))
        expected = t(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                     attn_mask=torch.from_numpy(mask))[0].numpy()
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_clip_forward_shapes():
    params = init_clip_params(TINY)
    model = CLIPModel(TINY)
    images = jnp.zeros((3, 32, 32, 3))
    tokens = jnp.zeros((5, 16), jnp.int32).at[:, 0].set(1).at[:, 3].set(100)
    logits = model.apply({"params": params}, images, tokens)
    assert logits.shape == (3, 5)
    img = model.apply({"params": params}, images, method=CLIPModel.encode_image)
    txt = model.apply({"params": params}, tokens, method=CLIPModel.encode_text)
    assert img.shape == (3, 32) and txt.shape == (5, 32)


def test_eot_pooling_uses_argmax_token():
    """EOT pooling must pick the position of the max token id."""
    params = init_clip_params(TINY)
    model = CLIPModel(TINY)
    t1 = np.zeros((1, 16), np.int32)
    t1[0, :5] = [126, 3, 4, 5, 127]  # EOT (max id 127) at position 4
    t2 = t1.copy()
    t2[0, 10] = 90  # different content AFTER the EOT: must not change pooling
    # tokens after EOT position still flow through attention of earlier
    # positions? no: causal mask means positions before EOT can't see later
    # ones, so output at EOT is unchanged.
    f1 = np.asarray(model.apply({"params": params}, jnp.asarray(t1), method=CLIPModel.encode_text))
    f2 = np.asarray(model.apply({"params": params}, jnp.asarray(t2), method=CLIPModel.encode_text))
    np.testing.assert_allclose(f1, f2, atol=1e-5)


def test_converter_roundtrip(tmp_path):
    """Build a tiny torch CLIP-style state_dict, convert, and run."""
    import torch

    c = TINY
    sd = {}
    g = torch.Generator().manual_seed(0)
    rnd = lambda *shape: torch.randn(*shape, generator=g) * 0.02

    sd["visual.conv1.weight"] = rnd(c.vision_width, 3, c.patch_size, c.patch_size)
    sd["visual.class_embedding"] = rnd(c.vision_width)
    n_tok = (c.image_size // c.patch_size) ** 2 + 1
    sd["visual.positional_embedding"] = rnd(n_tok, c.vision_width)
    sd["visual.ln_pre.weight"] = torch.ones(c.vision_width)
    sd["visual.ln_pre.bias"] = torch.zeros(c.vision_width)
    sd["visual.ln_post.weight"] = torch.ones(c.vision_width)
    sd["visual.ln_post.bias"] = torch.zeros(c.vision_width)
    sd["visual.proj"] = rnd(c.vision_width, c.embed_dim)

    def blocks(prefix, width, layers):
        for i in range(layers):
            p = f"{prefix}.{i}"
            sd[f"{p}.ln_1.weight"] = torch.ones(width)
            sd[f"{p}.ln_1.bias"] = torch.zeros(width)
            sd[f"{p}.ln_2.weight"] = torch.ones(width)
            sd[f"{p}.ln_2.bias"] = torch.zeros(width)
            sd[f"{p}.attn.in_proj_weight"] = rnd(3 * width, width)
            sd[f"{p}.attn.in_proj_bias"] = torch.zeros(3 * width)
            sd[f"{p}.attn.out_proj.weight"] = rnd(width, width)
            sd[f"{p}.attn.out_proj.bias"] = torch.zeros(width)
            sd[f"{p}.mlp.c_fc.weight"] = rnd(4 * width, width)
            sd[f"{p}.mlp.c_fc.bias"] = torch.zeros(4 * width)
            sd[f"{p}.mlp.c_proj.weight"] = rnd(width, 4 * width)
            sd[f"{p}.mlp.c_proj.bias"] = torch.zeros(width)

    blocks("visual.transformer.resblocks", c.vision_width, c.vision_layers)
    blocks("transformer.resblocks", c.text_width, c.text_layers)
    sd["token_embedding.weight"] = rnd(c.vocab_size, c.text_width)
    sd["positional_embedding"] = rnd(c.context_length, c.text_width)
    sd["ln_final.weight"] = torch.ones(c.text_width)
    sd["ln_final.bias"] = torch.zeros(c.text_width)
    sd["text_projection"] = rnd(c.text_width, c.embed_dim)
    sd["logit_scale"] = torch.tensor(np.log(1 / 0.07))

    path = tmp_path / "tiny_clip.pt"
    torch.save(sd, str(path))

    params = convert_openai_checkpoint(str(path), c)
    model = CLIPModel(c)
    images = jnp.ones((2, 32, 32, 3)) * 0.3
    tokens = jnp.zeros((3, c.context_length), jnp.int32).at[:, 1].set(c.vocab_size - 1)
    logits = np.asarray(model.apply({"params": params}, images, tokens))
    assert logits.shape == (2, 3)
    assert np.isfinite(logits).all()


def test_hash_tokenizer_stable():
    tok = HashTokenizer(vocab_size=128, context_length=16)
    a = tok.tokenize(["a point representation of a car"])
    b = tok.tokenize(["a point representation of a car"])
    np.testing.assert_array_equal(a, b)
    c = tok.tokenize(["a point representation of a tree"])
    assert (a != c).any()
    assert a[0, 0] == 126  # SOT


def test_normalize_images():
    img = np.ones((1, 4, 4, 3), np.float32) * 0.5
    out = np.asarray(normalize_images(jnp.asarray(img)))
    assert out.shape == (1, 4, 4, 3)
    assert np.all(np.abs(out) < 1.0)
