"""Zero-shot CLIP classification wrapper.

TPU-native equivalent of the reference's `ClipWrapper`
(`/root/reference/src/utils/clip_utils.py:10-63`): text prompts are
encoded once at construction; the image path is a single jitted graph
(grey depth image -> 3-channel -> uint8 quantize -> CLIP normalize ->
ViT-B/16 encode -> cosine logits x100 -> softmax -> top-1). The uint8
round-trip mirrors the reference's PIL conversion
(`zero_shot_detector.py:408-410`) so scores match the torch pipeline.

The vision tower runs in bfloat16 by default (the reference converts the
torch model to fp16, `third_party/CLIP/clip/model.py:375-396`; bf16 is
the TPU-native equivalent with a wider exponent).
"""
from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .clip import (CLIPModel, clip_vit_b16, convert_openai_checkpoint,
                   init_clip_params, normalize_images)
from .tokenizer import ClipTokenizer, HashTokenizer


class ClipWrapper:
    def __init__(self, clip_cfg: dict, checkpoint_path: str | None = None,
                 bpe_path: str | None = None, dtype=jnp.bfloat16, seed: int = 0,
                 model_cfg=None):
        self.cfg = clip_cfg
        self.model_cfg = model_cfg or clip_vit_b16(dtype=dtype)
        self.model = CLIPModel(self.model_cfg)
        if checkpoint_path and Path(checkpoint_path).exists():
            self.params = convert_openai_checkpoint(checkpoint_path, self.model_cfg)
        else:
            self.params = init_clip_params(self.model_cfg, seed=seed)
        if bpe_path and Path(bpe_path).exists():
            self.tokenizer = ClipTokenizer(bpe_path)
        else:
            self.tokenizer = HashTokenizer()

        self.class_list = list(clip_cfg.get("class_list", []))
        self.class_mapping = dict(clip_cfg.get("class_mapping", {}))
        template = clip_cfg.get("prompt_template", "a point representation of a {}")
        prompts = [template.format(c) for c in self.class_list]
        tokens = jnp.asarray(self.tokenizer.tokenize(prompts))
        feats = self.model.apply({"params": self.params}, tokens,
                                 method=self.model.encode_text)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        self.text_features = jnp.asarray(feats, jnp.float32)  # (K, D)

        @jax.jit
        def _predict(params, images, text_features):
            # images: (B, H, W) grey in [0, 1]
            img = jnp.round(images * 255.0) / 255.0  # PIL uint8 round-trip
            rgb = jnp.repeat(img[..., None], 3, axis=-1)
            x = normalize_images(rgb).astype(dtype)
            feats = self.model.apply({"params": params}, x,
                                     method=self.model.encode_image)
            feats = feats.astype(jnp.float32)
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
            logits = 100.0 * feats @ text_features.T  # clip_utils.py:40-44
            probs = jax.nn.softmax(logits, axis=-1)
            idx = jnp.argmax(probs, axis=-1)
            return idx.astype(jnp.int32), jnp.max(probs, axis=-1)

        self._predict = _predict

    def predict(self, images: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """images: (B, H, W) grey depth images in [0, 1].
        Returns (class_idx (B,) into class_list, score (B,))."""
        idx, score = self._predict(self.params, jnp.asarray(images),
                                   self.text_features)
        return np.asarray(idx), np.asarray(score)

    def make_cluster_classifier(self, num_clusters: int, capacity: int,
                                resolution: int = 112, depth: int = 8,
                                obj_ratio: float = 0.8, depth_bias: float = 0.2,
                                image_size: int = 224):
        key = (num_clusters, capacity, resolution, depth, obj_ratio,
               depth_bias, image_size)
        cached = getattr(self, "_classifiers", {}).get(key)
        if cached is not None:
            return cached
        built = self._build_cluster_classifier(
            num_clusters, capacity, resolution, depth, obj_ratio, depth_bias,
            image_size)
        self.__dict__.setdefault("_classifiers", {})[key] = built
        return built

    def _build_cluster_classifier(self, num_clusters: int, capacity: int,
                                  resolution: int = 112, depth: int = 8,
                                  obj_ratio: float = 0.8,
                                  depth_bias: float = 0.2,
                                  image_size: int = 224):
        """Fully fused cluster->class device program over the resident
        sequence buffers: gather cluster points, transform to ego, render
        4 views, encode with CLIP, zero-shot logits — nothing but the
        final (B, V) class/score pairs crosses the host boundary. The
        reference ships every cluster through PIL on the host
        (zero_shot_detector.py:389-410); on a tunneled TPU the image
        round-trip alone costs ~100 MB per batch.
        """
        import jax
        from functools import partial

        from ..ops.rasterize import render_cluster_views

        model = self.model

        @partial(jax.jit, static_argnames=())
        def classify(params, text_features, ng_xyz, tables, table_masks,
                     frame_ids, cluster_ids, transforms):
            # items may come from DIFFERENT frames: one full ViT batch per
            # call instead of one padded call per frame
            rows = jnp.maximum(tables[frame_ids, cluster_ids], 0)  # (B, cap)
            rmask = table_masks[frame_ids, cluster_ids] & (
                cluster_ids >= 0)[:, None]
            pts = ng_xyz[frame_ids[:, None], rows]
            ego = jnp.einsum("bij,bpj->bpi", transforms[:, :3, :3], pts
                             ) + transforms[:, None, :3, 3]
            ego = jnp.where(rmask[..., None], ego, 0.0)
            safe = rmask.at[:, 0].set(True)
            images = render_cluster_views(
                ego, safe, resolution=resolution, depth=depth,
                obj_ratio=obj_ratio, depth_bias=depth_bias,
                image_size=image_size)                          # (B, V, S, S)
            b, v, s, _ = images.shape
            img = jnp.round(images * 255.0) / 255.0
            rgb = jnp.repeat(img.reshape(b * v, s, s)[..., None], 3, axis=-1)
            x = normalize_images(rgb).astype(self.model_cfg.dtype)
            feats = model.apply({"params": params}, x,
                                method=model.encode_image).astype(jnp.float32)
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
            logits = 100.0 * feats @ text_features.T
            probs = jax.nn.softmax(logits, axis=-1).reshape(b, v, -1)
            return (jnp.argmax(probs, axis=-1).astype(jnp.int32),
                    jnp.max(probs, axis=-1))

        def run(ng_xyz, tables, table_masks, frame_ids, cluster_ids, transforms):
            return classify(self.params, self.text_features, ng_xyz, tables,
                            table_masks, jnp.asarray(frame_ids, jnp.int32),
                            jnp.asarray(cluster_ids, jnp.int32),
                            jnp.asarray(transforms, jnp.float32))

        return run
