"""CLIP text-image guidance for ``--rand_pose`` semi-supervised training.

Reference: ``reconstruction/nerf/clip_utils.py:11-63`` — wraps OpenAI
``clip.load('ViT-B/16')``, embeds one text prompt, and scores rendered
images with the negative cosine similarity ``-(img_z * text_z).sum(-1)``;
``utils.py:500-552`` calls it on random-pose renders that have no GT image.

TPU-native rebuild: the vision tower is a pure-JAX pre-LN ViT whose
parameters are keyed by the ``transformers.CLIPModel`` state-dict names
(``vision_model.embeddings.patch_embedding`` ..., including the upstream
``pre_layrnorm`` typo), so a published ``ViT-B/16`` checkpoint loads
mechanically via :func:`state_dict_to_tree`. The patch embedding runs as an
unfold + one big matmul (MXU-friendly; a strided conv lowers to the same
thing but the explicit form keeps the layout obvious), and the text side
reuses :mod:`trinerflet_tpu.sr.text`'s transformer with the CLIP pooled
output (hidden state at the EOS/argmax token) and ``text_projection``.

Numerics are pinned by a golden parity test against a tiny random
``transformers.CLIPModel`` (tests/test_clip.py), so layout regressions are
caught without shipping real weights.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..sr.text import TextConfig, _act, _lin, _ln, text_encode

__all__ = [
    "VisionConfig", "init_vision_params", "vision_encode",
    "image_features", "text_features", "state_dict_to_tree",
    "init_clip_params", "CLIPLoss",
]

# OpenAI CLIP preprocessing constants (clip_utils.py:24-27)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """ViT-B/16 defaults (the reference's ``name='ViT-B/16'``)."""
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    hidden_act: str = "quick_gelu"   # OpenAI CLIP towers use quick_gelu

    @classmethod
    def from_json(cls, path: str) -> "VisionConfig":
        with open(path) as f:
            c = json.load(f)
        v = c.get("vision_config", c)
        return cls(
            image_size=v["image_size"], patch_size=v["patch_size"],
            hidden_size=v["hidden_size"], num_layers=v["num_hidden_layers"],
            num_heads=v["num_attention_heads"],
            intermediate_size=v["intermediate_size"],
            projection_dim=c.get("projection_dim", v.get("projection_dim", 512)),
            hidden_act=v.get("hidden_act", "quick_gelu"),
        )


def _attn(lp: Dict, x: jnp.ndarray, num_heads: int,
          causal: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    B, L, D = x.shape
    d = D // num_heads
    q = _lin(lp["q_proj"], x).reshape(B, L, num_heads, d).transpose(0, 2, 1, 3)
    k = _lin(lp["k_proj"], x).reshape(B, L, num_heads, d).transpose(0, 2, 1, 3)
    v = _lin(lp["v_proj"], x).reshape(B, L, num_heads, d).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(d)
    if causal is not None:
        att = att + causal
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", att, v).transpose(0, 2, 1, 3).reshape(B, L, D)
    return _lin(lp["out_proj"], o)


def _patchify(images: jnp.ndarray, P: int) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, N, P*P*3) flattened in (i, j, c) order — matches a
    stride-P OIHW conv whose kernel is reshaped via transpose(2, 3, 1, 0)."""
    B, H, W, C = images.shape
    x = images.reshape(B, H // P, P, W // P, P, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // P) * (W // P), P * P * C)


def vision_encode(params: Dict, cfg: VisionConfig, images: jnp.ndarray) -> jnp.ndarray:
    """Preprocessed images (B, S, S, 3) -> pooled CLS embedding (B, D)."""
    vm = params["vision_model"]
    emb = vm["embeddings"]
    B = images.shape[0]
    x = _patchify(images, cfg.patch_size) @ emb["patch_embedding"]["kernel"]
    cls = jnp.broadcast_to(emb["class_embedding"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + emb["position_embedding"]["weight"][None]
    x = _ln(vm["pre_layrnorm"], x)  # upstream typo preserved for key parity
    for i in range(cfg.num_layers):
        lp = vm["encoder"]["layers"][str(i)]
        x = x + _attn(lp["self_attn"], _ln(lp["layer_norm1"], x), cfg.num_heads)
        h = _ln(lp["layer_norm2"], x)
        x = x + _lin(lp["mlp"]["fc2"], _act(cfg.hidden_act, _lin(lp["mlp"]["fc1"], h)))
    return _ln(vm["post_layernorm"], x[:, 0])


def image_features(params: Dict, cfg: VisionConfig, images: jnp.ndarray) -> jnp.ndarray:
    """Preprocessed images -> L2-normalized joint-space features (B, P)."""
    z = vision_encode(params, cfg, images) @ params["visual_projection"]["weight"].T
    return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-10)


def text_features(params: Dict, cfg: TextConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token ids (B, L) -> L2-normalized joint-space features (B, P).

    Pooled output = hidden state at the EOS position (argmax of ids — the EOS
    id is the largest in CLIP vocabularies), as transformers does."""
    h = text_encode(params, cfg, tokens)
    pooled = h[jnp.arange(h.shape[0]), tokens.argmax(axis=-1)]
    z = pooled @ params["text_projection"]["weight"].T
    return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-10)


def preprocess(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """[0,1] RGB (B, H, W, 3) -> resized + CLIP-normalized (B, size, size, 3).

    Mirrors clip_utils.py:23-27 (Resize(224) + Normalize); bilinear resize on
    device so the whole loss stays inside one jit."""
    B = images.shape[0]
    x = jax.image.resize(images, (B, size, size, 3), "linear")
    return (x - CLIP_MEAN) / CLIP_STD


def state_dict_to_tree(flat: Dict[str, np.ndarray], dtype=jnp.float32) -> Dict:
    """Flat torch/transformers CLIP state dict -> nested param pytree.

    The patch-embedding conv (D, 3, P, P) becomes a (P*P*3, D) matmul kernel
    matching :func:`_patchify`'s (i, j, c) flattening; ``position_ids``
    buffers are dropped."""
    tree: Dict = {}
    for name, arr in flat.items():
        if name.endswith("position_ids"):
            continue
        a = np.asarray(arr, np.float32)
        parts = name.split(".")
        if name.endswith("patch_embedding.weight"):
            a = a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0])
            parts[-1] = "kernel"
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(a, dtype)
    return tree


def init_vision_params(rng: jax.Array, cfg: VisionConfig) -> Dict:
    def lin(key, ci, co):
        s = 1.0 / math.sqrt(ci)
        return {"weight": jax.random.uniform(key, (co, ci), jnp.float32, -s, s),
                "bias": jnp.zeros((co,))}

    D = cfg.hidden_size
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    keys = iter(jax.random.split(rng, 6 * cfg.num_layers + 4))
    layers = {}
    for i in range(cfg.num_layers):
        layers[str(i)] = {
            "layer_norm1": {"weight": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "self_attn": {n: lin(next(keys), D, D)
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm2": {"weight": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "mlp": {"fc1": lin(next(keys), D, cfg.intermediate_size),
                    "fc2": lin(next(keys), cfg.intermediate_size, D)},
        }
    P3 = cfg.patch_size * cfg.patch_size * 3
    return {"vision_model": {
        "embeddings": {
            "class_embedding": 0.02 * jax.random.normal(next(keys), (D,)),
            "patch_embedding": {"kernel": 0.02 * jax.random.normal(next(keys), (P3, D))},
            "position_embedding": {"weight": 0.01 * jax.random.normal(next(keys), (n_pos, D))},
        },
        "pre_layrnorm": {"weight": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "encoder": {"layers": layers},
        "post_layernorm": {"weight": jnp.ones((D,)), "bias": jnp.zeros((D,))},
    }}


def init_clip_params(rng: jax.Array, vcfg: VisionConfig, tcfg: TextConfig) -> Dict:
    """Random full CLIP param tree (vision + text + projections) for tests."""
    from ..sr.text import init_text_params

    kv, kt, kp, kq = jax.random.split(rng, 4)
    params = init_vision_params(kv, vcfg)
    params.update(init_text_params(kt, tcfg))
    P = vcfg.projection_dim
    sv = 1.0 / math.sqrt(vcfg.hidden_size)
    st = 1.0 / math.sqrt(tcfg.hidden_size)
    params["visual_projection"] = {
        "weight": jax.random.uniform(kp, (P, vcfg.hidden_size), jnp.float32, -sv, sv)}
    params["text_projection"] = {
        "weight": jax.random.uniform(kq, (P, tcfg.hidden_size), jnp.float32, -st, st)}
    return params


class CLIPLoss:
    """Text-image guidance loss (clip_utils.py:11-63 parity).

    ``prepare_text(texts)`` embeds prompts once; ``__call__(images)`` scores
    [0,1] renders with ``-(img_z · text_z).sum(-1).mean()``. With multiple
    prompts, pass ``prompt_index`` (host-sampled) to pick one per call — the
    reference uses ``random.randint`` per step.

    Construct with a real param tree (``state_dict_to_tree`` of a published
    ViT-B/16 checkpoint) or, offline, with ``init_clip_params`` randoms or a
    bespoke ``loss_fn(images) -> scalar``.
    """

    def __init__(self, params: Optional[Dict] = None,
                 vision_cfg: Optional[VisionConfig] = None,
                 text_cfg: Optional[TextConfig] = None,
                 tokenizer: Optional[Callable[[str], np.ndarray]] = None,
                 loss_fn: Optional[Callable] = None):
        if params is None and loss_fn is None:
            raise NotImplementedError(
                "CLIP guidance needs ViT weights (no checkpoints ship in this "
                "offline environment). Provide params= (state_dict_to_tree of "
                "a ViT-B/16 checkpoint) or loss_fn=callable(images)->scalar "
                "to enable --rand_pose training.")
        self.params = params
        self.vision_cfg = vision_cfg or VisionConfig()
        self.text_cfg = text_cfg
        self.tokenizer = tokenizer
        self.loss_fn = loss_fn
        self.text_zs: Optional[jnp.ndarray] = None

    def prepare_text(self, texts: Sequence[str],
                     tokens: Optional[np.ndarray] = None) -> None:
        """Embed prompts once (utils.py:503). ``tokens`` (N, L) bypasses the
        tokenizer for tests / precomputed ids."""
        if self.loss_fn is not None:
            return
        if tokens is None:
            assert self.tokenizer is not None, "need a tokenizer or tokens="
            tokens = np.concatenate([self.tokenizer(t) for t in texts], axis=0)
        self.text_zs = text_features(self.params, self.text_cfg,
                                     jnp.asarray(tokens))

    def __call__(self, images: jnp.ndarray, prompt_index: int = 0) -> jnp.ndarray:
        """images (B, H, W, 3) in [0,1] -> scalar loss (differentiable)."""
        if self.loss_fn is not None:
            return self.loss_fn(images)
        assert self.text_zs is not None, "call prepare_text first"
        x = preprocess(images, self.vision_cfg.image_size)
        img_z = image_features(self.params, self.vision_cfg, x)
        t_z = jax.lax.stop_gradient(self.text_zs[prompt_index])
        return -(img_z * t_z).sum(-1).mean()
