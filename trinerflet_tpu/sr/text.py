"""CLIP text encoder + prompt processor in pure JAX.

Reference: ``threestudio/models/prompt_processors/base.py`` (+
``stable_diffusion_prompt_processor.py``) — embeds the prompt and the
negative prompt once in a spawned subprocess and caches the embeddings to
disk; the x4-upscaler consumes them as ``encoder_hidden_states``.

Here the text tower is the standard CLIPTextModel transformer (token +
position embeddings, pre-LN blocks with causal self-attention, final LN),
with params keyed by the transformers state-dict names so a
``text_encoder/model.safetensors`` from any SD checkpoint loads mechanically
via ``sr.diffusion.load_safetensors_params``. A minimal byte-level BPE
tokenizer loads the checkpoint's own ``vocab.json``/``merges.txt``. Offline
(no weights), ``init_text_params`` + ``PromptProcessor(tokens=...)`` keep the
whole path integration-testable.
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import html
import json
import math
import os
import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TextConfig", "init_text_params", "text_encode",
    "CLIPTokenizer", "PromptProcessor",
]


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024          # OpenCLIP-H (SD2.x family)
    num_layers: int = 23             # penultimate layer of a 24-layer tower
    num_heads: int = 16
    intermediate_size: int = 4096
    max_length: int = 77
    hidden_act: str = "gelu"         # SD1.x CLIP-L uses "quick_gelu"

    @classmethod
    def from_json(cls, path: str) -> "TextConfig":
        """Build from a transformers ``config.json``.

        Diffusers SD2-family/x4-upscaler text-encoder checkpoints already ship
        with the penultimate-layer trim baked in (config says 23 layers and the
        reference runs all of them via ``text_encoder(...)[0]``), so the layer
        count is used as-is; only an untrimmed 24-layer OpenCLIP tower gets the
        penultimate trim applied here."""
        with open(path) as f:
            c = json.load(f)
        layers = c["num_hidden_layers"]
        return cls(
            vocab_size=c["vocab_size"], hidden_size=c["hidden_size"],
            num_layers=layers - 1 if layers >= 24 else layers,
            num_heads=c["num_attention_heads"],
            intermediate_size=c["intermediate_size"],
            max_length=c.get("max_position_embeddings", 77),
            hidden_act=c.get("hidden_act", "gelu"),
        )


def _ln(p, x, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["weight"] + p["bias"]


def _lin(p, x):
    return x @ p["weight"].T + p["bias"]


def _act(name, x):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def text_encode(params: Dict, cfg: TextConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens (B, L) int32 -> hidden states (B, L, D)."""
    tm = params["text_model"]
    B, L = tokens.shape
    x = jnp.take(tm["embeddings"]["token_embedding"]["weight"], tokens, axis=0)
    x = x + tm["embeddings"]["position_embedding"]["weight"][:L]

    causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    H = cfg.num_heads
    d = cfg.hidden_size // H
    for i in range(cfg.num_layers):
        lp = tm["encoder"]["layers"][str(i)]
        h = _ln(lp["layer_norm1"], x)
        a = lp["self_attn"]
        q = _lin(a["q_proj"], h).reshape(B, L, H, d).transpose(0, 2, 1, 3)
        k = _lin(a["k_proj"], h).reshape(B, L, H, d).transpose(0, 2, 1, 3)
        v = _lin(a["v_proj"], h).reshape(B, L, H, d).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(d) + causal
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", att, v).transpose(0, 2, 1, 3).reshape(B, L, -1)
        x = x + _lin(a["out_proj"], o)
        h = _ln(lp["layer_norm2"], x)
        x = x + _lin(lp["mlp"]["fc2"], _act(cfg.hidden_act, _lin(lp["mlp"]["fc1"], h)))
    return _ln(tm["final_layer_norm"], x)


def init_text_params(rng: jax.Array, cfg: TextConfig) -> Dict:
    def lin(key, ci, co):
        s = 1.0 / math.sqrt(ci)
        return {"weight": jax.random.uniform(key, (co, ci), jnp.float32, -s, s),
                "bias": jnp.zeros((co,))}

    keys = iter(jax.random.split(rng, 8 * cfg.num_layers + 4))
    D = cfg.hidden_size
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
    return {"text_model": {
        "embeddings": {
            "token_embedding": {"weight": 0.02 * jax.random.normal(next(keys), (cfg.vocab_size, D))},
            "position_embedding": {"weight": 0.01 * jax.random.normal(next(keys), (cfg.max_length, D))},
        },
        "encoder": {"layers": layers},
        "final_layer_norm": {"weight": jnp.ones((D,)), "bias": jnp.zeros((D,))},
    }}


# ---------------------------------------------------------------------------
# Tokenizer (CLIP byte-level BPE; loads the checkpoint's vocab/merges)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP byte-level fallback map: every byte gets a printable unicode
    char that exists in the vocab, so no input can tokenize to <unk>."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class CLIPTokenizer:
    # CLIP's BPE regex ('s|'t|...|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+) in
    # stdlib-re form: letter runs, SINGLE digits, greedy non-alnum runs
    # (underscore counts as punctuation, not a word char).
    PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[^\W\d_]+|\d|(?:[^\w\s]|_)+",
        re.IGNORECASE,
    )

    def __init__(self, vocab_path: str, merges_path: str, max_length: int = 77):
        with open(vocab_path) as f:
            self.vocab: Dict[str, int] = json.load(f)
        opener = gzip.open if merges_path.endswith(".gz") else open
        with opener(merges_path, "rt") as f:
            lines = f.read().split("\n")
        lines = [l for l in lines if l and not l.startswith("#version")]
        self.ranks = {tuple(l.split()): i for i, l in enumerate(lines)}
        self.max_length = max_length
        self.bos = self.vocab.get("<|startoftext|>", 49406)
        self.eos = self.vocab.get("<|endoftext|>", 49407)
        self.byte_encoder = _bytes_to_unicode()

    def _bpe(self, word: str) -> List[str]:
        parts = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pairs = [(self.ranks.get((a, b), 1 << 30), i)
                     for i, (a, b) in enumerate(zip(parts, parts[1:]))]
            rank, i = min(pairs)
            if rank == 1 << 30:
                break
            parts = parts[:i] + [parts[i] + parts[i + 1]] + parts[i + 2:]
        return parts

    def __call__(self, text: str) -> np.ndarray:
        text = html.unescape(html.unescape(text.strip()))
        text = re.sub(r"\s+", " ", text).lower()
        ids = [self.bos]
        for tok in self.PAT.findall(text):
            if tok in ("<|startoftext|>", "<|endoftext|>"):
                ids.append(self.bos if tok == "<|startoftext|>" else self.eos)
                continue
            # byte-level fallback: every byte maps to a vocab char, so
            # arbitrary input (emoji, CJK, ...) never produces <unk>
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(tok):
                ids.append(self.vocab.get(piece, self.eos))
            if len(ids) >= self.max_length - 1:
                break
        ids = ids[: self.max_length - 1] + [self.eos]
        ids += [self.eos] * (self.max_length - len(ids))
        return np.asarray(ids, np.int32)[None]


# ---------------------------------------------------------------------------
# Prompt processor
# ---------------------------------------------------------------------------

class PromptProcessor:
    """Embed (prompt, negative prompt) once and cache to disk — the reference
    runs this in a spawned subprocess and caches to .threestudio_cache
    (prompt_processors/base.py); here it is a plain call + npz cache.

    Provide either (params, cfg, tokenizer) for the real path, or
    ``tokens=`` pre-tokenized ids / ``embeds=`` precomputed embeddings for
    offline use.
    """

    def __init__(self, prompt: str = "", negative_prompt: str = "",
                 params: Optional[Dict] = None, cfg: Optional[TextConfig] = None,
                 tokenizer: Optional[CLIPTokenizer] = None,
                 cache_dir: Optional[str] = None,
                 embeds: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        self.prompt = prompt
        self.negative_prompt = negative_prompt
        self._embeds = embeds
        self.params, self.cfg, self.tokenizer = params, cfg, tokenizer
        self.cache_dir = cache_dir

    @property
    def available(self) -> bool:
        return self._embeds is not None or (
            self.params is not None and self.tokenizer is not None
        )

    def _cache_path(self) -> Optional[str]:
        if not self.cache_dir:
            return None
        import hashlib

        h = hashlib.sha1(f"{self.prompt}\x00{self.negative_prompt}".encode()).hexdigest()[:16]
        return os.path.join(self.cache_dir, f"prompt_{h}.npz")

    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (cond_embeds (1, L, D), uncond_embeds (1, L, D))."""
        if self._embeds is not None:
            return self._embeds
        if not self.available:
            raise NotImplementedError(
                "PromptProcessor needs a CLIP text encoder checkpoint "
                "(params + tokenizer files) or precomputed embeds=; neither "
                "is bundled in this offline environment."
            )
        cp = self._cache_path()
        if cp and os.path.exists(cp):
            z = np.load(cp)
            return jnp.asarray(z["cond"]), jnp.asarray(z["uncond"])
        enc = jax.jit(functools.partial(text_encode, self.params, self.cfg))
        cond = enc(jnp.asarray(self.tokenizer(self.prompt)))
        uncond = enc(jnp.asarray(self.tokenizer(self.negative_prompt)))
        if cp:
            os.makedirs(self.cache_dir, exist_ok=True)
            np.savez(cp, cond=np.asarray(cond), uncond=np.asarray(uncond))
        return cond, uncond
