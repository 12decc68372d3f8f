"""CLIP text encoder, BPE tokenizer, and prompt processor (reference
threestudio prompt_processors)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trinerflet_tpu.sr.text import (
    CLIPTokenizer,
    PromptProcessor,
    TextConfig,
    init_text_params,
    text_encode,
)

TINY = TextConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                  intermediate_size=64, max_length=16)


def test_text_encode_shapes_and_causality():
    params = init_text_params(jax.random.PRNGKey(0), TINY)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 16)), jnp.int32)
    h = text_encode(params, TINY, toks)
    assert h.shape == (2, 16, 32)
    # causality: changing a LATER token must not affect earlier positions
    toks2 = toks.at[:, 10].set((toks[:, 10] + 1) % 64)
    h2 = text_encode(params, TINY, toks2)
    np.testing.assert_allclose(np.asarray(h[:, :10]), np.asarray(h2[:, :10]),
                               atol=1e-5)
    assert float(jnp.abs(h[:, 10:] - h2[:, 10:]).max()) > 1e-6


def _write_tokenizer(tmp_path):
    # micro BPE: letters + a few merges
    letters = list("abcdefghijklmnopqrstuvwxyz ")
    vocab = {}
    for ch in letters:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    for tok in ["he", "ll", "llo</w>", "hello</w>"]:
        vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    merges = ["h e", "l l", "ll o</w>", "he llo</w>"]
    vp = str(tmp_path / "vocab.json")
    mp = str(tmp_path / "merges.txt")
    with open(vp, "w") as f:
        json.dump(vocab, f)
    with open(mp, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    return vp, mp, vocab


def test_tokenizer_bpe_merges(tmp_path):
    vp, mp, vocab = _write_tokenizer(tmp_path)
    tok = CLIPTokenizer(vp, mp, max_length=8)
    ids = tok("hello")[0]
    assert ids[0] == vocab["<|startoftext|>"]
    assert ids[1] == vocab["hello</w>"]  # full merge chain applied
    assert ids[2] == vocab["<|endoftext|>"]
    assert ids.shape == (8,)
    # unknown chars fall back without crashing; padding fills with eos
    ids2 = tok("zq")[0]
    assert ids2.shape == (8,)


def test_prompt_processor_cache_and_fallbacks(tmp_path):
    vp, mp, _ = _write_tokenizer(tmp_path)
    tok = CLIPTokenizer(vp, mp, max_length=16)
    params = init_text_params(jax.random.PRNGKey(0), TINY)
    pp = PromptProcessor("hello", "", params=params, cfg=TINY, tokenizer=tok,
                         cache_dir=str(tmp_path / "cache"))
    assert pp.available
    c1, u1 = pp()
    assert c1.shape == (1, 16, 32)
    c2, u2 = pp()  # second call hits the npz cache
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)

    pre = PromptProcessor(embeds=(c1, u1))
    assert pre.available and pre()[0] is c1

    empty = PromptProcessor("x")
    assert not empty.available
    with pytest.raises(NotImplementedError):
        empty()


def test_tokenizer_parity_vs_transformers(tmp_path):
    """Golden parity of the tokenizer against transformers.CLIPTokenizer —
    the exact class that tokenizes for real published SD/CLIP checkpoints —
    over a full byte-level base vocab with merges, on prompts exercising
    digits, punctuation runs, underscores, apostrophes, unicode, and
    truncation (reference pipeline tokenization,
    threestudio/models/prompt_processors/stable_diffusion_prompt_processor.py)."""
    transformers = pytest.importorskip("transformers")
    from transformers.models.clip.tokenization_clip import bytes_to_unicode

    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    for tok in ["th", "the</w>", "ph", "oto</w>", "ca", "cat</w>"]:
        vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    merges = ["t h", "th e</w>", "p h", "ot o</w>", "c a", "ca t</w>"]
    vp = str(tmp_path / "vocab.json")
    mp = str(tmp_path / "merges.txt")
    with open(vp, "w") as f:
        json.dump(vocab, f)
    with open(mp, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")

    ours = CLIPTokenizer(vp, mp, max_length=77)
    theirs = transformers.CLIPTokenizer(vp, mp)

    prompts = [
        "a photo of the cat",
        "sks 4k 1234 photo!!!",
        "foo_bar __init__ a-b--c",
        "it's the cat's toy, isn't it?",
        "  spaced\t\tout\n text  ",
        "emoji \U0001f600 and CJK 猫 mix",
        "punct...:;()[]{}<>#@$%^&*",
        "a " * 100,  # truncation to 77
    ]
    for p in prompts:
        got = ours(p)[0].tolist()
        want = theirs(p, padding="max_length", max_length=77,
                      truncation=True)["input_ids"]
        assert got == want, (p, got[:16], want[:16])


def test_text_encode_parity_vs_transformers_cliptextmodel():
    """Golden parity of text_encode against transformers.CLIPTextModel's
    last_hidden_state (the [0] the reference pipeline consumes,
    stable_diffusion_guidance_sr.py encode stage) — same state-dict naming,
    both gelu variants."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    for act in ("gelu", "quick_gelu"):
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16, hidden_act=act)
        torch.manual_seed(0)
        model = transformers.CLIPTextModel(hf_cfg).eval()

        tree = {}
        for name, t in model.state_dict().items():
            if name.endswith("position_ids"):
                continue  # buffer, not a parameter
            node = tree
            parts = name.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(t.numpy())

        cfg = TextConfig(vocab_size=64, hidden_size=32, num_layers=3,
                         num_heads=4, intermediate_size=64, max_length=16,
                         hidden_act=act)
        toks = np.random.default_rng(0).integers(0, 64, (2, 16)).astype(np.int32)
        ours = np.asarray(text_encode(tree, cfg, jnp.asarray(toks)))
        with torch.no_grad():
            ref = model(torch.from_numpy(toks.astype(np.int64)))
        np.testing.assert_allclose(
            ours, ref.last_hidden_state.numpy(), atol=2e-5,
            err_msg=f"hidden_act={act}")


def test_text_config_from_json_trim(tmp_path):
    """Diffusers SD2-family text encoders ship pre-trimmed (23 layers, used
    as-is); only an untrimmed 24-layer OpenCLIP tower gets the penultimate
    trim (round-2 advisor finding)."""
    base = dict(vocab_size=49408, hidden_size=1024, num_attention_heads=16,
                intermediate_size=4096, max_position_embeddings=77,
                hidden_act="gelu")
    p23 = str(tmp_path / "c23.json")
    p24 = str(tmp_path / "c24.json")
    with open(p23, "w") as f:
        json.dump({**base, "num_hidden_layers": 23}, f)
    with open(p24, "w") as f:
        json.dump({**base, "num_hidden_layers": 24}, f)
    assert TextConfig.from_json(p23).num_layers == 23
    assert TextConfig.from_json(p24).num_layers == 23
