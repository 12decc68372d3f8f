"""The SD x4-upscaler checkpoint validation runbook (scripts/validate_sd_ckpt)
dry-runs green on a synthesized tiny checkpoint: layout resolves, key sets
match the checkpoint's own config, schedule constants reproduce the
diffusers-0.16 math, and a 2-step generate_sr smoke completes.

Reference loader semantics: stable_diffusion_guidance_sr.py:94-158.
"""

import numpy as np
import pytest


@pytest.mark.e2e
def test_runbook_green_on_synthesized_checkpoint(tmp_path, capsys):
    from scripts.validate_sd_ckpt import main

    rc = main(["--synthesize", str(tmp_path / "ckpt"), "--smoke-size", "16"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "RESULT: PASS" in out
    assert out.count("[PASS]") >= 5  # layout, 2x keyset, schedule, smoke
    assert "[FAIL]" not in out


@pytest.mark.e2e
def test_runbook_flags_corrupted_checkpoint(tmp_path, capsys):
    """Key-set damage (a missing tensor) must be caught, not silently pass."""
    from safetensors.numpy import load_file, save_file

    from scripts.validate_sd_ckpt import main, synthesize

    root = tmp_path / "ckpt"
    synthesize(str(root))
    p = str(root / "vae" / "diffusion_pytorch_model.safetensors")
    flat = load_file(p)
    flat.pop(sorted(flat)[0])
    bad = {k: np.asarray(v) for k, v in flat.items()}
    save_file(bad, p)
    rc = main(["--path", str(root), "--smoke-size", "16"])
    out = capsys.readouterr().out
    assert rc != 0
    assert "[FAIL] keyset/vae" in out
