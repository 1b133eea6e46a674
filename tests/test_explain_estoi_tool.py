"""Smoke-pin the ESTOI-regression analysis tool (tools/explain_estoi.py,
VERDICT r3 weak #6): the masked-OLA resynthesis must be edge-safe (the
bug class the tool itself once had — near-zero window sums amplifying
boundary samples ~60x), and the headline findings must hold at smoke
geometry: oracle Wiener raises BOTH SI-SNR and ESTOI over noisy on the
synthetic corpus (i.e. suppression per se cannot explain a negative
ESTOI delta there)."""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "explain_estoi", os.path.join(REPO, "tools", "explain_estoi.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_masked_ola_is_edge_safe():
    tool = _load_tool()
    rng = np.random.default_rng(3)
    x = rng.standard_normal(tool.FS).astype(np.float32) * 0.1
    spec = tool._stft(x)
    # round-trip exact-ish
    rt = tool._istft(spec, len(x))
    assert np.max(np.abs(rt - x)) < 1e-6
    # a hard 0/1 mask must not blow up boundary samples
    mask = (np.abs(spec) > np.median(np.abs(spec))).astype(float)
    est = tool._istft(spec * mask, len(x))
    assert np.max(np.abs(est)) < 2.0 * np.max(np.abs(x))


def test_oracle_wiener_raises_both_sisdr_and_estoi():
    tool = _load_tool()
    out = tool.run(per_bucket=1, utt_seconds=2.0, seed=11,
                   only_arms=("noisy", "wiener^1"))
    noisy = out["per_bucket"]["noisy"]["ALL"]
    deltas = out["delta_vs_noisy_ALL"]
    assert deltas["wiener^1"]["sisdr"] > 3.0
    assert deltas["wiener^1"]["estoi"] > 0.1
    assert 0.0 < noisy["estoi"] < 0.9
    assert out["noisy_estoi_dispersion"]["unpaired_delta_95ci_at_n24"] > 0
