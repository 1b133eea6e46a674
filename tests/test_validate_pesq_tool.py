"""The PESQ certification harness (tools/validate_pesq.py) has never
been able to execute in this image — the ITU `pesq` package is
uninstallable offline (BASELINE.md records the attempt). These tests
prove the harness ITSELF is runnable end-to-end by injecting stub
`pesq`/`pystoi` modules, so that on any networked host the remaining
step is literally `pip install pesq pystoi && python
tools/validate_pesq.py` (VERDICT r3 weak #4)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "validate_pesq", os.path.join(REPO, "tools", "validate_pesq.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def stub_itu(monkeypatch):
    """Fake `pesq`/`pystoi` that return the NATIVE scores plus a known
    constant offset — the harness's reported deltas must recover it."""
    from idccrn_vae_tpu.eval.metrics import stoi as stoi_native
    from idccrn_vae_tpu.eval.pesq_native import pesq_wb_native

    OFFSET = 0.013

    pesq_mod = types.ModuleType("pesq")
    pesq_mod.pesq = (lambda fs, ref, deg, mode="wb":
                     pesq_wb_native(ref, deg, fs) + OFFSET)
    pystoi_mod = types.ModuleType("pystoi")
    pystoi_mod.stoi = (lambda ref, deg, fs, extended=False:
                       stoi_native(ref, deg, fs, extended=extended))
    monkeypatch.setitem(sys.modules, "pesq", pesq_mod)
    monkeypatch.setitem(sys.modules, "pystoi", pystoi_mod)
    return OFFSET


def test_harness_runs_and_reports_known_offset(stub_itu, monkeypatch,
                                               capsys):
    tool = _load_tool()
    # 4 synthetic conditions keep the test fast
    full = tool.synthetic_pairs
    monkeypatch.setattr(
        tool, "synthetic_pairs",
        lambda: (p for i, p in enumerate(full()) if i < 4))
    stats = tool.main([])
    assert stats["n"] == 4
    # deltas recover the injected constant offset exactly
    assert stats["mean_abs_delta"] == pytest.approx(stub_itu, abs=1e-9)
    assert stats["max_abs_delta"] == pytest.approx(stub_itu, abs=1e-9)
    assert stats["rank_corr"] == pytest.approx(1.0)
    # the printed report carries the acceptance framing
    out = capsys.readouterr().out
    assert "mean |delta|" in out and "linear fit" in out


def test_harness_scores_wav_pairs(stub_itu, tmp_path):
    from idccrn_vae_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    sp = (0.3 * np.sin(2 * np.pi * 220 * np.arange(32000) / 16000)
          ).astype(np.float32)
    deg = (sp + 0.05 * rng.standard_normal(len(sp))).astype(np.float32)
    write_wav(str(tmp_path / "a_clean.wav"), sp, 16000)
    write_wav(str(tmp_path / "a_deg.wav"), deg, 16000)
    tool = _load_tool()
    stats = tool.main([str(tmp_path)])
    assert stats["n"] == 1


def test_harness_rejects_empty_dir(stub_itu, tmp_path):
    tool = _load_tool()
    with pytest.raises(SystemExit, match="no .clean, deg. pairs"):
        tool.main([str(tmp_path)])
