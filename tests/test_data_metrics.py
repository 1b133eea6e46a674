"""Data pipeline + metric sanity tests."""

import json
import os

import numpy as np
import pytest

from idccrn_vae_tpu.data.audio_io import (
    read_wav,
    resample,
    trim_silence,
    write_wav,
)
from idccrn_vae_tpu.data.loader import BatchLoader
from idccrn_vae_tpu.data.segments import (
    SegmentDataset,
    build_segment_index,
    companion_paths,
)
from idccrn_vae_tpu.data.stats import corpus_mean_std
from idccrn_vae_tpu.eval.metrics import (
    EvalMetrics,
    compute_mean,
    compute_median,
    compute_rmse,
    compute_sisdr,
    stoi,
)

FS = 16000


@pytest.fixture
def wav_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(3):
        # speech-ish: amplitude-modulated tone + noise, 2 s
        t = np.arange(2 * FS) / FS
        x = (0.3 * np.sin(2 * np.pi * 220 * t) * (1 + np.sin(2 * np.pi * 3 * t))
             + 0.05 * rng.standard_normal(2 * FS)).astype(np.float32)
        write_wav(str(tmp_path / f"clean_fileid_{i}.wav"), x, FS)
    return tmp_path


def test_wav_roundtrip(tmp_path):
    x = np.clip(
        np.random.default_rng(1).standard_normal(8000) * 0.2, -0.99, 0.99
    ).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, FS)
    y, fs = read_wav(p)
    assert fs == FS
    np.testing.assert_allclose(y, x, atol=1e-4)  # PCM16 quantization


def test_trim_silence():
    x = np.zeros(16000, np.float32)
    x[6000:10000] = np.random.default_rng(2).standard_normal(4000) * 0.5
    b, e = trim_silence(x, 30.0)
    assert 4000 <= b <= 6100
    assert 9900 <= e <= 12000


def test_resample_length():
    x = np.random.default_rng(3).standard_normal(16000).astype(np.float32)
    y = resample(x, 16000, 10000)
    assert abs(len(y) - 10000) <= 1


def test_segment_index_and_dataset(wav_dir, tmp_path):
    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir))
    idx = build_segment_index(files, sequence_len=81, hop=100, fs=FS,
                              trim=False, shuffle=False)
    # 2 s = 32000 samples; window = 80*100 = 8000 -> (1+320)//81 = 3 per file
    assert len(idx) == 9
    ds = SegmentDataset(idx, "single")
    assert ds[0].shape == (8000,)
    # caching round-trips
    cache = str(tmp_path / "cache.json")
    idx2 = build_segment_index(files, 81, 100, FS, trim=False, shuffle=False,
                               cache_path=cache)
    idx3 = build_segment_index(files, 81, 100, FS, trim=False, shuffle=False,
                               cache_path=cache, use_cache=True)
    assert idx2 == idx3


def test_companion_paths():
    c, n = companion_paths("/d/noisy/book_fileid_42.wav", "/d/clean", "/d/noise")
    assert c == "/d/clean/clean_fileid_42.wav"
    assert n == "/d/noise/noise_fileid_42.wav"


def test_batch_loader(wav_dir):
    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir))
    idx = build_segment_index(files, 81, 100, FS, trim=False, shuffle=False)
    ds = SegmentDataset(idx, "single")
    loader = BatchLoader(ds, batch_size=4, shuffle=True, num_threads=2)
    batches = list(loader)
    assert len(batches) == len(idx) // 4
    assert batches[0].shape == (4, 8000)
    # epoch reshuffles but sizes stay
    batches2 = list(loader)
    assert len(batches2) == len(batches)


def test_corpus_mean_std(wav_dir):
    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir))
    mean, std = corpus_mean_std(files, trim=False)
    assert mean.shape == (257, 2)
    assert std.shape == (257, 2)
    assert np.all(std >= 0)
    # 220 Hz bin (220/16000*512 ≈ bin 7) should dominate energy
    assert std[7].max() > std[200].max()


def test_rmse_sisdr():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(16000)
    assert compute_rmse(2.0 * x, x) < 1e-7  # scale-invariant
    assert compute_sisdr(2.0 * x, x) > 80
    noisy = x + 0.1 * rng.standard_normal(16000)
    assert 15 < compute_sisdr(noisy, x) < 25


def test_stoi_sanity():
    rng = np.random.default_rng(5)
    t = np.arange(3 * FS) / FS
    x = (np.sin(2 * np.pi * 300 * t) * (1 + np.sin(2 * np.pi * 4 * t))
         + 0.02 * rng.standard_normal(3 * FS))
    clean_score = stoi(x, x, FS, extended=False)
    assert clean_score > 0.95
    noisy = x + 1.5 * rng.standard_normal(3 * FS)
    noisy_score = stoi(x, noisy, FS, extended=False)
    assert noisy_score < clean_score
    e_clean = stoi(x, x, FS, extended=True)
    e_noisy = stoi(x, noisy, FS, extended=True)
    assert e_clean > 0.95 and e_noisy < e_clean


def test_eval_metrics_all():
    rng = np.random.default_rng(6)
    t = np.arange(2 * FS) / FS
    x = np.sin(2 * np.pi * 250 * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t))
    est = x + 0.1 * rng.standard_normal(len(x))
    out = EvalMetrics("all").eval(est, x, FS, "t")
    assert len(out) == 4
    rmse, sisdr, pesq_s, estoi_s = out
    assert rmse > 0 and sisdr > 5 and 0 < estoi_s <= 1
    assert 1.0 <= pesq_s <= 4.644  # native PESQ-WB: a real score


def test_ci_helpers():
    data = np.array([1.0, 2.0, 3.0, 4.0])
    m, ci = compute_mean(data)
    assert m == 2.5 and ci > 0
    med, mci = compute_median(data)
    assert med == 2.5
    with pytest.raises(NameError):
        compute_mean(np.array([1.0, np.nan]))


def test_batch_loader_propagates_worker_errors():
    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt sample")
            return np.zeros(10, np.float32)

    loader = BatchLoader(Bad(), batch_size=2, shuffle=False, num_threads=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader:
            pass


def test_rmse_zero_estimate_finite():
    """A fully suppressed (all-zero) estimate must not produce a 0/0
    NaN that aborts the whole eval summary."""
    from idccrn_vae_tpu.eval.metrics import compute_rmse

    ref = np.sin(np.arange(1600) / 10).astype(np.float32)
    val = compute_rmse(np.zeros_like(ref), ref)
    assert np.isfinite(val)


def test_loader_set_epoch_reproducible():
    """A resumed run must draw epoch-k's shuffle order, not epoch 0's:
    set_epoch pins the order regardless of process-local history."""

    class Ix:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return np.asarray([i], np.float32)

    def order(loader):
        return [int(b[0][0]) for b in loader]

    fresh = BatchLoader(Ix(), batch_size=1, shuffle=True, num_threads=1)
    fresh.set_epoch(3)
    o3 = order(fresh)

    resumed = BatchLoader(Ix(), batch_size=1, shuffle=True, num_threads=1)
    for e in range(4):
        resumed.set_epoch(e)
        oe = order(resumed)
    assert oe == o3
    resumed.set_epoch(0)
    assert order(resumed) != o3  # epochs genuinely differ


def test_segment_cache_invalidated_on_geometry_change(wav_dir, tmp_path):
    """The cache must NOT be reused when sequence_len/hop/corpus change
    (the reference's pkl cache, keyed only by first_use, silently
    trained on stale windows)."""
    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir))
    cache = str(tmp_path / "c.json")
    idx = build_segment_index(files, 81, 100, FS, trim=False,
                              shuffle=False, cache_path=cache)
    # same geometry -> cache hit
    assert build_segment_index(files, 81, 100, FS, trim=False,
                               shuffle=False, cache_path=cache,
                               use_cache=True) == idx
    # different sequence_len -> rebuilt, different windows
    idx2 = build_segment_index(files, 41, 100, FS, trim=False,
                               shuffle=False, cache_path=cache,
                               use_cache=True)
    assert idx2 != idx and idx2[0][2] - idx2[0][1] == 4000
    # corpus shrinks -> rebuilt again
    idx3 = build_segment_index(files[:1], 41, 100, FS, trim=False,
                               shuffle=False, cache_path=cache,
                               use_cache=True)
    assert {e[0] for e in idx3} == {files[0]}


def test_companion_paths_rejects_nonconforming_name():
    import pytest

    with pytest.raises(ValueError, match="fileid"):
        companion_paths("/d/noisy/noisy_001.wav", "/d/clean", "/d/noise")


def test_segment_cache_invalidated_on_order_change(wav_dir, tmp_path):
    """shuffle and seed determine the index ORDER — they must be part of
    the cache key or a cached shuffled index is silently returned to a
    caller who asked for a different ordering."""
    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir))
    cache = str(tmp_path / "c.json")
    idx_shuf = build_segment_index(files, 41, 100, FS, trim=False,
                                   shuffle=True, seed=1, cache_path=cache)
    idx_plain = build_segment_index(files, 41, 100, FS, trim=False,
                                    shuffle=False, cache_path=cache,
                                    use_cache=True)
    assert sorted(idx_plain) == sorted(idx_shuf)
    assert idx_plain == sorted(
        idx_plain, key=lambda e: (files.index(e[0]), e[1]))
    idx_seed2 = build_segment_index(files, 41, 100, FS, trim=False,
                                    shuffle=True, seed=2, cache_path=cache,
                                    use_cache=True)
    assert idx_seed2 != idx_plain


def test_corpus_mean_std_empty_raises(tmp_path):
    """All-too-short corpus must raise, not return all-zero stats that a
    later training run would load as datanorm (1/(std+1e-6) blowup)."""
    from idccrn_vae_tpu.data.audio_io import write_wav

    p = str(tmp_path / "tiny_fileid_0.wav")
    write_wav(p, np.zeros(64, np.float32), FS)  # < n_fft=512
    with pytest.raises(ValueError, match="0 frames"):
        corpus_mean_std([p], n_fft=512, hop=100, fs=FS, trim=False)


def test_batch_loader_abandoned_iteration_cleans_up(wav_dir):
    """Breaking out of an epoch early must release the prefetch workers
    (they used to block forever on the full output queue)."""
    import threading
    import time

    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir))
    index = build_segment_index(files, 41, 100, FS, trim=False,
                                shuffle=False)
    ds = SegmentDataset(index, mode="single")
    loader = BatchLoader(ds, batch_size=1, shuffle=False, num_threads=2,
                         prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # what `break` does at gc time
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_index_cache_routed_out_of_cwd(wav_dir, tmp_path, monkeypatch):
    """Round-4 fix for the CWD-droppings footgun: loaders_from_ini
    writes the segment-index cache next to the corpus (or into
    IDCCRN_CACHE_DIR), never into the launch directory; a legacy CWD
    cache is still honored read-only."""
    from idccrn_vae_tpu.cli.common import _index_cache_path
    from idccrn_vae_tpu.data.segments import build_segment_index as bsi

    # default: next to the corpus
    monkeypatch.delenv("IDCCRN_CACHE_DIR", raising=False)
    assert _index_cache_path(str(wav_dir), "ds", "train") == str(
        wav_dir / "ds_train.json")
    # env override wins
    cdir = tmp_path / "cachehome"
    monkeypatch.setenv("IDCCRN_CACHE_DIR", str(cdir))
    assert _index_cache_path(str(wav_dir), "ds", "train") == str(
        cdir / "ds_train.json")

    # legacy CWD cache is read when the primary has no valid entry,
    # and the rebuild-on-miss still writes ONLY to the primary
    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir))
    legacy = str(tmp_path / "legacy.json")
    idx = bsi(files, 81, 100, FS, trim=False, shuffle=False,
              cache_path=legacy)
    primary = str(tmp_path / "sub" / "primary.json")
    got = bsi(files, 81, 100, FS, trim=False, shuffle=False,
              cache_path=primary, use_cache=True,
              legacy_cache_paths=(legacy,))
    assert got == idx
    assert not os.path.exists(primary)  # legacy HIT -> nothing rewritten
    # stale legacy (different geometry) -> rebuilt and written to primary
    got2 = bsi(files, 41, 100, FS, trim=False, shuffle=False,
               cache_path=primary, use_cache=True,
               legacy_cache_paths=(legacy,))
    assert os.path.exists(primary)
    assert got2[0][2] - got2[0][1] == 4000


def test_index_cache_corrupt_file_rebuilds(wav_dir, tmp_path):
    """A truncated/corrupt cache (killed writer) must rebuild, not crash
    every subsequent launch; the rewrite is atomic (no .tmp left)."""
    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir)
                   if f.endswith(".wav"))
    cache = str(tmp_path / "idx.json")
    with open(cache, "w") as f:
        f.write('{"key": {"trunc')  # half-written JSON
    idx = build_segment_index(files, 81, 100, FS, trim=False,
                              shuffle=False, cache_path=cache,
                              use_cache=True)
    assert idx
    with open(cache) as f:
        assert json.load(f)["index"]  # repaired in place
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]


def test_index_cache_path_for_txt_filelist(tmp_path, monkeypatch):
    """A .txt file-list corpus caches BESIDE the list file (the corpus
    'dir' is a file — nesting under it would fail every write)."""
    from idccrn_vae_tpu.cli.common import _index_cache_path

    monkeypatch.delenv("IDCCRN_CACHE_DIR", raising=False)
    lst = tmp_path / "corpus" / "list.txt"
    lst.parent.mkdir()
    lst.write_text("")
    assert _index_cache_path(str(lst), "ds", "train") == str(
        tmp_path / "corpus" / "ds_train.json")


def test_index_cache_write_failure_is_nonfatal(wav_dir):
    """A read-only corpus mount must not kill indexing — the cache write
    warns and the index is still returned."""
    import warnings as _w

    files = sorted(str(wav_dir / f) for f in os.listdir(wav_dir))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        idx = build_segment_index(
            files, 81, 100, FS, trim=False, shuffle=False,
            cache_path="/proc/definitely/not/writable/c.json")
    assert idx
    assert any("segment-index cache" in str(r.message) for r in rec)
