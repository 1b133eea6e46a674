"""Serve from an exported artifact — no checkpoint or model code.

Counterpart to cli/export_model.py: loads the StableHLO artifact
written there (`eval/export.py`) and enhances a directory of wavs.
Everything the program needs (weights included) lives in the artifact;
this entrypoint only does wav IO, length bucketing to the artifact's
fixed length, and batching.

  python -m idccrn_vae_tpu.cli.run_artifact \
      --artifact_dir artifact/ --in_dir noisy/ --out_dir enhanced/
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact_dir", type=str, required=True)
    p.add_argument("--in_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0,
                   help="latent-sampling key fed to the artifact")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from idccrn_vae_tpu.data.audio_io import write_wav
    from idccrn_vae_tpu.data.segments import find_wavs
    from idccrn_vae_tpu.eval.export import load_artifact
    from idccrn_vae_tpu.eval.runners import load_testset

    call, meta = load_artifact(args.artifact_dir)
    length, fs = meta["length"], meta["fs"]
    raw_key = np.asarray([0, args.seed], np.uint32)

    paths = find_wavs(args.in_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    wavs = load_testset(paths, fs)

    # each utterance is cut into fixed-`length` windows (the artifact is
    # length-specialized). Adjacent windows OVERLAP by n_fft so the
    # independently-enhanced window heads (which lack left context) are
    # cross-faded against the previous window's in-context tail instead
    # of butting into it as an audible seam (ADVICE r2). Windows from
    # ALL files flatten into one span list so --batch_size bounds the
    # device batch in WINDOWS — a single long file cannot blow past it.
    overlap = min(int(meta.get("n_fft", 512)), length // 2)
    step = max(length - overlap, 1)
    spans = []  # (utt_idx, start, valid)
    for u, w in enumerate(wavs):
        start = 0
        while True:
            spans.append((u, start, max(min(length, len(w) - start), 0)))
            if start + length >= len(w):
                break
            start += step
    # group similar-length windows together so short tails batch into
    # the smaller artifact buckets (load_artifact pads to the smallest
    # covering bucket per call)
    spans.sort(key=lambda s: -s[2])
    # weighted overlap-add: ramped window weights, normalized by the
    # accumulated weight afterwards (self-normalizing — a sample covered
    # by a single ramped window divides back to full scale)
    num = [np.zeros(len(w), np.float64) for w in wavs]
    den = [np.zeros(len(w), np.float64) for w in wavs]

    t0 = time.perf_counter()
    for s in range(0, len(spans), args.batch_size):
        group = spans[s : s + args.batch_size]
        width = max(1, max(v for _, _, v in group))
        batch = np.zeros((len(group), width), np.float32)
        for r, (u, start, valid) in enumerate(group):
            batch[r, :valid] = wavs[u][start : start + valid]
        out = np.asarray(call(batch, raw_key))
        for r, (u, start, valid) in enumerate(group):
            v = min(valid, out.shape[1])
            if v <= 0:
                continue
            wt = np.ones(v)
            if start > 0:  # fade in against the previous window's tail
                h = min(overlap, v)
                wt[:h] = np.arange(1, h + 1) / (h + 1)
            if start + length < len(wavs[u]):  # a next window follows
                tail = min(overlap, v)
                wt[-tail:] = np.minimum(
                    wt[-tail:], np.arange(tail, 0, -1) / (tail + 1))
            num[u][start : start + v] += out[r, :v] * wt
            den[u][start : start + v] += wt
    outs = [(n / np.maximum(d, 1e-12)).astype(np.float32)
            for n, d in zip(num, den)]
    wall = time.perf_counter() - t0

    audio_s = 0.0
    for u, w in enumerate(outs):
        write_wav(os.path.join(args.out_dir, os.path.basename(paths[u])),
                  w, fs)
        audio_s += len(w) / fs
    print(json.dumps({"files": len(paths), "windows": len(spans),
                      "audio_s": round(audio_s, 2),
                      "wall_s": round(wall, 2),
                      "rtf_x": round(audio_s / wall, 1)}))


if __name__ == "__main__":
    main()
