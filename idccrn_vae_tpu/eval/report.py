"""Per-SNR-bucket median reporting, the reference's published format.

The reference's only published quality evidence is per-SNR-bucket box
plots of SI-SDR / PESQ / ESTOI on DNS3 / WSJ0-QUT / VB-DMD
(/root/reference/results/*.png; medians transcribed in BASELINE.md).
This module reproduces that report shape from the eval runners'
per-utterance score files: for each bucket, the median enhanced score,
the median unprocessed-noisy score, and the median of PAIRED per-
utterance deltas (more robust than a difference of medians at the
small per-bucket n a demo corpus affords).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import numpy as np


def bucketed_median_report(
    per_utt: Mapping[str, Mapping[str, float]],
    noisy_per_utt: Mapping[str, Mapping[str, float]],
    bucket_of: Mapping[str, str],
    bucket_order: Optional[Sequence[str]] = None,
) -> Dict[str, dict]:
    """Per-bucket medians of enhanced / noisy / paired-delta scores.

    per_utt / noisy_per_utt: utterance name -> {metric: value} (the
    runners' per_utterance.json / noisy_per_utterance.json contents).
    bucket_of: utterance name -> bucket label; utterances without a
    bucket are grouped under "(unbucketed)".

    Returns {bucket: {"n": int, metric: {"enhanced": med, "noisy": med,
    "delta": median of per-utt (enhanced - noisy)}}}, insertion-ordered
    by bucket_order (then any extra buckets, sorted).
    """
    groups: Dict[str, list] = {}
    for name, scores in per_utt.items():
        groups.setdefault(bucket_of.get(name, "(unbucketed)"),
                          []).append(name)
    order = [b for b in (bucket_order or []) if b in groups]
    order += sorted(b for b in groups if b not in order)

    report: Dict[str, dict] = {}
    for bucket in order:
        names = groups[bucket]
        row: dict = {"n": len(names)}
        metrics = sorted({k for n in names for k in per_utt[n]})
        for m in metrics:
            enh = np.array([per_utt[n][m] for n in names
                            if m in per_utt[n]], np.float64)
            paired = [(per_utt[n][m], noisy_per_utt[n][m]) for n in names
                      if m in per_utt[n]
                      and m in noisy_per_utt.get(n, {})]
            entry = {"enhanced": float(np.median(enh))}
            if paired:
                arr = np.array(paired, np.float64)
                entry["noisy"] = float(np.median(arr[:, 1]))
                entry["delta"] = float(np.median(arr[:, 0] - arr[:, 1]))
            row[m] = {k: round(v, 4) for k, v in entry.items()}
        report[bucket] = row
    return report


def format_bucket_table(report: Mapping[str, dict],
                        metrics: Sequence[str] = ("sisdr", "pesq",
                                                  "estoi")) -> str:
    """Plain-text table of a bucketed_median_report (noisy -> enhanced
    (delta) per metric per bucket), for logs and the E2E driver."""
    have = [m for m in metrics
            if any(m in row for row in report.values())]
    head = ["bucket", "n"] + [f"{m} noisy->enh (Δmed)" for m in have]
    lines = []
    for bucket, row in report.items():
        cells = [bucket, str(row.get("n", ""))]
        for m in have:
            e = row.get(m)
            if not e:
                cells.append("-")
            elif "noisy" in e:
                cells.append(f"{e['noisy']:.3f}->{e['enhanced']:.3f} "
                             f"({e['delta']:+.3f})")
            else:
                cells.append(f"{e['enhanced']:.3f}")
        lines.append(cells)
    widths = [max(len(r[i]) for r in [head] + lines)
              for i in range(len(head))]
    fmt = "  ".join(f"{{:<{w}}}" for w in widths)
    return "\n".join(fmt.format(*r) for r in [head] + lines)
