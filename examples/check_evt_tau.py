"""EVT temperature calibration: sweep tau over the diffusion-distance
distribution (the reference's check_evt_tau example, SURVEY.md §2.8).

Run: python examples/check_evt_tau.py [--confusion CSV --counts JSON]
With no args it demos on a synthetic confusion table.
"""
import argparse
import json

import numpy as np


def main(argv=None):
    from forest_tpu.eval.tau_calibration import (DEFAULT_TAUS,
                                                 entropy_tau_sweep)
    from forest_tpu.losses.evt_soft_neighborhood import EvtDiffusionMetric

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--confusion", default=None)
    ap.add_argument("--counts", default=None,
                    help="JSON of {code: pixel count}")
    ap.add_argument("--min-count", type=int, default=100)
    ap.add_argument("--diffusion-steps", type=int, default=2)
    a = ap.parse_args(argv)

    if a.confusion:
        counts = json.load(open(a.counts)) if a.counts else {}
        metric = EvtDiffusionMetric(a.confusion, counts,
                                    min_count=a.min_count,
                                    diffusion_steps=a.diffusion_steps)
    else:
        import tempfile
        from pathlib import Path

        rng = np.random.default_rng(0)
        codes = [7001, 7002, 7003, 7004, 7005]
        k = len(codes)
        conf = rng.integers(2, 30, size=(k, k)).astype(float)
        conf += np.diag(rng.integers(80, 150, size=k).astype(float))
        lines = ["," + ",".join(map(str, codes))]
        for c, row in zip(codes, conf):
            lines.append(f"{c}," + ",".join(map(str, row)))
        p = Path(tempfile.mkdtemp()) / "conf.csv"
        p.write_text("\n".join(lines))
        metric = EvtDiffusionMetric(p, {c: 1000 for c in codes},
                                    min_count=10,
                                    min_confusion_samples=10)
        print(f"[demo] synthetic confusion table with {k} codes")

    d_full = 1.0 - metric.similarity
    k = metric.n_codes
    # Same-code pairs are excluded in the loss: drop the diagonal so the
    # entropy runs over the K-1 cross-code neighbors per row.
    off = ~np.eye(k, dtype=bool)
    d_ref = d_full[off].reshape(k, k - 1)
    sweep = entropy_tau_sweep(d_ref, DEFAULT_TAUS)
    print(f"codes: {k}   log(K-1) = {np.log(k - 1):.3f} (uniform entropy)")
    print("tau    mean row entropy of softmax(-d_ref/tau)")
    for tau, ent in sweep.items():
        marker = " <-- well-sized" if 0.3 * np.log(k - 1) < ent \
            < 0.8 * np.log(k - 1) else ""
        print(f"{tau:5.2f}  {ent:.3f}{marker}")


if __name__ == "__main__":
    main()
