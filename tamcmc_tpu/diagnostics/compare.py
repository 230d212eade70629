"""Posterior-moment parity comparison — the BASELINE.json acceptance test.

SURVEY.md §7 stage 8 calls for a parity harness: "posterior-moment
comparison (vs reference binaries when available, vs long-run self-truth
otherwise)", and BASELINE.json's metric is "posterior moments match within
Monte-Carlo error".  This module makes that check a tool instead of a
judgment call: given two posterior sample sets (two of our runs, or ours vs
an ASCII export of the reference's bin2txt output), it compares each
common parameter's mean with an ESS-aware z-score

    z = |m1 - m2| / sqrt(sd1^2/ESS1 + sd2^2/ESS2)

and each parameter's spread via the log std ratio.  PRNG parity is defined
in distribution, never sample-by-sample (SURVEY hard-part 6), which is
exactly what this statistic tests.
"""

from __future__ import annotations

import numpy as np

from tamcmc_tpu.diagnostics.ess import effective_sample_size


def _moments(samples: np.ndarray):
    """samples: (N, D) or (E, C, D) -> per-param dict arrays.

    Cast to f64 first: an axis-0 mean over a C-contiguous f32 array
    accumulates sequentially (not pairwise) and biases O(2000)-scale
    parameter means by up to ~ulp(sum)/2 ~ O(1) — far outside the
    MC-error resolution this harness judges at (round-5 diagnosis)."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 3:
        per_walker = samples
        flat = samples.reshape(-1, samples.shape[-1])
    else:
        flat = samples
        per_walker = samples[:, None, :]
    D = flat.shape[1]
    ess = np.array([max(effective_sample_size(per_walker[:, :, i]), 2.0)
                    for i in range(D)])
    return {"mean": flat.mean(axis=0), "std": flat.std(axis=0, ddof=1),
            "ess": ess}


def compare_posteriors(samples_a, names_a, samples_b, names_b,
                       z_threshold: float = 3.0,
                       std_ratio_threshold: float = 1.5):
    """Compare two posterior sample sets on their common parameter names.

    Returns dict with per-param rows and an overall `consistent` verdict:
    every common param must have |z| < z_threshold AND a std ratio within
    [1/r, r].  Raises if the name sets are disjoint."""
    ma, mb = _moments(np.asarray(samples_a)), _moments(np.asarray(samples_b))
    ia = {n: i for i, n in enumerate(names_a)}
    ib = {n: i for i, n in enumerate(names_b)}
    common = [n for n in names_a if n in ib]
    if not common:
        raise ValueError("no common parameter names between the two sets "
                         f"({list(names_a)[:5]}... vs {list(names_b)[:5]}...)")
    rows = []
    for n in common:
        i, j = ia[n], ib[n]
        se2 = ma["std"][i] ** 2 / ma["ess"][i] + \
            mb["std"][j] ** 2 / mb["ess"][j]
        z = float(abs(ma["mean"][i] - mb["mean"][j]) / max(np.sqrt(se2),
                                                           1e-300))
        ratio = float(max(ma["std"][i], 1e-300) / max(mb["std"][j], 1e-300))
        rows.append({
            "name": n,
            "mean_a": float(ma["mean"][i]), "mean_b": float(mb["mean"][j]),
            "std_a": float(ma["std"][i]), "std_b": float(mb["std"][j]),
            "ess_a": float(ma["ess"][i]), "ess_b": float(mb["ess"][j]),
            "z": z,
            "std_ratio": ratio,
            "ok": bool(z < z_threshold and
                       1.0 / std_ratio_threshold < ratio <
                       std_ratio_threshold),
        })
    return {
        "params": rows,
        "n_common": len(common),
        "max_z": max(r["z"] for r in rows),
        "worst_param": max(rows, key=lambda r: r["z"])["name"],
        "consistent": all(r["ok"] for r in rows),
        "z_threshold": z_threshold,
        "std_ratio_threshold": std_ratio_threshold,
    }


def format_comparison(res) -> str:
    lines = [f"{'param':<18}{'mean A':>12}{'mean B':>12}{'z':>8}"
             f"{'std A/B':>9}  verdict"]
    for r in res["params"]:
        lines.append(f"{r['name']:<18}{r['mean_a']:>12.5g}"
                     f"{r['mean_b']:>12.5g}{r['z']:>8.2f}"
                     f"{r['std_ratio']:>9.3f}  "
                     + ("ok" if r["ok"] else "MISMATCH"))
    v = "CONSISTENT" if res["consistent"] else "INCONSISTENT"
    lines.append(f"--> {v}: {res['n_common']} common params, "
                 f"max |z| = {res['max_z']:.2f} ({res['worst_param']}), "
                 f"threshold {res['z_threshold']}")
    return "\n".join(lines)


def load_ascii_samples(path: str):
    """Read an ASCII sample table (one column per parameter) with a
    '# name1 name2 ...' header line — the format `tamcmc export` writes and
    the reference's bin2txt produces [U].  Returns (samples (N, D), names)."""
    names = None
    with open(path) as f:
        for line in f:
            t = line.strip()
            if t.startswith(("#", "!")):
                toks = t.lstrip("#!").split()
                if toks:
                    names = toks
            elif t:
                break
    # '!' headers (the reference bin2txt convention) must be skipped by the
    # DATA parse too, not just the name scan above — plain loadtxt only
    # treats '#' as comments and would crash on such files
    arr = np.loadtxt(path, comments=("#", "!"))
    if arr.ndim == 1:
        arr = arr[:, None]
    if names is None or len(names) != arr.shape[1]:
        names = [f"p{i}" for i in range(arr.shape[1])]
    return arr, names
