"""Matplotlib diagnostic reports — the reference's gnuplot artifact set.

Reference equivalent: `diagnostics.cpp` + vendored gnuplot-iostream [U]
(SURVEY.md section 2 "Diagnostics"): spectrum + best-fit model overlay,
parameter histograms/pdfs, likelihood/parameter traces, acceptance and swap
evolution.  Pure host-side; importable lazily so headless runs without
matplotlib never pay for it.
"""

from __future__ import annotations

import pathlib

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_spectrum_fit(outpath, nu, power, model, title="spectrum fit"):
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(10, 4.5))
    ax.plot(nu, power, lw=0.4, color="0.6", label="data")
    ax.plot(nu, model, lw=1.2, color="C3", label="model (posterior median)")
    ax.set_xlabel("frequency [uHz]"); ax.set_ylabel("power [ppm$^2$/uHz]")
    ax.set_yscale("log"); ax.legend(); ax.set_title(title)
    fig.tight_layout(); fig.savefig(outpath, dpi=110); plt.close(fig)


def plot_param_pdfs(outpath, samples, names, max_params=24):
    """samples: (N, D) flat draws."""
    plt = _mpl()
    D = min(samples.shape[1], max_params)
    ncol = 4; nrow = (D + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.2 * ncol, 2.4 * nrow))
    axes = np.atleast_1d(axes).ravel()
    for i in range(D):
        axes[i].hist(samples[:, i], bins=60, density=True, color="C0", alpha=0.8)
        axes[i].set_title(names[i], fontsize=8)
        axes[i].tick_params(labelsize=7)
    for j in range(D, len(axes)):
        axes[j].axis("off")
    fig.tight_layout(); fig.savefig(outpath, dpi=110); plt.close(fig)


def plot_traces(outpath, samples, names, max_params=12):
    """samples: (E, C, D) thinned chains."""
    plt = _mpl()
    D = min(samples.shape[2], max_params)
    fig, axes = plt.subplots(D, 1, figsize=(9, 1.4 * D), sharex=True)
    axes = np.atleast_1d(axes)
    for i in range(D):
        axes[i].plot(samples[:, :, i], lw=0.4, alpha=0.7)
        axes[i].set_ylabel(names[i], fontsize=7)
    axes[-1].set_xlabel("thinned iteration")
    fig.tight_layout(); fig.savefig(outpath, dpi=110); plt.close(fig)


def plot_acceptance(outpath, acc_rate, log_sigma, target=0.234):
    """acc_rate, log_sigma: (E, T)."""
    plt = _mpl()
    fig, (a0, a1) = plt.subplots(2, 1, figsize=(9, 5), sharex=True)
    for t in range(acc_rate.shape[1]):
        a0.plot(acc_rate[:, t], lw=0.8, label=f"T{t}")
    a0.axhline(target, color="k", ls="--", lw=0.8)
    a0.set_ylabel("acceptance"); a0.legend(fontsize=7, ncol=4)
    for t in range(log_sigma.shape[1]):
        a1.plot(np.exp(log_sigma[:, t]), lw=0.8)
    a1.set_yscale("log"); a1.set_ylabel("proposal scale sigma")
    a1.set_xlabel("thinned iteration")
    fig.tight_layout(); fig.savefig(outpath, dpi=110); plt.close(fig)


def plot_likelihood_trace(outpath, logL):
    """logL: (E, T, C)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(9, 3.5))
    mean_walkers = logL.mean(axis=2)
    for t in range(mean_walkers.shape[1]):
        ax.plot(mean_walkers[:, t], lw=0.7, label=f"T{t}")
    ax.set_xlabel("thinned iteration"); ax.set_ylabel("logL (walker mean)")
    ax.legend(fontsize=7, ncol=4)
    fig.tight_layout(); fig.savefig(outpath, dpi=110); plt.close(fig)


def plot_swap_rates(outpath, swap_att, swap_acc):
    """swap_att/swap_acc: (E, T) cumulative adjacent-pair counters; the last
    rung has no upper partner.  Plots the running acceptance rate per pair
    (the reference's swap table, as an evolution plot)."""
    plt = _mpl()
    att = np.asarray(swap_att, dtype=np.float64)[:, :-1]
    acc = np.asarray(swap_acc, dtype=np.float64)[:, :-1]
    rate = acc / np.maximum(att, 1.0)
    fig, ax = plt.subplots(figsize=(9, 3.5))
    for p in range(rate.shape[1]):
        ax.plot(rate[:, p], lw=0.9, label=f"pair {p}-{p + 1}")
    ax.set_ylim(0, 1); ax.set_xlabel("thinned iteration")
    ax.set_ylabel("tempering swap acceptance")
    ax.legend(fontsize=7, ncol=4)
    fig.tight_layout(); fig.savefig(outpath, dpi=110); plt.close(fig)


def plot_joint(outpath, x, y, xname, yname):
    """2-D joint posterior with marginal histograms — used for the classic
    a1-inclination degeneracy ridge (the seismic splitting nu*sin(i) is what
    the data constrain; the reference community reads this plane first when
    judging a peak-bagging fit [U])."""
    plt = _mpl()
    fig = plt.figure(figsize=(6.4, 6.4))
    gs = fig.add_gridspec(2, 2, width_ratios=(4, 1), height_ratios=(1, 4),
                          wspace=0.04, hspace=0.04)
    axj = fig.add_subplot(gs[1, 0])
    axx = fig.add_subplot(gs[0, 0], sharex=axj)
    axy = fig.add_subplot(gs[1, 1], sharey=axj)
    h = axj.hist2d(x, y, bins=60, cmap="Blues")
    fig.colorbar(h[3], ax=axy, fraction=0.3, pad=0.2)
    axj.set_xlabel(xname); axj.set_ylabel(yname)
    axx.hist(x, bins=60, color="C0", alpha=0.8)
    axy.hist(y, bins=60, color="C0", alpha=0.8, orientation="horizontal")
    axx.tick_params(labelbottom=False); axy.tick_params(labelleft=False)
    fig.savefig(outpath, dpi=110, bbox_inches="tight"); plt.close(fig)


def _find_rot_inc(names):
    """Indices of the splitting head (a1) and the inclination in the free
    names, or None."""
    i_a1 = i_inc = None
    for i, n in enumerate(names):
        ln = n.lower()
        if i_a1 is None and (ln == "a1" or ln.startswith("a1_")
                             or ln == "rot" or ln == "rot_0"
                             or ln == "a1_env"):
            i_a1 = i
        if i_inc is None and (ln == "inc" or ln.startswith("inclination")
                              or ln == "i"):
            i_inc = i
    return (i_a1, i_inc) if (i_a1 is not None and i_inc is not None) else None


def write_report(outdir, results: dict, problem=None, names=None,
                 model_at_median=None):
    """Emit the full artifact set from run_phases results."""
    outdir = pathlib.Path(outdir); outdir.mkdir(parents=True, exist_ok=True)
    made = []
    phase = "A" if "A" in results else list(results)[-1]
    outs = results[phase]
    theta = outs["theta0"]                       # (E, C, Df)
    flat = theta.reshape(-1, theta.shape[-1])
    names = names or [f"p{i}" for i in range(flat.shape[1])]
    plot_param_pdfs(outdir / "param_pdfs.png", flat, names); made.append("param_pdfs.png")
    plot_traces(outdir / "traces.png", theta, names); made.append("traces.png")
    plot_acceptance(outdir / "acceptance.png", outs["acc_rate"],
                    outs["log_sigma"]); made.append("acceptance.png")
    plot_likelihood_trace(outdir / "logL_trace.png", outs["logL"]); made.append("logL_trace.png")
    if "swap_att" in outs and outs["swap_att"].shape[1] > 1:
        plot_swap_rates(outdir / "swap_rates.png", outs["swap_att"],
                        outs["swap_acc"]); made.append("swap_rates.png")
    ri = _find_rot_inc(names)
    if ri is not None:
        i_a1, i_inc = ri
        plot_joint(outdir / "rotation_inclination.png",
                   flat[:, i_a1], np.rad2deg(flat[:, i_inc]),
                   f"{names[i_a1]} [uHz]", f"{names[i_inc]} [deg]")
        made.append("rotation_inclination.png")
    if problem is not None and model_at_median is not None:
        plot_spectrum_fit(outdir / "spectrum_fit.png",
                          np.asarray(problem.nu), np.asarray(problem.spec),
                          model_at_median); made.append("spectrum_fit.png")
    return made
