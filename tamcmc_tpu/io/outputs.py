"""Output writers: thinned posterior samples + adaptation trajectories.

Reference equivalent: the buffered binary writers of `outputs.cpp` [U]
(SURVEY.md section 2 "Outputs"): samples of the coldest chain (thinned),
sigma/mu/Sigma adaptation trajectories, acceptance and swap rates, logL
chains for all temperatures, with `.hdr` sidecar headers.

Format here:
  {phase}_samples.bin  — raw little-endian float64 records, one row per
                         (emit, walker): Df values.  `.hdr` sidecar is ASCII:
                         Nvars, Nsamples, column names — enough for the
                         `tamcmc export` tool (reference bin2txt parity).
  {phase}_chains.npz   — logL (emit, T, C), logP0, log_sigma, acc_rate, mu0,
                         cov_diag0 (emit, Df), swap_att/swap_acc (emit, T;
                         cumulative counters — rates are diffs over emits)
A C++ implementation of the record writer lives in native/ (used when built;
this module transparently falls back to numpy).
"""

from __future__ import annotations

import os
import pathlib

import numpy as np


class OutputWriter:
    def __init__(self, outdir: str, param_names, n_temps: int, n_chains: int):
        self.outdir = pathlib.Path(outdir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self.param_names = list(param_names)
        self.n_temps = n_temps
        self.n_chains = n_chains
        self._bin_handles = {}
        self._counts = {}
        self._chain_buffers = {}

    # --- streaming API (called per chunk from the driver) ---
    def append_chunk(self, phase: str, outs: dict):
        """outs: host dict from run_phase — theta0 (E, C, Df), logL (E, T, C),
        logP0 (E, C), log_sigma (E, T), acc_rate (E, T), mu0 (E, Df)."""
        theta0 = np.asarray(outs["theta0"], dtype=np.float64)
        E, C, Df = theta0.shape
        f = self._bin_handles.get(phase)
        if f is None:
            f = self._open_writer(phase, Df)
            self._bin_handles[phase] = f
            self._counts[phase] = 0
            self._chain_buffers[phase] = []
        records = theta0.reshape(E * C, Df)
        if hasattr(f, "append"):           # native async writer
            f.append(records)
        else:
            f.write(records.astype("<f8").tobytes())
        self._counts[phase] += E * C
        self._chain_buffers[phase].append(
            {k: np.asarray(v) for k, v in outs.items() if k != "theta0"})

    def _open_writer(self, phase: str, nvars: int):
        """Prefer the native async double-buffered writer (native/recordio);
        fall back to a plain Python file handle."""
        path = self.outdir / f"{phase}_samples.bin"
        try:
            from tamcmc_tpu.io.native import NativeRecordWriter
            return NativeRecordWriter(str(path), nvars)
        except Exception:
            return open(path, "wb")

    def finalize_phase(self, phase: str):
        if phase not in self._bin_handles:
            return
        self._bin_handles[phase].close()
        del self._bin_handles[phase]
        with open(self.outdir / f"{phase}_samples.hdr", "w") as h:
            h.write("# tamcmc-tpu samples header\n")
            h.write(f"Nvars= {len(self.param_names)}\n")
            h.write(f"Nsamples= {self._counts[phase]}\n")
            h.write(f"Nchains= {self.n_chains}\n")
            h.write("variable_names= " + " ".join(self.param_names) + "\n")
            h.write("dtype= float64_le\n")
        bufs = self._chain_buffers.pop(phase)
        stacked = {k: np.concatenate([b[k] for b in bufs], axis=0)
                   for k in bufs[0]}
        np.savez_compressed(self.outdir / f"{phase}_chains.npz", **stacked)

    def close(self):
        for phase in list(self._bin_handles):
            self.finalize_phase(phase)


def read_bin_samples(outdir: str, phase: str):
    """Read back {phase}_samples.bin via its .hdr → (samples, names).
    This is the reference's bin2txt input path (SURVEY.md section 3.3)."""
    outdir = pathlib.Path(outdir)
    hdr = {}
    with open(outdir / f"{phase}_samples.hdr") as f:
        for line in f:
            if line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            hdr[k.strip()] = v.strip()
    nvars = int(hdr["Nvars"])
    names = hdr["variable_names"].split()
    raw = np.fromfile(outdir / f"{phase}_samples.bin", dtype="<f8")
    n = raw.size // nvars
    assert n == int(hdr["Nsamples"]), \
        f"bin/hdr mismatch: {n} records vs {hdr['Nsamples']}"
    return raw.reshape(n, nvars), names
