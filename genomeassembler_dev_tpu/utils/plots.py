"""Optional diagnostics plots (matplotlib), replacing the reference's PDF
outputs (lib/DeNovoAssembler.R:485-563 boxplots; lib/GenerateReads.R:261-345
probability-track and breakpoint histograms). All plots are derived from the
same CSV/array data the pipeline already emits; matplotlib is imported lazily
so headless/minimal installs never pay for it."""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_probability_track(track: np.ndarray, out_path: str, title: str = "") -> str:
    """Breakage probability along the segment (GenerateReads.R:261-299)."""
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(11, 4))
    ax.bar(np.arange(len(track)), track, width=1.0, color="grey")
    ax.set_xlabel("Genome sequence (8-mer sliding window by 1 nt)")
    ax.set_ylabel("Breakage probability")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_breakpoint_histogram(positions: np.ndarray, seq_len: int, out_path: str,
                              bins: int = 300) -> str:
    """Sampled breakpoint positions (GenerateReads.R:316-345)."""
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(11, 4))
    ax.hist(positions, bins=bins, color="grey")
    ax.set_xlim(0, seq_len)
    ax.set_xlabel("Genomic sequence position")
    ax.set_ylabel("Breakpoint draws")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_score_vs_levdist(columns: dict, out_path: str, bins: int = 6) -> str:
    """Boxplots of the three bp_score flavours vs binned Levenshtein distance
    (lib/DeNovoAssembler.R:485-563)."""
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    lev = np.asarray(columns["lev_dist_vs_true"], dtype=float)
    edges = np.linspace(0, max(lev.max(), 1), bins)
    labels = [f"({edges[i]:.0f},{edges[i+1]:.0f}]" for i in range(len(edges) - 1)]
    fig, axes = plt.subplots(1, 3, figsize=(19, 5))
    for ax, key, ylabel in zip(
        axes,
        ["bp_score_true", "bp_score_norm_by_len_true",
         "bp_score_norm_by_break_freqs_true"],
        ["Actual", "Normalised by length", "Normalised by nr of breaks"],
    ):
        vals = np.asarray(columns[key], dtype=float)
        groups = []
        for i in range(len(edges) - 1):
            lo, hi = edges[i], edges[i + 1]
            sel = (lev > lo) & (lev <= hi) if i else (lev >= lo) & (lev <= hi)
            groups.append(vals[sel & ~np.isnan(vals)])
        ax.boxplot(groups, tick_labels=labels)
        ax.set_ylabel(ylabel)
        ax.tick_params(axis="x", rotation=90)
    fig.suptitle("Breakage probability scores vs binned Levenshtein distance")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
