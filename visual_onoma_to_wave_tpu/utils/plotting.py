"""Mel/energy figure plotting for training observability.

Equivalent of the reference's mel+energy overlays sent to TensorBoard
(reference utils/tools.py:243-303, 541-583).
"""
from __future__ import annotations

import numpy as np


def plot_mel(mels_and_titles, energies=None):
    """mels_and_titles: list of (mel (T, n_mels), title). Returns a figure."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    n = len(mels_and_titles)
    fig, axes = plt.subplots(n, 1, squeeze=False, figsize=(8, 3 * n))
    for i, (mel, title) in enumerate(mels_and_titles):
        ax = axes[i][0]
        ax.imshow(np.asarray(mel).T, origin="lower", aspect="auto",
                  interpolation="none")
        ax.set_title(title, fontsize=9)
        ax.set_ylabel("mel bin")
        if energies is not None and energies[i] is not None:
            ax2 = ax.twinx()
            ax2.plot(np.asarray(energies[i]), color="white", linewidth=0.8)
            ax2.set_ylabel("energy")
    fig.tight_layout()
    return fig
