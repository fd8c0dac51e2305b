"""Mel/energy figure plotting for training observability.

Equivalent of the reference's mel+energy overlays sent to TensorBoard
(reference utils/tools.py:243-303, 541-583): each mel panel can carry the
character-level energy contour expanded to frames, dotted vlines at the
character boundaries (cumsum of durations), and the rendered visual
onomatopoeia strip above the spectrograms.
"""
from __future__ import annotations

import numpy as np


def plot_mel(mels_and_titles, energies=None, char_breaks=None,
             energy_ylim=None, input_image=None):
    """mels_and_titles: list of (mel (T, n_mels), title). Returns a figure.

    energies: optional per-panel frame-level energy contour (or None entries)
    char_breaks: optional per-panel frame indices of character boundaries
    energy_ylim: (min, max) for the energy axis (reference uses the
        stats.json energy min/max so panels are comparable across steps)
    input_image: optional (H, W) grayscale visual-text strip drawn above
        the mel panels (reference plot_mel_withinput, utils/tools.py:243)
    """
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    n = len(mels_and_titles)
    extra = 1 if input_image is not None else 0
    heights = ([0.6] if extra else []) + [3.0] * n
    fig, axes = plt.subplots(
        n + extra, 1, squeeze=False, figsize=(8, 3 * n + extra),
        gridspec_kw={"height_ratios": heights})
    if input_image is not None:
        ax = axes[0][0]
        ax.imshow(np.asarray(input_image), cmap="gray", aspect="auto")
        ax.tick_params(left=False, labelleft=False,
                       bottom=False, labelbottom=False)
    for i, (mel, title) in enumerate(mels_and_titles):
        ax = axes[i + extra][0]
        ax.imshow(np.asarray(mel).T, origin="lower", aspect="auto",
                  interpolation="none")
        ax.set_title(title, fontsize=9)
        ax.set_ylabel("mel bin")
        energy = energies[i] if energies is not None else None
        if energy is not None:
            ax2 = ax.twinx()
            ax2.plot(np.asarray(energy), color="violet", linewidth=0.8)
            ax2.set_ylabel("energy", color="darkviolet")
            ax2.set_xlim(0, max(np.asarray(mel).shape[0] - 1, 1))
            if energy_ylim is not None:
                ax2.set_ylim(*energy_ylim)
            breaks = char_breaks[i] if char_breaks is not None else None
            if breaks is not None:
                for b in np.asarray(breaks):
                    ax2.axvline(x=float(b), color="violet", alpha=0.5,
                                linestyle=":")
    fig.tight_layout()
    return fig


def expand_char_values(values: np.ndarray, durations: np.ndarray,
                       max_len: int | None = None) -> np.ndarray:
    """Character-level values -> frame-level contour by repeating each value
    duration[i] times (reference utils/tools.py:173-177 `expand`)."""
    out = np.repeat(np.asarray(values), np.asarray(durations).astype(int))
    if max_len is not None:
        out = out[:max_len]
    return out
